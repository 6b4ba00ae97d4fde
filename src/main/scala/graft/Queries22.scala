package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.{AsOfJoin, GraphOps, TimeSeries}
import Queries.Q

/** Batch 22: last-touch attribution (as-of backward + tolerance),
  * seeded harmonic closeness, exact per-group mode, session journey
  * paths, and the Gini concentration index — analytics compositions
  * over the operators the engine already owns.
  */
object Queries22 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Last-touch attribution: each purchase joined to the user's most
    * recent click within 24 h — [[AsOfJoin.nearest]]'s backward +
    * tolerance mode (previously API-only), i.e. pandas merge_asof
    * tolerance semantics. Same argmin-aggregate shape as
    * `j5_asof_nearest`: candidates collapse map-side, one shuffle.
    */
  val j5_asof_attribution = Q(
    (s, dir) => {
      val e = T_(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("cts"))
      AsOfJoin.nearest(p, c, Seq("user_id"), "ts", "cts",
          direction = "backward", tolerance = Some(86400L),
          tiebreak = Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("click_id"))
    },
    Some("""WITH p AS (SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'),
        j AS (SELECT p.purchase_id, p.user_id, c.click_id,
            CASE WHEN c.cts IS NOT NULL
                 AND floor(epoch(c.cts)) <= floor(epoch(p.ts))
                 AND abs(floor(epoch(p.ts)) - floor(epoch(c.cts))) <= 86400
              THEN abs(floor(epoch(p.ts)) - floor(epoch(c.cts))) END AS vdiff
          FROM p LEFT JOIN c ON p.user_id = c.user_id),
        r AS (SELECT purchase_id, user_id, click_id, vdiff,
            row_number() OVER (PARTITION BY purchase_id
              ORDER BY coalesce(vdiff, 9223372036854775807) ASC,
                       click_id ASC) AS rn
          FROM j)
      SELECT purchase_id, user_id,
        CASE WHEN vdiff IS NOT NULL THEN click_id END AS click_id
      FROM r WHERE rn = 1"""))

  private val copurchaseSql =
    """b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'),
      pc AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS cnt
        FROM b a JOIN b b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      sym AS (SELECT p1 AS src, p2 AS dst, 1000 // cnt AS w FROM pc
        UNION ALL SELECT p2, p1, 1000 // cnt FROM pc),
      verts AS (SELECT src AS id FROM sym UNION SELECT dst FROM sym),
      seeds AS (SELECT id FROM verts ORDER BY id ASC LIMIT 3),
      hop AS (SELECT src, dst, w FROM sym
        UNION ALL SELECT id, id, 0 FROM verts)"""

  /** Seeded harmonic closeness: per seed, Σ 1000 div dist over the
    * vertices reached within 3 weighted hops — the centrality family
    * computed from landmark seeds, the standard way closeness scales
    * (all-pairs is quadratic; landmarks are the production
    * approximation). One tagged Bellman-Ford: the seed id rides the
    * distance frame, so k seeds share every shuffle instead of
    * running k jobs.
    */
  val g_closeness_seeded = Q(
    (s, dir) => {
      val urgent = T_(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("ok"))
      val b = T_(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .join(urgent, "ok").distinct()
      val pc = b.as("a").join(b.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("cnt"))
      val sym = pc.select(col("p1").as("src"), col("p2").as("dst"),
          expr("1000 div cnt").as("w"))
        .unionByName(pc.select(col("p2").as("src"), col("p1").as("dst"),
          expr("1000 div cnt").as("w")))
      val verts = sym.select(col("src").as("id"))
        .union(sym.select(col("dst").as("id"))).distinct()
      val seeds = verts.orderBy(col("id").asc).limit(3)
        .select(col("id").as("sid"), col("id"))
      val hop = sym.unionByName(
        verts.select(col("id").as("src"), col("id").as("dst"),
          lit(0L).as("w")))
      var dist = seeds.withColumn("dist", lit(0L))
      for (_ <- 1 to 3) {
        dist = hop.join(dist, hop("src") === dist("id"))
          .groupBy(col("sid"), col("dst").as("id"))
          .agg(min(col("dist") + col("w")).as("dist"))
      }
      dist.filter(col("dist") > 0)
        .groupBy(col("sid"))
        .agg(count(lit(1)).as("n_reached"),
          sum(expr("1000 div dist")).as("harmonic_milli"))
    },
    Some(s"""WITH $copurchaseSql,
        d0 AS (SELECT id AS sid, id, CAST(0 AS BIGINT) AS dist FROM seeds),
        d1 AS (SELECT sid, dst AS id, min(dist + w) AS dist
          FROM hop JOIN d0 ON hop.src = d0.id GROUP BY 1, 2),
        d2 AS (SELECT sid, dst AS id, min(dist + w) AS dist
          FROM hop JOIN d1 ON hop.src = d1.id GROUP BY 1, 2),
        d3 AS (SELECT sid, dst AS id, min(dist + w) AS dist
          FROM hop JOIN d2 ON hop.src = d2.id GROUP BY 1, 2)
      SELECT sid, count(*) AS n_reached,
        CAST(sum(1000 // dist) AS BIGINT) AS harmonic_milli
      FROM d3 WHERE dist > 0 GROUP BY 1"""))

  /** Exact mode per group (most frequent quantity per return flag,
    * smallest value on ties): the value-frequency table — the same
    * compression every exact order statistic here rides — then ONE
    * max_by argmax with a total order. No window, no sort of raw
    * rows.
    */
  val a_mode_per_group = Q(
    (s, dir) => T_(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("l_returnflag"))
      .agg(max_by(col("l_quantity"),
          struct(col("c"), (lit(-1.0) * col("l_quantity")).as("nv"))).as("mode_qty"),
        max(col("c")).as("mode_n")),
    Some("""SELECT l_returnflag, mode_qty, mode_n
      FROM (SELECT l_returnflag, l_quantity AS mode_qty, c,
              max(c) OVER (PARTITION BY l_returnflag) AS mode_n,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY c DESC, l_quantity ASC) AS rn
            FROM (SELECT l_returnflag, l_quantity, count(*) AS c
                  FROM lineitem GROUP BY 1, 2))
      WHERE rn = 1"""))

  /** Session journey paths: sessionize the event feed (30-min gap),
    * concatenate each session's event types in time order, and rank
    * the 50 most common journeys — the product-analytics "path
    * analysis" view. The path build is one per-session aggregate
    * (sort_array over the collected session, bounded by session
    * length); journey ranking is a TakeOrdered merge.
    */
  val r8_session_path = Q(
    (s, dir) => TimeSeries.sessionize(T_(s, dir, "events"),
        col("user_id"), col("ts"), gapSeconds = 1800,
        ord = Seq(col("ts").asc, col("event_id").asc))
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("us"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(50),
    Some("""WITH l AS (SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        b AS (SELECT user_id, event_id, ts, event_type,
            CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                 THEN 1 ELSE 0 END AS nb FROM l),
        g AS (SELECT user_id, event_id, ts, event_type,
            CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b),
        p AS (SELECT user_id, session_idx,
            string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM g GROUP BY 1, 2)
      SELECT path, count(*) AS n FROM p GROUP BY 1
      ORDER BY n DESC, path ASC LIMIT 50"""))

  /** Gini concentration of order revenue as an EXACT RATIONAL:
    * G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over cents-scaled values,
    * computed from the value-frequency table (the percentile kernel's
    * compression: the cumulative window sees |distinct prices| rows —
    * bounded by the value domain, not the row count). Σ i·x_i folds
    * each value's occupied rank range in closed form, so every term
    * is a BIGINT and both engines agree to the last digit.
    */
  val a_gini = Q(
    (s, dir) => {
      val freq = T_(s, dir, "orders")
        .select((col("o_totalprice").cast("decimal(27,2)") * 100)
          .cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      // decimal(38,0) from the PER-ROW product on: v·rankRange is
      // ~v·n²/4 per row and the summed s1 is ~v·n²·distinct — both
      // blow through int64 well below sf1 (the round-8 amplified
      // sweep caught exactly this), so every term after the frequency
      // table is exact decimal, and the rationals ship as canonical
      // integer strings per the engine-wide wide-rational convention
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val wCum = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      freq.withColumn("cum", sum(col("c")).over(wCum))
        .select(col("v"), col("c"), col("cum"))
        .agg(sum(col("c")).as("n"), sum(d(col("v")) * col("c")).as("s"),
          sum(d(col("v")) * ((col("cum") - col("c")) * col("c")
            + expr("c * (c + 1) div 2"))).as("s1"))
        .select(col("n"),
          (lit(2) * col("s1") - (col("n") + 1) * col("s"))
            .cast("decimal(38,0)").cast("string").as("gini_num"),
          (col("n") * col("s")).cast("decimal(38,0)")
            .cast("string").as("gini_den"))
    },
    Some("""WITH f AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT) AS v,
            count(*) AS c
          FROM orders GROUP BY 1),
        cumt AS (SELECT v, c,
            sum(c) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
          FROM f),
        m AS (SELECT sum(c) AS n,
            sum(CAST(v AS HUGEINT) * c) AS s,
            sum(CAST(v AS HUGEINT) * ((cum - c) * c + c * (c + 1) // 2)) AS s1
          FROM cumt)
      SELECT CAST(n AS BIGINT) AS n,
        CAST(CAST(2 * s1 - (n + 1) * s AS DECIMAL(38,0)) AS VARCHAR) AS gini_num,
        CAST(CAST(n * s AS DECIMAL(38,0)) AS VARCHAR) AS gini_den FROM m"""))

  val all: Map[String, Q] = Map(
    "j5_asof_attribution" -> j5_asof_attribution,
    "g_closeness_seeded" -> g_closeness_seeded,
    "a_mode_per_group" -> a_mode_per_group,
    "r8_session_path" -> r8_session_path,
    "a_gini" -> a_gini,
  )
}
