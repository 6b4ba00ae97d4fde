package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.Percentiles
import Queries.Q

/** Batch 19: behavioral / basket analytics — weekly cohort retention,
  * association rules (support/confidence/lift), common-neighbor link
  * prediction with a hub cap, RFM segmentation from exact percentile
  * thresholds, and the event-type Markov transition matrix.
  *
  * Capability provenance: the reference materializes per-entity
  * activity projections and rate metrics over its event tables
  * (graph_weather_day.py:69-117 daily rates; main_graph_topraq.py:84-340
  * the per-run metric sweep); these are the standard next analytics a
  * user of that engine asks of the same data. All rate/score
  * arithmetic is integer-quantized (milli units) so every row replays
  * bit-for-bit in the DuckDB oracle.
  */
object Queries19 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Weekly cohort retention matrix: users bucketed by first-active
    * week, tracked across subsequent weeks. Two hash aggregates over
    * events (first-week per user, distinct user-week activity), one
    * equi-join on user, then the matrix itself — |cohorts| x |weeks|
    * rows, constant-size at any corpus scale — carries the one window
    * (cohort size at week 0). Retention is integer milli so both
    * engines emit identical rows.
    */
  val w_cohort_retention = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val active = ev.distinct()
      val cells = active.join(cohort, "user_id")
        .groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("int").as("weeks_since"))
        .agg(count(lit(1)).as("n_users"))
      // cohort size = the week-0 cell; the window runs over the tiny
      // cohort x week matrix, never over events
      val w = Window.partitionBy(col("cohort_wk"))
      cells
        .withColumn("cohort_size",
          max(when(col("weeks_since") === 0, col("n_users"))).over(w))
        .select(col("cohort_wk"), col("weeks_since"), col("n_users"),
          expr("1000L * n_users div cohort_size").as("retention_milli"))
    },
    Some("""WITH ev AS (SELECT user_id,
            CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
        active AS (SELECT DISTINCT user_id, wk FROM ev),
        cells AS (SELECT cohort_wk,
            CAST(date_diff('day', cohort_wk, wk) // 7 AS INT) AS weeks_since,
            count(*) AS n_users
          FROM active JOIN cohort USING (user_id) GROUP BY 1, 2)
      SELECT cohort_wk, weeks_since, n_users,
        1000 * n_users // (max(CASE WHEN weeks_since = 0 THEN n_users END)
          OVER (PARTITION BY cohort_wk)) AS retention_milli
      FROM cells"""))

  /** Market-basket association rules over co-purchased parts:
    * support (co-occurrence count), confidence and lift in exact
    * integer units (milli / micro). Basket membership is the distinct
    * (order, part) set; the pair count is an order-local self-join
    * (fan-out bounded by per-order line cap, not table size) and both
    * metrics divide pre-aggregated counts, so nothing past the first
    * aggregate ever touches raw rows. Rules are emitted in both
    * directions; min support 2; top 100 by confidence.
    */
  val a_assoc_rules = Q(
    (s, dir) => {
      val b = T_(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val nOrders = b.select(col("ok")).distinct().agg(count(lit(1)).as("n_orders"))
      val item = b.groupBy(col("pk")).agg(count(lit(1)).as("c_item"))
      val pair = b.as("a").join(b.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .groupBy(col("a.pk").as("lhs"), col("b.pk").as("rhs"))
        .agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 2)
      pair
        .join(item.withColumnRenamed("pk", "lhs")
          .withColumnRenamed("c_item", "c_lhs"), "lhs")
        .join(item.withColumnRenamed("pk", "rhs")
          .withColumnRenamed("c_item", "c_rhs"), "rhs")
        .crossJoin(broadcast(nOrders))
        .select(col("lhs"), col("rhs"), col("supp"),
          expr("1000L * supp div c_lhs").as("conf_milli"),
          expr("(1000000L * supp * n_orders) div (c_lhs * c_rhs)").as("lift_micro"))
        .orderBy(col("conf_milli").desc, col("lift_micro").desc,
          col("lhs").asc, col("rhs").asc)
        .limit(100)
    },
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
        t AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        item AS (SELECT pk, count(*) AS c_item FROM b GROUP BY 1),
        pair AS (SELECT a.pk AS lhs, b.pk AS rhs, count(*) AS supp
          FROM b a JOIN b b ON a.ok = b.ok AND a.pk <> b.pk
          GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT lhs, rhs, supp,
        1000 * supp // li.c_item AS conf_milli,
        (1000000 * supp * t.n_orders) // (li.c_item * ri.c_item) AS lift_micro
      FROM pair
        JOIN item li ON li.pk = pair.lhs
        JOIN item ri ON ri.pk = pair.rhs
        CROSS JOIN t
      ORDER BY conf_milli DESC, lift_micro DESC, lhs ASC, rhs ASC LIMIT 100"""))

  /** Common-neighbor link prediction over the urgent-order co-purchase
    * graph: for part pairs NOT directly co-purchased, count shared
    * neighbors and score milli-Jaccard over the capped neighbor sets.
    * The 2-hop expansion goes ONLY through middle vertices of degree
    * <= 50 (the Adamic-Adar insight made a hard guard: hubs carry
    * ~zero signal and all of the quadratic cost — sum of deg^2 over
    * capped middles is <= 50 * 2|E|, linear in edges). Everything is
    * an equi-join; the anti-join removes existing edges.
    */
  val g_link_predict = Q(
    (s, dir) => {
      // r17 negative result (OPTIMIZATION_r17.md): persisting b/und/nlow
      // (each consumed 2-3x in this DAG; the initial plan shows 264
      // Exchanges over 136 scans) measured WORSE at 32 cores (3.80 s
      // vs 3.06 s warm median) — ReuseExchange already dedups the
      // identical subtrees at runtime, and the persists only added
      // materialization barriers. Left unpersisted on purpose.
      val urgentOrders = T_(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("ok"))
      val b = T_(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .join(urgentOrders, "ok").distinct()
      val und = b.as("a").join(b.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("p1"), col("b.pk").as("p2")).distinct()
      val sym = und.select(col("p1").as("v"), col("p2").as("w"))
        .unionByName(und.select(col("p2").as("v"), col("p1").as("w")))
      val deg = sym.groupBy(col("w")).agg(count(lit(1)).as("deg_w"))
      val nlow = sym.join(deg, "w").filter(col("deg_w") <= 50)
        .select(col("v"), col("w"))
      val degLow = nlow.groupBy(col("v")).agg(count(lit(1)).as("deg_low"))
      val cand = nlow.as("x").join(nlow.as("y"),
          col("x.w") === col("y.w") && col("x.v") < col("y.v"))
        .groupBy(col("x.v").as("a"), col("y.v").as("c"))
        .agg(count(lit(1)).as("common"))
        .join(und, col("a") === col("p1") && col("c") === col("p2"), "left_anti")
      cand
        .join(degLow.withColumnRenamed("v", "a")
          .withColumnRenamed("deg_low", "deg_a"), "a")
        .join(degLow.withColumnRenamed("v", "c")
          .withColumnRenamed("deg_low", "deg_c"), "c")
        .select(col("a"), col("c"), col("common"),
          expr("1000L * common div (deg_a + deg_c - common)").as("jaccard_milli"))
        .orderBy(col("common").desc, col("jaccard_milli").desc,
          col("a").asc, col("c").asc)
        .limit(100)
    },
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'),
        und AS (SELECT DISTINCT a.pk AS p1, b.pk AS p2
          FROM b a JOIN b b ON a.ok = b.ok AND a.pk < b.pk),
        sym AS (SELECT p1 AS v, p2 AS w FROM und
          UNION ALL SELECT p2, p1 FROM und),
        deg AS (SELECT w, count(*) AS deg_w FROM sym GROUP BY 1),
        nlow AS (SELECT v, sym.w FROM sym JOIN deg ON sym.w = deg.w
          WHERE deg_w <= 50),
        deglow AS (SELECT v, count(*) AS deg_low FROM nlow GROUP BY 1),
        cand AS (SELECT x.v AS a, y.v AS c, count(*) AS common
          FROM nlow x JOIN nlow y ON x.w = y.w AND x.v < y.v
          GROUP BY 1, 2),
        nd AS (SELECT a, c, common FROM cand
          WHERE NOT EXISTS (SELECT 1 FROM und
            WHERE p1 = cand.a AND p2 = cand.c))
      SELECT a, c, common,
        1000 * common // (da.deg_low + dc.deg_low - common) AS jaccard_milli
      FROM nd JOIN deglow da ON da.v = nd.a JOIN deglow dc ON dc.v = nd.c
      ORDER BY common DESC, jaccard_milli DESC, a ASC, c ASC LIMIT 100"""))

  /** RFM segmentation: per-customer recency (days since last order,
    * vs the corpus max date), frequency (order count) and monetary
    * (exact decimal revenue), each scored 1-4 against its own exact
    * quartile thresholds from the frequency-table percentile kernel
    * (no global sort anywhere — the raw table only meets hash
    * aggregates; quartiles come from [[Percentiles.quantilesDisc]]
    * over the per-customer table). Output is the segment histogram.
    * Recency scores are reversed (recent = better).
    */
  val a_rfm_segments = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
      val maxD = o.agg(max(to_date(col("o_orderdate"))).as("max_d"))
      val rfm = o.crossJoin(broadcast(maxD))
        .groupBy(col("o_custkey"))
        .agg(
          min(datediff(col("max_d"), to_date(col("o_orderdate")))).as("r"),
          count(lit(1)).as("f"),
          sum(col("o_totalprice").cast("decimal(27,8)")).as("m"))
      // ONE percentile-kernel pass for all three metrics: melt to
      // (metric, value) in a shared exact decimal type, then pivot the
      // nine thresholds into a single 1-row broadcast frame
      val melted = rfm.select(explode(array(
          struct(lit("r").as("metric"), col("r").cast("decimal(27,8)").as("v")),
          struct(lit("f").as("metric"), col("f").cast("decimal(27,8)").as("v")),
          struct(lit("m").as("metric"), col("m").cast("decimal(27,8)").as("v"))))
          .as("mv"))
        .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
      val qd = Percentiles.quantilesDisc(
        melted, col("metric"), col("v"), Seq(2500, 5000, 7500))
      val thCols =
        for (m <- Seq("r", "f", "m"); (p, i) <- Seq(2500, 5000, 7500).zipWithIndex)
          yield max(when(col("g") === m && col("pct_bp") === p, col("value")))
            .as(s"${m}_q${i + 1}")
      val th = qd.agg(thCols.head, thCols.tail: _*)
      def score(c: org.apache.spark.sql.Column, q: String) =
        (lit(1) + (c > col(s"${q}_q1")).cast("int")
          + (c > col(s"${q}_q2")).cast("int")
          + (c > col(s"${q}_q3")).cast("int"))
      rfm.crossJoin(broadcast(th))
        .select(
          (lit(5) - score(col("r"), "r")).as("r_score"),
          score(col("f"), "f").as("f_score"),
          score(col("m"), "m").as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"))
    },
    Some("""WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
        rfm AS (SELECT o_custkey,
            min(date_diff('day', CAST(o_orderdate AS DATE), max_d)) AS r,
            count(*) AS f,
            sum(CAST(o_totalprice AS DECIMAL(27,8))) AS m
          FROM orders CROSS JOIN mx GROUP BY 1),
        rq AS (SELECT
            min(v) FILTER (WHERE cum >= (2500 * tot + 9999) // 10000) AS q1,
            min(v) FILTER (WHERE cum >= (5000 * tot + 9999) // 10000) AS q2,
            min(v) FILTER (WHERE cum >= (7500 * tot + 9999) // 10000) AS q3
          FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
              sum(c) OVER () AS tot
            FROM (SELECT r AS v, count(*) AS c FROM rfm GROUP BY 1))),
        fq AS (SELECT
            min(v) FILTER (WHERE cum >= (2500 * tot + 9999) // 10000) AS q1,
            min(v) FILTER (WHERE cum >= (5000 * tot + 9999) // 10000) AS q2,
            min(v) FILTER (WHERE cum >= (7500 * tot + 9999) // 10000) AS q3
          FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
              sum(c) OVER () AS tot
            FROM (SELECT f AS v, count(*) AS c FROM rfm GROUP BY 1))),
        mq AS (SELECT
            min(v) FILTER (WHERE cum >= (2500 * tot + 9999) // 10000) AS q1,
            min(v) FILTER (WHERE cum >= (5000 * tot + 9999) // 10000) AS q2,
            min(v) FILTER (WHERE cum >= (7500 * tot + 9999) // 10000) AS q3
          FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
              sum(c) OVER () AS tot
            FROM (SELECT m AS v, count(*) AS c FROM rfm GROUP BY 1)))
      SELECT
        5 - (1 + CAST(r > rq.q1 AS INT) + CAST(r > rq.q2 AS INT)
          + CAST(r > rq.q3 AS INT)) AS r_score,
        1 + CAST(f > fq.q1 AS INT) + CAST(f > fq.q2 AS INT)
          + CAST(f > fq.q3 AS INT) AS f_score,
        1 + CAST(m > mq.q1 AS INT) + CAST(m > mq.q2 AS INT)
          + CAST(m > mq.q3 AS INT) AS m_score,
        count(*) AS n_customers
      FROM rfm CROSS JOIN rq CROSS JOIN fq CROSS JOIN mq
      GROUP BY 1, 2, 3"""))

  /** Event-type Markov transition matrix: consecutive event pairs per
    * user (one per-user window, one shuffle) counted into the
    * |types|^2 matrix, with milli-probabilities normalized per source
    * state over that constant-size matrix. The behavioral-model prior
    * every session-analysis pipeline starts from.
    */
  val w_transition_matrix = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val pairs = T_(s, dir, "events")
        .select(col("user_id"), col("event_type").as("from_et"),
          lead(col("event_type"), 1).over(w).as("to_et"))
        .filter(col("to_et").isNotNull)
      val m = pairs.groupBy(col("from_et"), col("to_et"))
        .agg(count(lit(1)).as("n"))
      val wTot = Window.partitionBy(col("from_et"))
      m.withColumn("p_milli", expr("1000L * n") / sum(col("n")).over(wTot))
        .select(col("from_et"), col("to_et"), col("n"),
          floor(col("p_milli")).cast("long").as("p_milli"))
    },
    Some("""WITH p AS (SELECT event_type AS from_et,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC) AS to_et
          FROM events),
        m AS (SELECT from_et, to_et, count(*) AS n FROM p
          WHERE to_et IS NOT NULL GROUP BY 1, 2)
      SELECT from_et, to_et, n,
        CAST(floor(1000.0 * n / sum(n) OVER (PARTITION BY from_et)) AS BIGINT)
          AS p_milli
      FROM m"""))

  val all: Map[String, Q] = Map(
    "w_cohort_retention" -> w_cohort_retention,
    "a_assoc_rules" -> a_assoc_rules,
    "g_link_predict" -> g_link_predict,
    "a_rfm_segments" -> a_rfm_segments,
    "w_transition_matrix" -> w_transition_matrix,
  )
}
