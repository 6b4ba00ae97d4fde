package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, GraphOps, Sampling, TimeSeries}
import Queries.Q

/** Batch 20: integer-exact EWMA smoothing, day-of-week seasonality,
  * weighted shortest paths, directed n-gram containment, and
  * weighted priority sampling.
  *
  * Capability provenance: the reference's per-station daily series
  * (main_graph_topraq.py:79-80; graph_weather_day.py:69-117) motivate
  * the smoothing/seasonality pair; the dedup/sampling entries extend
  * the training-data curation family. All scores and rates are
  * integer-quantized so the DuckDB oracle replays them bit-for-bit.
  */
object Queries20 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val ewmaDepth = 8
  private val ewmaWts = (0 until ewmaDepth).map(i => 1L << (ewmaDepth - 1 - i))

  /** Lag-truncated EWMA over each user's event values: power-of-two
    * weights on the last 8 observations, milli-integer arithmetic,
    * ONE per-user window (single shuffle). The recursive EWMA can't
    * be windowed or replayed; the depth-8 truncation differs from it
    * by ≤ 2^-8 of mass while staying a fixed linear form.
    */
  val ts_ewma = Q(
    (s, dir) => TimeSeries.ewmaLag(
        T_(s, dir, "events").withColumn("us", unix_micros(col("ts"))),
        col("user_id"), col("value"),
        Seq(col("us"), col("event_id")), depth = ewmaDepth)
      .select(col("user_id"), col("event_id"), col("ewma_milli")),
    Some {
      val numTerms = (0 until ewmaDepth).map { i =>
        val x = if (i == 0) "x" else s"lag(x, $i) OVER win"
        s"coalesce($x * ${ewmaWts(i)}, 0)"
      }.mkString(" + ")
      val denTerms = (0 until ewmaDepth).map { i =>
        val x = if (i == 0) "x" else s"lag(x, $i) OVER win"
        s"CASE WHEN $x IS NULL THEN 0 ELSE ${ewmaWts(i)} END"
      }.mkString(" + ")
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS x FROM events),
        t AS (SELECT user_id, event_id,
            $numTerms AS num,
            $denTerms AS den
          FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id, event_id, num // den AS ewma_milli FROM t"""
    })

  /** Day-of-week seasonal index per event type: mean(dow) / mean(all)
    * in exact integer milli over milli-scaled values — the
    * multiplicative seasonality profile a forecast pipeline divides
    * out. Two hash aggregates (per-(type,dow), per-type) and a
    * broadcast-sized join of the 5x7 matrix; raw events meet nothing
    * else. The sums and the 1000·s·n_tot product run in decimal(38,0)
    * on the Spark side / HUGEINT in the oracle so no scale can wrap
    * them (round-6 advice); the integral quotient itself is small and
    * ships as BIGINT on both sides.
    */
  val ts_seasonality = Q(
    (s, dir) => {
      val e = T_(s, dir, "events").select(col("event_type"),
        expr("weekday(ts)").as("dow"),
        col("value").cast("decimal(27,3)").*(lit(1000)).cast("long").as("x"))
      val byDow = e.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("x").cast("decimal(38,0)")).as("s"))
      val byType = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_tot"),
          sum(col("x").cast("decimal(38,0)")).as("s_tot"))
      byDow.join(byType, "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          // IntegralDivide over decimal operands emits BIGINT
          expr("1000 * s * n_tot div (n * s_tot)").as("idx_milli"))
    },
    Some("""WITH e AS (SELECT event_type, CAST(isodow(ts) - 1 AS INTEGER) AS dow,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS x FROM events),
        d AS (SELECT event_type, dow, count(*) AS n,
            sum(CAST(x AS HUGEINT)) AS s
          FROM e GROUP BY 1, 2),
        t AS (SELECT event_type, count(*) AS n_tot,
            sum(CAST(x AS HUGEINT)) AS s_tot
          FROM e GROUP BY 1)
      SELECT event_type, dow, n,
        CAST((1000 * s * n_tot) // (n * s_tot) AS BIGINT) AS idx_milli
      FROM d JOIN t USING (event_type)"""))

  private val copurchaseSql =
    """b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'),
      pc AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS cnt
        FROM b a JOIN b b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      sym AS (SELECT p1 AS src, p2 AS dst, 1000 // cnt AS w FROM pc
        UNION ALL SELECT p2, p1, 1000 // cnt FROM pc),
      verts AS (SELECT src AS id FROM sym UNION SELECT dst FROM sym),
      seed AS (SELECT min(id) AS id FROM verts),
      hop AS (SELECT src, dst, w FROM sym
        UNION ALL SELECT id, id, 0 FROM verts)"""

  /** Weighted shortest paths on the urgent co-purchase graph:
    * affinity-derived weights (strong ties are short — w = 1000 div
    * co-count), Bellman-Ford from the lowest part id, 4 relaxation
    * rounds, each ONE shuffle. Exact BIGINT distances; the oracle
    * unrolls the same 4 rounds.
    */
  val g_weighted_sssp = Q(
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
      val seed = sym.select(col("src").as("id"))
        .union(sym.select(col("dst").as("id")))
        .agg(min(col("id")).as("id"))
      GraphOps.weightedSssp(sym, seed, iterations = 4)
    },
    Some(s"""WITH $copurchaseSql,
        d0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM seed),
        d1 AS (SELECT dst AS id, min(dist + w) AS dist
          FROM hop JOIN d0 ON hop.src = d0.id GROUP BY 1),
        d2 AS (SELECT dst AS id, min(dist + w) AS dist
          FROM hop JOIN d1 ON hop.src = d1.id GROUP BY 1),
        d3 AS (SELECT dst AS id, min(dist + w) AS dist
          FROM hop JOIN d2 ON hop.src = d2.id GROUP BY 1),
        d4 AS (SELECT dst AS id, min(dist + w) AS dist
          FROM hop JOIN d3 ON hop.src = d3.id GROUP BY 1)
      SELECT verts.id, d4.dist FROM verts LEFT JOIN d4 ON verts.id = d4.id"""))

  /** Directed n-gram containment: short-document-inside-long-document
    * detection (scraped excerpts, quote farms) that symmetric Jaccard
    * dilutes away. Same inverted-index + df-prune scaffolding as
    * dd_ngram_jaccard; milli-integer scores.
    */
  val dd_containment = Q(
    (s, dir) => Dedup.ngramContainment(
        T_(s, dir, "documents"), "text", "doc_id",
        tokenize = t => split(graft.functions.TextFunctions.normText(t), " "),
        gramLen = 3, thresholdMilli = 300, maxDf = Some(10))
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct([
            concat_ws(' ', t[i], t[i+1], t[i+2]) FOR i IN range(1, len(t) - 1)]) AS g
        FROM (SELECT doc_id,
                string_split(regexp_replace(lower(trim(substr(text, 1, 10000))), '\s+', ' ', 'g'), ' ') AS t
              FROM documents)
        WHERE len(t) >= 3),
      inv0 AS (SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM sh),
      rare AS (SELECT gram FROM inv0 GROUP BY gram HAVING count(*) <= 10),
      inv AS (SELECT inv0.* FROM inv0 JOIN rare USING (gram)),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, count(*) AS inter
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id <> b.doc_id
        GROUP BY 1, 2, 3)
      SELECT id_a, id_b, 1000 * inter // n_a AS cont_milli
      FROM pairs WHERE 1000 * inter // n_a >= 300
      ORDER BY id_a, id_b"""))

  private val hash2Sql = {
    val h1 = "(doc_id % 94906249) * 1103515245 % 2147483647"
    s"(($h1) % 94906249) * 1103515245 % 2147483647"
  }

  /** Priority sampling (Duffield–Lund–Thorup): weight-proportional
    * without-replacement top-k via priority = w div u with a
    * deterministic integer pseudo-uniform — heavier documents enter
    * the sample with probability ∝ size, yet the draw replays
    * bit-for-bit in any engine (no RNG state, no partition-order
    * dependence). Plans as TakeOrderedAndProject: per-partition top-k
    * then a k-row merge, no global sort.
    */
  val samp_priority_weighted = Q(
    (s, dir) => T_(s, dir, "documents")
      .withColumn("__h", Sampling.detHash2(col("doc_id")))
      .withColumn("priority", expr("n_chars * 2147483648L div (__h + 1)"))
      .select(col("doc_id"), col("n_chars"), col("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(200),
    Some(s"""SELECT doc_id, n_chars,
        n_chars * 2147483648 // (($hash2Sql) + 1) AS priority
      FROM documents ORDER BY priority DESC, doc_id ASC LIMIT 200"""))

  val all: Map[String, Q] = Map(
    "ts_ewma" -> ts_ewma,
    "ts_seasonality" -> ts_seasonality,
    "g_weighted_sssp" -> g_weighted_sssp,
    "dd_containment" -> dd_containment,
    "samp_priority_weighted" -> samp_priority_weighted,
  )
}
