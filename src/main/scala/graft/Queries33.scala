package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{DataQuality, GraphOps}
import Queries.Q

/** Batch 33 (round 7): deterministic random-walk corpus generation,
  * Welch-t drift on a continuous column, pairwise centroid
  * similarity over compressed aggregates, and the streaming twin of
  * the chi-square category monitor.
  */
object Queries33 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** 3-step deterministic walks ([[GraphOps.deterministicWalks]])
    * over the UNDIRECTED order↔part purchase bipartite graph — the
    * DeepWalk sampling pass with hash-replayable choices. Walks
    * start at every 500th order and alternate order→part→order→part
    * by construction of the union adjacency. The oracle unrolls the
    * three hash-picked hops over the same dst-indexed adjacency.
    */
  val g_random_walk = Q(
    (s, dir) => {
      val op = T_(s, dir, "lineitem")
        .select((col("l_orderkey") + 10000000L).as("src"),
          (col("l_partkey") + 20000000L).as("dst"))
        .distinct()
      val edges = op.unionByName(
        op.select(col("dst").as("src"), col("src").as("dst")))
      val sources = T_(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("id"))
      GraphOps.deterministicWalks(edges, sources, steps = 3)
        .orderBy(col("start"))
    },
    Some {
      def hop(i: Int, prev: String) =
        s"""h$i AS (SELECT h.*, a.dst AS n$i
          FROM h${i - 1} h LEFT JOIN adj a ON h.$prev = a.src
            AND a.idx = (($prev * 1000003 + $i) % 94906249)
              * 1103515245 % 2147483647 % a.deg)"""
      s"""WITH op AS (SELECT DISTINCT 10000000 + l_orderkey AS src,
            20000000 + l_partkey AS dst FROM lineitem),
        e AS (SELECT src, dst FROM op UNION ALL SELECT dst, src FROM op),
        adj AS (SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY dst ASC) - 1
              AS idx,
            count(*) OVER (PARTITION BY src) AS deg
          FROM e),
        h0 AS (SELECT 10000000 + o_orderkey AS start,
            10000000 + o_orderkey AS n0
          FROM orders WHERE o_orderkey % 500 = 0),
        ${hop(1, "n0")},
        ${hop(2, "n1")},
        ${hop(3, "n2")}
      SELECT start, n1, n2, n3 FROM h3 ORDER BY start"""
    })

  private val milliSql = "CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT)"

  /** Welch-t drift on the continuous `value` column between the
    * day-parity slices, per event type — the companion to
    * dq_chi2_drift for numeric distributions. Values are
    * milli-quantized; the t² statistic comes out as the EXACT
    * RATIONAL pair
    *   t2_num = (s₁n₂ − s₂n₁)²·(n₁−1)(n₂−1)
    *   t2_den = (n₁q₁ − s₁²)·n₂²(n₂−1) + (n₂q₂ − s₂²)·n₁²(n₁−1)
    * (sample-variance Welch, all decimal(38,0); exact through sf0.1
    * with ~10³⁶ headroom — the sf1+ widening is the same deci-scale
    * drop SCALE.md prescribes for the moment sums). One scan, one
    * grouped aggregate with conditional sums, no join.
    */
  val dq_ttest_value = Q(
    (s, dir) => {
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      T_(s, dir, "events")
        .withColumn("x",
          col("value").cast("decimal(27,3)").*(lit(1000)).cast("long"))
        .withColumn("cur", dayofmonth(col("ts")) % 2 === 1)
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("cur"), 0L).otherwise(1L)).as("n_ref"),
          sum(when(col("cur"), 1L).otherwise(0L)).as("n_cur"),
          sum(when(col("cur"), 0L).otherwise(d(col("x")))).as("s1"),
          sum(when(col("cur"), d(col("x"))).otherwise(0L)).as("s2"),
          sum(when(col("cur"), 0L).otherwise(d(col("x")) * col("x")))
            .as("q1"),
          sum(when(col("cur"), d(col("x")) * col("x")).otherwise(0L))
            .as("q2"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          // rational pair as canonical integer strings (hash-portable)
          ((col("s1") * col("n_cur") - col("s2") * col("n_ref"))
            * (col("s1") * col("n_cur") - col("s2") * col("n_ref"))
            * (col("n_ref") - 1) * (col("n_cur") - 1))
            .cast("decimal(38,0)").cast("string").as("t2_num"),
          ((col("n_ref") * col("q1") - col("s1") * col("s1"))
            * col("n_cur") * col("n_cur") * (col("n_cur") - 1)
            + (col("n_cur") * col("q2") - col("s2") * col("s2"))
            * col("n_ref") * col("n_ref") * (col("n_ref") - 1))
            .cast("decimal(38,0)").cast("string").as("t2_den"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH b AS (SELECT event_type, $milliSql AS x,
            day(ts) % 2 = 1 AS cur FROM events),
        g AS (SELECT event_type,
            CAST(SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
            CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
            SUM(CASE WHEN cur THEN 0 ELSE CAST(x AS HUGEINT) END) AS s1,
            SUM(CASE WHEN cur THEN CAST(x AS HUGEINT) ELSE 0 END) AS s2,
            SUM(CASE WHEN cur THEN 0
              ELSE CAST(x AS HUGEINT) * x END) AS q1,
            SUM(CASE WHEN cur THEN CAST(x AS HUGEINT) * x
              ELSE 0 END) AS q2
          FROM b GROUP BY 1)
      SELECT event_type, n_ref, n_cur,
        CAST(CAST((s1 * n_cur - s2 * n_ref) * (s1 * n_cur - s2 * n_ref)
          * (n_ref - 1) * (n_cur - 1) AS DECIMAL(38,0)) AS VARCHAR)
          AS t2_num,
        CAST(CAST((n_ref * q1 - s1 * s1) * n_cur * n_cur * (n_cur - 1)
          + (n_cur * q2 - s2 * s2) * n_ref * n_ref * (n_ref - 1)
          AS DECIMAL(38,0)) AS VARCHAR) AS t2_den
      FROM g ORDER BY event_type"""))

  private val vqSql =
    "CAST(CAST(CAST(embedding[i.i + 1] AS DOUBLE) AS DECIMAL(27,6))" +
      " * 1000000 AS BIGINT)"

  /** Pairwise label-centroid similarity over COMPRESSED aggregates:
    * the per-(label, dim) micro-quantized component sums (the
    * vec_dim_stats pass, keyed by label) self-join on the dimension
    * only — label-pair dot products of centroid SUMS, 64·L² work on
    * L·64 rows, never touching the raw vectors twice. Emits the
    * exact integer dot numerator (centroid dot = dot_num /
    * (n_a·n_b·10¹²)) — the class-confusability / semantic-overlap
    * matrix, rational-exact.
    */
  val vec_centroid_dots = Q(
    (s, dir) => {
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val x = T_(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("vq",
          col("v").cast("double").cast("decimal(27,6)").*(lit(1000000))
            .cast("long"))
      val c = x.groupBy(col("label"), col("pos"))
        .agg(sum(d(col("vq"))).as("s"))
      val n = T_(s, dir, "embeddings").groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
      val pairs = c.as("a").join(c.as("b"),
          col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(sum(col("a.s") * col("b.s")).cast("decimal(38,0)")
          .cast("string").as("dot_num"))
      pairs
        .join(n.select(col("label").as("label_a"), col("n").as("n_a")),
          "label_a")
        .join(n.select(col("label").as("label_b"), col("n").as("n_b")),
          "label_b")
        .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
          col("dot_num"))
        .orderBy(col("label_a"), col("label_b"))
    },
    Some(s"""WITH x AS (SELECT label, CAST(i.i AS INTEGER) AS pos,
            $vqSql AS vq
          FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
          WHERE i.i < len(embedding)),
        c AS (SELECT label, pos, SUM(CAST(vq AS HUGEINT)) AS s
          FROM x GROUP BY 1, 2),
        n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        p AS (SELECT a.label AS label_a, b.label AS label_b,
            SUM(a.s * b.s) AS dot
          FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
          GROUP BY 1, 2)
      SELECT label_a, label_b, na.n AS n_a, nb.n AS n_b,
        CAST(CAST(dot AS DECIMAL(38,0)) AS VARCHAR) AS dot_num
      FROM p JOIN n na ON label_a = na.label
        JOIN n nb ON label_b = nb.label
      ORDER BY label_a, label_b"""))

  /** The chi-square category monitor as a STREAM
    * ([[graft.streaming.StreamingDrift]]): counts maintained by an
    * incremental streaming aggregate, the rational tail shared with
    * the batch operator — same oracle as dq_chi2_drift.
    */
  val stream_drift = Q(
    (s, dir) => graft.streaming.StreamingDrift.chi2Once(
        s, s"$dir/events.parquet",
        col("event_type"), dayofmonth(col("ts")) % 2 === 1)
      .orderBy(col("category")),
    Queries31.dq_chi2_drift.oracle,
    bench = false)

  val all: Map[String, Q] = Map(
    "g_random_walk" -> g_random_walk,
    "dq_ttest_value" -> dq_ttest_value,
    "vec_centroid_dots" -> vec_centroid_dots,
    "stream_drift" -> stream_drift,
  )
}
