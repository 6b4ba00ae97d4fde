package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.GraphOps
import Queries.Q

/** Batch 13: dense-kernel graph extraction (k-core peeling) and
  * stream-static dimension enrichment. Both replay bit-for-bit in the
  * DuckDB oracle.
  */
object Queries13 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val coreK = 4
  private val coreIters = 6

  /** The 4-core of the part co-purchase graph: iterative peeling down
    * to the maximal min-degree-≥4 subgraph — the dense kernel where
    * `g_triangles` measures density and this extracts it. Six peels
    * (spec proves a seventh changes nothing at test scale); the oracle
    * replays the unrolled peel with materialized CTEs. Emits the
    * kernel's size and its minimum degree (≥ k iff converged).
    */
  val g_kcore = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
      val pairs = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.pk") < col("l2.pk"))
        .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
      GraphOps.kCore(pairs, coreK, coreIters)
        .agg(count(lit(1)).as("n_vertices"),
          expr("sum(degree) div 2").as("n_edges"),
          min(col("degree")).as("min_degree"))
    },
    Some {
      val cte = new StringBuilder(
        s"""li AS MATERIALIZED (SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS pk
          FROM lineitem WHERE l_quantity >= 25),
        e0 AS MATERIALIZED (SELECT DISTINCT least(l1.pk, l2.pk) AS a,
            greatest(l1.pk, l2.pk) AS b
          FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
          WHERE l1.pk < l2.pk)""")
      for (i <- 1 to coreIters) cte.append(
        s""",
        d$i AS MATERIALIZED (SELECT id, count(*) AS d FROM
          (SELECT a AS id FROM e${i - 1} UNION ALL SELECT b AS id FROM e${i - 1})
          GROUP BY id),
        e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
          JOIN d$i da ON e.a = da.id JOIN d$i db ON e.b = db.id
          WHERE da.d >= $coreK AND db.d >= $coreK)""")
      s"""WITH $cte,
      fin AS (SELECT id, count(*) AS degree FROM
        (SELECT a AS id FROM e$coreIters UNION ALL SELECT b AS id FROM e$coreIters)
        GROUP BY id)
      SELECT count(*) AS n_vertices,
        CAST(SUM(degree) AS BIGINT) // 2 AS n_edges,
        min(degree) AS min_degree FROM fin"""
    })

  /** Stream-static enrichment: the event stream joined to the
    * broadcast customer dim and rolled up per market segment — the
    * streaming twin of the J1/J7 batch joins, checked against the
    * batch oracle (see [[graft.streaming.StreamingEnrich]]).
    */
  val stream_enrich = Q(
    (s, dir) => graft.streaming.StreamingEnrich.enrichOnce(
      s, s"$dir/events.parquet",
      T_(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))),
    Some("""SELECT c_mktsegment, count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events JOIN customer ON user_id = c_custkey GROUP BY 1"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "g_kcore" -> g_kcore,
    "stream_enrich" -> stream_enrich,
  )
}
