package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{GraphOps, Sampling}
import Queries.Q

/** Batch 26: edge-weighted PageRank and class-balanced deterministic
  * downsampling.
  */
object Queries26 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val wprIters = 2

  /** The pageRank-style quantization macro, as DuckDB SQL. */
  private def qsumSql(e: String) =
    s"""CAST(CAST(round(SUM(CAST($e AS DECIMAL(27,15))) * 1000000000, 0) AS BIGINT) AS DOUBLE)
        / CAST(1000000000.0 AS DOUBLE)"""

  /** Edge-weighted PageRank on the urgent co-purchase graph: rank
    * flows proportionally to co-purchase AFFINITY (w = pair count)
    * instead of splitting evenly — hub parts with one strong partner
    * route their mass there. Same one-shuffle-per-iteration loop and
    * decimal grid as `g_pagerank`; the oracle unrolls both
    * iterations with the identical quantization macro.
    */
  val g_pagerank_weighted = Q(
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
          col("cnt").as("w"))
        .unionByName(pc.select(col("p2").as("src"), col("p1").as("dst"),
          col("cnt").as("w")))
      GraphOps.pageRankWeighted(sym, wprIters)
    },
    Some {
      val iters = (1 to wprIters).map { t =>
        val prev = s"r${t - 1}"
        s"""r$t AS (SELECT v.id,
             CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0.0 AS DOUBLE)) AS rank
           FROM verts v LEFT JOIN (
             SELECT ew.dst AS id, ${qsumSql("r.rank * ew.frac")} AS inflow
             FROM ew JOIN $prev r ON r.id = ew.src GROUP BY ew.dst) s
           ON v.id = s.id)"""
      }.mkString(",\n      ")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'),
        pc AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS cnt
          FROM b a JOIN b b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        sym AS (SELECT p1 AS src, p2 AS dst, cnt AS w FROM pc
          UNION ALL SELECT p2, p1, cnt FROM pc),
        verts AS (SELECT src AS id FROM sym UNION SELECT dst FROM sym),
        ws AS (SELECT src, sum(w) AS wsum FROM sym GROUP BY 1),
        ew AS (SELECT sym.src, sym.dst,
            CAST(sym.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE) AS frac
          FROM sym JOIN ws ON sym.src = ws.src),
        r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts),
        $iters
      SELECT id, rank FROM r$wprIters"""
    })

  private val hash2VecSql = {
    val h1 = "(vec_id % 94906249) * 1103515245 % 2147483647"
    s"(($h1) % 94906249) * 1103515245 % 2147483647"
  }

  /** Class-balanced downsampling: every label kept at (approximately)
    * the minority class's size via a per-label basis-point gate on
    * the deterministic id hash — fully relational (the rate table is
    * a broadcast join, no driver collect), one scan of the vectors,
    * replayable draw. Emits the per-label audit row (total, rate,
    * kept).
    */
  val samp_class_balanced = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val counts = emb.groupBy(col("label")).agg(count(lit(1)).as("n_total"))
      val minc = counts.agg(min(col("n_total")).as("min_n"))
      val rates = counts.crossJoin(broadcast(minc))
        .select(col("label"), col("n_total"),
          expr("10000L * min_n div n_total").as("rate_bp"))
      emb.select(col("vec_id"), col("label"),
          (Sampling.detHash2(col("vec_id")) % 10000L).as("gate"))
        .join(broadcast(rates), "label")
        .filter(col("gate") < col("rate_bp"))
        .groupBy(col("label"), col("n_total"), col("rate_bp"))
        .agg(count(lit(1)).as("n_kept"))
    },
    Some(s"""WITH c AS (SELECT label, count(*) AS n_total FROM embeddings GROUP BY 1),
        m AS (SELECT min(n_total) AS min_n FROM c),
        r AS (SELECT label, n_total, 10000 * min_n // n_total AS rate_bp
          FROM c CROSS JOIN m),
        k AS (SELECT e.label, ($hash2VecSql) % 10000 AS gate
          FROM embeddings e)
      SELECT r.label, r.n_total, r.rate_bp, count(*) AS n_kept
      FROM k JOIN r ON k.label = r.label
      WHERE k.gate < r.rate_bp
      GROUP BY 1, 2, 3"""))

  val all: Map[String, Q] = Map(
    "g_pagerank_weighted" -> g_pagerank_weighted,
    "samp_class_balanced" -> samp_class_balanced,
  )
}
