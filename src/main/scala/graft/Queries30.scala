package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{GraphOps, Sampling}
import Queries.Q

/** Batch 30 (round 7): temperature-scaled mixture sampling (the
  * multilingual-pretraining rebalance) and the rel-typed k-hop
  * pattern (Cypher's `-[:A|B*1..k]->`).
  */
object Queries30 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val hashSql = "(doc_id % 94906249) * 1103515245 % 2147483647"

  /** Temperature mixture at α = 1/2
    * ([[Sampling.temperatureRatesSqrt]]): per-language keep rates
    * √(n_min/n_s) APPLIED through the deterministic basis-point gate,
    * emitting the per-stratum audit row (observed count, gate, kept
    * count). The whole pipeline is one keyed count + broadcast min +
    * one codegen'd filter + one keyed count — no shuffle touches the
    * document rows beyond the two counts, and every number replays
    * exactly (√ is IEEE correctly-rounded; the gate is integral).
    */
  val samp_temperature = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
      val rates = Sampling.temperatureRatesSqrt(docs, col("lang"))
      docs.join(broadcast(rates), docs("lang") === rates("stratum"))
        .filter(Sampling.detHash(col("doc_id")) % 10000L < col("keep_bp"))
        .groupBy(col("stratum"), col("n_rows"), col("keep_bp"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("stratum"))
    },
    Some(s"""WITH c AS (SELECT lang AS stratum, count(*) AS n_rows
          FROM documents GROUP BY 1),
        m AS (SELECT min(n_rows) AS mn FROM c),
        r AS (SELECT stratum, n_rows,
            CAST(floor(sqrt(CAST(mn AS DOUBLE) / n_rows) * 10000) AS INTEGER)
              AS keep_bp
          FROM c, m)
      SELECT stratum, n_rows, keep_bp, count(*) AS n_kept
      FROM documents d JOIN r ON d.lang = r.stratum
      WHERE $hashSql % 10000 < keep_bp
      GROUP BY 1, 2, 3 ORDER BY stratum"""))

  /** Rel-TYPED variable-length pattern — Cypher's
    * `(o)-[:PLACED_BY|IN_NATION*1..2]->(v)`: the typed edge list is
    * filtered to the allowed rel set BEFORE [[GraphOps.kHopPaths]]
    * expands, so the frontier never touches excluded edge types (the
    * filter prunes at the scan). Two hops stop at nations; the
    * IN_REGION tail is excluded by type, not by depth.
    */
  val g_khop_typed = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"),
          (col("o_custkey") + 10000L).as("dst"), lit("PLACED_BY").as("rel"))
      val c = T_(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"),
          (col("c_nationkey").cast("long") + 100L).as("dst"),
          lit("IN_NATION").as("rel"))
      val n = T_(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"),
          col("n_regionkey").cast("long").as("dst"), lit("IN_REGION").as("rel"))
      val typed = o.unionByName(c).unionByName(n)
        .filter(col("rel").isin("PLACED_BY", "IN_NATION"))
        .select(col("src"), col("dst"))
      val sources = T_(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("id"))
      GraphOps.kHopPaths(typed, sources, maxHops = 2)
    },
    Some("""WITH edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst,
          'PLACED_BY' AS rel FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey, 'IN_NATION'
          FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT),
          CAST(n_regionkey AS BIGINT), 'IN_REGION' FROM nation),
      typed AS (SELECT src, dst FROM edges
        WHERE rel IN ('PLACED_BY', 'IN_NATION')),
      src AS (SELECT 10000000 + o_orderkey AS id FROM orders
        WHERE o_orderkey % 500 = 0),
      h0 AS (SELECT id AS start, id AS "end", [id] AS path FROM src),
      h1 AS (SELECT h0.start, e.dst AS "end", list_append(h0.path, e.dst) AS path
        FROM h0 JOIN typed e ON h0."end" = e.src
        WHERE NOT list_contains(h0.path, e.dst)),
      h2 AS (SELECT h1.start, e.dst AS "end", list_append(h1.path, e.dst) AS path
        FROM h1 JOIN typed e ON h1."end" = e.src
        WHERE NOT list_contains(h1.path, e.dst))
      SELECT start, "end", CAST(1 AS INTEGER) AS hops, path FROM h1
      UNION ALL SELECT start, "end", CAST(2 AS INTEGER), path FROM h2"""))

  val all: Map[String, Q] = Map(
    "samp_temperature" -> samp_temperature,
    "g_khop_typed" -> g_khop_typed,
  )
}
