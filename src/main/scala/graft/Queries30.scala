package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.domain.GraphAssembly
import graft.operators.{GraphExport, GraphOps, Sampling}
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
      // scalar '->' path string: hash/sort-portable where a
      // list-typed column is not
      GraphOps.kHopPaths(typed, sources, maxHops = 2)
        .withColumn("path",
          array_join(expr("CAST(path AS ARRAY<STRING>)"), "->"))
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
      SELECT start, "end", CAST(1 AS INTEGER) AS hops,
        array_to_string(path, '->') AS path FROM h1
      UNION ALL SELECT start, "end", CAST(2 AS INTEGER),
        array_to_string(path, '->') FROM h2"""))

  /** Incremental graph refresh ([[GraphExport.exportVerticesDelta]]):
    * export the 4-label graph, then refresh ONLY the Nation label
    * with re-projected vertices carrying an `upd` marker prop —
    * dynamic partition overwrite rewrites the one touched label
    * directory and leaves every other label's files alone (the
    * byte-identity of untouched files is spec-proven; this query
    * proves the CONTENT contract on the read-back: untouched labels
    * match the original projection exactly, the refreshed label
    * carries the new props).
    */
  val g_export_incremental = Q(
    (s, dir) => {
      def V(t: String, label: String, keys: Seq[String], cols: Seq[String]) =
        GraphAssembly.vertices(T_(s, dir, t).select(cols.map(col): _*),
          label, keys)
      val verts =
        V("orders", "Order", Seq("o_orderkey"), Seq("o_orderkey", "o_orderpriority"))
        .unionByName(V("customer", "Customer", Seq("c_custkey"),
          Seq("c_custkey", "c_mktsegment")))
        .unionByName(V("nation", "Nation", Seq("n_nationkey"),
          Seq("n_nationkey", "n_name")))
        .unionByName(V("region", "Region", Seq("r_regionkey"),
          Seq("r_regionkey", "r_name")))
      val root = java.nio.file.Files
        .createTempDirectory("graft_graph_delta").toString
      GraphExport.exportVertices(s, verts, root)
      val delta = GraphAssembly.vertices(
        T_(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
          .withColumn("upd", lit(1)),
        "Nation", Seq("n_nationkey"))
      val back = GraphExport.exportVerticesDelta(s, delta, root)
        .select("id", "label", "props")
      val untouched = verts.filter(col("label") =!= "Nation")
      val backUntouched = back.filter(col("label") =!= "Nation")
      val diff = untouched.exceptAll(backUntouched).count() +
        backUntouched.exceptAll(untouched).count()
      val updated = back.filter(col("label") === "Nation" &&
        col("props").contains("\"upd\":1")).count()
      back.groupBy(col("label").as("name")).agg(count(lit(1)).as("n"))
        .select(lit("vertex").as("kind"), col("name"), col("n"))
        .unionByName(s.range(1).select(lit("check").as("kind"),
          lit("untouched_diff").as("name"), lit(diff).as("n")))
        .unionByName(s.range(1).select(lit("check").as("kind"),
          lit("nation_updated").as("name"), lit(updated).as("n")))
        .orderBy(col("kind"), col("name"))
    },
    Some("""SELECT kind, name, n FROM (
        SELECT 'vertex' AS kind, 'Order' AS name, count(*) AS n FROM orders
        UNION ALL SELECT 'vertex', 'Customer', count(*) FROM customer
        UNION ALL SELECT 'vertex', 'Nation', count(*) FROM nation
        UNION ALL SELECT 'vertex', 'Region', count(*) FROM region
        UNION ALL SELECT 'check', 'untouched_diff', 0
        UNION ALL SELECT 'check', 'nation_updated', count(*) FROM nation)
      ORDER BY kind, name"""))

  /** K-cheapest bounded paths ([[GraphOps.kCheapestPaths]]): the 2
    * cheapest ≤2-hop simple paths per (start, end) pair over a
    * DIAMOND graph — customer→order (per-order weight) →part (via
    * distinct lineitems), so the same (customer, part) pair is
    * reached through DIFFERENT orders at different costs and the
    * per-pair top-k genuinely selects. The (cost, path) total order
    * makes the selection replay exactly — integer arrays compare
    * lexicographically in both engines. Oracle = two unrolled
    * weighted hops + QUALIFY row_number per pair.
    */
  val g_kpaths_cheapest = Q(
    (s, dir) => {
      val co = T_(s, dir, "orders")
        .select((col("o_custkey") + 10000L).as("src"),
          (col("o_orderkey") + 10000000L).as("dst"))
      val op = T_(s, dir, "lineitem")
        .select((col("l_orderkey") + 10000000L).as("src"),
          (col("l_partkey") + 20000000L).as("dst"))
        .distinct()
      val edges = co.unionByName(op)
        .withColumn("w", col("dst") % 5 + 1)
      val sources = T_(s, dir, "customer")
        .filter(col("c_custkey") % 300 === 0)
        .select((col("c_custkey") + 10000L).as("id"))
      // rank selection happens INSIDE kCheapestPaths on the integer
      // array (exact lexicographic tiebreak); only the shipped column
      // is the '->' string — scalar, hash/sort-portable
      GraphOps.kCheapestPaths(edges, sources, maxHops = 2, k = 2)
        .withColumn("path",
          array_join(expr("CAST(path AS ARRAY<STRING>)"), "->"))
    },
    Some("""WITH edges0 AS (
        SELECT 10000 + o_custkey AS src, 10000000 + o_orderkey AS dst FROM orders
        UNION ALL SELECT DISTINCT 10000000 + l_orderkey, 20000000 + l_partkey
          FROM lineitem),
      edges AS (SELECT src, dst, dst % 5 + 1 AS w FROM edges0),
      src AS (SELECT 10000 + c_custkey AS id FROM customer
        WHERE c_custkey % 300 = 0),
      h0 AS (SELECT id AS start, id AS "end", [id] AS path,
        CAST(0 AS BIGINT) AS cost FROM src),
      h1 AS (SELECT h0.start, e.dst AS "end", list_append(h0.path, e.dst) AS path,
          h0.cost + e.w AS cost
        FROM h0 JOIN edges e ON h0."end" = e.src
        WHERE NOT list_contains(h0.path, e.dst)),
      h2 AS (SELECT h1.start, e.dst AS "end", list_append(h1.path, e.dst) AS path,
          h1.cost + e.w AS cost
        FROM h1 JOIN edges e ON h1."end" = e.src
        WHERE NOT list_contains(h1.path, e.dst)),
      lv AS (SELECT start, "end", CAST(1 AS INTEGER) AS hops, cost, path FROM h1
        UNION ALL SELECT start, "end", CAST(2 AS INTEGER), cost, path FROM h2)
      SELECT start, "end", hops, cost,
        array_to_string(path, '->') AS path, rank
      FROM (SELECT start, "end", hops, cost, path,
          CAST(row_number() OVER (PARTITION BY start, "end"
            ORDER BY cost ASC, path ASC) AS INTEGER) AS rank
        FROM lv)
      WHERE rank <= 2"""))

  /** Length-curriculum epoch order: tier documents by
    * floor(log2(n_tokens+1)) — the binary-string-length idiom, pure
    * integer, no libm — then lay out the epoch tier-major (shortest
    * tier first; length curriculum is the standard warm-up schedule)
    * with a DETERMINISTIC shuffle inside each tier (double-mixed
    * hash, unique-id tiebreak) and a GLOBAL position from the
    * distributed prefix-sum ([[graft.operators.GlobalOrder]]) — no
    * single-reducer global sort. Every loader replica slices the
    * same (doc, pos) epoch file.
    */
  val samp_curriculum = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.wsTokenCount(col("text")).as("n_tokens"))
        .withColumn("tier", (length(bin(col("n_tokens") + 1)) - 1).cast("int"))
      graft.operators.GlobalOrder.withGlobalIndex(docs,
          Seq(col("tier").asc, Sampling.detHash2(col("doc_id")).asc,
            col("doc_id").asc))
        .select(col("doc_id"), col("n_tokens"), col("tier"), col("pos"))
    },
    Some {
      val toks = """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
           ELSE len(string_split_regex(trim(text), '\s+')) END"""
      val h1 = "(doc_id % 94906249) * 1103515245 % 2147483647"
      val h2 = s"(($h1) % 94906249) * 1103515245 % 2147483647"
      s"""WITH d AS (SELECT doc_id, CAST($toks AS BIGINT) AS n_tokens
            FROM documents),
          t AS (SELECT doc_id, n_tokens,
              CAST(length(bin(n_tokens + 1)) - 1 AS INTEGER) AS tier
            FROM d)
        SELECT doc_id, n_tokens, tier,
          row_number() OVER (ORDER BY tier ASC, $h2 ASC, doc_id ASC) AS pos
        FROM t"""
    })

  val all: Map[String, Q] = Map(
    "samp_temperature" -> samp_temperature,
    "g_khop_typed" -> g_khop_typed,
    "g_export_incremental" -> g_export_incremental,
    "g_kpaths_cheapest" -> g_kpaths_cheapest,
    "samp_curriculum" -> samp_curriculum,
  )
}
