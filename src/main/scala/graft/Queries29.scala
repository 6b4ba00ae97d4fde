package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.domain.GraphAssembly
import graft.operators.{GraphExport, GraphOps}
import Queries.Q

/** Batch 29 (round 7): the graph EXPORT stage — the engine's terminal
  * artifact, closing the round-6 verdict's top coverage gap — and the
  * bounded k-hop path expand that closes the last Cypher-user query
  * family (variable-length patterns).
  */
object Queries29 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Export the assembled graph to the partitioned parquet layout
    * ([[GraphExport]]) and PROVE the round-trip lossless: the emitted
    * rows are per-label/per-rel counts read from the EXPORTED files
    * (not the in-memory frames), plus two check rows counting the
    * symmetric difference original↔read-back (must be 0). The write
    * itself runs behind the same integrity gates the reference
    * enforces as Neo4j constraints (graph_constraints.py:2-133) —
    * vertex-id uniqueness and no dangling endpoints — so a failed
    * gate aborts before any bytes land.
    */
  val g_export_roundtrip = Q(
    (s, dir) => {
      val verts =
        GraphAssembly.vertices(T_(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          "Order", Seq("o_orderkey"))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          "Customer", Seq("c_custkey")))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name")),
          "Nation", Seq("n_nationkey")))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "region")
          .select(col("r_regionkey"), col("r_name")),
          "Region", Seq("r_regionkey")))
      val edges =
        GraphAssembly.edges(T_(s, dir, "orders"), "PLACED_BY",
          "Order", Seq("o_orderkey"), "Customer", Seq("o_custkey"))
        .unionByName(GraphAssembly.edges(T_(s, dir, "customer"), "IN_NATION",
          "Customer", Seq("c_custkey"), "Nation", Seq("c_nationkey")))
        .unionByName(GraphAssembly.edges(T_(s, dir, "nation"), "IN_REGION",
          "Nation", Seq("n_nationkey"), "Region", Seq("n_regionkey")))
      val root = java.nio.file.Files
        .createTempDirectory("graft_graph_export").toString
      val (vBack, eBack) = GraphExport.exportGraph(s, verts, edges, root)
      // read-back column order differs (partition col moves last);
      // realign before the symmetric difference
      val vB = vBack.select("id", "label", "props")
      val eB = eBack.select("src", "dst", "rel")
      val vDiff = verts.exceptAll(vB).count() + vB.exceptAll(verts).count()
      val eDiff = edges.exceptAll(eB).count() + eB.exceptAll(edges).count()
      vB.groupBy(col("label").as("name")).agg(count(lit(1)).as("n"))
        .select(lit("vertex").as("kind"), col("name"), col("n"))
        .unionByName(
          eB.groupBy(col("rel").as("name")).agg(count(lit(1)).as("n"))
            .select(lit("edge").as("kind"), col("name"), col("n")))
        .unionByName(s.range(1).select(lit("check").as("kind"),
          lit("verts_roundtrip_diff").as("name"), lit(vDiff).as("n")))
        .unionByName(s.range(1).select(lit("check").as("kind"),
          lit("edges_roundtrip_diff").as("name"), lit(eDiff).as("n")))
        .orderBy(col("kind"), col("name"))
    },
    Some("""SELECT kind, name, n FROM (
        SELECT 'vertex' AS kind, 'Order' AS name, count(*) AS n FROM orders
        UNION ALL SELECT 'vertex', 'Customer', count(*) FROM customer
        UNION ALL SELECT 'vertex', 'Nation', count(*) FROM nation
        UNION ALL SELECT 'vertex', 'Region', count(*) FROM region
        UNION ALL SELECT 'edge', 'PLACED_BY', count(*) FROM orders
        UNION ALL SELECT 'edge', 'IN_NATION', count(*) FROM customer
        UNION ALL SELECT 'edge', 'IN_REGION', count(*) FROM nation
        UNION ALL SELECT 'check', 'verts_roundtrip_diff', 0
        UNION ALL SELECT 'check', 'edges_roundtrip_diff', 0)
      ORDER BY kind, name"""))

  /** Variable-length path query ([[GraphOps.kHopPaths]]): every
    * simple directed path of 1..3 hops from a sampled source set over
    * the namespaced order→customer→nation→region graph — Cypher's
    * `(o)-[*1..3]->(v)` as three unrolled frontier joins, and the
    * oracle replays exactly that unrolling.
    */
  val g_khop_paths = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"),
          (col("o_custkey") + 10000L).as("dst"))
      val c = T_(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"),
          (col("c_nationkey").cast("long") + 100L).as("dst"))
      val n = T_(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"),
          col("n_regionkey").cast("long").as("dst"))
      val edges = o.unionByName(c).unionByName(n)
      val sources = T_(s, dir, "orders")
        .filter(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + 10000000L).as("id"))
      GraphOps.kHopPaths(edges, sources, maxHops = 3)
    },
    Some("""WITH edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation),
      src AS (SELECT 10000000 + o_orderkey AS id FROM orders
        WHERE o_orderkey % 1000 = 0),
      h0 AS (SELECT id AS start, id AS "end", [id] AS path FROM src),
      h1 AS (SELECT h0.start, e.dst AS "end", list_append(h0.path, e.dst) AS path
        FROM h0 JOIN edges e ON h0."end" = e.src
        WHERE NOT list_contains(h0.path, e.dst)),
      h2 AS (SELECT h1.start, e.dst AS "end", list_append(h1.path, e.dst) AS path
        FROM h1 JOIN edges e ON h1."end" = e.src
        WHERE NOT list_contains(h1.path, e.dst)),
      h3 AS (SELECT h2.start, e.dst AS "end", list_append(h2.path, e.dst) AS path
        FROM h2 JOIN edges e ON h2."end" = e.src
        WHERE NOT list_contains(h2.path, e.dst))
      SELECT start, "end", CAST(1 AS INTEGER) AS hops, path FROM h1
      UNION ALL SELECT start, "end", CAST(2 AS INTEGER), path FROM h2
      UNION ALL SELECT start, "end", CAST(3 AS INTEGER), path FROM h3"""))

  val all: Map[String, Q] = Map(
    "g_export_roundtrip" -> g_export_roundtrip,
    "g_khop_paths" -> g_khop_paths,
  )
}
