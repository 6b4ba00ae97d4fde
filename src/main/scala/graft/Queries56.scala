package graft

import org.apache.spark.sql.functions._

import Queries.Q
import Queries54.stagedDemo

/** Batch 56 (round 12): the Cypher consumer-surface items of the
  * round-11 verdict — the two MATCH idioms every Neo4j-trained user
  * types first (undirected edges and open var-length ranges),
  * relationship properties through the write surface, and Bolt
  * explicit transactions. All batch entries run over the staged demo
  * graph ([[Queries54.stagedDemo]]) and the DuckDB oracle recomputes
  * each answer relationally from the raw tables.
  */
object Queries56 {

  /** Undirected relationship pattern `-[:R]-`: the compiler unions
    * BOTH stored orientations (an equi-join shape — never an OR-join,
    * which would nested-loop at 100 TB). From Nation the FROM_NATION
    * edges are traversed BACKWARDS (customers point at nations) and
    * IN_REGION forwards — one pattern, both directions, which is
    * exactly why consumers reach for `-[]-` first. */
  val cy_undirected = Q(
    (s, dir) => stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)-[:FROM_NATION|IN_REGION]-(x)
         WHERE n.name <> 'NATION_0'
         RETURN label(x) AS lbl, count(*) AS n
         ORDER BY lbl"""),
    Some("""SELECT 'Customer' AS lbl, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name <> 'NATION_0'
      UNION ALL
      SELECT 'Region' AS lbl, COUNT(*) AS n
        FROM nation WHERE n_name <> 'NATION_0'
      ORDER BY lbl"""))

  /** Open var-length range `[*]`: since round 13 this CONVERGES —
    * one frontier⋈edges level per hop, seeded from the BUILDING
    * customers, stopping at the empty frontier (trail uniqueness
    * makes it finite). The real graph bottoms out at depth 2
    * (Customer → Nation → Region), so the expansion runs exactly 3
    * levels (the third is empty) instead of the round-12 fixed
    * 8-chain union. */
  val cy_var_open = Q(
    (s, dir) => stagedDemo(s, dir).cypher(
      """MATCH (c:Customer {mktsegment: 'BUILDING'})
               -[:FROM_NATION|IN_REGION*]->(x)
         RETURN label(x) AS dst, count(*) AS n
         ORDER BY dst"""),
    Some("""WITH f AS (SELECT c_custkey, c_nationkey FROM customer
                 WHERE c_mktsegment = 'BUILDING')
      SELECT 'Nation' AS dst, COUNT(*) AS n
        FROM f JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 'Region' AS dst, COUNT(*) AS n
        FROM f JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
      ORDER BY dst"""))

  /** Relationship properties through the WRITE surface, over genuine
    * Bolt TCP: an unmodified wire client sends
    * `MATCH ()-[l:CONTAINS]->() WHERE … SET l.flag = …` — a
    * MATCH-bound edge update compiled to ONE broadcast left-outer
    * probe over the standing edge table (the standing graph never
    * shuffles for a write) — then the updated props are read back
    * via `l.flag` / `l.quantity` projections through the compiler.
    * The SET replays as a fixpoint (second pass changes nothing),
    * and the oracle recomputes the flagged population relationally,
    * so the hash proves wire → parse → set-wise edge update →
    * map-typed rel-prop read-back. */
  val cy_rel_props = Q(
    (s, dir) => {
      val store = new graft.cypher.GraphStore(stagedDemo(s, dir))
      val srv = new graft.cypher.BoltQueryServer(store)
      try {
        val sess = new graft.sinks.bolt.BoltSocketSession(
          srv.host, srv.port, "graft-entry", 15000)
        try {
          val setStmt =
            """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
               WHERE toInteger(l.quantity) >= $q AND o.orderstatus = 'F'
               SET l.flag = 'hot'"""
          sess.run(setStmt, Map("q" -> 49))
          val before = store.graph.edges
            .filter(col("props").getItem("flag") === "hot").count()
          require(before > 0, "SET l.flag updated no edges")
          // fixpoint: replay changes nothing
          sess.run(setStmt, Map("q" -> 49))
          val after = store.graph.edges
            .filter(col("props").getItem("flag") === "hot").count()
          require(before == after,
            s"edge SET replay changed the graph: $before -> $after")
        } finally sess.close()
      } finally srv.close()
      store.cypher(
        """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
           WHERE l.flag = 'hot'
           RETURN p.brand AS brand, count(*) AS n,
                  max(toInteger(l.quantity)) AS max_qty
           ORDER BY brand""")
    },
    Some("""WITH e AS (SELECT l_orderkey, l_partkey,
                 CAST(SUM(l_quantity) AS BIGINT) AS qty
               FROM lineitem GROUP BY 1, 2)
      SELECT p_brand AS brand, COUNT(*) AS n, MAX(qty) AS max_qty
      FROM e JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
      WHERE qty >= 49 AND o_orderstatus = 'F'
      GROUP BY 1 ORDER BY brand"""),
    // wire fixture: socket + store transitions, not a batch plan
    bench = false)

  /** Bolt EXPLICIT transactions over TCP — what a real driver's
    * `execute_write` unit of work sends (BEGIN/RUN/PULL/COMMIT, plus
    * ROLLBACK and RESET): a committed two-statement transaction lands
    * atomically, a rolled-back one provably discards (including a
    * read INSIDE the tx seeing its own writes while the standing
    * store does not), and the final state reads back through the
    * same wire, hash-checked against the oracle recomputing
    * relationally. */
  val cy_bolt_tx = Q(
    (s, dir) => {
      import graft.cypher.{GraphStore, PropertyGraph}
      import s.implicits._
      val nations = graft.sources.Tables.read(s, dir, "nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"))
        .collect().toSeq
        .map(r => Map[String, Any]("k" -> r.get(0), "name" -> r.get(1)))
      val empty = PropertyGraph(
        Seq.empty[(String, String, Map[String, String])]
          .toDF("id", "label", "props"),
        Seq.empty[(String, String, String, Map[String, String])]
          .toDF("src", "dst", "rel", "props"))
      val store = new GraphStore(empty, Map("Nation" -> Seq("k")))
      val srv = new graft.cypher.BoltQueryServer(store)
      try {
        val sess = new graft.sinks.bolt.BoltSocketSession(
          srv.host, srv.port, "graft-entry", 15000)
        try {
          // committed transaction: batch MERGE + a tag update, atomic
          sess.begin()
          sess.run(
            """UNWIND $rows AS row
               MERGE (n:Nation {k: row.k}) SET n.name = row.name""",
            Map("rows" -> nations))
          // the tx reads its own writes; the store sees nothing yet
          val (_, inTx) = sess.query(
            "MATCH (n:Nation) RETURN count(*) AS n", Map.empty)
          require(inTx == Seq(Seq(nations.size.toLong)),
            s"tx does not read its own writes: $inTx")
          require(store.graph.vertices.count() == 0,
            "uncommitted writes leaked into the standing store")
          sess.run(
            "MATCH (n:Nation) WHERE n.name ENDS WITH '3' SET n.tag = 'x'",
            Map.empty)
          sess.commit()
          // rolled-back transaction: provably discarded
          sess.begin()
          sess.run("MATCH (n:Nation) SET n.tag = 'DOOMED'", Map.empty)
          sess.rollback()
          val (fields, rows) = sess.query(
            """MATCH (n:Nation)
               RETURN n.name AS name, coalesce(n.tag, '-') AS tag
               ORDER BY name""", Map.empty)
          require(fields == Seq("name", "tag"),
            s"unexpected wire fields: $fields")
          rows.map(r => (r(0).asInstanceOf[String],
            r(1).asInstanceOf[String])).toDF("name", "tag")
        } finally sess.close()
      } finally srv.close()
    },
    Some("""SELECT n_name AS name,
        CASE WHEN n_name LIKE '%3' THEN 'x' ELSE '-' END AS tag
      FROM nation ORDER BY name"""),
    // wire fixture: per-message socket round-trips by design
    bench = false)

  val all: Map[String, Q] = Map(
    "cy_undirected" -> cy_undirected,
    "cy_var_open" -> cy_var_open,
    "cy_rel_props" -> cy_rel_props,
    "cy_bolt_tx" -> cy_bolt_tx,
  )
}
