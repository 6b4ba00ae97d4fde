package graft

import org.apache.spark.sql.functions._

import Queries.Q
import Queries54.stagedDemo

/** Batch 57 (round 13): the write surface's READ CONTINUATIONS — the
  * round-12 verdict's top consumer-surface items — plus the two
  * follow-ups it ordered: a benched (socket-free) form of the
  * rel-prop write apply, and the unbounded var-length expansion on a
  * fixture DEEPER than the old hop cap.
  *
  *   - `MERGE … RETURN n` / `CREATE … RETURN n` is THE most common
  *     write idiom in Neo4j application code (every get-or-create
  *     returns the node); the reference itself never returns from
  *     writes (its projectors are fire-and-forget MERGE text,
  *     app/graph_fields.py:14-30), so this is consumer surface.
  *   - `MERGE … WITH … MATCH … RETURN` threads the written rows into
  *     the read pipeline over the POST-APPLY graph in one statement.
  *   - `[*]` now CONVERGES (trail-semantics fixpoint) instead of
  *     silently capping at 8 hops — proven here on a 12-hop chain
  *     (13 nodes), past the old cap.
  *
  * The DuckDB oracle recomputes every answer relationally from the
  * raw tables, so a hash match proves parse → set-wise apply →
  * post-apply re-probe → projection.
  */
object Queries57 {

  private def emptyGraph(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    graft.cypher.PropertyGraph(
      Seq.empty[(String, String, Map[String, String])]
        .toDF("id", "label", "props"),
      Seq.empty[(String, String, String, Map[String, String])]
        .toDF("src", "dst", "rel", "props"))
  }

  /** `MERGE … RETURN` in all three forms — MERGE-new (ON CREATE
    * branch visible in the returned rows), MERGE-existing (ON MATCH
    * branch + previously written props read back), and `CREATE …
    * RETURN` — each projecting the statement's OWN rows against the
    * post-apply graph (one broadcast semi-probe over the standing
    * vertices; the standing graph never shuffles for a write's
    * RETURN). One output row per UNWIND input row, openCypher
    * semantics. */
  val cy_merge_return = Q(
    (s, dir) => {
      val nations = graft.sources.Tables.read(s, dir, "nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"))
        .collect().toSeq
        .map(r => Map[String, Any]("k" -> r.get(0), "name" -> r.get(1)))
      val store = new graft.cypher.GraphStore(emptyGraph(s),
        Map("Nation" -> Seq("k")))
      val (st1, r1) = store.executeReturning(
        """UNWIND $rows AS row
           MERGE (n:Nation {k: row.k})
           ON CREATE SET n.src = 'created'
           SET n.name = row.name
           RETURN n.k AS k, n.name AS name, n.src AS src""",
        Map("rows" -> nations))
      require(st1.nodesCreated == nations.size.toLong,
        s"expected ${nations.size} creations, got $st1")
      val (st2, r2) = store.executeReturning(
        """UNWIND $rows AS row
           MERGE (n:Nation {k: row.k})
           ON MATCH SET n.src = 'matched'
           RETURN n.k AS k, n.name AS name, n.src AS src""",
        Map("rows" -> nations))
      require(st2.nodesCreated == 0 && st2.nodesMatched == nations.size,
        s"expected all-matched, got $st2")
      val (st3, r3) = store.executeReturning(
        """CREATE (x:Nation {k: -1, name: 'SENTINEL', src: 'plain-create'})
           RETURN x.k AS k, x.name AS name, x.src AS src""")
      require(st3.nodesCreated == 1, s"expected one creation, got $st3")
      Seq(r1.get.withColumn("stage", lit("merge-new")),
          r2.get.withColumn("stage", lit("merge-match")),
          r3.get.withColumn("stage", lit("create")))
        .reduce(_ unionByName _)
        .orderBy(col("stage"), col("k"))
    },
    Some("""WITH forms AS (
        SELECT 'merge-new' AS stage, 'created' AS src
        UNION ALL SELECT 'merge-match', 'matched')
      SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name, src, stage
      FROM nation CROSS JOIN forms
      UNION ALL
      SELECT '-1', 'SENTINEL', 'plain-create', 'create'
      ORDER BY stage, k"""))

  /** Write-then-read in ONE statement: upsert a sentinel customer and
    * its FROM_NATION edge, then `WITH c MATCH …` re-enters the read
    * pipeline over the POST-APPLY graph — the second MATCH walks
    * THROUGH the just-written node and edge to aggregate the standing
    * data around it. Trail semantics exclude the written edge from
    * re-use, so the peer count is exactly the pre-existing customers
    * of the nation. */
  val cy_write_with = Q(
    (s, dir) => {
      val store = new graft.cypher.GraphStore(stagedDemo(s, dir),
        Map("Customer" -> Seq("k"), "Nation" -> Seq("k")))
      val (st, rows) = store.executeReturning(
        """MERGE (c:Customer {k: -7})
           SET c.mktsegment = 'BUILDING', c.name = 'Customer#sentinel'
           MERGE (c)-[:FROM_NATION]->(n3:Nation {k: 3})
           WITH c
           MATCH (c)-[:FROM_NATION]->(n:Nation)<-[:FROM_NATION]-(o:Customer)
           RETURN n.name AS nation, count(*) AS n_peers""")
      require(st.nodesCreated == 1 && st.relsCreated == 1,
        s"expected one node + one edge created, got $st")
      rows.get
    },
    Some("""SELECT n_name AS nation, COUNT(*) AS n_peers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_nationkey = 3 GROUP BY 1"""))

  /** A 12-hop chain — past the round-12 DefaultHopCap=8 that would
    * silently truncate it: nation keys 0..12 linked
    * `N:k -NEXT-> N:k+1`, then `[:NEXT*]` from the head CONVERGES to
    * the full reachable set (one path per depth 1..12) — the
    * round-13 fixpoint expansion — plus open shortestPath over the
    * same chain. A deep chain is inherently LATENCY-bound: each hop
    * depends on the previous, so the entry pays ~one Spark job per
    * hop per expansion — the honest floor for unbounded depth, which
    * is why bounded ranges (a static union, no actions) stay the
    * right tool when the consumer knows a bound. */
  val cy_var_unbounded = Q(
    (s, dir) => {
      val nation = graft.sources.Tables.read(s, dir, "nation")
        .filter(col("n_nationkey") <= 12)
      // the key lives in the id under verticesMapProps; `kv` carries
      // it as a READABLE prop for the pattern + projections
      val v = graft.domain.GraphAssembly.verticesMapProps(
        nation.select(col("n_nationkey").as("k"),
          col("n_nationkey").cast("string").as("kv"),
          col("n_name").as("name")),
        "N", Seq("k"))
      val e = nation.alias("a")
        .join(nation.alias("b"),
          col("a.n_nationkey") + 1 === col("b.n_nationkey"))
        .select(
          concat_ws(":", lit("N"), col("a.n_nationkey")).as("src"),
          concat_ws(":", lit("N"), col("b.n_nationkey")).as("dst"),
          lit("NEXT").as("rel"))
      // materialize the tiny chain fixture ONCE: the converging
      // expansion runs one frontier⋈edges job per level, and ~2×13
      // levels re-scanning parquet-derived frames is all job overhead
      // (measured 15.6 s); over in-memory frames the same iteration
      // is a few seconds. At scale the edge side stays a lazy pruned
      // scan by design — materializing is the FIXTURE's choice.
      val g = graft.cypher.PropertyGraph(
        v.localCheckpoint(true), e.localCheckpoint(true))
      val reach = g.cypher(
        """MATCH (a:N {kv: '0'})-[:NEXT*]->(b)
           RETURN count(*) AS n_reach, max(toInteger(b.kv)) AS far""")
      val sp = g.cypher(
        """MATCH p = shortestPath((a:N {kv: '0'})-[:NEXT*]->(b))
           WHERE toInteger(b.kv) >= 10
           RETURN count(*) AS n_reach, max(length(p)) AS far""")
      reach.withColumn("form", lit("walk"))
        .unionByName(sp.withColumn("form", lit("shortest")))
        .orderBy(col("form"))
    },
    Some("""SELECT CAST(COUNT(*) - 1 AS BIGINT) AS n_reach,
        CAST(MAX(n_nationkey) AS BIGINT) AS far, 'walk' AS form
      FROM nation WHERE n_nationkey <= 12
      UNION ALL
      SELECT CAST(COUNT(*) AS BIGINT), CAST(MAX(n_nationkey) AS BIGINT),
        'shortest'
      FROM nation WHERE n_nationkey BETWEEN 10 AND 12
      ORDER BY form"""))

  /** The rel-prop WRITE APPLY itself, benched (round-12 verdict item
    * 7): `cy_rel_props` proves the same semantics over genuine Bolt
    * TCP but is excluded from the bench set (per-message socket
    * round-trips); this socket-free twin runs the MATCH-bound edge
    * SET — one broadcast left-outer probe over the standing edge
    * table — directly on the store, so a regression in the probe
    * plan is caught by the bench gate. */
  val cy_rel_props_apply = Q(
    (s, dir) => {
      val store = new graft.cypher.GraphStore(stagedDemo(s, dir))
      val st = store.execute(
        """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
           WHERE toInteger(l.quantity) >= $q AND o.orderstatus = 'F'
           SET l.flag = 'hot'""",
        Map("q" -> 49))
      require(st.relsMatched > 0, s"SET matched no edges: $st")
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
      GROUP BY 1 ORDER BY brand"""))

  val all: Map[String, Q] = Map(
    "cy_merge_return" -> cy_merge_return,
    "cy_write_with" -> cy_write_with,
    "cy_var_unbounded" -> cy_var_unbounded,
    "cy_rel_props_apply" -> cy_rel_props_apply,
  )
}
