package graft

import Queries.Q
import Queries54.stagedDemo

/** Batch 62 (round 16): the Cypher consumer-surface tail of the
  * round-15 verdict — the `CALL db.*` catalog procedures an
  * unmodified Neo4j driver/Browser issues on connect (the catalog the
  * reference bootstraps is its 23 constrained labels,
  * /root/reference/app/graph_constraints.py:2-133), GENERAL path
  * variables with `nodes(p)`/`relationships(p)`/`length(p)`
  * projections (the early idiom for traversing the reference's
  * Field→Station star, e.g. graph_weather_day.py:250-257), and
  * `duration.between()` temporal arithmetic (the engine-side
  * equivalent of the reference's precomputed
  * IrrigationEvent.duration_min, graph_irrigation_event.py:296-332).
  */
object Queries62 {

  /** The Bolt catalog-procedure surface end-to-end over real TCP: an
    * unmodified wire client issues the four introspection calls a
    * real driver sends on connect (`db.labels`,
    * `db.relationshipTypes`, `db.propertyKeys`,
    * `db.schema.visualization`) against a [[graft.cypher.GraphStore]]
    * serving the staged demo graph; the schema triples are
    * require()-checked in place and the three token catalogs land as
    * one (kind, name) frame the DuckDB oracle pins VALUES-wise (the
    * tokens are the demo graph's construction constants — the same
    * literal class as the label names other oracles pin). */
  val cy_procedures = Q(
    (s, dir) => {
      val store = new graft.cypher.GraphStore(stagedDemo(s, dir))
      val srv = new graft.cypher.BoltQueryServer(store)
      try {
        val sess = new graft.sinks.bolt.BoltSocketSession(
          srv.host, srv.port, "graft-entry", 15000)
        try {
          def one(call: String, field: String): Seq[String] = {
            val (fields, rows) = sess.query(call, Map.empty)
            require(fields == Seq(field),
              s"$call: unexpected wire fields $fields")
            rows.map(_.head.asInstanceOf[String])
          }
          val labels = one("CALL db.labels()", "label")
          // parens-less + YIELD forms drivers also send
          require(one("CALL db.labels", "label") == labels,
            "parens-less CALL db.labels diverged")
          require(one("CALL db.labels() YIELD label", "label") == labels,
            "YIELD-tailed CALL db.labels diverged")
          val rels = one("CALL db.relationshipTypes()", "relationshipType")
          val keys = one("CALL db.propertyKeys()", "propertyKey")
          // server-identity probe drivers send on connect (answered
          // honestly as the engine's own name/version)
          val (cfields, crows) =
            sess.query("CALL dbms.components()", Map.empty)
          require(cfields == Seq("name", "versions", "edition") &&
            crows.length == 1 && crows.head.head == "graft",
            s"dbms.components: $cfields / $crows")
          val (vfields, vrows) =
            sess.query("CALL db.schema.visualization()", Map.empty)
          require(vfields == Seq("nodes", "relationships"),
            s"schema.visualization fields: $vfields")
          require(vrows.length == 1, "schema.visualization is one row")
          val vizLabels =
            vrows.head.head.asInstanceOf[Seq[Any]].map(String.valueOf)
          val vizRels =
            vrows.head(1).asInstanceOf[Seq[Any]].map(String.valueOf)
          require(vizLabels == labels,
            s"schema.visualization labels $vizLabels != $labels")
          require(vizRels == Seq(
            "(:Customer)-[:FROM_NATION]->(:Nation)",
            "(:Customer)-[:PLACED]->(:Order)",
            "(:Nation)-[:IN_REGION]->(:Region)",
            "(:Order)-[:CONTAINS]->(:Part)"),
            s"schema.visualization triples: $vizRels")
          import s.implicits._
          (labels.map(("label", _)) ++ rels.map(("relationshipType", _)) ++
            keys.map(("propertyKey", _)))
            .toDF("kind", "name").orderBy("kind", "name")
        } finally sess.close()
      } finally srv.close()
    },
    Some("""SELECT * FROM (VALUES
        ('label', 'Customer'), ('label', 'Nation'), ('label', 'Order'),
        ('label', 'Part'), ('label', 'Region'),
        ('propertyKey', 'acctbal'), ('propertyKey', 'brand'),
        ('propertyKey', 'mktsegment'), ('propertyKey', 'name'),
        ('propertyKey', 'orderdate'), ('propertyKey', 'orderpriority'),
        ('propertyKey', 'orderstatus'), ('propertyKey', 'quantity'),
        ('propertyKey', 'size'), ('propertyKey', 'totalprice'),
        ('relationshipType', 'CONTAINS'), ('relationshipType', 'FROM_NATION'),
        ('relationshipType', 'IN_REGION'), ('relationshipType', 'PLACED')
      ) AS t(kind, name)
      ORDER BY kind, name"""),
    // wire fixture: socket + catalog probes, not a batch plan
    bench = false)

  /** General path variable over a var-length alternation:
    * `p = (c)-[:FROM_NATION|IN_REGION*1..2]->(x)` binds one row per
    * path (trail semantics), and the projections read it three ways —
    * `length(p)` as a grouping key, `nodes(p)` composed with
    * `head`/`last` (start/end ids), `relationships(p)` with `head`
    * (the first hop's canonical `src-[REL]->dst` triple text). The
    * plan is the SAME union-of-join-chains the unbound pattern
    * compiles to, plus three array columns built from hop columns the
    * chains already carry — no extra joins, no traversal state. */
  val cy_path_var = Q(
    (s, dir) => stagedDemo(s, dir).cypher(
      """MATCH p = (c:Customer {mktsegment: 'BUILDING'})
                   -[:FROM_NATION|IN_REGION*1..2]->(x)
         RETURN length(p) AS len, label(x) AS dst, count(*) AS n_paths,
                count(DISTINCT head(nodes(p))) AS n_starts,
                count(DISTINCT last(nodes(p))) AS n_ends,
                min(head(relationships(p))) AS first_rel
         ORDER BY len, dst"""),
    Some("""WITH f AS (SELECT c_custkey, c_nationkey FROM customer
                 WHERE c_mktsegment = 'BUILDING')
      SELECT CAST(1 AS BIGINT) AS len, 'Nation' AS dst,
             COUNT(*) AS n_paths,
             COUNT(DISTINCT 'Customer:' || c_custkey) AS n_starts,
             COUNT(DISTINCT 'Nation:' || c_nationkey) AS n_ends,
             MIN('Customer:' || c_custkey || '-[FROM_NATION]->Nation:'
                 || c_nationkey) AS first_rel
        FROM f
      UNION ALL
      SELECT CAST(2 AS BIGINT) AS len, 'Region' AS dst,
             COUNT(*) AS n_paths,
             COUNT(DISTINCT 'Customer:' || c_custkey) AS n_starts,
             COUNT(DISTINCT 'Region:' || r_regionkey) AS n_ends,
             MIN('Customer:' || c_custkey || '-[FROM_NATION]->Nation:'
                 || n_nationkey) AS first_rel
        FROM f JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
      ORDER BY len, dst"""))

  /** `duration.between(a, b)` over the Order dates: the component map
    * {days, hours, minutes, seconds, totalSeconds} (see
    * CypherAst.DurBetween) read back through WITH-aliased map access
    * — days varies per order, the time-of-day components are the
    * endpoint's (constant groups proving the breakdown), and
    * min(totalSeconds) pins the exact arithmetic. The oracle
    * recomputes every component from date_diff seconds. */
  val cy_duration = Q(
    (s, dir) => stagedDemo(s, dir).cypher(
      """MATCH (o:Order)
         WHERE o.orderdate >= '1998-07-01'
         WITH duration.between(o.orderdate, '1998-08-02T12:30:45') AS d
         RETURN d.days AS days, d.hours AS hours, d.minutes AS mins,
                d.seconds AS secs, min(d.totalSeconds) AS min_total,
                count(*) AS n
         ORDER BY days"""),
    Some("""WITH t AS (SELECT date_diff('second',
                 CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP),
                 TIMESTAMP '1998-08-02 12:30:45') AS total
               FROM orders
               WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1998-07-01')
      SELECT total // 86400 AS days, (total % 86400) // 3600 AS hours,
             (total % 3600) // 60 AS mins, total % 60 AS secs,
             MIN(total) AS min_total, COUNT(*) AS n
      FROM t GROUP BY 1, 2, 3, 4 ORDER BY days"""))

  /** shortestPath now binds a REAL path (round 16): one
    * deterministic representative per endpoint pair (the
    * lexicographically smallest (depth, nodes, rels) triple — the
    * engine's instance of openCypher's "some shortest path"),
    * projected through nodes()/relationships()/length(). Here every
    * (customer, region) pair has exactly one min path
    * (Customer→Nation→Region), so the oracle recomputes each
    * projection relationally — the hash proves the representative
    * aggregate keeps the right hop arrays, not just the length. */
  val cy_shortest_proj = Q(
    (s, dir) => stagedDemo(s, dir).cypher(
      """MATCH p = shortestPath((c:Customer {mktsegment: 'AUTOMOBILE'})
                   -[:FROM_NATION|IN_REGION*1..2]->(r:Region))
         RETURN r.name AS region, length(p) AS len, count(*) AS n_cust,
                count(DISTINCT last(relationships(p))) AS n_link_rels,
                min(head(nodes(p))) AS first_cust
         ORDER BY region"""),
    Some("""SELECT r_name AS region, CAST(2 AS BIGINT) AS len,
             COUNT(*) AS n_cust,
             COUNT(DISTINCT 'Nation:' || n_nationkey ||
                   '-[IN_REGION]->Region:' || r_regionkey) AS n_link_rels,
             MIN('Customer:' || c_custkey) AS first_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE c_mktsegment = 'AUTOMOBILE'
      GROUP BY 1 ORDER BY region"""))

  val all: Map[String, Q] = Map(
    "cy_procedures" -> cy_procedures,
    "cy_path_var" -> cy_path_var,
    "cy_duration" -> cy_duration,
    "cy_shortest_proj" -> cy_shortest_proj,
  )
}
