package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{CypherParser, PropertyGraph}
import graft.cypher.CypherAst._

/** Parser + compiler semantics for the Cypher READ subset
  * (graft.cypher), on tiny in-memory graphs where every expected
  * result is enumerable by hand.
  */
class CypherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // people graph: a KNOWS cycle + a LIKES edge with props, plus one
  // isolated node — enough to exercise joins, optional, trails
  private lazy val g: PropertyGraph = {
    val v = Seq(
      ("Person:1", "Person", """{"name":"ann","age":30}"""),
      ("Person:2", "Person", """{"name":"bob","age":25}"""),
      ("Person:3", "Person", """{"name":"cat","age":35}"""),
      ("Person:4", "Person", """{"name":"dan"}"""),
      ("Food:1", "Food", """{"name":"fig"}"""),
    ).toDF("id", "label", "props")
    val e = Seq(
      ("Person:1", "Person:2", "KNOWS", null),
      ("Person:2", "Person:3", "KNOWS", null),
      ("Person:3", "Person:1", "KNOWS", null),
      ("Person:1", "Food:1", "LIKES", """{"stars":5}"""),
      ("Person:2", "Food:1", "LIKES", """{"stars":2}"""),
    ).toDF("src", "dst", "rel", "props")
    PropertyGraph(v, e)
  }

  // ---- parser ----------------------------------------------------

  test("parser: full clause structure round-trips") {
    val q = CypherParser.parse(
      """MATCH (a:Person {name: 'ann'})-[r:KNOWS|LIKES]->(b)
         WHERE toInteger(b.age) >= 25 AND NOT b.name CONTAINS 'z'
         RETURN b.name AS who, count(*) AS n
         ORDER BY who DESC SKIP 1 LIMIT 5""")
    assert(q.matches.head.paths.head.nodes.head ==
      NodePat("a", Some("Person"), Map("name" -> Lit("ann"))))
    assert(q.matches.head.paths.head.edges.head.types == Seq("KNOWS", "LIKES"))
    assert(q.ret.items.map(_.alias) == Seq("who", "n"))
    assert(q.ret.orderBy == Seq(OrderItem(Var("who"), asc = false)))
    assert((q.ret.skip, q.ret.limit) == (Some(1L), Some(5L)))
  }

  test("parser: rejects unbounded and malformed input with positions") {
    val bad = Seq(
      "MATCH (a)-[:R*0..2]->(b) RETURN a",        // zero lower bound
      "MATCH (a)-[:R*2..1]->(b) RETURN a",        // inverted range
      "MATCH (a)-[:R*..]->(b) RETURN a",          // dangling '..'
      "MATCH (a RETURN a",                        // unclosed node
      "RETURN 1",                                 // no MATCH
      "OPTIONAL MATCH (a) RETURN a",              // leading OPTIONAL
      "MATCH (a) RETURN a extra",                 // trailing input
      "MATCH (a) RETURN sum(*)",                  // sum(*) is not Cypher
    )
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException](CypherParser.parse(s))
      assert(e.getMessage.contains("cypher parse error") ||
             e.getMessage.nonEmpty, s)
    }
  }

  // ---- compiler semantics ------------------------------------------

  test("node scan with prop map, typed access, string predicate") {
    val out = g.cypher(
      """MATCH (p:Person) WHERE toInteger(p.age) > 26 AND p.name STARTS WITH 'a'
         RETURN p.name AS name, toInteger(p.age) AS age ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ann", 30L)))
  }

  test("missing prop is null: IS NULL / IS NOT NULL") {
    val out = g.cypher(
      "MATCH (p:Person) WHERE p.age IS NULL RETURN p.name AS name")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("dan"))
  }

  test("hop with edge props and direction reversal") {
    val out = g.cypher(
      """MATCH (f:Food)<-[l:LIKES]-(p:Person)
         WHERE toInteger(l.stars) >= 5
         RETURN p.name AS name, f.name AS food""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("ann", "fig")))
  }

  test("rebound variable closes a cycle") {
    // the 3-cycle: every (a)-[:KNOWS]->(b)-[:KNOWS]->(c)-[:KNOWS]->(a)
    val out = g.cypher(
      """MATCH (a:Person)-[:KNOWS]->(b)-[:KNOWS]->(c)-[:KNOWS]->(a)
         RETURN a.name AS name ORDER BY name""")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("ann", "bob", "cat"))
  }

  test("trail semantics: a 2-hop path cannot reuse its edge") {
    // without relationship-uniqueness, (a)-[:LIKES]->(x)<-[:LIKES]-(a)
    // would match the SAME edge twice (x back to a itself)
    val out = g.cypher(
      """MATCH (a:Person)-[:LIKES]->(x)<-[:LIKES]-(b)
         RETURN a.name AS an, b.name AS bn ORDER BY an, bn""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // only the genuinely-distinct-edge pairs survive
    assert(out.toSeq == Seq(("ann", "bob"), ("bob", "ann")))
  }

  test("variable-length *1..2 returns one row per path with trails") {
    val out = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS*1..2]->(x)
         RETURN x.name AS name ORDER BY name""")
      .collect().map(_.getString(0))
    // depth 1: bob; depth 2: cat — each path once
    assert(out.toSeq == Seq("bob", "cat"))
  }

  test("named variable-length relationship is rejected") {
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (a)-[r:KNOWS*1..2]->(b) RETURN a"))
    assert(e.getMessage.contains("variable-length"))
  }

  test("OPTIONAL MATCH keeps unmatched rows, count skips nulls") {
    val out = g.cypher(
      """MATCH (p:Person)
         OPTIONAL MATCH (p)-[:LIKES]->(f:Food)
         RETURN p.name AS name, count(f) AS n ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq ==
      Seq(("ann", 1L), ("bob", 1L), ("cat", 0L), ("dan", 0L)))
  }

  test("WHERE on OPTIONAL MATCH filters matches, not rows (openCypher)") {
    // the filter rejects every LIKES edge below 3 stars: bob's match
    // dies (2 stars) but bob's ROW survives with null f — the
    // null-extension semantics a post-join filter would get wrong
    val out = g.cypher(
      """MATCH (p:Person)
         OPTIONAL MATCH (p)-[l:LIKES]->(f:Food) WHERE toInteger(l.stars) >= 3
         RETURN p.name AS name, f.name AS food ORDER BY name""")
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(out.toSeq == Seq(("ann", Some("fig")), ("bob", None),
      ("cat", None), ("dan", None)))
    // outer-variable reference inside the optional WHERE
    val outer = g.cypher(
      """MATCH (p:Person)
         OPTIONAL MATCH (p)-[:LIKES]->(f:Food) WHERE f.name = p.name
         RETURN p.name AS name, count(f) AS n ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // nobody likes a food named after themselves; all rows survive
    assert(outer.toSeq == Seq(("ann", 0L), ("bob", 0L),
      ("cat", 0L), ("dan", 0L)))
  }

  test("OPTIONAL MATCH WHERE rejects non-shared outer references") {
    // q is bound earlier but NOT part of the optional pattern: its
    // values are not determined by the join keys, so the per-key
    // null-extension would be unsound — must reject, not guess
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q:Person)
         OPTIONAL MATCH (p)-[:LIKES]->(f:Food) WHERE f.name = q.name
         RETURN p.name AS name"""))
    assert(e.getMessage.contains("OPTIONAL MATCH WHERE"))
  }

  test("coalesce defaults OPTIONAL MATCH nulls") {
    val out = g.cypher(
      """MATCH (p:Person)
         OPTIONAL MATCH (p)-[:LIKES]->(f:Food)
         RETURN p.name AS name, coalesce(f.name, 'none') AS food
         ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("ann", "fig"), ("bob", "fig"),
      ("cat", "none"), ("dan", "none")))
  }

  test("OPTIONAL MATCH with no shared variable is rejected") {
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) OPTIONAL MATCH (f:Food) RETURN p.name AS n"))
    assert(e.getMessage.contains("share"))
  }

  test("implicit grouping, count distinct, global aggregate") {
    val grouped = g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         RETURN f.name AS food, count(DISTINCT p) AS n""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grouped.toSeq == Seq(("fig", 2L)))
    val global = g.cypher(
      "MATCH (p:Person) RETURN count(*) AS n, min(p.name) AS first")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(global.toSeq == Seq((4L, "ann")))
  }

  test("DISTINCT, SKIP and LIMIT paginate after ORDER BY") {
    val out = g.cypher(
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
         RETURN DISTINCT label(b) AS l, b.name AS name
         ORDER BY name SKIP 1 LIMIT 1""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("Person", "bob")))
  }

  test("comma pattern without shared vars is a cross product") {
    val n = g.cypher(
      "MATCH (p:Person), (f:Food) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 4L)
  }

  test("edge prop access without a props column fails loudly") {
    val bare = PropertyGraph(g.vertices, g.edges.drop("props"))
    val e = intercept[IllegalArgumentException](bare.cypher(
      "MATCH (a)-[l:LIKES]->(b) WHERE toInteger(l.stars) > 1 RETURN a"))
    assert(e.getMessage.contains("props"))
  }

  test("label filter constant-folds non-matching union branches away") {
    // the scale contract stated in Queries54: on a union-of-labels
    // vertex table, `(:X)` must leave only X's branch in the
    // optimized plan — the other branches fold to empty relations
    val a = Seq(("A:1", "A", "{}")).toDF("id", "label", "props")
      .withColumn("tag", lit("branch_a")).drop("tag")
    val b = Seq(("B:1", "B", "{}")).toDF("id", "label", "props")
    val sep = spark.range(1).select(
      concat_ws(":", lit("C"), col("id")).as("id"),
      lit("C").as("label"), lit("{}").as("props"))
    val pg = PropertyGraph(a.unionByName(b).unionByName(sep),
      g.edges.limit(0))
    val plan = pg.cypher("MATCH (x:C) RETURN id(x) AS i")
      .queryExecution.optimizedPlan.toString
    // the folded branches leave no LocalRelation with rows and no
    // non-C label literal in the surviving plan
    assert(!plan.contains("branch_a"))
    assert(plan.contains("C"))
  }

  test("WITH aggregates mid-pipeline, trailing WHERE is the HAVING") {
    val out = g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         WITH f, count(*) AS n WHERE n >= 2
         RETURN f.name AS food, n ORDER BY food""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("fig", 2L)))
    val none = g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         WITH f, count(*) AS n WHERE n >= 3
         RETURN f.name AS food, n""").count()
    assert(none == 0L)
  }

  test("WITH keeps node bindings across segments (rename + re-match)") {
    val out = g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q:Person)
         WITH p AS who, q.name AS friend
         MATCH (who)-[:LIKES]->(f:Food)
         RETURN who.name AS name, friend, f.name AS food ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // only ann and bob LIKE anything; each knows exactly one person
    assert(out.toSeq ==
      Seq(("ann", "bob", "fig"), ("bob", "cat", "fig")))
  }

  test("WITH scoping: unprojected variables go out of scope") {
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         WITH f.name AS fn
         RETURN p.name AS x"""))
    assert(e.getMessage.contains("unbound"))
  }

  test("WITH ORDER BY/LIMIT paginate the pipeline; global agg crosses") {
    val out = g.cypher(
      """MATCH (p:Person) WITH p ORDER BY p LIMIT 2
         MATCH (p)-[:KNOWS]->(r) RETURN p.name AS a, r.name AS b ORDER BY a""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("ann", "bob"), ("bob", "cat")))
    val cross = g.cypher(
      """MATCH (p:Person) WITH count(*) AS n
         MATCH (f:Food) RETURN f.name AS food, n""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(cross.toSeq == Seq(("fig", 4L)))
  }

  test("shortestPath: one row per pair at the minimum hop count") {
    // the KNOWS 3-cycle from ann: bob@1, cat@2, ann@3 — and *1..3
    // also admits NO shorter route to any of them, so min is exact
    val out = g.cypher(
      """MATCH p = shortestPath((a:Person {name: 'ann'})-[:KNOWS*1..3]->(b:Person))
         RETURN b.name AS name, length(p) AS len ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ann", 3L), ("bob", 1L), ("cat", 2L)))
  }

  test("shortestPath: bare path var is rejected, length() required") {
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH p = shortestPath((a:Person)-[:KNOWS*1..2]->(b))
         RETURN p AS x"""))
    assert(e.getMessage.contains("length"))
    val e2 = intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH p = shortestPath((a)-[:R]->(b)) RETURN length(p)"))
    assert(e2.getMessage.contains("var-length"))
  }

  test("query parameters: $p in prop maps and WHERE; missing fails loud") {
    val one = g.cypher(
      "MATCH (p:Person {name: $who}) RETURN toInteger(p.age) AS age",
      Map("who" -> "ann")).collect().map(_.getLong(0))
    assert(one.toSeq == Seq(30L))
    val n = g.cypher(
      "MATCH (p:Person) WHERE toInteger(p.age) >= $min RETURN count(*) AS n",
      Map("min" -> 30)).collect().head.getLong(0)
    assert(n == 2L)
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person {name: $who}) RETURN p.name AS n").collect())
    assert(e.getMessage.contains("parameter"))
  }

  test("exists(pattern) semi-joins; NOT exists anti-joins; OR rejected") {
    val likers = g.cypher(
      """MATCH (p:Person)
         WHERE exists((p)-[:LIKES]->(f:Food))
         RETURN p.name AS name ORDER BY name""")
      .collect().map(_.getString(0))
    assert(likers.toSeq == Seq("ann", "bob"))
    val nonLikers = g.cypher(
      """MATCH (p:Person)
         WHERE NOT exists((p)-[:LIKES]->(f:Food)) AND p.age IS NOT NULL
         RETURN p.name AS name ORDER BY name""")
      .collect().map(_.getString(0))
    assert(nonLikers.toSeq == Seq("cat"))
    // correlated on a prop-map-constrained pattern
    val fiveStar = g.cypher(
      """MATCH (p:Person)
         WHERE exists((p)-[:LIKES {stars: 5}]->(f:Food))
         RETURN p.name AS name""").collect().map(_.getString(0))
    assert(fiveStar.toSeq == Seq("ann"))
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (p:Person)
         WHERE exists((p)-[:LIKES]->(f)) OR p.age IS NULL
         RETURN p.name AS n"""))
    assert(e.getMessage.contains("conjunct"))
    val e2 = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) WHERE exists((a:Food)-[:LIKES]->(b)) RETURN p.name AS n"))
    assert(e2.getMessage.contains("share"))
  }

  test("string functions, type(), and CASE WHEN") {
    val out = g.cypher(
      """MATCH (p:Person)
         RETURN toUpper(p.name) AS up, size(p.name) AS len,
                substring(p.name, 0, 2) AS pre,
                replace(p.name, 'a', 'o') AS rep,
                CASE WHEN toInteger(p.age) >= 30 THEN 'senior'
                     WHEN toInteger(p.age) >= 0 THEN 'junior'
                     ELSE 'unknown' END AS tier
         ORDER BY up""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      ("ANN", 3L, "an", "onn", "senior"),
      ("BOB", 3L, "bo", "bob", "junior"),
      ("CAT", 3L, "ca", "cot", "senior"),
      ("DAN", 3L, "da", "don", "unknown")))
    val rels = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[r]->(x)
         RETURN type(r) AS t, trim(toLower(' FIG ')) AS s ORDER BY t""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rels.toSeq == Seq(("KNOWS", "fig"), ("LIKES", "fig")))
  }

  test("list functions: split/head/last/range (r15)") {
    val out = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN split('a,b,,c', ',') AS parts,
                head(split('a,b', ',')) AS h,
                last(split('a,b', ',')) AS l,
                size(split('a.b.c', '.')) AS n,
                range(1, 5) AS r1,
                range(0, 10, 3) AS r2,
                head(range(2, 2)) AS one""")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getSeq[String](0) == Seq("a", "b", "", "c"))
    assert(r.getString(1) == "a")
    assert(r.getString(2) == "b")
    // split is LITERAL, not regex: '.' splits on dots, not any-char
    assert(r.getLong(3) == 3L)
    assert(r.getSeq[Long](4) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.getSeq[Long](5) == Seq(0L, 3L, 6L, 9L))
    assert(r.getLong(6) == 2L)
    // a dynamic (non-literal) split delimiter is rejected loudly
    val err = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) RETURN split(p.name, p.name) AS x"))
    assert(err.getMessage.contains("literal"))
  }

  test("ORDER BY expressions: non-returned sort keys, hidden and dropped") {
    val out = g.cypher(
      """MATCH (p:Person) WHERE p.age IS NOT NULL
         RETURN p.name AS name ORDER BY toInteger(p.age) DESC""")
    assert(out.columns.toSeq == Seq("name"))
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("cat", "ann", "bob")) // ages 35, 30, 25
    // mixed alias + expression keys
    val mixed = g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q)
         RETURN p.name AS name, q.name AS friend
         ORDER BY friend, toInteger(p.age) DESC""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(mixed.length == 3)
    // DISTINCT + non-returned sort key is rejected (openCypher too)
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) RETURN DISTINCT p.name AS n ORDER BY toInteger(p.age)"))
    assert(e.getMessage.contains("DISTINCT"))
    // aggregated RETURN: ORDER BY must use aliases
    val e2 = intercept[IllegalArgumentException](g.cypher(
      """MATCH (p:Person) RETURN label(p) AS l, count(*) AS n
         ORDER BY toInteger(p.age)"""))
    assert(e2.getMessage.contains("aggregation"))
  }

  test("arithmetic: precedence and grouping on computed expressions") {
    val out = g.cypher(
      """MATCH (p:Person) WHERE toInteger(p.age) % 2 = 1
         RETURN toInteger(p.age) * 2 + 1 AS x ORDER BY x""")
      .collect().map(_.getLong(0))
    // odd ages: 25, 35 → 51, 71
    assert(out.toSeq == Seq(51L, 71L))
    val agg = g.cypher(
      "MATCH (p:Person) RETURN sum(toInteger(p.age) / 5) AS s")
      .collect().head.getDouble(0)
    // 30/5 + 25/5 + 35/5 (dan has no age → null skipped) = 18
    assert(agg == 18.0)
  }

  test("over a GraphExport layout, (:X) prunes partition directories") {
    val verts = Seq(("A:1", "A", """{"v":1}"""), ("B:9", "B", "{}"))
      .toDF("id", "label", "props")
    val edges = Seq(("A:1", "B:9", "REL")).toDF("src", "dst", "rel")
    val root = java.nio.file.Files
      .createTempDirectory("cy_export").toString
    val (vB, eB) =
      graft.operators.GraphExport.exportGraph(spark, verts, edges, root)
    val pg = PropertyGraph(vB,
      eB.withColumn("props", lit(null).cast("string")))
    val q = pg.cypher("MATCH (x:A) RETURN id(x) AS i")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("A:1"))
    val plan = q.queryExecution.executedPlan.toString
    // the label pattern must reach DIRECTORY-level pruning on the
    // label-partitioned layout — the Cypher path inherits the same
    // guarantee Round7Spec proves for the hand-written filter
    assert(plan.contains("PartitionFilters") && plan.contains("label"),
      "Cypher label pattern did not partition-prune:\n" + plan)
  }

  test("UNWIND: one row per element, literal and $param lists") {
    val out = g.cypher(
      """UNWIND ['ann', 'cat', 'ann'] AS w
         MATCH (p:Person) WHERE p.name = w
         RETURN w, count(*) AS n ORDER BY w""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // duplicates in the list are preserved: ann appears twice
    assert(out.toSeq == Seq(("ann", 2L), ("cat", 1L)))
    val viaParam = g.cypher(
      """UNWIND $ages AS a
         MATCH (p:Person) WHERE toInteger(p.age) = a
         RETURN p.name AS name ORDER BY name""",
      Map("ages" -> Seq(25, 30))).collect().map(_.getString(0))
    assert(viaParam.toSeq == Seq("ann", "bob"))
    val e = intercept[IllegalArgumentException](g.cypher(
      "UNWIND $xs AS x RETURN x", Map("xs" -> 7)))
    assert(e.getMessage.contains("list"))
    val e2 = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) WITH p UNWIND [1] AS p RETURN id(p) AS i"))
    assert(e2.getMessage.contains("already declared"))
  }

  test("UNION dedups by name, UNION ALL concatenates, mixing rejected") {
    val u = g.cypher(
      """MATCH (p:Person {name: 'ann'}) RETURN label(p) AS l
         UNION MATCH (q:Person {name: 'bob'}) RETURN label(q) AS l""")
      .collect().map(_.getString(0))
    assert(u.toSeq == Seq("Person")) // deduped
    val ua = g.cypher(
      """MATCH (p:Person {name: 'ann'}) RETURN label(p) AS l
         UNION ALL MATCH (q:Person {name: 'bob'}) RETURN label(q) AS l""")
      .collect().map(_.getString(0))
    assert(ua.toSeq == Seq("Person", "Person"))
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (a:Person) RETURN a.name AS x
         UNION MATCH (b:Person) RETURN b.name AS x
         UNION ALL MATCH (c:Person) RETURN c.name AS x"""))
    assert(e.getMessage.contains("mix"))
  }

  test("Bolt query server: records round-trip, failures are frames") {
    val srv = new graft.cypher.BoltQueryServer(g)
    try {
      val sess = new graft.sinks.bolt.BoltSocketSession(
        srv.host, srv.port, "graft-spec", 5000)
      try {
        val (fields, rows) = sess.query(
          """MATCH (p:Person)-[:LIKES]->(f:Food)
             RETURN p.name AS name, toInteger(p.age) AS age,
                    count(*) AS n ORDER BY name""",
          Map.empty)
        assert(fields == Seq("name", "age", "n"))
        assert(rows == Seq(Seq("ann", 30L, 1L), Seq("bob", 25L, 1L)))
      } finally sess.close()
      // a parse error must surface as a Bolt FAILURE frame, and the
      // connection then enters the failed state (next request IGNORED)
      val bad = new graft.sinks.bolt.BoltSocketSession(
        srv.host, srv.port, "graft-spec", 5000)
      try {
        val e = intercept[graft.sinks.bolt.BoltFailure](
          bad.query("MATCH (a)-[:R*2..1]->(b) RETURN a"))
        assert(e.code.contains("SyntaxError"))
      } finally bad.close()
      // fresh connection still works after another's failure
      val again = new graft.sinks.bolt.BoltSocketSession(
        srv.host, srv.port, "graft-spec", 5000)
      try {
        val (_, rows2) = again.query(
          "MATCH (p:Person {name: $w}) RETURN id(p) AS i", Map("w" -> "cat"))
        assert(rows2 == Seq(Seq("Person:3")))
      } finally again.close()
    } finally srv.close()
  }

  test("catalog entries parse (full Cypher text of Queries54)") {
    // compile-time smoke over the real entry queries: the parser
    // accepts them and the compiled plan resolves against the demo
    // graph SCHEMA (no data needed — analysis only)
    val tiny = PropertyGraph(
      Seq(("Customer:1", "Customer", """{"name":"x","acctbal":1.0,"mktsegment":"BUILDING"}"""))
        .toDF("id", "label", "props"),
      Seq(("Customer:1", "Nation:1", "FROM_NATION", null))
        .toDF("src", "dst", "rel", "props"))
    Seq(
      """MATCH (c:Customer {mktsegment: 'BUILDING'})
         WHERE toFloat(c.acctbal) > 9000.0 AND c.name ENDS WITH '7'
         RETURN c.name AS name, toFloat(c.acctbal) AS acctbal ORDER BY name""",
      """MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)-[:PLACED]->(o:Order)
         WHERE o.orderpriority STARTS WITH '1'
         RETURN n.name AS nation, count(*) AS n_orders,
                min(o.orderdate) AS first_date ORDER BY nation""",
      """MATCH (c:Customer {mktsegment: 'FURNITURE'})
               -[:FROM_NATION|IN_REGION*1..2]->(x)
         RETURN label(x) AS dst, count(*) AS n ORDER BY dst""",
    ).foreach(q => tiny.cypher(q).schema) // analysis must not throw
  }

  // ---- round 11: structured props, collect/keys/properties, escapes

  /** The people graph in the STRUCTURED (map<string,string>) props
    * layout — same data as `g`; the compiler must give identical
    * answers through GetMapValue instead of get_json_object. */
  private lazy val gMap: PropertyGraph = {
    def m(kv: (String, String)*) = kv.toMap
    val v = Seq(
      ("Person:1", "Person", m("name" -> "ann", "age" -> "30")),
      ("Person:2", "Person", m("name" -> "bob", "age" -> "25")),
      ("Person:3", "Person", m("name" -> "cat", "age" -> "35")),
      ("Person:4", "Person", m("name" -> "dan")),
      ("Food:1", "Food", m("name" -> "fig")),
    ).toDF("id", "label", "props")
    val e = Seq(
      ("Person:1", "Person:2", "KNOWS", null),
      ("Person:2", "Person:3", "KNOWS", null),
      ("Person:3", "Person:1", "KNOWS", null),
      ("Person:1", "Food:1", "LIKES", Map("stars" -> "5")),
      ("Person:2", "Food:1", "LIKES", Map("stars" -> "2")),
    ).toDF("src", "dst", "rel", "props")
    PropertyGraph(v, e)
  }

  test("map-props graph: identical answers through GetMapValue") {
    val q =
      """MATCH (p:Person {name: 'ann'})-[l:LIKES]->(f:Food)
         WHERE toInteger(l.stars) >= 3
         RETURN f.name AS food, toInteger(l.stars) AS stars"""
    val viaJson = g.cypher(q).collect().map(r => (r.getString(0), r.getLong(1)))
    val viaMap = gMap.cypher(q).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaJson.toSeq == Seq(("fig", 5L)))
    assert(viaMap.toSeq == viaJson.toSeq)
    // missing key reads null on both layouts (dan has no age)
    val q2 = """MATCH (p:Person) WHERE p.age IS NULL RETURN p.name AS n"""
    assert(gMap.cypher(q2).collect().map(_.getString(0)).toSeq ==
           g.cypher(q2).collect().map(_.getString(0)).toSeq)
  }

  test("map-props prop equality folds through CreateMap and pushes down") {
    // on a parquet-backed map-props graph, {k: v} must reach the scan
    // as a pushed filter over the MAP column's element — the whole
    // point of the structured layout vs the JSON string
    val dir = java.nio.file.Files.createTempDirectory("cy_mapprops").toString
    gMap.vertices.write.mode("overwrite").parquet(s"$dir/v")
    val pg = PropertyGraph(spark.read.parquet(s"$dir/v"), gMap.edges)
    val q = pg.cypher("MATCH (p:Person {name: 'cat'}) RETURN id(p) AS i")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("Person:3"))
    val plan = q.queryExecution.executedPlan.toString
    // GetMapValue is not a parquet-pushable predicate, but it must at
    // least stay OUT of the interpreted JSON path: no get_json_object
    assert(!plan.contains("get_json_object"), plan)
    // and on the inline (non-parquet) form the optimizer folds
    // map(k,v)[k] → v entirely: no element_at/GetMapValue remains
    val folded = graft.cypher.PropertyGraph(
      Seq(("Person:9", "Person", Map("name" -> "zed")))
        .toDF("id", "label", "props"),
      gMap.edges.limit(0))
      .cypher("MATCH (p:Person {name: 'zed'}) RETURN id(p) AS i")
    assert(folded.collect().map(_.getString(0)).toSeq == Seq("Person:9"))
  }

  test("collect() aggregates to a SORTED list; DISTINCT dedups") {
    val out = g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q:Person)
         RETURN collect(q.name) AS names""")
      .collect().head.getSeq[String](0)
    assert(out == Seq("ann", "bob", "cat")) // sorted, deterministic
    val dist = g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         RETURN collect(DISTINCT f.name) AS foods""")
      .collect().head.getSeq[String](0)
    assert(dist == Seq("fig"))
    // per-group collect through WITH, then list-aware size()
    val grouped = g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q:Person)
         WITH p.name AS who, collect(q.name) AS known
         RETURN who, size(known) AS n, toString(known) AS ks
         ORDER BY who""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(grouped.toSeq == Seq(
      ("ann", 1L, """["bob"]"""),
      ("bob", 1L, """["cat"]"""),
      ("cat", 1L, """["ann"]""")))
  }

  test("nested aggregates: scalar expressions over agg results") {
    // openCypher allows expressions over aggregates in items —
    // toString(collect(x)), sum(a)*2 — compiled inside agg()
    val out = g.cypher(
      """MATCH (p:Person)-[:KNOWS]->(q:Person)
         RETURN toString(collect(DISTINCT q.name)) AS ks,
                sum(toInteger(q.age)) * 2 AS dbl""")
      .collect().head
    assert(out.getString(0) == """["ann","bob","cat"]""")
    assert(out.getLong(1) == 180L) // (30+25+35)*2
    // per-group nested agg through WITH
    val grouped = g.cypher(
      """MATCH (p:Person)-[:LIKES]->(f:Food)
         WITH f.name AS food, size(collect(p.name)) AS fans
         RETURN food, fans""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grouped.toSeq == Seq(("fig", 2L)))
    // aggregates in WHERE are rejected (by Spark's analyzer, loudly)
    intercept[Exception](g.cypher(
      "MATCH (p:Person) WHERE count(*) > 1 RETURN p.name AS n").collect())
  }

  test("keys()/properties() on both layouts; toString renders JSON") {
    // keys: sorted, both layouts
    val kJson = g.cypher(
      """MATCH (p:Person {name: 'ann'}) RETURN toString(keys(p)) AS ks""")
      .collect().head.getString(0)
    val kMap = gMap.cypher(
      """MATCH (p:Person {name: 'ann'}) RETURN toString(keys(p)) AS ks""")
      .collect().head.getString(0)
    assert(kJson == """["age","name"]""")
    assert(kMap == kJson)
    // properties: map layout renders canonical JSON via toString; the
    // JSON layout returns the stored string as-is
    val pMap = gMap.cypher(
      """MATCH (p:Person {name: 'bob'}) RETURN toString(properties(p)) AS ps""")
      .collect().head.getString(0)
    assert(pMap == """{"name":"bob","age":"25"}""")
    val pJson = g.cypher(
      """MATCH (p:Person {name: 'bob'}) RETURN properties(p) AS ps""")
      .collect().head.getString(0)
    assert(pJson == """{"name":"bob","age":25}""")
    // edge containers too
    val eKeys = gMap.cypher(
      """MATCH (p:Person)-[l:LIKES]->(f:Food)
         RETURN DISTINCT toString(keys(l)) AS ks""")
      .collect().map(_.getString(0))
    assert(eKeys.toSeq == Seq("""["stars"]"""))
  }

  test("lexer: string escapes and doubled quotes") {
    import graft.cypher.CypherAst.{Lit, NodePat}
    def propOf(q: String): Any =
      CypherParser.parse(q).matches.head.paths.head.nodes.head
        .props("name").asInstanceOf[Lit].value
    assert(propOf("""MATCH (p {name: 'it\'s'}) RETURN p""") == "it's")
    assert(propOf("""MATCH (p {name: "say \"hi\""}) RETURN p""") == "say \"hi\"")
    assert(propOf("""MATCH (p {name: 'it''s'}) RETURN p""") == "it's")
    assert(propOf("""MATCH (p {name: 'a\\b'}) RETURN p""") == "a\\b")
    assert(propOf("""MATCH (p {name: 'x\ny'}) RETURN p""") == "x\ny")
    val e = intercept[IllegalArgumentException](
      CypherParser.parse("""MATCH (p {name: 'bad\q'}) RETURN p"""))
    assert(e.getMessage.contains("escape"))
    val e2 = intercept[IllegalArgumentException](
      CypherParser.parse("MATCH (p {name: 'unterminated}) RETURN p"))
    assert(e2.getMessage.contains("unterminated"))
  }

  test("trail semantics hold BETWEEN var-length and fixed hops") {
    // KNOWS cycle 1→2→3→1: for the fixed hop (a)-[:KNOWS]->(b), the
    // 3-hop expansion from b walks the full cycle and would REUSE the
    // fixed edge — openCypher excludes those rows. Per fixed edge the
    // legal chains are length 1 and 2 only: 3 × 2 = 6 rows (an
    // engine enforcing uniqueness only inside the chain returns 9).
    val n = g.cypher(
      """MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS*1..3]->(c:Person)
         RETURN count(*) AS n""").collect().head.getLong(0)
    assert(n == 6L)
    // and between two var-length chains: a self-loop satisfies both
    // 1-hop chains only by reusing the same edge — zero rows
    val loop = PropertyGraph(
      Seq(("S:1", "S", "{}")).toDF("id", "label", "props"),
      Seq(("S:1", "S:1", "R")).toDF("src", "dst", "rel"))
    val m = loop.cypher(
      """MATCH (x:S)-[:R*1..1]->(y:S)-[:R*1..1]->(z:S)
         RETURN count(*) AS n""").collect().head.getLong(0)
    assert(m == 0L)
    // disjoint type sets still skip the condition (no false negatives)
    val mixed = g.cypher(
      """MATCH (a:Person)-[:KNOWS]->(b:Person)-[:LIKES*1..1]->(f)
         RETURN count(*) AS n""").collect().head.getLong(0)
    assert(mixed == 2L) // 1→2 then 2-LIKES->fig; 3→1 then 1-LIKES->fig
  }

  test("labels() list, exists(n.prop), stats aggregates") {
    // labels(): openCypher's list form — 1-element on our graphs
    val ls = g.cypher(
      "MATCH (p:Person {name: 'ann'}) RETURN toString(labels(p)) AS ls")
      .collect().head.getString(0)
    assert(ls == """["Person"]""")
    // legacy exists(n.prop) == n.prop IS NOT NULL (dan has no age)
    val withAge = g.cypher(
      """MATCH (p:Person) WHERE exists(p.age)
         RETURN count(*) AS n""").collect().head.getLong(0)
    assert(withAge == 3L)
    // stDev / stDevP over ages 30, 25, 35
    val sd = g.cypher(
      """MATCH (p:Person)
         RETURN stDev(toInteger(p.age)) AS s, stDevP(toInteger(p.age)) AS sp""")
      .collect().head
    assert(math.abs(sd.getDouble(0) - 5.0) < 1e-9)
    assert(math.abs(sd.getDouble(1) - math.sqrt(50.0 / 3)) < 1e-9)
    // percentileCont interpolates; percentileDisc returns an element
    val pc = g.cypher(
      """MATCH (p:Person)
         RETURN percentileCont(toInteger(p.age), 0.5) AS med,
                percentileDisc(toInteger(p.age), 0.5) AS dmed,
                percentileDisc(toInteger(p.age), 1.0) AS dmax""")
      .collect().head
    assert(pc.getDouble(0) == 30.0)
    assert(pc.getLong(1) == 30L)
    assert(pc.getLong(2) == 35L)
    // two-arg validation is loud
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (p) RETURN percentileCont(p.age) AS x"))
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (p) RETURN sum(p.age, 0.5) AS x"))
  }

  test("undirected edges: union of both orientations, never an OR-join") {
    // ann's KNOWS edges regardless of direction: out 1→2 (bob) and
    // in 3→1 (cat)
    val out = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS]-(b)
         RETURN b.name AS who ORDER BY who""")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("bob", "cat"))
    // every stored KNOWS edge is traversable both ways: 3 edges → 6
    val n = g.cypher(
      "MATCH (a:Person)-[:KNOWS]-(b:Person) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 6L)
    // the edge variable keeps its STORED identity under either
    // traversal: type() works and the triple is orientation-free
    val t = g.cypher(
      """MATCH (a:Person {name: 'cat'})-[r]-(b)
         RETURN type(r) AS t, count(*) AS n ORDER BY t""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(t.toSeq == Seq(("KNOWS", 2L))) // 2→3 in, 3→1 out
    // bare `--` parses as an anonymous undirected hop
    val bare = g.cypher(
      "MATCH (a:Person {name: 'ann'})--(b) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(bare == 3L) // bob, cat via KNOWS; fig via LIKES
    // a self-loop is matched ONCE, not twice (openCypher: one row per
    // relationship)
    val v2 = Seq(("A:1", "A", "{}"), ("A:2", "A", "{}"))
      .toDF("id", "label", "props")
    val e2 = Seq(("A:1", "A:1", "R"), ("A:1", "A:2", "R"))
      .toDF("src", "dst", "rel")
    val loops = PropertyGraph(v2, e2).cypher(
      "MATCH (a:A)-[:R]-(b) RETURN id(a) AS a, id(b) AS b ORDER BY a, b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(loops.toSeq ==
      Seq(("A:1", "A:1"), ("A:1", "A:2"), ("A:2", "A:1")))
  }

  test("open-range var-length: [*] / [*..n] / [*m..] / [*n]") {
    def range(q: String) = CypherParser.parse(q)
      .matches.head.paths.head.edges.head.range
    assert(range("MATCH (a)-[:R*]->(b) RETURN id(a) AS i") ==
      Some((1, None)))
    assert(range("MATCH (a)-[:R*..4]->(b) RETURN id(a) AS i") ==
      Some((1, Some(4))))
    assert(range("MATCH (a)-[:R*2..]->(b) RETURN id(a) AS i") ==
      Some((2, None)))
    assert(range("MATCH (a)-[:R*3]->(b) RETURN id(a) AS i") ==
      Some((3, Some(3))))
    // semantics over the KNOWS cycle 1→2→3→1 from ann, trail rules:
    // depth 1 = bob, 2 = cat, 3 = ann, then the edges are exhausted —
    // the open range converges at the cycle length (fixpoint, no cap)
    val all = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS*]->(b)
         RETURN b.name AS who ORDER BY who""")
      .collect().map(_.getString(0))
    assert(all.toSeq == Seq("ann", "bob", "cat"))
    val upTo2 = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS*..2]->(b)
         RETURN b.name AS who ORDER BY who""")
      .collect().map(_.getString(0))
    assert(upTo2.toSeq == Seq("bob", "cat"))
    val from2 = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS*2..]->(b)
         RETURN b.name AS who ORDER BY who""")
      .collect().map(_.getString(0))
    assert(from2.toSeq == Seq("ann", "cat"))
    val exactly2 = g.cypher(
      """MATCH (a:Person {name: 'ann'})-[:KNOWS*2]->(b)
         RETURN b.name AS who""")
      .collect().map(_.getString(0))
    assert(exactly2.toSeq == Seq("cat"))
    // undirected var-length: from bob at depth exactly 2, both
    // orientations per hop, trail rules forbid re-walking an edge —
    // 2→3 then 3→1 (ann), 1→2 then 1's other edges: 3→1 (cat)… each
    // simple 2-path lands on the remaining cycle member
    val und2 = g.cypher(
      """MATCH (a:Person {name: 'bob'})-[:KNOWS*2]-(b)
         RETURN b.name AS who ORDER BY who""")
      .collect().map(_.getString(0))
    assert(und2.toSeq == Seq("ann", "cat"))
  }

  test("exists() variables stay local to the predicate") {
    // the edge/path names bound inside exists() must NOT leak into
    // the outer scope: a later reference is the compiler's own
    // unbound-variable error, not a Spark AnalysisException
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (p:Person)
         WHERE exists((p)-[r:KNOWS]->(q:Person))
         RETURN type(r) AS t"""))
    assert(e.getMessage.contains("not a relationship variable") ||
           e.getMessage.contains("unbound"), e.getMessage)
  }

  // ---- round 15: lambda forms + scalar tail ------------------------

  test("list comprehension, reduce, quantifiers") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN [x IN [1, 2, 3, 4] WHERE x > 1 | x * 2] AS comp,
                [x IN [1, 2, 3] | x + 10] AS projOnly,
                [x IN [1, 2, 3, 4] WHERE x % 2 = 0] AS filterOnly,
                reduce(t = 0, x IN [1, 2, 3, 4] | t + x) AS total,
                reduce(s = 1, x IN [2, 3] | s * x) AS product,
                all(x IN [1, 2, 3] WHERE x > 0) AS allPos,
                any(x IN [1, 2, 3] WHERE x = 2) AS hasTwo,
                none(x IN [1, 2, 3] WHERE x > 5) AS noneOver,
                single(x IN [1, 2, 3] WHERE x = 2) AS oneTwo,
                single(x IN [2, 2, 3] WHERE x = 2) AS twoTwos""")
      .collect().head
    assert(r.getSeq[Long](0) == Seq(4L, 6L, 8L))
    assert(r.getSeq[Long](1) == Seq(11L, 12L, 13L))
    assert(r.getSeq[Long](2) == Seq(2L, 4L))
    assert(r.getLong(3) == 10L)
    assert(r.getLong(4) == 6L)
    assert((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
      r.getBoolean(8), r.getBoolean(9)) ==
      ((true, true, true, true, false)))
  }

  test("lambda variables shadow frame variables and restore on exit") {
    // `p` inside the comprehension is the lambda element, NOT the
    // matched node; after the bracket it is the node again
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN [p IN [5, 6] | p + 1] AS shadowed, p.name AS name""")
      .collect().head
    assert(r.getSeq[Long](0) == Seq(6L, 7L))
    assert(r.getString(1) == "ann")
    // nested: inner x shadows outer x per element
    val n = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN [x IN [1, 2] | reduce(t = 0, x IN [10, 20] | t + x) + x]
                  AS nested""")
      .collect().head
    assert(n.getSeq[Long](0) == Seq(31L, 32L))
  }

  test("pattern comprehensions: RETURN, WHERE, empty list, WITH, nesting") {
    val r = g.cypher(
      """MATCH (p:Person)
         RETURN p.name AS name,
                [(p)-[:KNOWS]->(q) | q.name] AS knows,
                [(p)-[r:LIKES]->(f) WHERE toInteger(r.stars) >= 5 | f.name]
                  AS faves,
                size([(p)-[:LIKES]->(f2) | f2.name]) AS n_likes
         ORDER BY name""").collect()
    val rows = r.map(x => (x.getString(0), x.getSeq[String](1).toList,
      x.getSeq[String](2).toList, x.getLong(3)))
    assert(rows.toList == List(
      ("ann", List("bob"), List("fig"), 1L),
      ("bob", List("cat"), Nil, 1L),
      ("cat", List("ann"), Nil, 0L),
      ("dan", Nil, Nil, 0L)))
    // WITH position: the comprehension projects through the pipeline
    val w = g.cypher(
      """MATCH (p:Person)
         WITH p.name AS name, [(p)-[:KNOWS]->(q) | q.name] AS ks
         WHERE size(ks) > 0
         RETURN name, toString(ks) AS ks_json ORDER BY name""").collect()
    assert(w.map(x => (x.getString(0), x.getString(1))).toList == List(
      ("ann", """["bob"]"""), ("bob", """["cat"]"""),
      ("cat", """["ann"]""")))
    // unanchored comprehension fails loudly
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) RETURN [(a)-[:KNOWS]->(b) | b.name] AS x"))
    assert(e.getMessage.contains("anchor"), e.getMessage)
  }

  test("map projections: picks, computed entries, star, WITH passthrough") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN toString(p {.name, .age, upper: toUpper(p.name)}) AS m""")
      .collect().head.getString(0)
    assert(r == """{"name":"ann","age":"30","upper":"ANN"}""")
    // through WITH: the alias is map-typed, `.k` access works after
    val w = g.cypher(
      """MATCH (p:Person {name: 'bob'})
         WITH p {.name} AS m
         RETURN m.name AS n""").collect().head.getString(0)
    assert(w == "bob")
    // `.*` needs the structured layout — loud on the JSON demo graph
    val e = intercept[IllegalArgumentException](g.cypher(
      "MATCH (p:Person) RETURN p {.*} AS m"))
    assert(e.getMessage.contains("map-typed"), e.getMessage)
    // `.*` on a map-layout graph; explicit entries override the copy
    val mv = Seq(("N:1", "N", Map("a" -> "1", "b" -> "2")))
      .toDF("id", "label", "props")
    val me = Seq.empty[(String, String, String)].toDF("src", "dst", "rel")
    val s = PropertyGraph(mv, me)
      .cypher("MATCH (x:N) RETURN toString(x {.*, b: 'X'}) AS m")
      .collect().head.getString(0)
    assert(s == """{"a":"1","b":"X"}""")
  }

  test("pattern comprehension plan: anchor equi-join, never a nested loop") {
    val q = g.cypher(
      """MATCH (p:Person)
         RETURN p.name AS name, [(p)-[:KNOWS]->(x) | x.name] AS ks""")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      "pattern comprehension should join on the anchor ids:\n" + plan)
  }

  test("string + concatenates when a side is statically a string") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN 'Mr ' + p.name AS greet,
                p.name + '!' AS bang,
                'a' + 'b' + p.name AS chain,
                toInteger(p.age) + 1 AS next_age""").collect().head
    assert(r.getString(0) == "Mr ann")
    assert(r.getString(1) == "ann!")
    assert(r.getString(2) == "abann")
    assert(r.getLong(3) == 31L) // numeric + untouched
  }

  test("simple CASE form desugars to equality branches") {
    val r = g.cypher(
      """MATCH (p:Person)
         RETURN p.name AS name,
                CASE p.name WHEN 'ann' THEN 'first'
                            WHEN 'bob' THEN 'second'
                            ELSE 'other' END AS pos
         ORDER BY name""").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(r.toList == List(("ann", "first"), ("bob", "second"),
      ("cat", "other"), ("dan", "other")))
  }

  test("EXISTS { } / COUNT { } brace subqueries") {
    // EXISTS with an inner WHERE: the filter applies to the pattern
    // rows BEFORE the semi join
    val r = g.cypher(
      """MATCH (p:Person)
         WHERE EXISTS { (p)-[r:LIKES]->(f) WHERE toInteger(r.stars) >= 5 }
         RETURN p.name AS name""").collect().map(_.getString(0))
    assert(r.toSeq == Seq("ann"))
    // NOT EXISTS { MATCH … } — the anti join; full MATCH form
    val n = g.cypher(
      """MATCH (p:Person)
         WHERE NOT EXISTS { MATCH (p)-[:KNOWS]->(q) }
         RETURN p.name AS name""").collect().map(_.getString(0))
    assert(n.toSeq == Seq("dan"))
    // COUNT { … } in RETURN: sugar for size of a pattern comprehension
    val c = g.cypher(
      """MATCH (p:Person)
         RETURN p.name AS name, COUNT { (p)-[:LIKES]->(f) } AS likes
         ORDER BY name""").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(c.toList == List(
      ("ann", 1L), ("bob", 1L), ("cat", 0L), ("dan", 0L)))
  }

  test("scalar tail: sqrt/floor/ceil/sign/left/right/reverse/trim/toBoolean") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN sqrt(16.0) AS root, floor(2.7) AS fl, ceil(2.1) AS ce,
                sign(-3) AS sg, left('ALGERIA', 3) AS l3,
                right('ALGERIA', 2) AS r2, right('IA', 9) AS rclamp,
                reverse('abc') AS rev, ltrim('  x ') AS lt,
                rtrim('  x ') AS rt, toBoolean('true') AS tb,
                toBoolean('nope') AS nb""")
      .collect().head
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0)
    assert(r.getLong(3) == -1L)
    assert(r.getString(4) == "ALG" && r.getString(5) == "IA")
    assert(r.getString(6) == "IA")
    assert(r.getString(7) == "cba")
    assert(r.getString(8) == "x " && r.getString(9) == "  x")
    assert(r.getBoolean(10))
    assert(r.isNullAt(11))
  }

  test("toBoolean is strict true/false, not Spark's extended cast") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         RETURN toBoolean('TRUE') AS t, toBoolean('False') AS f,
                toBoolean('1') AS one, toBoolean('yes') AS yes,
                toBoolean('t') AS tt""").collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // Spark's boolean cast accepts these; Neo4j's toBoolean does not
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("path variable: fixed-length binding projects nodes/rels/length") {
    val r = g.cypher(
      """MATCH p = (a:Person {name: 'ann'})-[:KNOWS]->(b)
         RETURN length(p) AS len, nodes(p) AS ns, relationships(p) AS rs""")
      .collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[String](1) == Seq("Person:1", "Person:2"))
    assert(r.getSeq[String](2) == Seq("Person:1-[KNOWS]->Person:2"))
  }

  test("path variable: var-length binding, per-depth node/rel lists") {
    val rows = g.cypher(
      """MATCH p = (a:Person {name: 'ann'})-[:KNOWS*1..2]->(b)
         RETURN length(p) AS len, nodes(p) AS ns, relationships(p) AS rs,
                b.name AS who
         ORDER BY len""").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getSeq[String](1) == Seq("Person:1", "Person:2"))
    assert(rows(0).getString(3) == "bob")
    assert(rows(1).getLong(0) == 2L)
    assert(rows(1).getSeq[String](1) ==
      Seq("Person:1", "Person:2", "Person:3"))
    assert(rows(1).getSeq[String](2) == Seq(
      "Person:1-[KNOWS]->Person:2", "Person:2-[KNOWS]->Person:3"))
    assert(rows(1).getString(3) == "cat")
  }

  test("path variable: trail dedup bounds the open range; list fns compose") {
    // the KNOWS cycle: ann→bob, ann→bob→cat, ann→bob→cat→ann; a 4th
    // hop would re-walk edge 1→2 — trail uniqueness stops it
    val rows = g.cypher(
      """MATCH p = (a:Person {name: 'ann'})-[:KNOWS*]->(x)
         RETURN length(p) AS len, size(nodes(p)) AS nn,
                head(nodes(p)) AS first, last(nodes(p)) AS lastn
         ORDER BY len""").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // size(nodes(p)) = length(p) + 1, start is always the anchor
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 1))
    assert(rows.forall(_.getString(2) == "Person:1"))
    assert(rows.last.getString(3) == "Person:1") // the cycle closes
  }

  test("path variable: mixed fixed + var-length hops in one binding") {
    val r = g.cypher(
      """MATCH p = (a:Person {name: 'ann'})-[:KNOWS*1..1]->(b)-[:LIKES]->(f)
         RETURN length(p) AS len, nodes(p) AS ns, relationships(p) AS rs""")
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[String](1) == Seq("Person:1", "Person:2", "Food:1"))
    assert(r.getSeq[String](2) == Seq(
      "Person:1-[KNOWS]->Person:2", "Person:2-[LIKES]->Food:1"))
  }

  test("path variable error surface: bare p and non-path vars stay loud") {
    val bare = intercept[IllegalArgumentException](g.cypher(
      """MATCH p = (a:Person {name: 'ann'})-[:KNOWS]->(b) RETURN p"""))
    assert(bare.getMessage.contains("nodes(p)"))
    val notPath = intercept[IllegalArgumentException](g.cypher(
      """MATCH (a:Person) RETURN nodes(a) AS ns"""))
    assert(notPath.getMessage.contains("not a path binding"))
  }

  // diamond: two equal-length R-paths a→d (via b, via c) — the tie
  // case shortestPath must break deterministically
  private lazy val diamond: PropertyGraph = {
    val v = Seq(("X:a", "X", "{}"), ("X:b", "X", "{}"),
      ("X:c", "X", "{}"), ("X:d", "X", "{}")).toDF("id", "label", "props")
    val e = Seq(("X:a", "X:b", "R", null), ("X:a", "X:c", "R", null),
      ("X:b", "X:d", "R", null), ("X:c", "X:d", "R", null))
      .toDF("src", "dst", "rel", "props")
    PropertyGraph(v, e)
  }

  test("shortestPath binds a real path: nodes/relationships/length") {
    val rows = g.cypher(
      """MATCH p = shortestPath((a:Person {name: 'ann'})-[:KNOWS*1..3]->(b))
         RETURN id(b) AS dst, length(p) AS len, nodes(p) AS ns,
                relationships(p) AS rs
         ORDER BY dst""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("Person:1", 3L), ("Person:2", 1L), ("Person:3", 2L)))
    val toBob = rows(1)
    assert(toBob.getSeq[String](2) == Seq("Person:1", "Person:2"))
    assert(toBob.getSeq[String](3) == Seq("Person:1-[KNOWS]->Person:2"))
    val toCat = rows(2)
    assert(toCat.getSeq[String](2) ==
      Seq("Person:1", "Person:2", "Person:3"))
  }

  test("shortestPath ties break to the lexicographically smallest path") {
    val r = diamond.cypher(
      """MATCH p = shortestPath((s:X)-[:R*1..3]->(t))
         WHERE id(s) = 'X:a' AND id(t) = 'X:d'
         RETURN length(p) AS len, nodes(p) AS ns""").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 2L)
    // via b < via c in array order — the deterministic representative
    assert(r.head.getSeq[String](1) == Seq("X:a", "X:b", "X:d"))
  }

  test("allShortestPaths keeps every min-length path") {
    val rows = diamond.cypher(
      """MATCH p = allShortestPaths((s:X)-[:R*1..3]->(t))
         WHERE id(s) = 'X:a' AND id(t) = 'X:d'
         RETURN length(p) AS len, nodes(p) AS ns""").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(0) == 2L))
    assert(rows.map(_.getSeq[String](1)).toSet == Set(
      Seq("X:a", "X:b", "X:d"), Seq("X:a", "X:c", "X:d")))
  }

  test("duration.between: component map, signed; duration() constructor") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         WITH duration.between('2024-01-01T00:00:00',
                               '2024-01-02T03:04:05') AS d,
              duration.between('2024-01-02', '2024-01-01') AS neg,
              duration({days: 1, hours: 2, minutes: 3}) AS w
         RETURN d.days AS dd, d.hours AS dh, d.minutes AS dm,
                d.seconds AS ds, d.totalSeconds AS dt,
                neg.days AS nd, neg.totalSeconds AS nt,
                w.totalSeconds AS wt, w.hours AS wh""").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 3L, 4L, 5L)))
    assert(r.getLong(4) == 97445L)
    assert(r.getLong(5) == -1L && r.getLong(6) == -86400L)
    assert(r.getLong(7) == 93780L && r.getLong(8) == 2L)
  }

  test("duration.between over date-typed strings and bare dates") {
    val r = g.cypher(
      """MATCH (p:Person {name: 'ann'})
         WITH duration.between('2024-02-27', '2024-03-01T06:30:00') AS d
         RETURN d.days AS days, d.hours AS hours, d.minutes AS mins""")
      .collect().head
    // 2024 is a leap year: feb 27 → mar 1 is 3 days, plus 6:30
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 6L, 30L)))
  }

  test("WITH rebinding a map alias to a scalar clears map semantics") {
    // positive: a map alias survives re-projection (`WITH m`)
    val ok = g.cypher(
      """MATCH (n:Person {name: 'ann'})
         WITH n {.name} AS m
         WITH m
         RETURN m.name AS who""").collect().head
    assert(ok.getString(0) == "ann")
    // negative: scope 2 REBINDS m to a scalar — `m.name` must fail as
    // unbound/clean, not compile as map access on the stale column
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (n:Person {name: 'ann'})
         WITH n {.name} AS m
         WITH m.name AS m
         RETURN m.name AS who"""))
    assert(e.getMessage.contains("unbound"))
  }

  test("EXISTS { … WHERE … } rejects outer correlation cleanly") {
    val e = intercept[IllegalArgumentException](g.cypher(
      """MATCH (a:Person), (f:Food)
         WHERE EXISTS { (a)-[:KNOWS]->(b) WHERE b.name = f.name }
         RETURN a.name AS name"""))
    assert(e.getMessage.contains("not bound in the pattern"))
    // pattern-local + shared references stay fine
    val ok = g.cypher(
      """MATCH (a:Person)
         WHERE EXISTS { (a)-[r:KNOWS]->(b) WHERE b.name = 'cat' }
         RETURN a.name AS name ORDER BY name""").collect()
    assert(ok.map(_.getString(0)).toSeq == Seq("bob"))
  }

  test("catalog procedures: labels/relTypes/propertyKeys/schema triples") {
    val store = new graft.cypher.GraphStore(g)
    assert(store.procLabels == Seq("Food", "Person"))
    assert(store.procRelationshipTypes == Seq("KNOWS", "LIKES"))
    // JSON-props layout: json_object_keys path; stars is an EDGE key
    assert(store.procPropertyKeys == Seq("age", "name", "stars"))
    assert(store.procSchemaTriples == Seq(
      ("Person", "KNOWS", "Person"), ("Person", "LIKES", "Food")))
    val (vf, vr) = store.procedureRows("db.schema.visualization")
    assert(vf == Seq("nodes", "relationships") && vr.length == 1)
    assert(vr.head(1) == Seq("(:Person)-[:KNOWS]->(:Person)",
      "(:Person)-[:LIKES]->(:Food)"))
    // a registered-only label joins the catalog before its first row
    store.registerConstraint(graft.cypher.CypherAst.ConstraintDdl(
      name = "", ifNotExists = false, label = "Robot", keys = Seq("rid")))
    assert(store.procLabels == Seq("Food", "Person", "Robot"))
  }

  test("parseProcedureCall: forms and non-matches") {
    import CypherParser.parseProcedureCall
    assert(parseProcedureCall("CALL db.labels()") == Some("db.labels"))
    assert(parseProcedureCall("call db.labels") == Some("db.labels"))
    assert(parseProcedureCall("CALL db.labels() YIELD label;") ==
      Some("db.labels"))
    assert(parseProcedureCall("CALL db.relationshipTypes()") ==
      Some("db.relationshipTypes"))
    assert(parseProcedureCall("CALL db.propertyKeys") ==
      Some("db.propertyKeys"))
    assert(parseProcedureCall("CALL db.schema.visualization()") ==
      Some("db.schema.visualization"))
    assert(parseProcedureCall(
      "CALL db.labels() YIELD label RETURN label") == Some("db.labels"))
    assert(parseProcedureCall("CALL dbms.components()") ==
      Some("dbms.components"))
    assert(parseProcedureCall("CALL { MATCH (n) RETURN n }").isEmpty)
    assert(parseProcedureCall("MATCH (n) RETURN n").isEmpty)
    assert(parseProcedureCall("CALL db.indexes()").isEmpty)
  }
}
