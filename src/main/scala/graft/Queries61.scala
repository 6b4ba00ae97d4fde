package graft

import Queries.Q

/** Batch 61 (round 15, session 2): the Cypher expression-surface
  * tail a Neo4j-trained consumer expects beyond the reference's own
  * corpus — list comprehensions, reduce(), the list quantifiers, and
  * the scalar math/string builtins. Everything compiles to codegen'd
  * Spark builtins (`filter`/`transform`/`aggregate`/`forall`/
  * `exists` higher-order functions for the lambda forms) — zero
  * UDFs; see cypher/CypherCompiler.scala (ListComp/Reduce/Quant).
  */
object Queries61 {

  /** List comprehension `[x IN l WHERE p | e]`, `reduce`,
    * `all/any/none/single`, and the scalar tail (sqrt/floor/ceil/
    * sign/left/right/reverse/ltrim/rtrim/toBoolean) over the staged
    * demo graph, with every value mirrored by a closed-form DuckDB
    * expression on `nation`. */
  val cy_expr_suite = Q(
    (s, dir) => Queries54.stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)
         WITH n, toInteger(last(split(id(n), ':'))) AS k
         RETURN n.name AS name,
                toString([x IN range(0, k) WHERE x % 2 = 0 | x * 10]) AS evens_x10,
                reduce(t = 0, x IN range(0, k) | t + x) AS tri,
                all(x IN range(0, k) WHERE x >= 0) AS all_nonneg,
                any(x IN range(0, k) WHERE x = 3) AS has_three,
                none(x IN range(0, k) WHERE x > k) AS none_over,
                single(x IN range(0, k) WHERE x = 0) AS single_zero,
                sqrt(toFloat(k)) AS root,
                floor(toFloat(k) / 2.0) AS half_floor,
                ceil(toFloat(k) / 2.0) AS half_ceil,
                sign(k - 10) AS sign_v,
                left(n.name, 3) AS l3,
                right(n.name, 2) AS r2,
                reverse(n.name) AS rev,
                ltrim($padded) AS lt,
                rtrim($padded) AS rt,
                toBoolean(CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END) AS even_b
         ORDER BY name""",
      Map("padded" -> "  padded  ")),
    Some("""SELECT n_name AS name,
        CAST(to_json([CAST(x * 10 AS BIGINT) FOR x IN range(0, CAST(n_nationkey AS BIGINT) + 1) IF x % 2 = 0]) AS VARCHAR) AS evens_x10,
        CAST((n_nationkey * (n_nationkey + 1)) // 2 AS BIGINT) AS tri,
        TRUE AS all_nonneg,
        n_nationkey >= 3 AS has_three,
        TRUE AS none_over,
        TRUE AS single_zero,
        sqrt(CAST(n_nationkey AS DOUBLE)) AS root,
        floor(n_nationkey / 2.0) AS half_floor,
        ceil(n_nationkey / 2.0) AS half_ceil,
        CAST(sign(n_nationkey - 10) AS BIGINT) AS sign_v,
        left(n_name, 3) AS l3,
        right(n_name, 2) AS r2,
        reverse(n_name) AS rev,
        'padded  ' AS lt,
        '  padded' AS rt,
        (n_nationkey % 2 = 0) AS even_b
      FROM nation ORDER BY name"""))

  /** Pattern comprehension `[(c)-[:R]->(n) WHERE … | e]` — the
    * per-row collected subquery (every Neo4j consumer's "children
    * inline" idiom). Anchored at the Nation row; nations with no
    * qualifying customer keep the EMPTY list (left-join contract).
    * The list ships as canonical JSON (driver checker cannot hash
    * list columns) in the engine's canonical ascending order. */
  val cy_pattern_comp = Q(
    (s, dir) => Queries54.stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)
         RETURN n.name AS name,
                toString([(c:Customer)-[:FROM_NATION]->(n)
                          WHERE toFloat(c.acctbal) >= 9900.0 | c.name])
                  AS rich,
                size([(c:Customer)-[:FROM_NATION]->(n)
                      WHERE toFloat(c.acctbal) >= 9900.0 | c.name])
                  AS n_rich
         ORDER BY name"""),
    Some("""SELECT n_name AS name,
        COALESCE(CAST(to_json(list_sort(
          list(c_name) FILTER (WHERE c_name IS NOT NULL))) AS VARCHAR),
          '[]') AS rich,
        CAST(COUNT(c_name) AS BIGINT) AS n_rich
      FROM nation LEFT JOIN customer
        ON c_nationkey = n_nationkey
       AND CAST(c_acctbal AS DOUBLE) >= 9900.0
      GROUP BY n_name ORDER BY name"""))

  /** Neo4j-5 brace subqueries: `EXISTS { … WHERE … }` as a WHERE
    * conjunct (filtered semi join — the inner predicate applies to
    * the pattern rows BEFORE the join) and `COUNT { … }` in RETURN
    * (sugar for the size of a 1-projecting pattern comprehension). */
  val cy_subquery_exists = Q(
    (s, dir) => Queries54.stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)
         WHERE EXISTS { (c:Customer)-[:FROM_NATION]->(n)
                        WHERE toFloat(c.acctbal) >= 9900.0 }
         RETURN n.name AS name,
                COUNT { (c2:Customer)-[:FROM_NATION]->(n)
                        WHERE toFloat(c2.acctbal) >= 9900.0 } AS n_rich
         ORDER BY name"""),
    Some("""SELECT n_name AS name, CAST(COUNT(*) AS BIGINT) AS n_rich
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE CAST(c_acctbal AS DOUBLE) >= 9900.0
      GROUP BY 1 ORDER BY name"""))

  /** Map projection `n {.k, alias: expr}` — the per-row shaped-map
    * idiom; values are strings (the engine's prop model), the map
    * ships as canonical JSON in ITEM order (both engines preserve
    * construction order). */
  val cy_map_projection = Q(
    (s, dir) => Queries54.stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)
         RETURN n.name AS name,
                toString(n {.name, key: toInteger(last(split(id(n), ':')))})
                  AS proj
         ORDER BY name"""),
    Some("""SELECT n_name AS name,
        CAST(json_object('name', n_name,
          'key', CAST(n_nationkey AS VARCHAR)) AS VARCHAR) AS proj
      FROM nation ORDER BY name"""))

  val all: Map[String, Q] = Map(
    "cy_expr_suite" -> cy_expr_suite,
    "cy_pattern_comp" -> cy_pattern_comp,
    "cy_subquery_exists" -> cy_subquery_exists,
    "cy_map_projection" -> cy_map_projection,
  )
}
