package graft.cypher

/** AST for the openCypher READ subset the engine compiles to
  * DataFrame plans ([[CypherCompiler]]).
  *
  * Reference capability: the reference's terminal artifact is a live
  * Neo4j property graph (app/graph_constraints.py:2-133 and every
  * projector's MERGE) whose CONSUMERS query it in Cypher — the one
  * user-facing surface the engine's write-side equivalents
  * (GraphAssembly / GraphExport / CypherSink) did not yet serve. This
  * package closes it: `MATCH … WHERE … RETURN …` over the engine's
  * standard graph shape — vertices `(id, label, props-json)`, edges
  * `(src, dst, rel[, props-json])` — parsed here, compiled to plain
  * Catalyst plans (joins + filters + aggregates) in
  * [[CypherCompiler]]. Nothing is interpreted row-at-a-time: a Cypher
  * query costs exactly what the equivalent hand-written DataFrame
  * program costs.
  *
  * Supported grammar (documented deviations at the bottom):
  *
  * {{{
  * query    := segment+ RETURN (DISTINCT)? item (',' item)*
  *             (ORDER BY oitem (ASC|DESC)? (',' …)*)? (SKIP n)? (LIMIT n)?
  * segment  := matchPart* (WHERE expr)?
  *             (WITH (DISTINCT)? item (',' item)* (ORDER BY …)?
  *              (SKIP n)? (LIMIT n)? (WHERE expr)?)?
  * matchPart:= (OPTIONAL)? MATCH pattern (',' pattern)*
  * pattern  := node (edge node)*
  * node     := '(' var? (':' Label)? propMap? ')'
  * edge     := '-[' var? (':' Rel ('|' Rel)*)? ('*' m '..' n)? propMap? ']->'
  *           | '<-[' …same… ']-'
  * propMap  := '{' key ':' literal (',' key ':' literal)* '}'
  * expr     := boolean algebra (AND OR NOT, parens) over comparisons
  *             (= <> < <= > >=), IS (NOT) NULL, IN [lit, …],
  *             CONTAINS / STARTS WITH / ENDS WITH
  * atom     := var.prop | id(var) | label(var) | toInteger(e) |
  *             toFloat(e) | literal
  * item     := expr (AS alias)? | count(*) | count((DISTINCT)? e) |
  *             sum(e) | min(e) | max(e) | avg(e)
  * }}}
  *
  * Deviations from full openCypher, all deliberate:
  *   - properties are stored as a JSON column, so `v.prop` reads as a
  *     STRING; `toInteger` / `toFloat` (openCypher's own coercion
  *     functions) make numeric typing explicit — the honest contract
  *     for a schema-on-read props column;
  *   - `label(v)` is scalar (the engine's graphs are single-label by
  *     construction — GraphAssembly.vertices), where openCypher's
  *     `labels(v)` returns a list;
  *   - bounded variable-length ranges `*m..n` expand to a union of
  *     fixed-length join chains with openCypher's
  *     relationship-uniqueness (trail) semantics; OPEN ranges
  *     (`[*]`, `[*m..]`) expand by converging iteration — one hop
  *     per level until the frontier is empty (trail uniqueness makes
  *     that finite), so results match openCypher's unbounded
  *     semantics exactly, with no silent hop cap (round 13; the
  *     expansion is data-dependent, so compiling an open range runs
  *     Spark jobs);
  *   - CREATE/MERGE/SET/DELETE parse as WRITE statements
  *     ([[WriteQuery]], executed by [[CypherWrite]]/[[GraphStore]]),
  *     including the `MERGE … RETURN`/`… WITH … RETURN` read
  *     continuations.
  */
object CypherAst {

  // ---- patterns -------------------------------------------------
  /** `(v:Label {k: lit|$param, …})`; every part optional. Anonymous
    * nodes get fresh internal names at parse time so the compiler
    * never special-cases them. */
  final case class NodePat(name: String, label: Option[String],
                           props: Map[String, Expr])

  /** One relationship hop. `types` empty = any type; `range` =
    * Some((m, Some(n))) for `*m..n` (`[*..n]` fills the lower bound
    * with 1; `[*n]` is the fixed length n) and Some((m, None)) for the
    * OPEN forms `[*]` / `[*m..]` — no upper bound: the compiler
    * expands to the trail-semantics FIXPOINT (iterate until the
    * frontier is empty; relationship uniqueness makes every expansion
    * finite), matching openCypher's unbounded semantics instead of a
    * silent hop cap. `out=true` is `-[…]->`, else
    * `<-[…]-`; `undirected=true` is `-[…]-` (matches the stored edge
    * in EITHER direction — compiled as a union of both orientations,
    * never an OR-join; `out` is meaningless then). */
  final case class EdgePat(name: String, types: Seq[String],
                           out: Boolean, range: Option[(Int, Option[Int])],
                           props: Map[String, Expr],
                           undirected: Boolean = false)

  /** A linear pattern `n0 e0 n1 e1 n2 …`. `shortest` = Some(pathVar)
    * for `p = shortestPath((a)-[:R*m..n]->(b))` — exactly one
    * var-length edge, and the pattern yields ONE row per (a, b) pair
    * at the minimum path length (readable via `length(p)`).
    * `pathVar` = Some(p) for the GENERAL binding `p = (a)-[…]->(b)`
    * (round 16): the pattern yields one row per path (trail
    * semantics, like any MATCH), and the binding is readable via
    * `nodes(p)` (node-id list along the traversal), `relationships(p)`
    * (canonical `src-[REL]->dst` triple text per hop — the engine's
    * render of a relationship value; Neo4j returns relationship
    * OBJECTS, and the stored-orientation text is the deterministic
    * engine spelling, same contract as bare-var → id resolution) and
    * `length(p)` (hop count). Mutually exclusive with `shortest`.
    * Round 16: shortestPath bindings project the same three ways —
    * ONE representative per (start, end) pair, the lexicographically
    * smallest (depth, nodes, rels) triple (openCypher returns SOME
    * shortest path; the engine's instance is the deterministic,
    * oracle-pinnable one). `shortestAll` = the `allShortestPaths`
    * form: EVERY path at the pair's minimum length, one row each. */
  final case class PathPat(nodes: Seq[NodePat], edges: Seq[EdgePat],
                           shortest: Option[String] = None,
                           pathVar: Option[String] = None,
                           shortestAll: Boolean = false)

  /** One MATCH clause (possibly OPTIONAL) holding 1+ comma patterns,
    * with ITS OWN trailing WHERE — openCypher attaches WHERE to the
    * preceding MATCH, which matters for OPTIONAL MATCH: the filter
    * applies to the optional side BEFORE the null-extension, so an
    * unmatched (or filtered-out) row keeps its left side with nulls
    * rather than disappearing. */
  final case class MatchPart(paths: Seq[PathPat], optional: Boolean,
                             where: Option[Expr] = None)

  // ---- expressions ----------------------------------------------
  sealed trait Expr
  /** `v.prop` — JSON-props access, string-typed. */
  final case class Prop(v: String, key: String) extends Expr
  /** `id(v)` — the vertex/edge-endpoint id string. */
  final case class Id(v: String) extends Expr
  /** `label(v)` — the vertex label (scalar; see deviations). */
  final case class LabelOf(v: String) extends Expr
  /** Bare `v` in RETURN/count — resolves to `id(v)`. */
  final case class Var(v: String) extends Expr
  /** `length(p)` — hop count of a path binding (shortestPath or a
    * general `p = (a)-[…]->(b)` binding). */
  final case class PathLen(v: String) extends Expr
  /** `nodes(p)` — the node-id list along a general path binding's
    * traversal, start to end (intermediate var-length nodes
    * included). Ids, not node objects: the engine's bare-var
    * resolution contract. */
  final case class PathNodes(v: String) extends Expr
  /** `relationships(p)` — one canonical `src-[REL]->dst` triple text
    * per hop of a general path binding, in traversal order. The
    * STORED orientation is rendered (the triple is the edge's
    * identity), regardless of the arrow direction the pattern
    * traversed — deterministic, and joinable back to the edge
    * table. */
  final case class PathRels(v: String) extends Expr
  final case class Lit(value: Any) extends Expr // String|Long|Double|Boolean|null
  /** `$name` — a query parameter, resolved at compile time from the
    * params map (the reference parameterizes every statement it
    * sends; the read side gets the same contract). */
  final case class Param(name: String) extends Expr
  /** `[lit, lit, …]` — a literal list (UNWIND position). */
  final case class ListLit(vals: Seq[Lit]) extends Expr
  final case class ToInt(e: Expr) extends Expr
  final case class ToFloat(e: Expr) extends Expr
  /** `coalesce(e1, e2, …)` — first non-null, openCypher builtin. */
  final case class Coalesce(es: Seq[Expr]) extends Expr
  /** Scalar string builtins: toLower/toUpper/trim/size (arity 1),
    * substring (2-3, openCypher 0-BASED start), replace (3). */
  final case class StrFn(name: String, args: Seq[Expr]) extends Expr
  /** `type(r)` — the relationship type of an edge variable. */
  final case class TypeOf(v: String) extends Expr
  /** `datetime(e)` / `date(e)` — Neo4j temporal constructors over a
    * $param (the reference sends a component map
    * {year,month,day,hour,minute,second[,timezone]},
    * app/utils.py:45-57, in MERGE patterns and SET values) or an ISO
    * string. The engine's props are strings, so these render the
    * CANONICAL ISO text at compile time (params resolve at compile
    * time) — making the reference's verbatim projector statements
    * executable against the engine's servers. */
  final case class TemporalFn(kind: String, e: Expr) extends Expr
  /** `duration.between(a, b)` — Neo4j temporal arithmetic (round 16;
    * the reference precomputes IrrigationEvent.duration_min in
    * Python, app/graph_irrigation_event.py:296-332 — this is the
    * engine-side equivalent over its string-typed temporal props).
    * Arguments are ISO date / datetime strings (the engine's
    * temporal prop contract) or timestamps; the value is a COMPONENT
    * MAP `{days, hours, minutes, seconds, totalSeconds}` — the
    * normalized breakdown of the signed whole-second interval a→b
    * (days = total/86400, hours/minutes/seconds the remainder
    * breakdown, every component long-typed). Documented deviation:
    * Neo4j's duration carries a months component and nanoseconds;
    * the engine's instance is the day/time normalization consumers
    * actually read (`d.minutes`, `d.days`), with `totalSeconds` as
    * the exact total. Accessors compile through the ordinary
    * map-access path (`d.days` after `WITH … AS d`, or directly on
    * the call). */
  final case class DurBetween(a: Expr, b: Expr) extends Expr
  /** `duration({days: 1, hours: 2, …})` — duration constructor from
    * a component map (literals/params; weeks/days/hours/minutes/
    * seconds accepted), normalized to the same component-map shape
    * as [[DurBetween]]. */
  final case class DurMake(items: Map[String, Expr]) extends Expr
  /** `labels(v)` — openCypher's list form (the engine's graphs are
    * single-label by construction, so this is a 1-element list;
    * scalar `label(v)` remains the ergonomic form). */
  final case class LabelsOf(v: String) extends Expr
  /** `keys(v)` — the SORTED property-key list of a node/edge variable
    * (openCypher leaves key order unspecified; sorted is the engine's
    * deterministic instance, same contract as collect()). */
  final case class Keys(v: String) extends Expr
  /** `properties(v)` — the property container of a node/edge variable:
    * the map column on a structured-props graph, the JSON string on a
    * JSON-props graph (render canonically via toString()). */
  final case class PropsOf(v: String) extends Expr
  /** `CASE WHEN c THEN v … [ELSE d] END` (searched form). */
  final case class CaseWhen(branches: Seq[(Expr, Expr)],
                            otherwise: Option[Expr]) extends Expr
  /** An aggregate call NESTED inside a RETURN/WITH item expression —
    * `toString(collect(x))`, `sum(a) * 2` — openCypher allows scalar
    * expressions over aggregates in projection items. `arg` = None is
    * `count(*)`. A bare top-level aggregate item normalizes to
    * [[Item]]'s `agg` field at parse time (same compiled form); this
    * node carries the nested occurrences. Invalid in WHERE (Spark
    * rejects aggregates in filters, loudly). */
  final case class AggFn(name: String, distinct: Boolean,
                         arg: Option[Expr],
                         extra: Option[Expr] = None) extends Expr
  /** `exists((a)-[:R]->(b))` — pattern predicate; compiles to a
    * semi-join (anti under NOT), the Cypher spelling of the
    * reference's existence guards (J6). Valid only as a WHERE
    * conjunct. */
  /** `where` (round 15) carries the inner predicate of the Neo4j-5
    * brace form `EXISTS { (a)-[:R]->(b) WHERE pred }` — applied to
    * the pattern's rows BEFORE the semi/anti join. */
  final case class ExistsPat(path: PathPat,
                             where: Option[Expr] = None) extends Expr
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr // = <> < <= > >=
  /** `+ - * / %` with the usual precedence (mul over add). */
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  final case class IsNull(e: Expr, not: Boolean) extends Expr
  final case class InList(e: Expr, vals: Seq[Lit]) extends Expr
  /** CONTAINS / STARTS WITH / ENDS WITH. */
  final case class StrPred(op: String, l: Expr, r: Expr) extends Expr
  /** `[x IN list WHERE pred | proj]` — openCypher list comprehension
    * (both the WHERE filter and the `|` projection are optional, but
    * at least one is present or the form is just the list). Compiles
    * to the codegen'd higher-order builtins `filter`/`transform` —
    * the lambda variable binds through the compile state, never a
    * UDF. */
  final case class ListComp(v: String, list: Expr, where: Option[Expr],
                            proj: Option[Expr]) extends Expr
  /** `reduce(acc = init, x IN list | body)` — openCypher list fold;
    * compiles to the `aggregate` higher-order builtin. */
  final case class Reduce(acc: String, init: Expr, v: String,
                          list: Expr, body: Expr) extends Expr
  /** `all/any/none/single(x IN list WHERE pred)` — openCypher list
    * quantifiers; `forall`/`exists`/negation/filtered-size-1. */
  final case class Quant(kind: String, v: String, list: Expr,
                         pred: Expr) extends Expr
  /** `[(a)-[:R]->(b) WHERE pred | proj]` — openCypher PATTERN
    * comprehension: per row, the list of `proj` over the pattern's
    * matches anchored at the row's bound node variable(s). Valid in
    * RETURN/WITH items (it compiles to a grouped subquery joined
    * onto the row frame, not to a scalar Column — see
    * CypherCompiler.liftPatComps). The collected list is in
    * CANONICAL ascending order (sort_array): openCypher leaves the
    * order unspecified, and a deterministic order is what an oracle
    * can pin. */
  final case class PatComp(path: PathPat, where: Option[Expr],
                           proj: Expr) extends Expr
  /** `v {.k1, alias: expr, .*}` — openCypher MAP PROJECTION over a
    * bound node/edge variable. `items`: `(k, None)` for a `.k`
    * property pick, `(alias, Some(expr))` for a computed entry;
    * `star` = `.*` includes the variable's whole props map (explicit
    * entries override). Values land as STRINGS — the engine's prop
    * model is map<string,string> and Spark maps are homogeneous
    * (documented deviation from openCypher's heterogeneous maps). */
  final case class MapProj(v: String, items: Seq[(String, Option[Expr])],
                           star: Boolean) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  // ---- return ---------------------------------------------------
  /** `agg` = None for plain items; Some("count"|"sum"|"min"|"max"|
    * "avg") for aggregates; `count(*)` is Agg("count", None).
    * openCypher implicit grouping: non-aggregate items are the keys. */
  final case class Item(expr: Option[Expr], agg: Option[String],
                        distinct: Boolean, alias: String)
  /** ORDER BY item: a bare item-alias reference, or any expression
    * (computed into a hidden column, dropped after the sort). */
  final case class OrderItem(key: Expr, asc: Boolean)
  final case class Return(distinct: Boolean, items: Seq[Item],
                          orderBy: Seq[OrderItem], skip: Option[Long],
                          limit: Option[Long])

  /** `WITH (DISTINCT)? items (ORDER BY…)? (SKIP n)? (LIMIT n)?
    * (WHERE expr)?` — the openCypher pipeline operator. Bare node
    * variables stay bound as nodes downstream; expression items
    * become value columns named by their alias; everything else goes
    * out of scope (openCypher's WITH scoping). The trailing WHERE
    * filters the projected rows (the HAVING position when the WITH
    * aggregates). */
  final case class WithClause(distinct: Boolean, items: Seq[Item],
                              orderBy: Seq[OrderItem], skip: Option[Long],
                              limit: Option[Long], where: Option[Expr])

  /** One pipeline segment: UNWIND bindings (list expr → row-per-
    * element value variable, the reference's batch idiom), MATCH
    * parts, an optional WHERE, and the WITH that hands its projection
    * to the next segment (absent only on the final segment, which
    * ends in RETURN instead). */
  final case class Segment(unwinds: Seq[(Expr, String)],
                           matches: Seq[MatchPart], where: Option[Expr],
                           withPart: Option[WithClause])

  /** The whole query: 1+ segments, then RETURN; `union` chains a
    * following query (`true` = UNION ALL, `false` = UNION with
    * distinct), columns matched by name per openCypher. */
  final case class Query(segments: Seq[Segment], ret: Return,
                         union: Option[(Boolean, Query)] = None) {
    /** First segment's MATCH parts (convenience for single-segment
      * queries — most of them). */
    def matches: Seq[MatchPart] = segments.head.matches
  }

  // ---- writes (round 11) ------------------------------------------
  /** One SET item: `v.key = expr` updates a property (a null value
    * REMOVES the key, openCypher semantics); `key = None` is the
    * map-add form `v += $props` (every key of the map upserts). */
  final case class SetItem(v: String, key: Option[String], value: Expr)

  /** A write clause, executed in statement order. The statement
    * shapes are the reference's own projector idioms
    * (app/graph_fields.py:14-45, graph_weather_day.py:230-257):
    * node MERGE + SET, MATCH…SET update, MATCH…MERGE relationship,
    * CREATE, and the batched `UNWIND $rows AS row MERGE …` form. */
  sealed trait WriteClause
  /** `MERGE (v:Label {keyProps}) [ON CREATE SET …] [ON MATCH SET …]`
    * — node upsert. The pattern's prop map is the node identity (the
    * per-label uniqueness key, reference graph_constraints.py); a
    * trailing plain SET targeting `v` folds into `always`. */
  final case class MergeNode(pat: NodePat, onCreate: Seq[SetItem],
                             onMatch: Seq[SetItem],
                             always: Seq[SetItem]) extends WriteClause
  /** `MERGE (a)-[r:R {props}]->(b) [ON CREATE SET r.…] [ON MATCH SET
    * r.…]` — relationship upsert between bound endpoints; identity is
    * the (src, dst, rel) TRIPLE, never the props. Pattern props are
    * SET-ON-CREATE (the same contract as node MERGE's non-key props):
    * a triple that already exists matches regardless of its stored
    * props and the pattern's props are NOT applied — openCypher would
    * instead create a parallel relationship on a props mismatch, which
    * this graph model cannot represent (MERGE-idempotent assembly
    * dedupes on the triple). Use ON MATCH SET to update a matched
    * relationship's props; a trailing plain SET targeting the edge
    * variable folds into `always` (applied to matched AND created). */
  final case class MergeRel(path: PathPat,
                            onCreate: Seq[SetItem] = Nil,
                            onMatch: Seq[SetItem] = Nil,
                            always: Seq[SetItem] = Nil) extends WriteClause
  /** `CREATE pattern, …` — plain creation (nodes and/or single-hop
    * relationships); violating a declared uniqueness key fails the
    * statement loudly, like Neo4j under a constraint. */
  final case class Create(paths: Seq[PathPat]) extends WriteClause
  /** `SET items` targeting MATCH-bound variables — pure update. */
  final case class SetOnly(items: Seq[SetItem]) extends WriteClause
  /** `SET v:Label` / `REMOVE v:Label` (round 14) — label mutation on
    * a MATCH-bound node. DOCUMENTED DEVIATION: this graph model is
    * single-label (the vertex frame's `label` column), so SET
    * REASSIGNS the label (openCypher adds to a label set) and REMOVE
    * clears it only when it matches the stored label. Relabeling INTO
    * a label with declared uniqueness keys is rejected — node
    * identity (`label:keys`) is minted at MERGE time and a keyed
    * label reached by relabel would corrupt the identity contract the
    * match probes rely on. The id handle itself never changes: a
    * later MERGE on the ORIGINAL label/key still addresses the same
    * node (engine identity = id). */
  final case class SetLabel(v: String, label: String, add: Boolean)
    extends WriteClause
  /** `FOREACH (v IN list | <write clauses>)` (round 14 — first-class
    * clause, siblings and nesting allowed). Executed set-wise as a
    * SUB-SCOPE: the statement frame cross-joins the list (one row per
    * frame row × element), the body's clauses contribute to the SAME
    * statement's deltas, and the outer frame is untouched — so an
    * EMPTY list skips the body while the statement's other clauses
    * and its RETURN/WITH continuation keep every bound row
    * (openCypher's cardinality-neutral FOREACH). Body-bound variables
    * go out of scope at the closing paren, per openCypher. */
  final case class Foreach(v: String, list: Expr,
                           clauses: Seq[WriteClause]) extends WriteClause
  /** `[DETACH] DELETE v, …` — delete MATCH-bound nodes (or edge
    * variables: their (src,dst,rel) triples). Plain DELETE of a node
    * with attached relationships fails loudly (Neo4j semantics);
    * DETACH removes the attached relationships too. An extension
    * beyond the reference (which is MERGE-only) — a real consumer of
    * a graph store needs the full lifecycle. */
  final case class Delete(vars: Seq[String], detach: Boolean)
    extends WriteClause

  /** A write statement: optional UNWIND bindings (the batch idiom),
    * optional MATCH parts (endpoint/update binding), then 1+ write
    * clauses, then an optional READ CONTINUATION (round 13):
    * `… RETURN items` or `… WITH items [MATCH …]* RETURN items` —
    * the get-or-create-and-read idiom every Neo4j application types
    * first (`MERGE (n:X {k:$k}) RETURN n`). `returning`'s first
    * segment carries no UNWIND/MATCH of its own (the write's bound
    * rows ARE the segment input, re-probed against the POST-APPLY
    * graph so RETURN sees the written values); subsequent segments
    * are ordinary read pipeline over the post-write graph. The
    * reference's projectors never return, so this is consumer
    * surface, not reference parity. */
  final case class WriteQuery(unwinds: Seq[(Expr, String)],
                              matches: Seq[MatchPart],
                              clauses: Seq[WriteClause],
                              returning: Option[Query] = None,
                              call: Option[CallBlock] = None)

  /** `[WITH vars] CALL { [WITH vars [WHERE pred]]* [MATCH …]*
    * <write clauses> [RETURN expr] }` — the CONDITIONAL WRITE
    * subquery, the reference's own idiom for an optional edge
    * (graph_app_nutrient_content.py:155-162: link FertilizerProduct →
    * AppNutrientContent only when name/brand are present). Semantics
    * executed set-wise: the statement's bound rows filter by the
    * accumulated WHERE, the block's MATCH parts bind (inner join —
    * non-matching rows drop, exactly the CALL cardinality contract
    * for a tail block), and the write clauses contribute to the SAME
    * statement's deltas. The trailing RETURN (openCypher requires
    * one inside CALL) is parsed and discarded — a CALL block is
    * supported as the statement's TAIL, so its output rows feed
    * nothing. `imports` is recorded for fidelity; the engine's frame
    * carries all bound columns, so the projection is a no-op. */
  final case class CallBlock(imports: Seq[String], where: Option[Expr],
                             matches: Seq[MatchPart],
                             clauses: Seq[WriteClause],
                             lets: Seq[(String, Expr)] = Nil)

  /** `CREATE CONSTRAINT [name] [IF NOT EXISTS] FOR (v:Label) REQUIRE
    * (v.k1[, v.k2…]) IS UNIQUE` — the reference's bootstrap DDL
    * (app/graph_constraints.py:2-133, one statement per node label,
    * run BEFORE any projector). The engine's spelling of a uniqueness
    * constraint is the [[GraphStore]] per-label key declaration (it
    * drives MERGE identity minting `label:key1:key2` and the bucketed
    * probe index), so the DDL registers exactly that: the label's key
    * columns, in the REQUIRE tuple's declared order. Only `IS UNIQUE`
    * node constraints are supported — the only kind the reference
    * uses. */
  final case class ConstraintDdl(name: String, ifNotExists: Boolean,
                                 label: String, keys: Seq[String])
}
