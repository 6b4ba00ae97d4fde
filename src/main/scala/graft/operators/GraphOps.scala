package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph view + graph analytics over DataFrames (SURVEY §4.2.3, §7 M7).
  *
  * The reference materializes a property graph of key-joined node
  * tables (§1.2/§1.3); here the graph IS the pair (vertices DF,
  * edges DF), and the algorithms are iterative DataFrame programs —
  * every iteration is a join + aggregate on the edge relation, which
  * Spark shuffles by dst once per iteration (same plan GraphX's
  * Pregel generates, but in DataFrames so Catalyst/AQE optimize it
  * and the DuckDB oracle can replay it).
  *
  * Determinism: per-iteration sums go through a decimal cast, so the
  * ranks are bit-identical regardless of partitioning — an engine
  * running on 1000 executors produces the same bytes as DuckDB
  * single-threaded.
  */
object GraphOps {

  /** Deterministic PageRank: rank_{t+1}(v) = reset + damp * Σ_{u→v}
    * rank_t(u) / outdeg(u), fixed iteration count, dangling mass
    * dropped. Input: edges (src: long, dst: long).
    */
  def pageRank(edges: DataFrame, iterations: Int,
               reset: Double = 0.15, damp: Double = 0.85,
               scope: CacheScope = CacheScope.global): DataFrame = {
    // vertices is re-joined every iteration — persist it or each
    // iteration re-runs the distinct over the edge set
    // vertices comes out of distinct() hash-partitioned by id; edges
    // are explicitly repartitioned by src. Cached plans keep their
    // output partitioning (canChangeCachedPlanOutputPartitioning is
    // false by default), so every iteration's rank⋈edge join and
    // vertex left-join are exchange-free — the only shuffle per
    // iteration is the contribution aggregate, i.e. the actual
    // message-passing step. 3 shuffles/iter → 1.
    // the input lineage is referenced 4× below (vertices union twice,
    // outDeg, withInv), and every iteration's logical plan would embed
    // it again — localCheckpoint materializes it ONCE and replaces the
    // lineage with a LogicalRDD, so iteration plans stay constant-size
    // (a persist alone caches execution but Catalyst still re-analyzes
    // the full tree, which doubles per iteration: comp_t is referenced
    // twice by comp_{t+1}). LogicalRDD preserves output partitioning,
    // so the co-partitioning below survives the truncation.
    val e = scope.checkpoint(edges)
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // 1/outdeg as IEEE double (engine-independent), fixed per vertex
    val withInv = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("inv_outdeg"))
    val edgesCached = scope.checkpoint(withInv.repartition(col("src")))
    // zero-contribution rows for every vertex replace the per-iteration
    // `vertices LEFT JOIN summed` that re-attached rank-less vertices:
    // summing an extra 0 is a no-op for receivers and yields
    // reset + damp*0 for vertices with no inflow — identical values,
    // one fewer join per iteration (the aggregate's shuffle IS the
    // message-passing step and is the only one left).
    val zeroContribs = scope.checkpoint(
      vertices.select(col("id"), lit(0.0).as("contrib")))
    var ranks = vertices.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edgesCached.join(ranks, edgesCached("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("rank") * col("inv_outdeg")).as("contrib"))
        .unionByName(zeroContribs)
      // decimal sum is partition-order-free; the decimal→double hop
      // goes through an exact integer (×1e9, round, BIGINT) because a
      // direct decimal→double cast is correctly rounded in the JVM but
      // 1-ulp off in engines that convert via (int128→double)/10^scale
      // — that ulp compounds across iterations on hub vertices
      // rank_t is referenced exactly ONCE per iteration (the contribs
      // join), so the plan grows LINEARLY — no lineage truncation
      // needed. Leaving the chain lazy turns the loop into one job of
      // pipelined shuffle stages instead of `iterations` blocking
      // materialization jobs (each checkpoint was a full pass +
      // block-manager write + scheduler round trip).
      ranks = contribs.groupBy(col("id"))
        .agg((lit(reset) + lit(damp) *
          (round(sum(col("contrib").cast("decimal(27,15)")) * 1000000000L)
            .cast("long").cast("double") / 1.0e9)).as("rank"))
    }
    ranks
  }

  /** Edge-weighted PageRank: rank_{t+1}(v) = reset + damp ·
    * Σ_{u→v} rank_t(u) · w(u,v) / Σ_out w(u) — the weight-proportional
    * generalization of [[pageRank]] (which this matches exactly at
    * w ≡ 1). Input: edges (src, dst, w: integer weights, so the
    * normalized fraction w / Σw is one deterministic double both
    * engines compute identically). Same iteration discipline as
    * [[pageRank]]: co-partitioned checkpointed edges, zero-contribution
    * union instead of a per-iteration vertex join, decimal-quantized
    * sums — one shuffle per iteration.
    *
    * Weights must be POSITIVE: a non-positive edge weight would give
    * a src with sum(w) ≤ 0 whose fractions are NaN/negative and
    * silently zero downstream ranks through the decimal quantization
    * (non-ANSI cast). Such edges are rejected loudly up front.
    */
  def pageRankWeighted(edges: DataFrame, iterations: Int,
                       reset: Double = 0.15, damp: Double = 0.85,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.checkpoint(edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w")))
    val badW = e.filter(col("w") <= 0 || col("w").isNull).limit(1).count()
    require(badW == 0,
      "pageRankWeighted: edge weights must be positive non-null " +
        "(found a w <= 0 or NULL edge); filter or reweight upstream")
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val wSum = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val withFrac = e.join(wSum, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wsum").cast("double")).as("frac"))
    val edgesCached = scope.checkpoint(withFrac.repartition(col("src")))
    val zeroContribs = scope.checkpoint(
      vertices.select(col("id"), lit(0.0).as("contrib")))
    var ranks = vertices.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edgesCached.join(ranks, edgesCached("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") * col("frac")).as("contrib"))
        .unionByName(zeroContribs)
      ranks = contribs.groupBy(col("id"))
        .agg((lit(reset) + lit(damp) *
          (round(sum(col("contrib").cast("decimal(27,15)")) * 1000000000L)
            .cast("long").cast("double") / 1.0e9)).as("rank"))
    }
    ranks
  }

  /** Connected components by iterative min-label propagation over the
    * undirected edge set: comp_{t+1}(v) = min(comp_t(v),
    * min_{(u,v)∈E} comp_t(u)). Converges in diameter iterations;
    * deterministic (min is order-free).
    */
  def connectedComponents(edges: DataFrame, iterations: Int,
                          scope: CacheScope = CacheScope.global): DataFrame = {
    // same co-partitioning discipline as pageRank: undirected edges
    // partitioned by src once, comp stays partitioned by id, so the
    // propagation join is exchange-free and only the min-aggregate
    // shuffles per iteration
    // input lineage referenced twice by the symmetric union, and
    // comp_t twice by iteration t+1 (propagation source and join
    // target) — without truncation both the EXECUTION (recompute per
    // reference) and the LOGICAL PLAN (tree doubles per iteration,
    // re-analyzed even when execution is cached) blow up 2^iterations.
    // localCheckpoint cuts both: one materialization, constant-size
    // iteration plans, output partitioning preserved.
    val e = scope.checkpoint(edges)
    // self-loops make the recurrence min over neighbors ∪ self, so
    // comp_t is referenced exactly ONCE per iteration (the propagation
    // join) instead of twice (join source + "keep own label" join
    // target). That turns the logical plan from doubling per iteration
    // into linear growth — no per-iteration lineage truncation, and
    // the whole loop executes as ONE job of pipelined shuffle stages
    // (same trick as pageRank; values are identical:
    // min(comp(v), min_nbr comp) == min over nbrs∪self).
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val undirected = scope.checkpoint(e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .union(vertices.select(col("id").as("src"), col("id").as("dst")))
      .repartition(col("src")))
    var comp = vertices.select(col("id"), col("id").as("comp"))
    for (_ <- 1 to iterations) {
      comp = undirected.join(comp, undirected("src") === comp("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("comp"))
    }
    comp
  }

  /** Synchronous label propagation (community detection), `iterations`
    * rounds: every vertex starts as its own label; each round it
    * adopts the MOST FREQUENT label among its neighbors (undirected),
    * ties broken toward the smallest label so the result is
    * deterministic. Differs from [[connectedComponents]] exactly in
    * the vote: mode-of-neighbors finds dense communities inside a
    * component, min-of-neighbors finds the component itself.
    *
    * Plan shape per round: ONE exchange-free join (labels against the
    * src-partitioned undirected edge list, same discipline as
    * pageRank) and TWO map-side-combined hash aggregates — the
    * (vertex, label) vote count, then the per-vertex argmax. The
    * argmax is `max_by` over (count, −label) — an aggregate, never a
    * rank-1 window, so a hub's votes combine map-side instead of
    * sorting on one reducer. Labels are referenced once per round, so
    * the logical plan grows linearly and needs no per-round
    * checkpoint. Every vertex derived from the edge list has a
    * neighbor, so no keep-own fallback join is needed.
    */
  def labelPropagation(edges: DataFrame, iterations: Int,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.checkpoint(edges)
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val undirected = scope.checkpoint(e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")))
    var lbl = vertices.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to iterations) {
      val votes = undirected.join(lbl, undirected("src") === lbl("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      lbl = votes.groupBy(col("dst").as("id"))
        .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("lbl"))
    }
    lbl
  }

  /** Multi-source BFS / unit-weight shortest paths along edge
    * direction: dist(v) = hops from the nearest source, null if
    * unreachable within `iterations`. Same Pregel shape and the same
    * plan discipline as [[connectedComponents]]: zero-weight
    * self-loops make the recurrence `min over in-edges ∪ self`, so
    * the frontier frame is referenced once per iteration, the plan
    * grows linearly, and the only shuffle per iteration is the
    * min-aggregate (the join is exchange-free against the
    * src-partitioned hop relation). `iterations` must be >= the
    * radius of interest; unreached vertices surface as null, not a
    * sentinel, so truncation is visible to the caller.
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame, iterations: Int,
                    scope: CacheScope = CacheScope.global): DataFrame =
    weightedSssp(edges.select(col("src"), col("dst"), lit(1L).as("w")),
      sources, iterations, scope)

  /** K-CHEAPEST simple paths within a hop bound: enumerate every
    * simple directed path of 1..maxHops over weighted edges
    * (src, dst, w: long), then keep the `k` cheapest per
    * (start, end) pair under the TOTAL order (cost, path) — the path
    * array is the unique tiebreak, and both Spark and SQL engines
    * order integer arrays lexicographically, so the selection
    * replays exactly. Exact by construction: all bounded simple
    * paths are enumerated before ranking ([[kHopPaths]] cost model —
    * the true path count, bounded by maxHops and the source set).
    * The rank window partitions by (start, end): at scale that
    * shuffle carries only enumerated paths, and the per-pair
    * partition is the path multiplicity between one vertex pair —
    * never a global sort. Output: (start, end, hops, cost, path,
    * rank) with rank ≤ k.
    */
  def kCheapestPaths(edges: DataFrame, sources: DataFrame,
                     maxHops: Int, k: Int,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHops >= 1 && k >= 1, "maxHops and k must be >= 1")
    val e = scope.checkpoint(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .repartition(col("src")))
    var frontier = sources.select(col("id").as("start"),
      col("id").as("end"), array(col("id")).as("path"),
      lit(0L).as("cost"))
    val levels = (1 to maxHops).map { h =>
      frontier = scope.checkpoint(
        frontier.join(e, frontier("end") === e("src"))
          .filter(!array_contains(col("path"), col("dst")))
          .select(col("start"), col("dst").as("end"),
            concat(col("path"), array(col("dst"))).as("path"),
            (col("cost") + col("w")).as("cost")))
      frontier.withColumn("hops", lit(h))
    }
    val all = levels.reduce(_ unionByName _)
    val w = Window.partitionBy(col("start"), col("end"))
      .orderBy(col("cost").asc, col("path").asc)
    all.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("start"), col("end"), col("hops"), col("cost"),
        col("path"), col("rank"))
  }

  /** Bounded k-hop path EXPAND with full path accumulation — the
    * DataFrame form of Cypher's variable-length pattern
    * `(s)-[*1..k]->(v)`: from each source, every simple path of 1..k
    * directed hops, as (start, end, hops, path[ids]). "Simple" means
    * no repeated vertex within a path (`array_contains` guard), which
    * is Cypher's own trail/no-revisit semantics for bounded patterns
    * and also what keeps the expansion finite on cyclic graphs.
    *
    * Scale design: hop h is ONE equi-join of the frontier (paths of
    * length h−1, shuffled on their end vertex) against the
    * src-partitioned edge relation — the standard distributed
    * path-expand; total cost is the true path-count, which the
    * caller bounds by `maxHops` and the source set. The path array
    * grows to at most k+1 longs, so frontier rows stay narrow; no
    * driver-side state, no recursion. The per-level frames are
    * checkpointed so the logical plan stays linear in k.
    *
    * The output is deterministic set semantics (paths are values, no
    * ordering) and replays in any engine as k unrolled self-joins —
    * the oracle form.
    */
  def kHopPaths(edges: DataFrame, sources: DataFrame, maxHops: Int,
                scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = scope.checkpoint(
      edges.select(col("src"), col("dst")).repartition(col("src")))
    var frontier = sources.select(col("id").as("start"),
      col("id").as("end"), array(col("id")).as("path"))
    val levels = (1 to maxHops).map { h =>
      frontier = scope.checkpoint(
        frontier.join(e, frontier("end") === e("src"))
          .filter(!array_contains(col("path"), col("dst")))
          .select(col("start"), col("dst").as("end"),
            concat(col("path"), array(col("dst"))).as("path")))
      frontier.withColumn("hops", lit(h))
    }
    levels.reduce(_ unionByName _)
      .select(col("start"), col("end"), col("hops"), col("path"))
  }

  /** Weighted single-source(s) shortest paths — Bellman-Ford
    * relaxation over integer-weight edges (src, dst, w), fixed
    * `iterations` rounds. Per round ONE shuffle: the edge join on the
    * current distance frame + a min-aggregate; the zero-weight
    * self-loop union keeps settled distances in play without a
    * second union branch. Distances are exact BIGINTs, so a depth-k
    * run is the true minimum over paths of ≤ k edges and any engine
    * replays it bit-for-bit ([[shortestPaths]] is the w ≡ 1 case).
    * Unreachable-within-k vertices emit NULL.
    */
  def weightedSssp(edges: DataFrame, sources: DataFrame, iterations: Int,
                   scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.checkpoint(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w")))
    // Sources are unioned into the vertex set so an isolated source
    // (no incident edges) still surfaces with dist=0 rather than
    // silently vanishing from the output.
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(sources.select(col("id"))).distinct())
    val hop = scope.checkpoint(e
      .union(vertices.select(col("id").as("src"), col("id").as("dst"),
        lit(0L).as("w")))
      .repartition(col("src")))
    // distinct() guards against duplicate source ids feeding duplicate
    // seed rows into the first min-aggregate.
    var dist = sources.select(col("id")).distinct().withColumn("dist", lit(0L))
    for (_ <- 1 to iterations) {
      dist = hop.join(dist, hop("src") === dist("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("dist") + col("w")).as("dist"))
    }
    vertices.join(dist, Seq("id"), "left").select(col("id"), col("dist"))
  }

  /** Convergence-safe connected components: same min-label propagation
    * as [[connectedComponents]], iterated until NO label changed in a
    * round (checked with a limit-1 emptiness probe, not a full count)
    * or `maxIterations` as a runaway bound. A fixed-depth run
    * silently splits any component whose diameter exceeds the depth —
    * at corpus scale a dup chain longer than the depth under-dedups —
    * so this is the production path; the fixed-depth form stays for
    * oracle replay (a data-dependent iteration count cannot be
    * mirrored in static SQL).
    *
    * Each round's labels are checkpointed: the convergence probe is an
    * action per round, and without materialization round t+1 would
    * recompute rounds 1..t.
    */
  def connectedComponentsConverged(edges: DataFrame, maxIterations: Int = 50,
                                   scope: CacheScope = CacheScope.global): DataFrame = {
    // convergence-loop floor scope (r17) — see [[kCore]]: per-window
    // probe + checkpoint actions run at Spark's 1m floor (32-core A/B:
    // g_connected_components 2.57 s at 256k vs 2.18 s at 1m, g_mis
    // 6.65 vs 5.40).
    graft.GraftSession.withMinCoalesced(edges.sparkSession, "1m") {
    val e = scope.checkpoint(edges)
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val undirected = scope.checkpoint(e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .union(vertices.select(col("id").as("src"), col("id").as("dst")))
      .repartition(col("src")))
    var comp = scope.checkpoint(vertices.select(col("id"), col("id").as("comp")))
    var changed = 1L
    var iter = 0
    // Windowed probe (same cadence as pageRankConverged): labels only
    // DECREASE, so "no vertex changed across the whole window" is
    // EXACTLY "no step in the window changed anything" — the window
    // probe against the window-start state is exact, and 3 min-
    // propagation steps pipeline as one lazy job between checkpoints.
    val probeEvery = 3
    while (changed > 0L && iter < maxIterations) {
      val steps = math.min(probeEvery, maxIterations - iter)
      val prev = comp
      var cur = comp
      for (_ <- 1 to steps) {
        cur = undirected.join(cur, undirected("src") === cur("id"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("comp")).as("comp"))
      }
      val next = scope.checkpoint(
        cur.join(prev.select(col("id"), col("comp").as("prev")), "id"))
      // labels only decrease, so "any row strictly smaller" == "changed"
      changed = next.filter(col("comp") < col("prev")).limit(1).count()
      comp = next.select(col("id"), col("comp"))
      iter += steps
    }
    comp
    }
  }

  /** Personalized PageRank: random walks restart at the SOURCE set
    * instead of uniformly — rank_{t+1}(v) = reset·1{v ∈ sources} +
    * damp·Σ_{u→v} rank_t(u)/outdeg(u), rank_0 = 1{v ∈ sources}. The
    * graph-retrieval primitive ("importance relative to THESE nodes"
    * — recommendation seeds, query-time personalization), with the
    * same exact 1e-9-quantized decimal sums as [[pageRank]] so the
    * oracle replays the iteration chain bit-for-bit.
    *
    * Plan shape: the per-vertex reset vector is checkpointed
    * hash-partitioned by id, and each iteration's aggregate output is
    * partitioned the same way, so the reset re-join is exchange-free —
    * still ONE shuffle per iteration (the message aggregate).
    * `sources` is an (id) frame; ids absent from the graph contribute
    * nothing.
    */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
                           iterations: Int,
                           reset: Double = 0.15, damp: Double = 0.85,
                           scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.checkpoint(edges)
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val srcSet = sources.select(col("id")).distinct()
      .withColumn("__s", lit(1))
    val resetVec = scope.checkpoint(
      vertices.join(broadcast(srcSet), Seq("id"), "left")
        .select(col("id"),
          when(col("__s").isNotNull, lit(reset)).otherwise(lit(0.0))
            .as("reset_w"))
        .repartition(col("id")))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withInv = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("inv_outdeg"))
    val edgesCached = scope.checkpoint(withInv.repartition(col("src")))
    val zeroContribs = scope.checkpoint(
      vertices.select(col("id"), lit(0.0).as("contrib")))
    var ranks = resetVec.select(col("id"),
      when(col("reset_w") > 0.0, lit(1.0)).otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edgesCached.join(ranks, edgesCached("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("rank") * col("inv_outdeg")).as("contrib"))
        .unionByName(zeroContribs)
      ranks = contribs.groupBy(col("id"))
        .agg((lit(damp) *
          (round(sum(col("contrib").cast("decimal(27,15)")) * 1000000000L)
            .cast("long").cast("double") / 1.0e9)).as("inflow"))
        .join(resetVec, "id")
        .select(col("id"), (col("reset_w") + col("inflow")).as("rank"))
    }
    ranks
  }

  /** Convergence-safe PageRank: same recurrence (and the same exact
    * 1e-9-quantized decimal sums) as [[pageRank]], iterated until no
    * vertex's rank moved more than `tol` in a round — checked with a
    * limit-1 emptiness probe like [[connectedComponentsConverged]] —
    * or `maxIterations` as the runaway bound. A fixed iteration count
    * under-converges hub-heavy graphs whose mixing time exceeds the
    * depth; this is the production path, while the fixed-depth form
    * stays for oracle replay (a data-dependent iteration count cannot
    * be mirrored in static SQL).
    *
    * Each round's ranks are checkpointed: the probe is an action per
    * round, and rank_t is referenced twice (contribution join + delta
    * probe) — the price is one blocking materialization per round,
    * the same trade the CC/k-core converged forms make. Termination
    * is guaranteed even for tiny `tol`: the damped recurrence
    * contracts deltas by `damp` per round and ranks live on the 1e-9
    * quantization grid, so the sequence reaches an exact fixpoint.
    */
  def pageRankConverged(edges: DataFrame, tol: Double = 1e-7,
                        maxIterations: Int = 50,
                        reset: Double = 0.15, damp: Double = 0.85,
                        scope: CacheScope = CacheScope.global): DataFrame = {
    require(tol > 0.0 && maxIterations >= 1)
    val e = scope.checkpoint(edges)
    val vertices = scope.checkpoint(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withInv = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("inv_outdeg"))
    val edgesCached = scope.checkpoint(withInv.repartition(col("src")))
    val zeroContribs = scope.checkpoint(
      vertices.select(col("id"), lit(0.0).as("contrib")))
    var ranks = scope.checkpoint(vertices.select(col("id"), lit(1.0).as("rank")))
    var moved = 1L
    var iter = 0
    // Probe cadence: convergence is checked every `probeEvery`
    // iterations, so a window of 3 recurrence steps runs as ONE job
    // of pipelined shuffle stages (each rank_t is referenced once —
    // linear lazy chain, the fixed-iteration pageRank discipline)
    // instead of 3 blocking checkpoint jobs. A tol-fixpoint stays a
    // fixpoint under extra iterations (the recurrence is a
    // contraction), so overshooting by ≤2 steps changes nothing the
    // certificate or oracle can see; prev is folded into the
    // window-end checkpoint so the probe is a limit-1 scan of
    // materialized partitions.
    val probeEvery = 3
    while (moved > 0L && iter < maxIterations) {
      val steps = math.min(probeEvery, maxIterations - iter)
      // the stopping criterion stays the SINGLE-step delta (what the
      // certificate's residual bound assumes): compare the window's
      // last step against the state just before it — beforeLast is
      // referenced twice (inside cur's plan and by the probe join),
      // which at window size 3 keeps plans bounded
      var beforeLast = ranks
      var cur = ranks
      for (_ <- 1 to steps) {
        beforeLast = cur
        val contribs = edgesCached.join(cur, edgesCached("src") === cur("id"))
          .select(col("dst").as("id"),
            (col("rank") * col("inv_outdeg")).as("contrib"))
          .unionByName(zeroContribs)
        cur = contribs.groupBy(col("id"))
          .agg((lit(reset) + lit(damp) *
            (round(sum(col("contrib").cast("decimal(27,15)")) * 1000000000L)
              .cast("long").cast("double") / 1.0e9)).as("rank"))
      }
      val next = scope.checkpoint(
        cur.join(beforeLast.select(col("id"), col("rank").as("prev")), "id"))
      moved = next.filter(abs(col("rank") - col("prev")) > tol)
        .limit(1).count()
      ranks = next.select(col("id"), col("rank"))
      iter += steps
    }
    ranks
  }

  // ---------------------------------------------------------------
  // Fixpoint certificates: the converged forms iterate a
  // data-dependent number of rounds, which no static SQL can unroll —
  // so their CORRECTNESS entries check the FIXPOINT PROPERTY instead
  // of the trajectory. Each certificate recomputes one application of
  // the recurrence from the OUTPUT itself (same quantization as the
  // engine) and emits rows whose correct values are knowable to the
  // oracle without replaying: the vertex list (graph-derived) and
  // all-true / all-zero violation columns. An under-converged run
  // cannot reproduce them — the residual check fails on exactly the
  // vertices whose values were still moving.
  // ---------------------------------------------------------------

  /** Per-vertex PageRank fixpoint certificate over `ranks` (the (id,
    * rank) output of [[pageRankConverged]]): recompute expected(v) =
    * reset + damp·Σ rank(u)/outdeg(u) with the engine's exact decimal
    * quantization and flag |rank − expected| within the contraction
    * bound. At a tol-fixpoint the residual of vertex v is at most
    * damp·(in_mass(v)·tol + q) where in_mass(v) = Σ_{u→v} 1/outdeg(u)
    * (each in-neighbor moved ≤ tol in the final round) and q = 1e-9 is
    * one quantization step — the per-vertex bound used here, plus 1e-8
    * slack. Emits (id, converged): every graph vertex exactly once,
    * all true iff the claimed fixpoint holds.
    */
  def pageRankCertificate(edges: DataFrame, ranks: DataFrame, tol: Double,
                          reset: Double = 0.15, damp: Double = 0.85,
                          scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.persist(edges.select(col("src"), col("dst")))
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withInv = scope.persist(e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("inv_outdeg")))
    val contribs = withInv
      .join(ranks.select(col("id").as("src"), col("rank")), "src")
      .select(col("dst").as("id"),
        (col("rank") * col("inv_outdeg")).as("contrib"))
      .unionByName(vertices.select(col("id"), lit(0.0).as("contrib")))
    val expected = contribs.groupBy(col("id"))
      .agg((lit(reset) + lit(damp) *
        (round(sum(col("contrib").cast("decimal(27,15)")) * 1000000000L)
          .cast("long").cast("double") / 1.0e9)).as("expected"))
    val inMass = withInv.groupBy(col("dst").as("id"))
      .agg(sum(col("inv_outdeg")).as("in_mass"))
    ranks.join(expected, "id")
      .join(inMass, Seq("id"), "left")
      .select(col("id"),
        (abs(col("rank") - col("expected")) <=
          lit(damp) * (coalesce(col("in_mass"), lit(0.0)) * lit(tol) + lit(1e-9))
            + lit(1e-8)).as("converged"))
  }

  /** Per-vertex connected-components fixpoint certificate over `comp`
    * (the (id, comp) output of [[connectedComponentsConverged]]). A
    * min-propagation fixpoint initialized from self-labels satisfies,
    * for every vertex: (a) comp(v) ≤ v (labels only decrease from the
    * id init); (b) no undirected neighbor carries a smaller label —
    * with symmetry that makes comp constant along every edge, exactly
    * the property an under-iterated run violates; (c) the label is a
    * self-labeled root: comp(comp(v)) = comp(v). Emits (id,
    * converged): every graph vertex exactly once, all true iff the
    * fixpoint holds.
    */
  def connectedComponentsCertificate(edges: DataFrame, comp: DataFrame,
                                     scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.persist(edges.select(col("src"), col("dst")))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val labels = scope.persist(comp.select(col("id"), col("comp")))
    val nbrMin = und
      .join(labels.select(col("id").as("src"), col("comp").as("c")), "src")
      .groupBy(col("dst").as("id")).agg(min(col("c")).as("nbr_min"))
    val roots = labels.filter(col("id") === col("comp"))
      .select(col("comp"), lit(true).as("root_ok"))
    labels.join(nbrMin, Seq("id"), "left")
      .join(roots, Seq("comp"), "left")
      .select(col("id"),
        (col("comp") <= col("id") &&
          coalesce(col("nbr_min") >= col("comp"), lit(true)) &&
          coalesce(col("root_ok"), lit(false))).as("converged"))
  }

  /** k-core fixpoint certificate over `core` (the (id, degree) output
    * of [[kCoreConverged]]): restrict the canonicalized edge set to
    * the surviving vertices and recompute induced degrees. At the
    * k-core fixpoint (i) every induced degree is ≥ k — equivalently,
    * one more peel removes nothing — and (ii) the reported degrees
    * equal the induced recomputation (the final edge set IS the
    * induced subgraph on survivors, since peeling only drops edges at
    * removed endpoints). Emits ONE row (n_vertices, n_below_k,
    * n_deg_mismatch): the graph's vertex count (oracle-computable) and
    * two violation counts that are 0 iff the fixpoint holds.
    */
  def kCoreCertificate(edges: DataFrame, core: DataFrame, k: Int,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.persist(edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    val surv = scope.persist(core.select(col("id"), col("degree")))
    val induced = e
      .join(surv.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(surv.select(col("id").as("b")), Seq("b"), "left_semi")
    val indDeg = induced.select(col("a").as("id"))
      .union(induced.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("ind_d"))
    val checks = surv.join(indDeg, Seq("id"), "left")
      .agg(
        coalesce(sum(when(coalesce(col("ind_d"), lit(0L)) < k, 1L)
          .otherwise(0L)), lit(0L)).as("n_below_k"),
        coalesce(sum(when(coalesce(col("ind_d"), lit(0L)) =!= col("degree"), 1L)
          .otherwise(0L)), lit(0L)).as("n_deg_mismatch"))
    val nVerts = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .agg(count_distinct(col("id")).as("n_vertices"))
    nVerts.crossJoin(checks) // two 1-row aggregates
  }

  /** GraphX-backed PageRank over the same edge DataFrame — the
    * VertexRDD/EdgeRDD execution path (BASELINE.json north star).
    * Same recurrence as [[pageRank]] but float sums follow GraphX's
    * partition order, so it is NOT bit-deterministic — use the
    * DataFrame form when results must be reproducible/oracle-checked,
    * this one to interop with the GraphX algorithm library.
    */
  def pageRankGraphX(edges: DataFrame, iterations: Int,
                     reset: Double = 0.15): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = edges.sparkSession
    val edgeRdd = edges.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val graph = Graph.fromEdges(edgeRdd, defaultValue = 1.0)
    val ranks = graph.staticPageRank(iterations, reset).vertices
    spark.createDataFrame(ranks.map { case (id, r) => (id, r) })
      .toDF("id", "rank")
  }

  /** Degree table: per vertex, out-, in-, and total degree. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("degree", col("out_deg") + col("in_deg"))
  }

  /** k-core decomposition by iterative peeling: drop every vertex
    * with degree < k, recompute degrees, repeat. After enough rounds
    * the survivors are exactly the k-core (the maximal subgraph of
    * min-degree ≥ k) — the "dense kernel" filter for co-occurrence
    * graphs (boilerplate-product clusters, spam rings) where
    * [[triangleCount]] is the density METRIC and this is the density
    * EXTRACTOR. Fixed `iterations` so the oracle can replay the
    * unrolled peel; callers needing guaranteed convergence run a spec
    * probe (one more round must change nothing — peeling is monotone,
    * so a fixed point is THE k-core). Each round is one degree
    * aggregate + two semi-join filters, checkpointed so round t+1
    * does not recompute rounds 1..t.
    *
    * Input treated as undirected; self-loops dropped, edges
    * canonicalized + distinct. Returns surviving (id, degree).
    */
  def kCore(edges: DataFrame, k: Int, iterations: Int,
            scope: CacheScope = CacheScope.global): DataFrame = {
    require(k >= 1 && iterations >= 1)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // convergence-loop floor scope (r17): each peel round materializes
    // a tiny edge set — the global 256k AQE floor over-fans those
    // per-round shuffles into rounds x tasks x fixed-cost task storms
    // (32-core A/B: 4.31 s at 256k vs 3.36 s at 1m). The round loop
    // runs at Spark's 1m default; the terminal degree aggregate (lazy,
    // runs at the caller's action) keeps the session floor.
    graft.GraftSession.withMinCoalesced(edges.sparkSession, "1m") {
      var e = scope.checkpoint(edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
      for (_ <- 1 to iterations) {
        val keep = degrees(e).filter(col("d") >= k).select(col("id"))
        e = scope.checkpoint(e
          .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
      }
      degrees(e).withColumnRenamed("d", "degree")
    }
  }

  /** Convergence-safe k-core: same peeling recurrence as [[kCore]],
    * iterated until a round removes nothing — and since peeling is
    * monotone, that fixed point IS the k-core — with `maxIterations`
    * as a runaway bound. The probe is the same limit-1 emptiness check
    * as [[connectedComponentsConverged]]: "does any surviving vertex
    * still have degree < k" touches at most one row, not a full count.
    * A fixed-depth peel that stops early returns a SUPERSET of the
    * k-core (vertices of degree < k still present — under-filtering,
    * the mirror of fixed-depth CC's under-dedup), so this is the
    * production path; [[kCore]] stays for oracle replay (a
    * data-dependent round count cannot be mirrored in static SQL).
    *
    * Returns surviving (id, degree); on a runaway-bound exit the
    * non-convergence is visible as degree < k rows in the output.
    */
  def kCoreConverged(edges: DataFrame, k: Int, maxIterations: Int = 50,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    require(k >= 1 && maxIterations >= 1)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // convergence-loop floor scope (r17) — see [[kCore]]: the probe +
    // re-checkpoint actions per round run at Spark's 1m floor (32-core
    // A/B via g_kcore_cert: 4.26 s at 256k vs 3.02 s at 1m).
    graft.GraftSession.withMinCoalesced(edges.sparkSession, "1m") {
      var e = scope.checkpoint(edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
      var changed = 1L
      var iter = 0
      while (changed > 0L && iter < maxIterations) {
        // deg derives from the round's CHECKPOINTED edge set, so the
        // probe and the keep-filter each cost one scan + aggregate over
        // materialized rows — no recursive recompute of earlier rounds
        val deg = degrees(e)
        changed = deg.filter(col("d") < k).limit(1).count()
        if (changed > 0L) {
          val keep = deg.filter(col("d") >= k).select(col("id"))
          e = scope.checkpoint(e
            .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
            .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
            .select(col("a"), col("b")))
        }
        iter += 1
      }
      degrees(e).withColumnRenamed("d", "degree")
    }
  }

  /** Exact triangle count via degree-ordered orientation (the MapReduce
    * triangle algorithm of Suri & Vassilvitskii 2011). Treats the input
    * as undirected: self-loops dropped, edges canonicalized + distinct.
    *
    * The naive wedge join enumerates Σ deg(v)² pairs — a single hub
    * vertex of degree 10^6 contributes 10^12 wedges, the classic
    * power-law blow-up. Orienting every edge from its (degree, id)-
    * smaller endpoint to the larger caps every vertex's OUT-degree at
    * O(√|E|), so the wedge join enumerates only out-neighbor pairs of
    * the low vertex: Σ outdeg(v)² = O(|E|^{3/2}) total — the optimal
    * bound, hub-proof. Three shuffles (degree agg, wedge self-join,
    * closing-edge join), all equi-joins.
    *
    * Returns one row (n_edges, n_wedges, n_triangles) — n_wedges is
    * the candidate count, the work metric that tells you whether the
    * orientation is containing the skew.
    */
  def triangleCount(edges: DataFrame,
                    scope: CacheScope = CacheScope.global): DataFrame = {
    val e = scope.persist(edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    val deg = scope.persist(
      e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d")))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = e.join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("src"),
        when(lowFirst, col("b")).otherwise(col("a")).as("dst"))
    // oriented edges + the destination's rank, reused by both sides of
    // the wedge self-join
    val oo = scope.persist(
      o.join(deg.select(col("id").as("dst"), col("d").as("dr")), "dst"))
    val wedges = oo.as("e1").join(oo.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dr") < col("e2.dr") ||
            (col("e1.dr") === col("e2.dr") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w2"))
    // o is distinct, so each wedge matches at most one closing edge —
    // an inner join counts triangles without double counting
    val tri = wedges.join(oo.select(col("src").as("v"), col("dst").as("w2")),
      Seq("v", "w2"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** HITS hubs-and-authorities (Kleinberg): auth_{t}(v) = Σ_{u→v}
    * hub_{t-1}(u), hub_t(u) = Σ_{u→v} auth_t(v), each vector
    * L1-normalized after its update. Complements PageRank on the same
    * graph view: PageRank ranks by random-walk mass, HITS separates
    * "points at good things" (hub) from "is pointed at" (authority) —
    * the directed-hierarchy shape (order→customer→nation→region)
    * makes the two rankings genuinely different.
    *
    * Determinism: every sum goes through the same decimal→×1e9→BIGINT
    * hop as [[pageRank]], and each normalized value is re-quantized to
    * the 1e-9 grid, so both the per-vertex sums and the scalar L1
    * totals are partition-order-free and replay bit-for-bit in any
    * engine. The L1 total is a 1-row aggregate broadcast into the
    * division — a scalar join, not a data shuffle.
    *
    * Plan shape: per iteration, two keyed aggregates (the two message
    * directions) + two 1-row broadcasts — the same one-shuffle-per-
    * message-pass discipline as [[pageRank]]; edges are checkpointed
    * once and reused.
    */
  def hits(edges: DataFrame, iterations: Int,
           scope: CacheScope = CacheScope.global): DataFrame = {
    // the two message directions join on different edge keys (src for
    // the auth pass, dst for the hub pass), so keep TWO checkpointed
    // copies, each pre-partitioned on its join key — the pageRank
    // discipline. The score side arrives hash-partitioned by id from
    // its groupBy, so every per-iteration join is exchange-free and
    // the only shuffle per half-iteration is the message aggregate.
    // eByDst and vertices derive FROM the materialized eBySrc (not a
    // third checkpointed copy of the distinct edge set): one fewer
    // materialization up front, and the distinct still runs once.
    val eBySrc = scope.checkpoint(edges.select(col("src"), col("dst"))
      .distinct().repartition(col("src")))
    val eByDst = scope.checkpoint(eBySrc.repartition(col("dst")))
    val vertices = scope.checkpoint(eBySrc.select(col("src").as("id"))
      .union(eBySrc.select(col("dst").as("id"))).distinct())
    // decimal sum → exact integer grid → double (the pageRank hop)
    def qsum(c: Column): Column =
      round(sum(c.cast("decimal(27,15)")) * 1000000000L)
        .cast("long").cast("double") / 1.0e9
    // IEEE division of two grid doubles, re-quantized to the grid
    def qdiv(n: Column, d: Column): Column =
      (round(n / d * 1000000000L).cast("long").cast("double") / 1.0e9)
    val zeroV = scope.checkpoint(vertices.select(col("id"), lit(0.0).as("v")))
    var hub = vertices.select(col("id"), lit(1.0).as("v"))
    var auth = zeroV
    for (_ <- 1 to iterations) {
      // raw sums are referenced twice each (normalize + L1 total), so
      // checkpoint them — plans stay constant-size per iteration (the
      // connectedComponents discipline), instead of doubling
      val authRaw = scope.checkpoint(
        eBySrc.join(hub, eBySrc("src") === hub("id"))
        .select(col("dst").as("id"), col("v"))
        .unionByName(zeroV)
        .groupBy(col("id")).agg(qsum(col("v")).as("v")))
      val authTot = authRaw.agg(qsum(col("v")).as("tot"))
      auth = authRaw.crossJoin(broadcast(authTot))
        .select(col("id"), qdiv(col("v"), col("tot")).as("v"))
      val hubRaw = scope.checkpoint(
        eByDst.join(auth, eByDst("dst") === auth("id"))
        .select(col("src").as("id"), col("v"))
        .unionByName(zeroV)
        .groupBy(col("id")).agg(qsum(col("v")).as("v")))
      val hubTot = hubRaw.agg(qsum(col("v")).as("tot"))
      hub = hubRaw.crossJoin(broadcast(hubTot))
        .select(col("id"), qdiv(col("v"), col("tot")).as("v"))
    }
    hub.select(col("id"), col("v").as("hub"))
      .join(auth.select(col("id"), col("v").as("auth")), Seq("id"), "full")
      .select(col("id"), coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
  }

  /** DETERMINISTIC random walks — the graph-embedding corpus
    * generator (DeepWalk/node2vec's sampling pass) with the
    * randomness replaced by the engine's deterministic hash, so the
    * walk corpus replays bit-for-bit on any cluster layout and in
    * the SQL oracle: at step i from node v the walk takes neighbor
    * index detHash(v·1000003 + i) mod deg(v) over the
    * dst-ascending-indexed adjacency. A node with no out-edges ends
    * the walk (nulls from there on — left joins, so partial walks
    * surface instead of vanishing). Emits one wide row per source:
    * (start, n1 … nSteps).
    *
    * Scale shape: the adjacency is indexed ONCE (one rank window
    * over the edge list); each step is one equi-join of the frontier
    * against it — `steps` shuffles of frontier size, never edge
    * size, and no per-walk state on the driver. The hash pick needs
    * `deg` on the matched row only, so the join stays an equi-join
    * on the node id with the index-pick as a residual predicate.
    */
  def deterministicWalks(edges: DataFrame, sources: DataFrame,
                         steps: Int,
                         scope: CacheScope = CacheScope.global): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val w = Window.partitionBy(col("src")).orderBy(col("dst").asc)
    val adj = scope.checkpoint(edges.select(col("src"), col("dst"))
      .withColumn("idx", row_number().over(w).cast("long") - 1L)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src")))))
    var st = sources.select(col("id").as("start"), col("id").as("n0"))
    for (i <- 1 to steps) {
      val prev = if (i == 1) "n0" else s"n${i - 1}"
      val a = adj.select(col("src").as(s"__s$i"), col("dst").as(s"n$i"),
        col("idx").as(s"__i$i"), col("deg").as(s"__d$i"))
      st = st.join(a,
          st(prev) === a(s"__s$i") &&
            a(s"__i$i") === Sampling.detHash(st(prev) * 1000003L + i)
              % a(s"__d$i"),
          "left")
        .drop(s"__s$i", s"__i$i", s"__d$i")
    }
    st.drop("n0")
  }

  /** NON-BACKTRACKING deterministic walks — node2vec's core bias
    * (p → ∞: never return to the node you just left) with the same
    * hash-replayable determinism as [[deterministicWalks]]. At step
    * i ≥ 2 the previous node is EXCLUDED from the candidate set by
    * index surgery, not by rejection sampling: look up prev's index
    * p in cur's adjacency (one extra equi-join on (cur, prev)), draw
    * j = detHash(cur·1000003 + i) mod (deg − 1), and take index
    * j + 1{j ≥ p} — a bijection onto the remaining neighbors, so
    * the pick stays uniform over them and replays exactly. deg = 1
    * with prev as the only neighbor is a dead end (guarded before
    * the modulo; nulls from there on).
    *
    * Same scale shape as the unbiased walker: the indexed adjacency
    * builds once; each step is two frontier-sized equi-joins
    * (prev-index lookup + pick), zero driver state.
    */
  def deterministicWalksNoBacktrack(edges: DataFrame, sources: DataFrame,
                                    steps: Int,
                                    scope: CacheScope = CacheScope.global)
      : DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val w = Window.partitionBy(col("src")).orderBy(col("dst").asc)
    val adj = scope.checkpoint(edges.select(col("src"), col("dst"))
      .withColumn("idx", row_number().over(w).cast("long") - 1L)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src")))))
    var st = sources.select(col("id").as("start"), col("id").as("n0"))
    for (i <- 1 to steps) {
      val cur = if (i == 1) "n0" else s"n${i - 1}"
      val hash = Sampling.detHash(st(cur) * 1000003L + i)
      if (i == 1) {
        val a = adj.select(col("src").as(s"__s$i"), col("dst").as(s"n$i"),
          col("idx").as(s"__i$i"), col("deg").as(s"__d$i"))
        st = st.join(a,
            st(cur) === a(s"__s$i") && a(s"__i$i") === hash % a(s"__d$i"),
            "left")
          .drop(s"__s$i", s"__i$i", s"__d$i")
      } else {
        val prev = s"n${i - 2}"
        val pe = adj.select(col("src").as(s"__ps$i"), col("dst").as(s"__pd$i"),
          col("idx").as(s"__pi$i"))
        st = st.join(pe,
          st(cur) === col(s"__ps$i") && st(prev) === col(s"__pd$i"), "left")
        val a = adj.select(col("src").as(s"__s$i"), col("dst").as(s"n$i"),
          col("idx").as(s"__i$i"), col("deg").as(s"__d$i"))
        val excl = when(col(s"__pi$i").isNotNull, 1L).otherwise(0L)
        val d2 = a(s"__d$i") - excl
        val j = hash % d2
        val pick = when(d2 > 0,
          j + when(col(s"__pi$i").isNotNull && j >= col(s"__pi$i"), 1L)
            .otherwise(0L))
        st = st.join(a, st(cur) === a(s"__s$i") && a(s"__i$i") === pick,
            "left")
          .drop(s"__ps$i", s"__pd$i", s"__pi$i", s"__s$i", s"__i$i",
            s"__d$i")
      }
    }
    st.drop("n0")
  }

  /** Newman MODULARITY of a vertex partition — the standard quality
    * score for a community assignment (label propagation, CC, an
    * external clustering): Q = Σ_c [ e_c/m − (deg_c/2m)² ] over the
    * UNDIRECTED view of `edges`, where m = |E|, e_c = intra-community
    * edge count and deg_c = total degree of community c. Emits one
    * row per community with the exact integer ingredients
    * (n_vertices, intra_edges, degree) plus the contribution as the
    * EXACT RATIONAL pair (q_num, q_den) in decimal(38,0):
    *   q_num = 4·m·e_c − deg_c²,   q_den = 4·m²
    * — the ts_trend_slope convention: no division ever happens, so
    * the score replays bit-exactly in any engine, and decimal (not
    * int64) keeps 4·m·e_c from wrapping at lake scale (it exceeds
    * 2⁶³ near m ≈ 1.5e9 undirected edges). Σ q_num / q_den is the
    * modularity; consumers divide at whatever precision they need.
    *
    * `assign` maps id → community; vertices missing from `assign`
    * would silently vanish from every term, so they are rejected
    * (inner-join count must cover both endpoints of every edge —
    * checked with one aggregate, failing fast like pageRankWeighted's
    * weight guard).
    *
    * Scale shape: two broadcast-friendly joins of the edge list
    * against the assignment (assignment is vertex-sized but
    * community-keyed aggregates combine map-side), one keyed
    * aggregate per term, and a 1-row total broadcast back — no
    * window, no all-pairs, no driver math beyond the guard count.
    */
  def modularity(edges: DataFrame, assign: DataFrame): DataFrame = {
    val a = assign.select(col("id"), col("community"))
    val e = edges.select(col("src"), col("dst"))
    val withC = e
      .join(a.select(col("id"), col("community").as("c_src")),
        e("src") === col("id"), "left").drop("id")
      .join(a.select(col("id"), col("community").as("c_dst")),
        e("dst") === col("id"), "left").drop("id")
    val unassigned = withC.filter(col("c_src").isNull || col("c_dst").isNull)
      .limit(1).count()
    require(unassigned == 0,
      "modularity: every edge endpoint must appear in the assignment")
    val m = withC.agg(count(lit(1)).cast("decimal(38,0)").as("m"))
    // degree view: each edge contributes 1 to both endpoints' degree
    val degC = withC.select(col("c_src").as("community"))
      .unionByName(withC.select(col("c_dst").as("community")))
      .groupBy(col("community"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("degree"))
    val intraC = withC.filter(col("c_src") === col("c_dst"))
      .groupBy(col("c_src").as("community"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("intra_edges"))
    val nC = a.groupBy(col("community"))
      .agg(count(lit(1)).as("n_vertices"))
    nC.join(degC, Seq("community"), "left")
      .join(intraC, Seq("community"), "left")
      .na.fill(0L, Seq("n_vertices"))
      .withColumn("degree",
        coalesce(col("degree"), lit(0).cast("decimal(38,0)")))
      .withColumn("intra_edges",
        coalesce(col("intra_edges"), lit(0).cast("decimal(38,0)")))
      .crossJoin(broadcast(m))
      .withColumn("q_num",
        (lit(4).cast("decimal(38,0)") * col("m") * col("intra_edges") -
          col("degree") * col("degree")).cast("decimal(38,0)"))
      .withColumn("q_den",
        (lit(4).cast("decimal(38,0)") * col("m") * col("m"))
          .cast("decimal(38,0)"))
      .select(col("community"), col("n_vertices"),
        col("intra_edges").cast("long").as("intra_edges"),
        col("degree").cast("long").as("degree"),
        // rational pair ships as canonical integer strings: exact at
        // int128 range and hash-portable (wide DECIMAL is not)
        col("q_num").cast("string").as("q_num"),
        col("q_den").cast("string").as("q_den"))
  }

  /** Luby-style MAXIMAL INDEPENDENT SET with deterministic hash
    * priorities: each round, every still-active vertex whose
    * ([[Sampling.detHash2]], id) priority is a LOCAL MINIMUM among
    * its active neighbors joins the set; winners and their neighbors
    * leave the graph. The hash replaces Luby's coin flips — the
    * expected O(log n) round count carries over (the priority order
    * is hash-random w.r.t. the topology), and the run is bit-
    * replayable in any engine, matching the engine's no-unreplayable-
    * randomness rule (see deterministicWalks).
    *
    * `rounds` is FIXED (oracle-replayable — a data-dependent round
    * count cannot be mirrored in static SQL, same trade as
    * [[kCore]]); vertices still active after the last round are
    * emitted with `sel_round = -1`, so non-convergence is visible in
    * the result instead of silently truncating the set. Per round:
    * one neighbor-compare equi-join + two anti-joins, all on the
    * vertex key — no windows, no driver state beyond the loop
    * counter.
    */
  def maximalIndependentSet(edges: DataFrame, rounds: Int,
                            scope: CacheScope = CacheScope.global): DataFrame = {
    require(rounds >= 1)
    // convergence-loop floor scope (r17) — see [[kCore]]: per-round
    // winner/active/adj checkpoints run at Spark's 1m floor (32-core
    // A/B: g_mis 6.65 s at 256k vs 5.40 s at 1m).
    graft.GraftSession.withMinCoalesced(edges.sparkSession, "1m") {
    val canon = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    // symmetric adjacency: one row per directed neighbor pair
    var adj = scope.checkpoint(
      canon.select(col("a").as("v"), col("b").as("n"))
        .union(canon.select(col("b").as("v"), col("a").as("n"))))
    var active = scope.checkpoint(
      adj.select(col("v")).distinct()
        .withColumn("h", Sampling.detHash2(col("v"))))
    var mis: DataFrame = null
    for (r <- 1 to rounds) {
      // a vertex LOSES if any active neighbor precedes it in (h, id)
      val losers = adj
        .join(active, Seq("v"))
        .join(active.select(col("v").as("n"), col("h").as("nh")), Seq("n"))
        .filter(col("nh") < col("h") ||
          (col("nh") === col("h") && col("n") < col("v")))
        .select(col("v")).distinct()
      // winners are CHECKPOINTED: the round's 3-way losers join is
      // referenced both by this round's removal step and by the final
      // mis union — unmaterialized, the terminal action re-ran every
      // round's neighbor-compare join a second time (r16: one losers
      // join per round instead of two; winner frames are tiny)
      val winners = scope.checkpoint(
        active.join(losers, Seq("v"), "left_anti")
          .select(col("v"), lit(r).as("sel_round")))
      mis = if (mis == null) winners else mis.unionByName(winners)
      // winners and their neighbors leave
      val removed = winners.select(col("v"))
        .union(adj.join(winners.select(col("v").as("n")), Seq("n"), "left_semi")
          .select(col("v")))
        .distinct()
      active = scope.checkpoint(
        active.join(removed, Seq("v"), "left_anti"))
      adj = scope.checkpoint(adj
        .join(active.select(col("v")), Seq("v"), "left_semi")
        .join(active.select(col("v").as("n")), Seq("n"), "left_semi"))
    }
    mis.unionByName(active.select(col("v"), lit(-1).as("sel_round")))
    }
  }
}
