package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => V}
import graft.plans.VectorExpressions.cosineFast

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; one broadcast of the
  * query set, no shuffle of the corpus). Scale path: IVF — k-means-ish
  * coarse centroids assign each vector to a cell; queries probe the
  * nearest `nProbe` cells, turning top-k into a bucket join that
  * touches `nProbe / nCells` of the corpus.
  */
object Similarity {

  /** Exact brute-force top-k by cosine: for each query row, the k
    * nearest corpus rows. The query side is broadcast (it is small by
    * construction); the corpus is never shuffled — per-partition
    * scoring, then a k-row window per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, qIdCol: String,
                     k: Int): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qIdCol).as("qid"), col(vecCol).as("qv"))))
      .withColumn("cos", cosineFast(col("v"), col("qv")))
    twoPhaseTopK(scored, k)
  }

  /** Two-phase distributed top-k per query: a single window on qid
    * would shuffle the whole scored set to one reducer per query
    * (total skew when queries are few). Phase 1 ranks within
    * (qid, physical partition) — the shuffle key is evenly spread and
    * its output is ≤ partitions × k rows per query, a guaranteed
    * superset of the true top-k whatever the data placement. Phase 2
    * ranks that small candidate set exactly, so the result is
    * deterministic. Input must have (qid, id, cos).
    */
  def twoPhaseTopK(scored: DataFrame, k: Int): DataFrame = {
    val ord = Seq(col("cos").desc_nulls_last, col("id").asc)
    val w1 = Window.partitionBy(col("qid"), col("__pid")).orderBy(ord: _*)
    val cand = scored.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k).drop("__r", "__pid")
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** SQ8 store builder: (id, v: array<double>, mn, mx, q: array<int>)
    * — the int8-quantized form of an embedding corpus with the
    * per-vector codebook alongside. mn/mx materialize as COLUMNS
    * before the per-element lambda (embedded in the lambda, the
    * interpreted HOF re-evaluates array_min/array_max per element —
    * O(d^2) per vector, measured 2.8s → sub-second at sf0.1). Same
    * arithmetic as [[graft.functions.VectorFunctions.quantizeInt8]]
    * (explicit floor(+0.5) — engine-stable rounding); shared by the
    * quantize and quantized-search queries so the two cannot drift.
    */
  def sq8Store(corpus: DataFrame, vecCol: String, idCol: String): DataFrame =
    corpus
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("v"))
      .select(col("id"), col("v"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
      .select(col("id"), col("v"), col("mn"), col("mx"),
        transform(col("v"), x =>
          when(col("mx") > col("mn"),
            floor((x - col("mn")) / (col("mx") - col("mn")) * 255.0 + 0.5)
              .cast("int") - 128)
            .otherwise(lit(-128))).as("q"))

  /** Nearest-centroid assignment — argmin as an aggregate, not a
    * window: the nCells candidate rows per vector are generated
    * locally (broadcast cross join), so a partial min collapses them
    * map-side and the one shuffle carries ONE row per vector — the
    * window form shuffled nCells copies of every embedding payload to
    * rank them. Ordering key mirrors a window's
    * (cos desc_nulls_last, cell asc): NaN cosine wins (desc treats
    * NaN as largest), null cosine loses.
    */
  private def assignCells(corpus: DataFrame, vecCol: String, idCol: String,
                          centroids: DataFrame): DataFrame = {
    val cosC = cosineFast(col("v"), col("cv"))
    val ordKey = when(isnan(cosC), lit(Double.NegativeInfinity))
      .when(cosC.isNull, lit(Double.PositiveInfinity))
      .otherwise(-cosC)
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("v"),
        struct(ordKey.as("k"), col("cell").as("cell")).as("sc"))
      .groupBy(col("id"), col("v"))
      .agg(min(col("sc")).as("best"))
      .select(col("id"), col("v"), col("best.cell").as("cell"))
  }

  /** IVF index, cheap quantizer: centroids are the lowest-id corpus
    * vectors. Deterministic and join-free, but pathologically
    * clustered ids (e.g. insertion order follows content) give poor
    * cell balance — prefer [[ivfKMeans]] for the production path; this
    * form is kept as the trivially-replayable baseline the recall spec
    * compares against. Returns the corpus with a `cell` column.
    */
  def ivfAssign(corpus: DataFrame, vecCol: String, idCol: String,
                nCells: Int): (DataFrame, DataFrame) = {
    val centroids = corpus.orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("cv"))
    (assignCells(corpus, vecCol, idCol, centroids), centroids)
  }

  /** Deterministic multiplicative id mix for the k-means seed sample.
    * The inner % keeps the product below 2^63 for any nonneg id, so
    * the arithmetic is exact in both Spark and the DuckDB oracle
    * (BIGINT overflow would otherwise differ: Java wraps, DuckDB
    * errors). NOT a quality hash — just enough spread that the seed
    * sample is independent of id locality.
    */
  def seedHash(id: Column): Column =
    (id % 94906249L) * 1103515245L % 2147483647L

  /** IVF index, seeded deterministic k-means: init = the `nCells`
    * corpus vectors with the smallest [[seedHash]] (a deterministic
    * pseudo-random sample, immune to id-locality skew), then `iters`
    * Lloyd rounds of assign → element-wise-mean update. Means are
    * decimal-cast sums (exact, order-independent) divided in double,
    * so every round — and therefore the final index — is
    * bit-replayable in the SQL oracle. Cell ids stay the seed
    * vector's id across rounds; a cell that attracts no vectors in a
    * round simply drops out (standard Lloyd behavior, replayed
    * identically in SQL).
    *
    * Scale shape per round: one broadcast cross-join + argmin-agg
    * shuffle (one row per vector on the wire) and one
    * posexplode → (cell, pos) partial-agg shuffle (one row per
    * (cell, dimension) after map-side combine). No global windows, no
    * driver-side iteration state beyond the loop counter.
    */
  def ivfKMeans(corpus: DataFrame, vecCol: String, idCol: String,
                nCells: Int, iters: Int = 2,
                scope: CacheScope = CacheScope.global): (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // TakeOrderedAndProject: per-partition top-nCells, merged on the
    // driver — no global sort of the corpus
    var centroids = c.orderBy(seedHash(col("id")).asc, col("id").asc)
      .limit(nCells)
      .select(col("id").as("cell"), col("v").cast("array<double>").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = assignCells(corpus, vecCol, idCol, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast("double").cast("decimal(38,12)"))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e("m")).as("cv"))
    }
    // the final centroid frame is nCells rows behind `iters` chained
    // Lloyd rounds; every consumer broadcast (index assign, query
    // probes) would otherwise replay the whole k-means — pin it once
    (assignCells(corpus, vecCol, idCol, scope.persist(centroids)), centroids)
  }

  /** ANN top-k via IVF: probe the `nProbe` nearest cells per query,
    * exact cosine within the probed cells only.
    */
  def ivfTopK(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
              vecCol: String, qIdCol: String, k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("qid"), col(vecCol).as("qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosineFast(col("qv"), col("cv")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos_c").desc_nulls_last, col("cell").asc)
    val probes = qCells.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"))
    // same two-phase top-k as the brute-force path: the probed-cell
    // join still yields nProbe/nCells of the corpus per query, and a
    // single per-qid window would send all of it to one reducer
    val scored = indexed.join(broadcast(probes), Seq("cell"))
      .withColumn("cos", cosineFast(col("v"), col("qv")))
    twoPhaseTopK(scored, k)
  }

  /** Incremental IVF refresh: assign ONLY the delta vectors to the
    * EXISTING centroids and union them into the index — the
    * production cadence for a vector store (cheap delta-assign on
    * every ingest batch; full re-cluster only when occupancy drift
    * says so, which is what the per-cell `is_delta` split lets a
    * caller measure). The assign job reads nothing but the delta
    * rows plus the broadcast centroid table (nCells rows) — the
    * [[Dedup]] delta-store discipline applied to the ANN index; the
    * standing corpus is never rescanned.
    */
  def ivfDeltaAssign(indexed: DataFrame, centroids: DataFrame,
                     delta: DataFrame, vecCol: String, idCol: String)
      : DataFrame =
    indexed.select(col("id"), col("v"), col("cell"),
        lit(false).as("is_delta"))
      .unionByName(assignCells(delta, vecCol, idCol, centroids)
        .select(col("id"), col("v"), col("cell"),
          lit(true).as("is_delta")))

  /** Batch kNN JOIN via IVF — the corpus-sized-query-side variant of
    * [[ivfTopK]]. When |queries| ≈ |corpus| (cross-corpus semantic
    * dedup, dataset-vs-dataset contamination, full-corpus self-kNN),
    * broadcasting the probe set is wrong: it ships the whole query
    * corpus to every task. Here NEITHER big side is broadcast:
    *
    *   1. centroids (nCells rows — genuinely tiny) broadcast to the
    *      query side; per-query top-`nProbe` cells via a map-side
    *      collect-sort-slice argtop aggregate. The broadcast cross
    *      join colocates each query's nCells candidate rows in one
    *      task, so the partial aggregate collapses them BEFORE the
    *      shuffle — one row per query on the wire, never a per-qid
    *      window over shuffled candidates.
    *   2. probes ⋈ indexed corpus as a SHUFFLED equi-join on `cell`
    *      (shuffle-hash hinted, so the planner cannot fall back to
    *      broadcasting a "small-looking" probe side).
    *   3. the same two-phase top-k as every other ANN path.
    *
    * Skew: a popular cell is a hot join key — exactly the shape AQE
    * skew-join splitting handles (both sides shuffled on `cell`).
    */
  def ivfKnnJoin(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
                 vecCol: String, qIdCol: String, k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("qid"), col(vecCol).as("qv"))
    val cosC = cosineFast(col("qv"), col("cv"))
    val ordKey = when(isnan(cosC), lit(Double.NegativeInfinity))
      .when(cosC.isNull, lit(Double.PositiveInfinity))
      .otherwise(-cosC)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qv"),
        struct(ordKey.as("o"), col("cell").as("cell")).as("sc"))
      .groupBy(col("qid"), col("qv"))
      .agg(slice(array_sort(collect_list(col("sc"))), 1, nProbe).as("top"))
      .select(col("qid"), col("qv"),
        explode(transform(col("top"), t => t("cell"))).as("cell"))
    val scored = indexed.join(probes.hint("shuffle_hash"), Seq("cell"))
      .withColumn("cos", cosineFast(col("v"), col("qv")))
    twoPhaseTopK(scored, k)
  }

  /** TOP PRINCIPAL DIRECTION by deterministic power iteration —
    * matrix-free PCA on the uncentered second-moment matrix XᵀX,
    * entirely in DataFrame ops: each round computes per-row dots
    * x·v (one codegen'd fold over the array, no posexplode of the
    * corpus for the dot), then the per-dimension image w_d =
    * Σᵢ x_id·(xᵢ·v) (one posexplode + keyed aggregate), then
    * normalizes by max|w| (sup-norm — exact to take, one float
    * division to apply). Every aggregate runs the pageRank/HITS
    * double-quantization hop (decimal sum → 10⁻⁹ grid), so the
    * iterate — and therefore the result — is BIT-IDENTICAL on any
    * cluster layout and replays exactly in the SQL oracle.
    *
    * Starts from the all-ones vector (deterministic; orthogonality
    * to the principal direction is measure-zero and quantization
    * breaks it anyway). Returns (pos, v) rows of the unit-sup-norm
    * direction after `iters` rounds. Scale shape per round: one
    * corpus scan for the dots, one posexplode shuffle keyed on the
    * dimension (d distinct keys), a 1-row broadcast back — no
    * d×d matrix ever materializes, which is the point: covariance
    * PCA at 100 TB is feasible exactly when you stay matrix-free.
    */
  def powerIteration(emb: DataFrame, vecCol: String, dim: Int,
                     iters: Int,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    require(dim >= 1 && iters >= 1)
    def qsum(c: Column): Column =
      round(sum(c.cast("decimal(27,15)")) * 1000000000L)
        .cast("long").cast("double") / 1.0e9
    def qdiv(n: Column, d: Column): Column =
      (round(n / d * 1000000000L).cast("long").cast("double") / 1.0e9)
    val x = scope.persist(emb.select(
      transform(col(vecCol), e => e.cast("double")).as("x")))
    var vRow = x.sparkSession.range(1)
      .select(array_repeat(lit(1.0), dim).as("v"))
    for (_ <- 1 to iters) {
      val dotted = x.crossJoin(broadcast(vRow))
        .select(col("x"),
          aggregate(zip_with(col("x"), col("v"), (a, b) => a * b),
            lit(0.0), (acc, t) => acc + t).as("dot"))
      val w = dotted
        .select(posexplode(col("x")).as(Seq("pos", "xd")), col("dot"))
        .groupBy(col("pos"))
        .agg(qsum(col("xd") * col("dot")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      vRow = w.crossJoin(broadcast(mx))
        .withColumn("vd", qdiv(col("w"), col("mx")))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("vd")))),
          t => t.getField("vd")).as("v"))
    }
    vRow.select(posexplode(col("v")).as(Seq("pos", "v")))
  }
}
