package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic corpus-sampling operators for training-data curation —
  * the selection step that follows dedup/quality-scoring in a 100 TB
  * pipeline (downsample the dominant language, cap any one source's
  * contribution, fill a token budget with the best documents).
  *
  * All three are driven by a multiplicative integer id mix rather than
  * `rand()`: the sample is a pure FILTER — reproducible across runs,
  * engines (the arithmetic replays exactly in the SQL oracle), retries,
  * and cluster sizes, and it costs zero shuffle where a `sample()`-
  * based stratification would need per-stratum passes.
  */
object Sampling {

  /** Deterministic pseudo-uniform mix of a nonneg integer id in
    * [0, 2^31): the inner `%` keeps the product below 2^63, so the
    * arithmetic is exact in both Spark and DuckDB (same form as
    * [[Similarity.seedHash]]). NOT cryptographic — just uncorrelated
    * with id locality.
    */
  def detHash(id: Column): Column =
    (id % 94906249L) * 1103515245L % 2147483647L

  /** Two mixing rounds of [[detHash]]. One multiplicative round maps a
    * CONTIGUOUS id range onto an arithmetic lattice mod 2^31-1 — fine
    * as a sort key or a rate gate at coarse granularity, but `% small`
    * bucketing of a lattice leaves residue gaps until N is large (500
    * consecutive ids hit only 76 of 100 buckets). The second round
    * breaks the lattice; use this wherever buckets must all populate
    * at small N (split assignment, bucket audits).
    */
  def detHash2(id: Column): Column = detHash(detHash(id))

  /** [[detHash]] as DuckDB SQL over expression `k` — the oracle-side
    * twin. Oracle batches must reference THIS, never re-type the
    * literal: a future change to [[detHash]] would otherwise silently
    * desynchronize whichever private copies didn't get the memo.
    */
  def detHashSql(k: String): String =
    s"(($k) % 94906249) * 1103515245 % 2147483647"

  /** [[detHash2]]'s oracle-side twin. */
  def detHash2Sql(k: String): String = detHashSql(detHashSql(k))

  /** Per-stratum Bernoulli sampling with a deterministic gate:
    * keep a row iff `detHash(id) % 10000` falls under its stratum's
    * rate (in basis points, 0..10000 — integral so the threshold is
    * exact; a double rate times 10000 is not). Unlisted strata use
    * `defaultBp`. One codegen'd filter, no shuffle, no per-stratum
    * passes — the shape that survives any scale-up.
    */
  def stratifiedBp(df: DataFrame, stratum: Column, id: Column,
                   ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      s"rates must be basis points in [0, 10000]")
    val rate = coalesce(element_at(typedLit(ratesBp), stratum.cast("string")),
      lit(defaultBp))
    df.filter(detHash(id) % 10000L < rate)
  }

  /** Solve for the per-stratum keep rates that achieve a TARGET
    * mixture (the step that produces [[stratifiedBp]]'s rate map):
    * with observed counts n_s and target shares t_s, the largest
    * downsample-only corpus with mixture t is N = min_s(n_s / t_s)
    * total rows, i.e. keep_rate_s = t_s * N / n_s (the scarcest
    * stratum relative to its target keeps everything). One aggregate
    * over the corpus + arithmetic on the tiny per-stratum table —
    * shares not covered by `targetShares` get rate 0. Returns
    * (stratum, n_rows, target_share, keep_rate, keep_bp) where
    * keep_bp = floor(rate * 10000) feeds [[stratifiedBp]] directly.
    */
  def mixtureRates(df: DataFrame, stratum: Column,
                   targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.values.forall(t => t > 0.0),
      "target shares must be positive")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"))
    val share = element_at(typedLit(targetShares), col("stratum").cast("string"))
    val withShare = counts.withColumn("target_share", share)
    // N = min over covered strata of n_s / t_s (global aggregate on a
    // strata-sized frame; cross-joined back as a 1-row literal frame)
    val n = withShare.filter(col("target_share").isNotNull)
      .agg(min(col("n_rows").cast("double") / col("target_share")).as("__N"))
    withShare.crossJoin(broadcast(n))
      .withColumn("keep_rate",
        coalesce(col("target_share") * col("__N") / col("n_rows"), lit(0.0)))
      .withColumn("keep_bp", floor(col("keep_rate") * 10000.0).cast("int"))
      .drop("__N")
  }

  /** Temperature-scaled mixture at α = 1/2 — the standard
    * multilingual-pretraining rebalance (sample stratum s with
    * probability ∝ n_s^α, α < 1 upweighting rare strata), solved as
    * DOWNSAMPLE-ONLY keep rates: with t_s ∝ √n_s the largest corpus
    * achieving the target mixture keeps
    * keep_rate_s = √(n_min / n_s) — the smallest stratum keeps 100%
    * and a stratum 100× larger keeps 10%. The normalizer Σ√n cancels
    * algebraically, so the computation is ONE keyed count + a
    * broadcast min: no double summation whose partition order could
    * wobble the last ulp, and √ of a double ratio is IEEE
    * correctly-rounded — any engine replays the rate bit-for-bit
    * (pow(x, α) for general α is NOT correctly rounded, which is why
    * the α dial is the exponent family {1/2, 1/4, ...} via nested
    * sqrt, not a float exponent). `keep_bp` feeds [[stratifiedBp]]'s
    * basis-point gate.
    */
  def temperatureRatesSqrt(df: DataFrame, stratum: Column): DataFrame = {
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"))
    val nMin = counts.agg(min(col("n_rows")).as("__m"))
    counts.crossJoin(broadcast(nMin))
      .withColumn("keep_rate", sqrt(col("__m").cast("double") / col("n_rows")))
      .withColumn("keep_bp", floor(col("keep_rate") * 10000.0).cast("int"))
      .drop("__m")
  }

  /** Keep at most `cap` rows per group, chosen deterministically by
    * (detHash(id), id) order. Two-phase like a distributed top-k: a
    * partition-local rank first bounds the candidates to
    * `partitions x cap` per group, so the per-group shuffle never
    * carries a whole skewed group to one reducer — only its first
    * `cap` rows from each map partition.
    */
  def capPerGroup(df: DataFrame, group: Column, id: Column, cap: Int): DataFrame = {
    val ord = Seq(detHash(id).asc, id.asc)
    val w1 = Window.partitionBy(group, col("__pid")).orderBy(ord: _*)
    val w2 = Window.partitionBy(group).orderBy(ord: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= cap)
      .drop("__pid", "__r")
      .withColumn("__r", row_number().over(w2))
      .filter(col("__r") <= cap)
      .drop("__r")
  }

  /** Greedy per-stratum selection up to a token budget: rank the
    * stratum by `ord` (best first — the caller's quality ordering,
    * which MUST be total for replayability) and keep rows while the
    * running token total stays within `budget`. Returns the input
    * plus the running total as `cum_tokens`.
    *
    * The running sum is a per-stratum sequential scan by construction
    * (each row's admission depends on every better row), so one
    * reducer per stratum: fine when strata are languages or sources
    * (few, large), not a per-user key. For huge strata the scale path
    * is a two-pass variant — histogram the per-rank token counts,
    * find the cutoff rank, then filter — trading exactness of the
    * boundary row for full parallelism.
    */
  def tokenBudget(df: DataFrame, stratum: Column, tokens: Column,
                  ord: Seq[Column], budget: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** The huge-stratum scale path for [[tokenBudget]]: a distributed
    * prefix sum instead of one reducer per stratum. Range-partition by
    * (stratum, ord) so each stratum spans MANY partitions in order,
    * then cum(row) = running sum within its (stratum, physical
    * partition) + the total of all earlier partitions of the same
    * stratum. The per-partition windows are parallel; the offset table
    * is one tiny aggregate (partitions x strata rows) broadcast back.
    * `ord` must be total (same requirement as [[tokenBudget]]), which
    * makes every row's cum value independent of where the range
    * boundaries land — identical output to the window form (spec
    * proves equality), at any parallelism.
    */
  def tokenBudgetLarge(df: DataFrame, stratum: Column, tokens: Column,
                       ord: Seq[Column], budget: Long,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val rangeCols = stratum.asc +: ord.map(c => c)
    // the pid-stamped frame feeds BOTH the offset table and the final
    // join, and the stamp is only meaningful for ONE materialization:
    // two independent executions may range-sample different partition
    // boundaries (the sampler's seed follows RDD identity), which
    // would misalign offsets against pids. Exchange reuse usually
    // dedupes the two subplans anyway — checkpointing makes the
    // single-assignment property explicit instead of optimizer-
    // dependent, at the cost of one materialization pass.
    val sorted = scope.checkpoint(df
      .repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val partSums = sorted.groupBy(col("__pid"), stratum.as("__s"))
      .agg(sum(tokens).as("__psum"))
    // total of all EARLIER partitions of the same stratum (rows-between
    // excludes the current partition's own sum)
    val offsets = partSums.withColumn("__off",
      coalesce(sum(col("__psum")).over(
        Window.partitionBy(col("__s")).orderBy(col("__pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // fresh names so the derived-frame self-join cannot collapse the
      // join condition onto sorted's own attributes
      .select(col("__pid").as("__opid"), col("__s"), col("__off"))
    val wLocal = Window.partitionBy(stratum, col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      // null-safe stratum equality: a NULL stratum is a group of its
      // own in the window form (and in SQL PARTITION BY); a
      // null-unsafe === here would silently drop those rows
      .join(broadcast(offsets),
        col("__pid") === col("__opid") && (stratum <=> col("__s")))
      .withColumn("cum_tokens", col("__off") + sum(tokens).over(wLocal))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__opid", "__s", "__off")
  }

  /** DETERMINISTIC PROPORTIONAL INTERLEAVE (stride scheduling): lay
    * the corpus into one training order where each source appears
    * spread evenly at its share — the i-th doc of a source with n_s
    * rows lands near global fraction i/n_s — instead of source-
    * concatenated (which trains on one domain for hours) or
    * globally-shuffled (which loses the per-source curriculum
    * order). Each row gets the stride midpoint key
    *   key = (2·i − 1)·N div (2·n_s)
    * (i = the row's 1-based rank inside its source under `ord`,
    * N = corpus total) and the global position is assigned by the
    * [[GlobalOrder]] distributed prefix sum over
    * (key, source, i) — a total order, so the layout replays
    * bit-for-bit, and no single-reducer global sort ever runs.
    *
    * Emits input + `src_idx` (i), `pos` (global 0-based? —
    * [[GlobalOrder.withGlobalIndex]]'s contract, 1-based `pos`).
    * One window per source for the rank, a broadcast of the
    * (source, n_s) counts + 1-row N, then the prefix-sum indexer:
    * two shuffles total regardless of scale.
    */
  def interleaveProportional(df: DataFrame, source: Column,
                             ord: Seq[Column]): DataFrame = {
    val wSrc = Window.partitionBy(source).orderBy(ord: _*)
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__ns"))
    val total = df.agg(count(lit(1)).as("__n"))
    val ranked = df
      .withColumn("src_idx", row_number().over(wSrc).cast("long"))
      .join(broadcast(counts), source === col("__src"))
      .crossJoin(broadcast(total))
      .withColumn("__key",
        expr("(2L * src_idx - 1L) * __n div (2L * __ns)"))
    GlobalOrder.withGlobalIndex(
        ranked, Seq(col("__key").asc, source.asc, col("src_idx").asc))
      .drop("__src", "__ns", "__n", "__key")
  }
}
