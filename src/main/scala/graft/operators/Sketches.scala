package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable cardinality sketches for corpus telemetry.
  *
  * The reference's telemetry counters (main_graph_topraq.py:327-334)
  * are exact per-table counts — affordable there because the engine is
  * single-node over small feeds. At 100 TB the question becomes "how
  * many distinct users / URLs / shingles" across feeds too large to
  * hold a distinct set, which is what a k-minimum-values (KMV) sketch
  * answers: keep the k smallest values of a uniform hash over the key
  * domain; the k-th smallest estimates the density, so
  * `D ≈ (k-1) * M / h_k` (Bar-Yossef et al. 2002, the same estimator
  * family behind DataSketches' theta sketch).
  *
  * Built deterministically on [[Sampling.detHash]] (exact 63-bit
  * integer arithmetic in the mod-2^31-1 field), so the WHOLE sketch —
  * retention set, k-th value, and estimate — replays bit-for-bit in
  * the DuckDB oracle. Spark's own `approx_count_distinct` (HLL++) is
  * the throughput baseline but its binary registers are not
  * cross-engine checkable; this sketch is the verifiable flavor.
  *
  * The retention set is the MERGEABLE summary: for any split of the
  * feed, `retain_k(A ∪ B) = retain_k(retain_k(A) ∪ retain_k(B))` —
  * union the k-row sets, re-take the k smallest. That identity is what
  * makes the sketch a daily-telemetry primitive (combine per-day /
  * per-feed sketches without re-reading data); [[mergeSketches]] is
  * that operation and `a_kmv_merge` proves it equals the direct sketch
  * against the direct oracle.
  */
object Sketches {

  /** Per-group k smallest distinct values of a pre-hashed (g, h)
    * frame — the retention step shared by the direct sketch, the
    * merge, and the streaming form. Two-phase ([[Sampling.capPerGroup]]
    * shape): a partition-local rank prefilter bounds every partition's
    * contribution to k rows per group, so the final per-group rank
    * window sees ≤ partitions×k rows — no full-group sort at any
    * scale.
    */
  private def kSmallest(dh: DataFrame, k: Int): DataFrame = {
    val clashes = dh.columns.filter(Seq("__pid", "__r").contains)
    require(clashes.isEmpty,
      s"kSmallest reserves columns __pid, __r; input already has " +
        s"${clashes.mkString(", ")}")
    val w1 = Window.partitionBy(col("g"), col("__pid")).orderBy(col("h").asc)
    val w2 = Window.partitionBy(col("g")).orderBy(col("h").asc)
    dh.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k).drop("__pid", "__r")
      .withColumn("__r", row_number().over(w2))
      .filter(col("__r") <= k).drop("__r")
  }

  /** The per-group KMV retention set of `id` under [[Sampling.detHash]]:
    * (g, h) rows, ≤ k per group. One distinct-aggregate over
    * (group, hash) is the only pass over raw rows. */
  def retention(df: DataFrame, group: Column, id: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    kSmallest(df.select(group.as("g"), Sampling.detHash(id).as("h")).distinct(), k)
  }

  /** Merge retention sets from independent feeds/partitions/days:
    * union, de-dup, re-take the k smallest per group. Input frames
    * must be (g, h) retention outputs built with the SAME k and hash. */
  def mergeSketches(sketches: Seq[DataFrame], k: Int): DataFrame =
    kSmallest(sketches.reduce(_ unionByName _).distinct(), k)

  /** Fold a retention set to the sketch summary (g, k_n, kth_hash,
    * est): `k_n` is the retained-set size (< k means the group was
    * exhausted and the sketch is exact), `kth_hash` the largest
    * retained hash. */
  def estimate(kept: DataFrame, k: Int): DataFrame = {
    // (k-1)*M precomputed as ONE literal (< 2^53, exactly representable)
    // so Spark and the SQL oracle divide the identical double.
    val numer = kmvNumerator(k)
    kept.groupBy(col("g"))
      .agg(count(lit(1)).as("k_n"), max(col("h")).as("kth_hash"))
      .withColumn("est",
        when(col("k_n") < k, col("k_n").cast("double"))
          .otherwise(lit(numer.toDouble) / col("kth_hash").cast("double")))
  }

  /** Per-group KMV distinct-count sketch over `id`: the retention +
    * estimate pipeline, with `n_distinct_hashed` — the true distinct
    * count of the HASHED domain (hash collisions fold, inherent to any
    * sketch over a hashed universe) — carried alongside for accuracy
    * checks. */
  def kmvDistinct(df: DataFrame, group: Column, id: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val dh = df.select(group.as("g"), Sampling.detHash(id).as("h")).distinct()
    val exact = dh.groupBy(col("g")).agg(count(lit(1)).as("n_distinct_hashed"))
    estimate(kSmallest(dh, k), k).join(exact, "g")
      .select(col("g"), col("k_n"), col("kth_hash"),
        col("n_distinct_hashed"), col("est"))
  }

  /** The oracle-side numerator for [[estimate]] — generated from the
    * same constant so the SQL cannot drift. */
  def kmvNumerator(k: Int): Long = (k - 1).toLong * 2147483647L

  // ---- Count-min sketch (Cormode & Muthukrishnan 2005) ----
  // The frequency-side companion of KMV: "how often does key u occur"
  // over a feed too large for an exact per-key table, in d×w integers.
  // Overestimates only (collisions add), so `min` over the d rows is
  // the estimate and `cms_est >= true count` always. Same determinism
  // story as KMV: seeded detHash rows, exact integer arithmetic,
  // bit-replayable in the oracle. Counters are mergeable by cell-wise
  // addition (counts are sums).

  /** Row-j bucket of `id` in a width-`w` CMS. */
  def cmsBucket(id: Column, j: Int, w: Int): Column =
    Sampling.detHash(id + lit(j * 1000003L)) % w

  private def cmsPairs(id: Column, d: Int, w: Int): Column =
    explode(array((0 until d).map(j =>
      struct(lit(j).as("j"), cmsBucket(id, j, w).as("b"))): _*))

  /** Build the d×w counter table (j, b, c) in ONE scan: each row fans
    * out to its d cells and one hash aggregate sums them — the output
    * is d·w rows whatever the input size. */
  def cmsCounters(df: DataFrame, id: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, "CMS needs d >= 1, w >= 2")
    df.select(cmsPairs(id, d, w).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Estimate counts for candidate keys: min over the key's d cells.
    * The counter table is d·w rows — always broadcast. `keys` keeps
    * its columns; the estimate lands in `cms_est`. */
  def cmsLookup(counters: DataFrame, keys: DataFrame, id: Column,
                d: Int, w: Int): DataFrame = {
    val cols = keys.columns
    keys.withColumn("__jb", cmsPairs(id, d, w))
      .join(broadcast(counters),
        col("__jb.j") === col("j") && col("__jb.b") === col("b"))
      .groupBy(cols.map(col).toIndexedSeq: _*)
      .agg(min(col("c")).as("cms_est"))
  }

  // ---- Fixed-grid histogram quantile sketch ----
  // The quantile-side companion: exact percentiles (operators.
  // Percentiles) need the full value-frequency table, which at 100 TB
  // can itself be huge for high-cardinality measures. The equi-width
  // histogram is the bounded-state alternative: `bins` counters
  // whatever the input size, mergeable by cell-wise addition (counts
  // are sums — same merge algebra as CMS), answering any quantile to
  // within one grid cell of value error ((hi-lo)/bins). This is the
  // shape t-digest/GK refine adaptively; the fixed grid is chosen here
  // because it is DETERMINISTIC and exact-integer — the whole sketch
  // replays bit-for-bit in the SQL oracle, which no adaptive sketch
  // with data-dependent centroids can.

  /** Bucket counts of `value` on the `bins`-cell grid over [lo, hi):
    * out-of-range values clamp to the edge cells; null/NaN rows are
    * dropped. Output is ≤ `bins` rows — one map-side-combining hash
    * aggregate over the scan, no other shuffle.
    */
  def histCounters(df: DataFrame, value: Column,
                   lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val b = least(greatest(
      floor((value - lit(lo)) / lit(hi - lo) * bins).cast("long"),
      lit(0L)), lit(bins - 1L))
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .select(b.as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
  }

  /** Merge histograms built on the SAME grid: cell-wise count sums. */
  def mergeHist(hists: Seq[DataFrame]): DataFrame =
    hists.reduce(_ unionByName _)
      .groupBy(col("b")).agg(sum(col("c")).as("c"))

  /** Per-GROUP bucket counts on a shared grid — the training-data
    * shape (token-length / quality-score distribution per language or
    * source): ≤ groups×bins rows of state, same cell-wise-addition
    * merge algebra. One map-combining hash aggregate on (g, b).
    */
  def histCountersBy(df: DataFrame, group: Column, value: Column,
                     lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val b = least(greatest(
      floor((value - lit(lo)) / lit(hi - lo) * bins).cast("long"),
      lit(0L)), lit(bins - 1L))
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .select(group.as("g"), b.as("b"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Per-group quantiles from a grouped counter table: the same
    * nearest-rank/left-edge rule as [[histQuantiles]], windowed and
    * ranked WITHIN each group. All frames here are ≤ groups×bins rows.
    */
  def histQuantilesBy(counters: DataFrame, lo: Double, hi: Double,
                      bins: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val w = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counters.withColumn("cum", sum(col("c")).over(w))
    val ranks = counters.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .select(col("g"), col("n"), explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
    cum.join(ranks, Seq("g"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("g"), col("q"), col("rank"), col("n"))
      .agg(min(col("b")).as("b"))
      .withColumn("est", lit(lo) + (col("b").cast("double") * lit(hi - lo)) / bins)
      .select(col("g"), col("q"), col("rank"), col("n"), col("b"), col("est"))
  }

  /** Answer quantiles from a counter table: nearest-rank on the grid —
    * quantile q lands in the first bucket whose cumulative count
    * reaches ceil(q·n), estimated at the bucket's LEFT edge
    * (deterministic; error ≤ one cell width). The windows/joins here
    * run over ≤ `bins` rows — driver-free and trivially cheap at any
    * input scale.
    */
  def histQuantiles(counters: DataFrame, lo: Double, hi: Double, bins: Int,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counters.withColumn("cum", sum(col("c")).over(w))
    val ranks = counters.agg(sum(col("c")).as("n"))
      .select(col("n"), explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
    cum.join(ranks, col("cum") >= col("rank")) // bins × |qs| rows, tiny
      .groupBy(col("q"), col("rank"), col("n"))
      .agg(min(col("b")).as("b"))
      .withColumn("est", lit(lo) + (col("b").cast("double") * lit(hi - lo)) / bins)
      .select(col("q"), col("rank"), col("n"), col("b"), col("est"))
  }
}
