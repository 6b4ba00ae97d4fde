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
  * cross-engine checkable; this sketch is the verifiable flavor, and
  * its retention set is mergeable across feeds/days by construction
  * (union the sets, re-take the k smallest).
  */
object Sketches {

  /** Per-group KMV distinct-count sketch over `id`.
    *
    * Returns (g, k_n, kth_hash, n_distinct_hashed, est) where `k_n` is
    * the retained-set size (< k means the group was exhausted and the
    * sketch is exact), `kth_hash` the largest retained hash, and `est`
    * the estimate. `n_distinct_hashed` is the true distinct count of
    * the HASHED domain (hash collisions fold — inherent to any sketch
    * over a hashed universe), carried alongside for accuracy checks.
    *
    * Plan shape: one distinct-aggregate over (group, hash) — the only
    * pass over raw rows — then the per-group k-smallest retention runs
    * the [[Sampling.capPerGroup]] two-phase trick: a partition-local
    * rank prefilter bounds every partition's contribution to k rows
    * per group, so the final per-group rank window sees ≤ partitions×k
    * rows, never the full distinct table. No full-group sort exists in
    * the plan at any scale.
    */
  def kmvDistinct(df: DataFrame, group: Column, id: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val dh = df.select(group.as("g"), Sampling.detHash(id).as("h")).distinct()
    val w1 = Window.partitionBy(col("g"), col("__pid")).orderBy(col("h").asc)
    val w2 = Window.partitionBy(col("g")).orderBy(col("h").asc)
    val kept = dh.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k).drop("__pid", "__r")
      .withColumn("__r", row_number().over(w2))
      .filter(col("__r") <= k).drop("__r")
    val sketch = kept.groupBy(col("g"))
      .agg(count(lit(1)).as("k_n"), max(col("h")).as("kth_hash"))
    val exact = dh.groupBy(col("g")).agg(count(lit(1)).as("n_distinct_hashed"))
    // (k-1)*M precomputed as ONE literal (< 2^53, exactly representable)
    // so Spark and the SQL oracle divide the identical double.
    val numer = (k - 1).toLong * 2147483647L
    sketch.join(exact, "g")
      .withColumn("est",
        when(col("k_n") < k, col("k_n").cast("double"))
          .otherwise(lit(numer.toDouble) / col("kth_hash").cast("double")))
  }

  /** The oracle-side numerator for [[kmvDistinct]] — generated from
    * the same constant so the SQL cannot drift. */
  def kmvNumerator(k: Int): Long = (k - 1).toLong * 2147483647L
}
