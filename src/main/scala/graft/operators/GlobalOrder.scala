package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic global position assignment — the "shuffle the corpus
  * and number every row" step a training-data loader needs before
  * sharding (each example's global index decides its shard and its
  * order within an epoch).
  *
  * The naive form — `row_number() OVER (ORDER BY ...)` — is a global
  * window: every row through ONE reducer, the canonical scale-killer.
  * This is the distributed form ([[Sampling.tokenBudgetLarge]]'s
  * prefix-sum pattern with counts instead of token sums):
  * range-partition by the total order, number rows per partition with
  * a partition-local window, and add each partition's broadcast offset
  * (the row count of all earlier partitions). The per-partition
  * windows are fully parallel; the offset table is one tiny aggregate
  * (#partitions rows). Output is IDENTICAL to the global window at any
  * parallelism because the order is total — which is also why `ord`
  * MUST be total (tie-break on a unique id); ties spanning a range
  * boundary would otherwise make positions partitioning-dependent.
  */
object GlobalOrder {

  /** Append 1-based `pos` in the total order `ord`. */
  def withGlobalIndex(df: DataFrame, ord: Seq[Column],
                      scope: CacheScope = CacheScope.global): DataFrame = {
    val reserved = Seq("__pid", "__opid", "__off", "pos")
    val clashes = df.columns.filter(reserved.contains)
    require(clashes.isEmpty,
      s"withGlobalIndex reserves columns ${reserved.mkString(", ")}; " +
        s"input already has ${clashes.mkString(", ")} — rename before indexing")
    // the pid stamp is only meaningful for ONE materialization (the
    // range sampler's boundaries follow RDD identity) — checkpoint so
    // the offset table and the final join see the same assignment
    val sorted = scope.checkpoint(df
      .repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    // unpartitioned window — WindowExec logs its single-partition
    // warning here, and that is fine: the input is the per-partition
    // count table, #partitions rows, never data
    val offsets = counts.withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // fresh names so the derived-frame self-join cannot collapse the
      // join condition onto sorted's own attributes
      .select(col("__pid").as("__opid"), col("__off"))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    sorted.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn("pos", col("__off") + row_number().over(wLocal))
      .drop("__pid", "__opid", "__off")
  }
}
