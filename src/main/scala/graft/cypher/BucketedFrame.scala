package graft.cypher

import org.apache.spark.rdd.{PartitionPruningRDD, RDD}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** A materialized standing frame clustered into `buckets` partitions
  * by `hash(keyCols) mod buckets` — the engine's KEY INDEX for the
  * row-at-a-time Cypher write path (round-14; SCALE.md round-13
  * mechanism 4: every wire statement paid 2-3 FULL standing probe
  * scans ≈ 0.45 s/scan at a 3.3 M-row store, the last O(store) term
  * per statement). A probe for a param-sized key set now reads ONLY
  * the partitions those keys can hash into ([[pruned]]), so a
  * statement touches O(delta) buckets, not the store — the same
  * bucket-pruned-semi-join discipline `Tables.writeBucketed` (S7)
  * proves for lake joins, applied to the standing graph. The
  * reference's equivalent is Neo4j's uniqueness-constraint index
  * behind every projector MERGE (app/graph_constraints.py:2-133,
  * graph_weather_day.py:230-248): idempotent upsert without scanning
  * the store.
  *
  * Correctness of the pruning rests on one Spark contract, pinned by
  * CypherWriteSpec: `repartition(n, cols)` places each row in
  * partition `pmod(murmur3hash(cols), n)`, and `functions.hash` IS
  * that murmur3 (same seed 42) — so the bucket set computed FROM the
  * probe keys is exactly the partition set that can hold matching
  * rows. [[pruned]] output is a SUPERSET of the matching rows (whole
  * buckets), which every caller immediately semi/anti-joins down.
  *
  * At 100 TB the same layout is the durable one (GraphExport's
  * key-partitioned parquet + hive pruning); in-memory, the index
  * build is one repartition shuffle paid ONCE per base pin —
  * amortized over every subsequent statement.
  */
final case class BucketedFrame(df: DataFrame, keyCols: Seq[String],
                               buckets: Int) {
  /** The materialized internal RDD — partition i holds exactly the
    * rows with `pmod(hash(keys), buckets) = i`. Resolved once; every
    * probe prunes THIS rdd. */
  @transient private lazy val internalRdd: RDD[InternalRow] =
    df.queryExecution.toRdd

  private def bucketCol(cols: Seq[Column]): Column = {
    val h = hash(cols: _*)
    // pmod: murmur3 is signed, partition index is not
    ((h % buckets) + buckets) % buckets
  }

  /** The distinct buckets the given key frame can hash into (tiny:
    * one job over a param-sized frame, ≤ `buckets` values). */
  def bucketsOf(keys: DataFrame): Set[Int] =
    keys.select(bucketCol(keyCols.map(keys(_))).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** The frame restricted to the partitions that can hold rows
    * matching `keys` — a bucket-superset of the matching rows, read
    * without touching any other partition. */
  def pruned(keys: DataFrame): DataFrame = prunedBySet(bucketsOf(keys))

  /** [[pruned]] with a PRE-COMPUTED bucket set — lets the leveled
    * store prune the base index and every level with ONE `bucketsOf`
    * job (all levels share the base's modulus), instead of one tiny
    * collect per frame per probe (at wire-statement granularity the
    * bottleneck is job count, SCALE.md round-14). */
  def prunedBySet(bset: Set[Int]): DataFrame = {
    if (bset.isEmpty) df.limit(0)
    else {
      require(internalRdd.getNumPartitions == buckets,
        s"bucketed frame lost its layout: ${internalRdd.getNumPartitions}" +
        s" partitions != $buckets buckets")
      val rdd = PartitionPruningRDD.create(internalRdd, bset.contains)
      org.apache.spark.sql.graft.SqlShim
        .internalCreateDataFrame(df.sparkSession, rdd, df.schema)
    }
  }
}

object BucketedFrame {
  /** Cluster + materialize: one shuffle over the frame (the index
    * build), paid once per base pin. */
  def build(df: DataFrame, keyCols: Seq[String], buckets: Int)
      : BucketedFrame =
    BucketedFrame(
      df.repartition(buckets, keyCols.map(df(_)): _*).localCheckpoint(true),
      keyCols, buckets)

  /** Bucket count for a base of `rows` rows: ~8k rows per bucket so a
    * few-bucket probe is job-overhead-bound, floored at the cluster
    * parallelism, capped to keep partition bookkeeping sane. */
  def bucketCountFor(rows: Long, parallelism: Int): Int =
    math.max(parallelism,
      math.min(4096L, rows / 8192L + 1L).toInt)
}
