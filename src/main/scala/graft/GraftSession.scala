package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Mirrors the reference's single entry point (main_graph_topraq.py:84-340)
  * but as a SparkSession: UTC session time zone (the reference normalizes
  * everything to tz-offset datetimes, app/utils.py:34-57), AQE on for
  * runtime re-planning at scale, and shuffle partitions sized to the
  * local core count rather than the 200 default (on a real cluster this
  * is set per-job; AQE coalesces the rest).
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan ON TOP of cached plans too: persisted frames
      // otherwise pin their shuffle partitioning, and a union of many
      // small cached branches schedules partitions-per-branch tiny
      // tasks (measured 2x wall on g_assembly at local[32])
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Scale-adaptive parallelism floor (optimization guide §2.2/§2.5):
      // AQE's parallelism-first coalescing targets
      // max(minPartitionSize, totalBytes/defaultParallelism); the 1 MiB
      // default floor serializes byte-small but CPU-dense shuffle
      // stages (measured: the decimal-exact graph iterations at 2
      // tasks on 32 cores, 2x the query wall). 256k keeps them
      // core-wide without over-fanning many-round convergence loops
      // (A/B sweep in OPTIMIZATION_r16.md); at cluster scale
      // totalBytes/parallelism >> 256k so the floor is inert.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED", "256k"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the test-data generator writes timestamp[us] with
      // isAdjustedToUTC=false; without this, Spark 4 infers
      // TIMESTAMP_NTZ and unix_micros/watermarks reject the column.
      // Reading as TIMESTAMP under the UTC session zone yields the
      // same values DuckDB sees for the same bytes.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // long-running sessions: broadcast/shuffle state is reclaimed by
      // ContextCleaner only after a driver GC — which a large driver
      // heap may not run for hours. Measured 2-40x query inflation
      // after ~160 back-to-back queries without it (SCALE.md); the
      // default interval is 30min.
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply engine defaults to an externally-created session (Verify/Bench
    * create their own). Idempotent; safe on a running session.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED", "256k"))
    spark
  }
}
