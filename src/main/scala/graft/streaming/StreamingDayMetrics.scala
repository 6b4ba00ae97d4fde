package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Upsert

/** The §3.2 day-metric pipeline as ONE watermarked stream: hourly
  * telemetry → tumbling daily window per (user, type) → pivot wide →
  * streaming MERGE into the keyed day-metric table. The streaming twin
  * of `pipeline_day_metrics` (Queries4.scala), verified against the
  * same batch oracle.
  *
  * Topology notes:
  *  - the windowed aggregate runs in UPDATE mode, so every micro-batch
  *    emits the latest (day, user, type) totals — including the final
  *    open day, which append mode would hold in state forever on a
  *    bounded source;
  *  - pivot is not supported on a streaming DataFrame (the column set
  *    would depend on data seen so far), so the pivot-to-wide step runs
  *    inside `foreachBatch` on the already-aggregated micro-batch —
  *    tiny relative to the input, and with a FIXED type list, so the
  *    schema is static after all;
  *  - the MERGE keeps existing non-null columns: a later batch that
  *    re-emits only a user's `click` totals must not null out their
  *    `view` columns. Re-emitted aggregates replace (incoming non-null
  *    wins), absent ones persist;
  *  - the 1-day watermark bounds state: windows a day behind the
  *    stream's max event time are finalized and their state dropped.
  *    Data arriving after its window's state is finalized is DROPPED,
  *    where a nightly batch recompute would have included it — the
  *    documented trade (StreamingDayMetricsSpec pins it on a
  *    three-batch replay; at 100 TB/day the watermark is the knob that
  *    keeps day-window state finite). Spark's watermark guarantee is
  *    one-directional: data inside the watermark is never dropped, but
  *    data slightly beyond it MAY still be absorbed while the window's
  *    state is live (eviction runs at the end of the first batch whose
  *    watermark passed the window).
  */
object StreamingDayMetrics {

  val wantedTypes: Seq[String] = Seq("click", "view", "purchase")

  /** Maintain the wide day-metric table at `targetPath` from the
    * event stream. Blocks until the (AvailableNow-bounded) source
    * drains. Crash-safe via the same write-then-swap as
    * [[StreamingUpsert]].
    */
  def run(spark: SparkSession, events: DataFrame, targetPath: String,
          checkpoint: String): Unit = {
    val rolled = events
      .filter(col("event_type").isin(wantedTypes: _*))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
      .select(to_date(col("w.start")).as("date"), col("user_id"),
        col("event_type"), col("n"), col("total"))
    val q = rolled.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val wide = batch.groupBy(col("user_id"), col("date"))
          .pivot("event_type", wantedTypes)
          .agg(first(col("n"), ignoreNulls = true).as("n"),
            first(col("total"), ignoreNulls = true).as("total"))
        val merged =
          if (StreamingUpsert.recoverTarget(spark, targetPath)) {
            val existing = spark.read.parquet(targetPath)
            Upsert.merge(existing, wide, Seq("user_id", "date"),
              keepExistingNonNull = true)
          } else wide
        StreamingUpsert.swapInto(spark, merged, targetPath, batchId)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Bounded verify runner: drive the full topology over a parquet
    * events path into a fresh temp target and return the final
    * day-metric table, with absent combos' counts aligned to the
    * batch oracle's FILTER-count 0 (same alignment as
    * `pipeline_day_metrics`).
    */
  def dayMetricsOnce(spark: SparkSession, eventsPath: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdaymetrics")
    val target = tmp.resolve("target").toString
    run(spark, StreamSource.parquet(spark, eventsPath), target,
      tmp.resolve("ckpt").toString)
    val t = spark.read.parquet(target)
    t.select(t.columns.map { c =>
      if (c.endsWith("_n")) coalesce(col(c), lit(0L)).as(c) else col(c)
    }.toIndexedSeq: _*)
  }
}
