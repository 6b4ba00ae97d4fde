package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact deduplication — the incremental form of
  * `operators.Dedup.exact` for a continuously-arriving corpus
  * (training-data ingest at 100 TB/day cannot re-scan history to
  * dedup; it keeps keys in watermarked state instead).
  *
  * `dropDuplicatesWithinWatermark` keeps one row per key and expires
  * state once the watermark passes a key's last-seen event time, so
  * state is bounded by (arrival rate × watermark horizon), not by
  * corpus history. Exactly the semantics a dedup-at-ingest stage
  * needs: duplicates land close together in time (re-crawls, retries,
  * mirror feeds); a dup older than the horizon is caught by the batch
  * pass (`Dedup.exact`) downstream.
  */
object StreamingDedup {

  /** Run content-hash dedup over a bounded parquet stream and return
    * the deduplicated rows: first arrival per normalized-content hash
    * within the watermark horizon. In-memory sink, driven to
    * exhaustion — the same verify-against-batch pattern as
    * [[StreamingRollup]].
    */
  /** @param prepare applied to the raw stream before watermarking —
    *   e.g. synthesize an event-time column for a source that lacks
    *   one (`timestamp_micros` of a monotone id). */
  def dedupOnce(spark: SparkSession, parquetPath: String,
                textCol: String, tsCol: String,
                watermark: String = "1 day",
                queryName: String = "stream_dedup",
                prepare: DataFrame => DataFrame = identity): DataFrame = {
    val deduped = prepare(StreamSource.parquet(spark, parquetPath))
      .withColumn("__key",
        sha2(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
