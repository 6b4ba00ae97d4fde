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
                prepare: DataFrame => DataFrame = identity): DataFrame =
    runDedup(spark, parquetPath, textCol, tsCol, watermark, queryName,
      prepare, store = None)

  /** [[dedupOnce]] with a HISTORICAL fingerprint store: the streaming
    * twin of `Dedup.minhashLshDelta`'s exact sibling — new arrivals
    * whose content hash already exists in the standing corpus are
    * dropped by a stream-static anti-join BEFORE the stateful
    * within-stream dedup, so state holds only genuinely-new keys.
    *
    * `store` is a static (fp: string) frame — in production the
    * parquet fingerprint table the batch pass maintains
    * (`Dedup.exact`'s keys); history stays on disk, NOT in streaming
    * state, which is what makes dedup-against-all-history feasible at
    * a 100 TB corpus: state is bounded by the watermark horizon while
    * the store lookup is a per-batch join against a broadcastable (or
    * bucketed) table.
    */
  def dedupAgainstStoreOnce(spark: SparkSession, parquetPath: String,
                            store: DataFrame,
                            textCol: String, tsCol: String,
                            watermark: String = "1 day",
                            queryName: String = "stream_dedup_store",
                            prepare: DataFrame => DataFrame = identity): DataFrame =
    runDedup(spark, parquetPath, textCol, tsCol, watermark, queryName,
      prepare, store = Some(store))

  /** Content hash used on both the stream and the store side. */
  def contentKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  private def runDedup(spark: SparkSession, parquetPath: String,
                       textCol: String, tsCol: String, watermark: String,
                       queryName: String, prepare: DataFrame => DataFrame,
                       store: Option[DataFrame]): DataFrame = {
    val keyed = prepare(StreamSource.parquet(spark, parquetPath))
      .withColumn("__key", contentKey(col(textCol)))
    val fresh = store match {
      case Some(st) =>
        keyed.join(st.select(col("fp").as("__key")), Seq("__key"), "left_anti")
      case None => keyed
    }
    val deduped = fresh
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
