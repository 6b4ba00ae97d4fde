package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream-stream interval join — the incremental form of
  * [[graft.operators.RangeJoin]]: match each left event to the right
  * events that follow it within a time window, per key, as both sides
  * arrive continuously.
  *
  * Both sides carry watermarks and the join condition bounds the time
  * range, so Spark can size and expire join state: a left row is held
  * only until the watermark passes `leftTs + windowSeconds`, a right
  * row until it can no longer match any retained left row. State is
  * bounded by (arrival rate × window + watermark), not by history —
  * the property that makes the join runnable forever at ingest scale.
  */
object StreamingJoin {

  /** Generic form: inner-join two prepared streaming DataFrames on
    * equal `keys` plus `rightTs ∈ [leftTs, leftTs + windowSeconds]`.
    * Non-key column names must not collide across sides.
    */
  def withinWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, windowSeconds: Long,
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r0 = right.withWatermark(rightTs, watermark)
    // self-joins share column lineage; disambiguate the right keys
    val r = keys.foldLeft(r0)((d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val keyCond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _)
    val rangeCond = col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSeconds SECONDS")
    l.join(r, keyCond && rangeCond)
      .drop(keys.map(k => s"__r_$k"): _*)
  }

  /** Run the events-table attribution join as a bounded streaming
    * query and return the joined rows: every `rightType` event within
    * `windowSeconds` after a `leftType` event by the same user.
    * In-memory append sink driven to exhaustion — the verify-against-
    * batch pattern shared with [[StreamingRollup]]/[[StreamingDedup]].
    */
  def eventWindowJoinOnce(spark: SparkSession, parquetPath: String,
                          leftType: String, rightType: String,
                          windowSeconds: Long,
                          queryName: String = "stream_join"): DataFrame = {
    def src(): DataFrame = StreamSource.parquet(spark, parquetPath)
    val l = src().filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as(s"${leftType}_id"),
        col("ts").as("l_ts"))
    val r = src().filter(col("event_type") === rightType)
      .select(col("user_id"), col("event_id").as(s"${rightType}_id"),
        col("ts").as("r_ts"))
    val joined = withinWindow(l, r, Seq("user_id"), "l_ts", "r_ts", windowSeconds)
      .select("user_id", s"${leftType}_id", s"${rightType}_id")
    val q = joined.writeStream
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
