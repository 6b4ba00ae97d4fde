package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming form of the daily-metric roll-up (SURVEY §2.8
  * "Streaming"): the same tumbling-day aggregation the batch engine
  * runs (A1), expressed as `readStream` → windowed agg → sink.
  *
  * The reference is pure batch over a --start/--end window
  * (main_graph_topraq.py:78-80); this is the north-star extension: at
  * 100 TB/day the day-metric tables are maintained incrementally with
  * watermarked state instead of nightly rescans.
  */
object StreamingRollup {

  /** Run the daily roll-up as a bounded streaming query over a parquet
    * directory and return the final result: per (event_type, day)
    * count and decimal-exact sum. Uses the in-memory sink in complete
    * mode and drives the source to exhaustion — the standard pattern
    * for verifying a streaming topology against its batch oracle.
    */
  def dailyRollupOnce(spark: SparkSession, parquetPath: String,
                      queryName: String = "stream_daily_rollup"): DataFrame = {
    val agg = StreamSource.parquet(spark, parquetPath)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,8)")).cast("double").as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(to_date(col("w.start")).as("date"), col("event_type"),
        col("n"), col("sum_value"))
  }
}
