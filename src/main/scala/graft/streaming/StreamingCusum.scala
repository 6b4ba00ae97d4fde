package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming form of the CUSUM volume monitor: the per-(event_type,
  * day) counts are maintained by an incremental watermarked
  * streaming aggregate — the state a continuously-ingesting monitor
  * keeps — and the exact drawdown-rewrite tail
  * ([[graft.Queries32.cusumFromDaily]]) runs over the final counts,
  * so the streaming twin shares every bit of the batch arithmetic.
  */
object StreamingCusum {

  def cusumOnce(spark: SparkSession, parquetPath: String,
                queryName: String = "stream_cusum"): DataFrame = {
    val counts = StreamSource.parquet(spark, parquetPath)
      .withWatermark("ts", "1 day")
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    graft.Queries32.cusumFromDaily(
      spark.table(queryName)
        .select(col("event_type"), to_date(col("w.start")).as("day"),
          col("n")))
  }
}
