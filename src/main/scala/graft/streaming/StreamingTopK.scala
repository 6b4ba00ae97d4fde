package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming "trending now": tumbling-window counts maintained
  * incrementally, with the per-window top-k ranking derived from the
  * materialized counts — the windowed heavy-hitters board every
  * telemetry deployment keeps. The windowed count state is bounded by
  * the watermark horizon (windows × keys), and counts are
  * order-independent, so the exhausted stream equals the batch replay
  * bit-for-bit — which is what the oracle checks.
  */
object StreamingTopK {

  // memory-sink temp views are session-global, so each invocation
  // gets a unique suffix: two concurrent runs in one SparkSession
  // would otherwise collide on the view name and read each other's
  // (or a stale run's) counts
  private val invocation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drive the windowed count to exhaustion over a parquet dir, then
    * rank: per tumbling day, the top-k event types by count
    * (count desc, type asc — total order). */
  def windowTopKOnce(spark: SparkSession, parquetPath: String, k: Int,
                     queryName: String = "stream_window_topk"): DataFrame = {
    val name = s"${queryName}_${invocation.incrementAndGet()}"
    val agg = StreamSource.parquet(spark, parquetPath)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // a complete-mode memory sink is already driver-resident (bounded:
    // watermark-horizon windows × event types), so pinning the counts
    // locally costs nothing — and then the temp view can be DROPPED
    // instead of accumulating one view (+ result table) per invocation
    // for the life of the session
    val counts = spark.table(name)
      .select(to_date(col("w.start")).as("date"), col("event_type"), col("n"))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](
      java.util.Arrays.asList(counts.collect(): _*))
    val schema = counts.schema
    spark.catalog.dropTempView(name)
    spark.createDataFrame(rows, schema)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("date"))
          .orderBy(col("n").desc, col("event_type").asc)))
      .filter(col("rank") <= k)
  }
}
