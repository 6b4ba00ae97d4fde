package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming form of the categorical drift monitor
  * ([[graft.operators.DataQuality.chi2Drift]]): the per-(category,
  * side) counts are maintained INCREMENTALLY by a streaming
  * aggregate — the state a 100 TB/day ingest would keep per
  * partition instead of re-scanning both slices — and the exact
  * rational chi-square terms are derived from the final counts
  * table by the SAME factored tail ([[graft.operators.DataQuality
  * .chi2FromCounts]]), so the streaming twin cannot drift from the
  * batch math.
  */
object StreamingDrift {

  /** Run the drift counts as a bounded streaming query over a
    * parquet path and return the chi-square table. `category` /
    * `isCurrent` are column expressions over the streamed rows.
    */
  def chi2Once(spark: SparkSession, parquetPath: String,
               category: Column, isCurrent: Column,
               queryName: String = "stream_drift"): DataFrame = {
    val counts = StreamSource.parquet(spark, parquetPath)
      .groupBy(category.as("category"))
      .agg(
        sum(when(isCurrent, 0L).otherwise(1L)).as("n_ref"),
        sum(when(isCurrent, 1L).otherwise(0L)).as("n_cur"))
    val q = counts.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    graft.operators.DataQuality.chi2FromCounts(spark.table(queryName))
  }
}
