package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static enrichment (the streaming form of the J1/J7 dimension
  * joins): a fact stream joined against a broadcast static dimension,
  * then aggregated. The stream side never shuffles for the join —
  * each micro-batch hash-probes the broadcast dim exactly like the
  * batch plan — so this is the shape a 100 TB/day event feed uses to
  * carry dimensions into its incremental aggregates.
  */
object StreamingEnrich {

  /** Drive the enriched roll-up to exhaustion: events joined to the
    * customer dim on user_id = c_custkey, aggregated per market
    * segment with a decimal-exact sum. Complete-mode memory sink, the
    * standard verify-against-batch pattern.
    */
  def enrichOnce(spark: SparkSession, eventsPath: String, dim: DataFrame,
                 queryName: String = "stream_enrich"): DataFrame = {
    val agg = StreamSource.parquet(spark, eventsPath)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
