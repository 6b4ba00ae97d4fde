package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingRollup

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming daily roll-up equals the batch aggregate") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = StreamingRollup.dailyRollupOnce(spark, path, "stream_spec_tbl")
      .orderBy("date", "event_type").collect()
    val batch = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,8)")).cast("double").as("sum_value"))
      .orderBy("date", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }
}
