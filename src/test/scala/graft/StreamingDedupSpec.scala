package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming dedup keeps one row per content hash within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup").toString
    val path = s"$dir/docs.parquet"
    Seq(
      (1L, "the quick brown fox", "2025-06-01 10:00:00"),
      (2L, "THE  quick   BROWN fox", "2025-06-01 10:05:00"), // dup of 1 after norm
      (3L, "completely different text", "2025-06-01 11:00:00"),
      (4L, "the quick brown fox", "2025-06-01 11:30:00"),    // dup of 1
      (5L, "another unique document", "2025-06-01 12:00:00")
    ).toDF("doc_id", "text", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val out = StreamingDedup.dedupOnce(spark, path, "text", "ts",
      queryName = "stream_dedup_spec")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted
    // one survivor per distinct normalized content: {1|2|4}, 3, 5 —
    // exactly three rows, one of which comes from the dup group
    assert(kept.length == 3)
    assert(kept.contains(3L) && kept.contains(5L))
    assert(Seq(1L, 2L, 4L).contains(kept.filterNot(Set(3L, 5L)).head))
  }
}
