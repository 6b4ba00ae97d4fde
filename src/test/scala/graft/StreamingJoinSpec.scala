package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamingJoin, StreamingUpsert}

class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-stream window join matches the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("stream_join").toString
    val path = s"$dir/events.parquet"
    Seq(
      (1L, 10L, "click", "2025-06-01 10:00:00"),
      (2L, 10L, "purchase", "2025-06-01 10:20:00"), // inside 30-min window
      (3L, 10L, "purchase", "2025-06-01 10:45:00"), // outside
      (4L, 20L, "click", "2025-06-01 11:00:00"),
      (5L, 20L, "purchase", "2025-06-01 11:00:00"), // boundary: ts == click ts
      (6L, 30L, "purchase", "2025-06-01 09:00:00")  // purchase before any click
    ).map { case (e, u, t, s) => (e, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.mode("overwrite").parquet(path)

    val out = StreamingJoin.eventWindowJoinOnce(spark, path,
      "click", "purchase", windowSeconds = 1800, queryName = "stream_join_spec")
    val got = out.select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 1L, 2L), (20L, 4L, 5L)))
  }

  test("streaming upsert sink maintains MERGE semantics across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("stream_upsert").toString
    val srcDir = s"$dir/src"
    val target = s"$dir/table"
    // two source files -> two micro-batches (maxFilesPerTrigger=1),
    // file-arrival order fixed by modification time
    Seq((1L, "a", 1), (2L, "old", 1)).toDF("k", "v", "ver")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so batch order is stable
    Seq((2L, "new", 2), (3L, "c", 1)).toDF("k", "v", "ver")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    StreamingUpsert.run(spark, stream, keys = Seq("k"), orderBy = Seq("ver"),
      targetPath = target, checkpoint = s"$dir/ckpt")

    val got = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toList
    assert(got == List((1L, "a", 1), (2L, "new", 2), (3L, "c", 1)))

    // idempotence: re-running over the same source (fresh checkpoint,
    // same target) converges to the same table — MERGE, not append
    StreamingUpsert.run(spark, stream, keys = Seq("k"), orderBy = Seq("ver"),
      targetPath = target, checkpoint = s"$dir/ckpt2")
    val again = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toList
    assert(again == got)
  }
}
