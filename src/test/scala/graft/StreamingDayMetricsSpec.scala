package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDayMetrics

/** Pins the documented late-data trade of the streaming day-metric
  * pipeline (StreamingDayMetrics): events arriving after their day
  * window's state is finalized are DROPPED where a nightly batch
  * recompute would count them — and the keep-existing MERGE preserves
  * a (user, day)'s untouched metric columns across micro-batches.
  *
  * The replay needs THREE batches because Spark's watermark guarantee
  * is one-directional (data beyond the watermark may still be absorbed
  * while the window's state is live): batch 1 advances the watermark
  * past the Jan-1 window, batch 2 runs under that watermark so its end
  * EVICTS the finalized Jan-1 state, and only then does batch 3's
  * late Jan-1 event hit the closed window and get dropped.
  */
class StreamingDayMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeBatch(streamDir: String, name: String,
                         rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("sdm_batch").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(streamDir, name))
    Thread.sleep(1100) // file source orders batches by modification time
  }

  test("event after window finalization is dropped; batch recompute keeps it") {
    val root = java.nio.file.Files.createTempDirectory("sdm").toString
    val streamDir = new java.io.File(root, "events"); streamDir.mkdirs()
    // batch 1: user 1's Jan-1 activity plus a Jan-5 event — advances
    // the watermark to Jan 4 09:00 for the NEXT batch
    writeBatch(streamDir.toString, "b1.parquet", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "view", 2.0),
      (3L, "2024-01-05 09:00:00", 2L, "click", 3.0)))
    // batch 2: runs under the Jan-4 watermark, so its end finalizes
    // (evicts) the Jan-1 window state
    writeBatch(streamDir.toString, "b2.parquet", Seq(
      (4L, "2024-01-05 10:00:00", 2L, "purchase", 4.0)))
    // batch 3: one LATE Jan-1 click against the now-closed window and
    // a fresh Jan-5 view
    writeBatch(streamDir.toString, "b3.parquet", Seq(
      (5L, "2024-01-01 12:00:00", 1L, "click", 10.0),
      (6L, "2024-01-05 11:00:00", 2L, "view", 5.0)))

    val schema = spark.read.parquet(streamDir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // replay file-per-micro-batch
      .parquet(streamDir.toString)
    val target = s"$root/target"
    StreamingDayMetrics.run(spark, stream, target, s"$root/ckpt")

    val out = spark.read.parquet(target)
      .select(col("user_id"), col("date").cast("string").as("d"),
        col("click_n"), col("click_total"), col("view_n"), col("purchase_n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap

    // the late Jan-1 click is NOT counted: click stays (1, 1.0). A
    // leak shows either as count 2 (absorbed into live state) or as a
    // re-created window with total 10.0 (aggregated past eviction)
    val jan1 = out((1L, "2024-01-01"))
    assert(jan1.getLong(2) == 1L && jan1.getDouble(3) == 1.0,
      s"late event leaked into the closed window: $jan1")
    assert(jan1.getLong(4) == 1L) // view preserved
    // batches 2 and 3 re-emitted only user 2's purchase/view combos;
    // the MERGE kept the click columns from batch 1
    val jan5 = out((2L, "2024-01-05"))
    assert(jan5.getLong(2) == 1L && jan5.getDouble(3) == 3.0,
      s"merge nulled out a column later batches did not re-emit: $jan5")
    assert(jan5.getLong(5) == 1L)

    // the batch recompute over the SAME files counts the late click —
    // the documented watermark-vs-recompute trade, asserted exactly
    val batch = spark.read.parquet(streamDir.toString)
      .filter(col("event_type") === "click" && col("user_id") === 1L)
      .agg(count(lit(1)), sum("value")).collect().head
    assert(batch.getLong(0) == 2L && batch.getDouble(1) == 11.0)
  }
}
