package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCdc

/** Multi-batch semantics of the streaming CDC sink, driven through
  * the PRODUCTION per-batch body ([[StreamingCdc.applyBatch]]) with
  * explicitly controlled batches — the log-order properties a
  * file-split stream cannot pin deterministically.
  */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTarget(): String =
    java.nio.file.Files.createTempDirectory("graft_scdc_spec")
      .resolve("target").toString

  test("later batch wins across batches; ordCols only resolve within a batch") {
    val target = freshTarget()
    // batch 0 seeds k=1 at seq 9
    StreamingCdc.applyBatch(spark,
      Seq((1L, 9L, "U", "from-batch-0")).toDF("k", "seq", "op", "v"),
      Seq("k"), "op", Seq("seq"), target, 0L)
    // batch 1 carries a LOWER seq — log order still wins
    StreamingCdc.applyBatch(spark,
      Seq((1L, 3L, "U", "from-batch-1")).toDF("k", "seq", "op", "v"),
      Seq("k"), "op", Seq("seq"), target, 1L)
    val out = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "from-batch-1"))
  }

  test("delete then reinsert across batches; empty-target bootstrap") {
    val target = freshTarget() // no seed: first batch bootstraps
    StreamingCdc.applyBatch(spark,
      Seq((1L, 1L, "U", "alive"), (2L, 1L, "U", "doomed"))
        .toDF("k", "seq", "op", "v"),
      Seq("k"), "op", Seq("seq"), target, 0L)
    StreamingCdc.applyBatch(spark,
      Seq((2L, 2L, "D", "x")).toDF("k", "seq", "op", "v"),
      Seq("k"), "op", Seq("seq"), target, 1L)
    assert(spark.read.parquet(target).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    StreamingCdc.applyBatch(spark,
      Seq((2L, 3L, "U", "reborn")).toDF("k", "seq", "op", "v"),
      Seq("k"), "op", Seq("seq"), target, 2L)
    val out = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alive", 2L -> "reborn"))
  }

  test("replaying a committed batch is a fixpoint (restart safety)") {
    val target = freshTarget()
    val b0 = Seq((1L, 1L, "U", "v1"), (2L, 1L, "U", "v2"), (3L, 1L, "D", "x"))
      .toDF("k", "seq", "op", "v")
    StreamingCdc.applyBatch(spark, b0, Seq("k"), "op", Seq("seq"), target, 0L)
    val once = spark.read.parquet(target).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    StreamingCdc.applyBatch(spark, b0, Seq("k"), "op", Seq("seq"), target, 0L)
    val twice = spark.read.parquet(target).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(once == twice && once == Set((1L, "v1"), (2L, "v2")))
  }
}
