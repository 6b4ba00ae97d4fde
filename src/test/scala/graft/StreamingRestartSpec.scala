package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingUpsert

/** Restart/recovery across a checkpoint — the exactly-once property a
  * production ingest relies on, proven with an observable kill: the
  * stream dies AFTER some batches commit and BEFORE another does; the
  * resumed run must (a) not replay the committed batches, (b) replay
  * the killed one, (c) leave the table equal to the batch oracle.
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("checkpointed MERGE stream: kill mid-run, resume, exactly-once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_restart_spec")
    val src = tmp.resolve("src").toString
    val target = tmp.resolve("target").toString
    val ckpt = tmp.resolve("ckpt").toString
    val input = (1L to 40L).map(i => (i, i % 7, i * 1.5))
    input.toDF("event_id", "user_id", "value")
      .repartition(4).write.parquet(src)
    val schema = spark.read.parquet(src).schema

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start(inject: Boolean) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        seen.add(batchId)
        if (inject && batchId >= 2L)
          throw new RuntimeException(s"injected crash at batch $batchId")
        StreamingUpsert.mergeBatch(spark, batch,
          Seq("event_id"), Seq("event_id"), target,
          keepExistingNonNull = false, batchId)
      }
      .start()

    // run 1: batches 0 and 1 commit, batch 2 dies before its commit
    val killed = start(inject = true)
    val death = intercept[Exception] { killed.processAllAvailable() }
    assert(death.getMessage != null)
    try killed.stop() catch { case scala.util.control.NonFatal(_) => () }
    val firstRun = seen.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
    assert(firstRun.contains(2L), s"crash batch never reached: $firstRun")
    seen.clear()

    // run 2: resumes from the checkpoint — only the uncommitted batch
    // and its successors run; 0 and 1 must NOT be replayed
    val resumed = start(inject = false)
    resumed.processAllAvailable()
    resumed.stop()
    val secondRun = seen.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
    assert(secondRun.nonEmpty && secondRun.forall(_ >= 2L),
      s"committed batches replayed after restart: $secondRun")

    // the recovered table equals the batch oracle: nothing lost,
    // nothing duplicated
    val got = spark.read.parquet(target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.size == 40, s"row count ${got.size} != 40")
    assert(got.toSet == input.toSet)
  }
}
