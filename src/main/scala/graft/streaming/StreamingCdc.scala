package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Upsert

/** Streaming change-data-capture ingest: each micro-batch of a CDC
  * feed (key, op, ordering, payload) folds onto the keyed target
  * table via [[Upsert.applyCdc]] — updates replace, deletes remove,
  * unseen keys insert — with the same crash-safe write-then-swap
  * table discipline as [[StreamingUpsert]].
  *
  * Ordering semantics are the ones a log-ordered CDC source (Debezium
  * topic, binlog reader) provides: ACROSS batches the later batch
  * wins (the log is consumed in order), WITHIN a batch `ordCols`
  * resolves collisions (a batch is an unordered set of log records).
  * Replaying a committed batch after a crash re-applies the same
  * latest-per-key rows onto a state they already shaped — applyCdc
  * replays to the same table, so restart recovery composes exactly
  * like the [[StreamingUpsert.restartProofOnce]] proof.
  *
  * Reference capability: the reference tails its feed tables and
  * re-MERGEs rows one at a time (app/main_graph_topraq.py:327-334);
  * deletes are the part it cannot express (MERGE only adds) — opCol
  * closes that gap.
  */
object StreamingCdc {

  /** Maintain the keyed table at `targetPath` from the streaming CDC
    * `feed`. The caller seeds `targetPath` with the base snapshot (or
    * leaves it absent to start empty). Blocks until the
    * AvailableNow-bounded stream drains.
    */
  def run(spark: SparkSession, feed: DataFrame, keys: Seq[String],
          opCol: String, ordCols: Seq[String], targetPath: String,
          checkpoint: String): Unit = {
    val q = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, keys, opCol, ordCols, targetPath, batchId)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Per-micro-batch body (shared so a multi-batch spec can drive the
    * production code batch by batch): applyCdc the batch onto the
    * live table — or onto an empty base of the post-CDC schema when
    * the target does not exist yet.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
                                keys: Seq[String], opCol: String,
                                ordCols: Seq[String], targetPath: String,
                                batchId: Long): Unit = {
    val base =
      if (StreamingUpsert.recoverTarget(spark, targetPath))
        spark.read.parquet(targetPath)
      else batch.drop(opCol +: ordCols: _*).limit(0)
    val next = Upsert.applyCdc(base, batch, keys, opCol, ordCols)
    StreamingUpsert.swapInto(spark, next, targetPath, batchId)
  }

  /** Bounded verify runner: seed `base` as the snapshot, stream the
    * staged feed at `feedPath` through the checkpointed CDC sink, and
    * return the final table. The harness stages the feed as one
    * parquet directory → one AvailableNow batch, so the result equals
    * the batch [[Upsert.applyCdc]] oracle exactly; multi-batch
    * sequencing is spec-proven via [[applyBatch]].
    */
  def applyCdcParquetOnce(spark: SparkSession, base: DataFrame,
                          feedPath: String, keys: Seq[String], opCol: String,
                          ordCols: Seq[String]): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scdc")
    val target = tmp.resolve("target").toString
    base.write.parquet(target)
    run(spark, StreamSource.parquet(spark, feedPath), keys, opCol, ordCols,
      target, tmp.resolve("ckpt").toString)
    spark.read.parquet(target)
  }
}
