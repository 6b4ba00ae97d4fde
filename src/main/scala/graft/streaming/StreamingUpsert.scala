package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Upsert

/** Streaming MERGE sink — the reference's idempotent Cypher MERGE
  * (e.g. /root/reference/app/graph_fields.py:14-30) applied
  * continuously: each micro-batch is upserted into a keyed table via
  * `foreachBatch` + [[Upsert.merge]], so re-delivered rows update in
  * place instead of duplicating.
  *
  * foreachBatch gives exactly-once table maintenance on top of the
  * source's offset tracking: a replayed batch re-merges to the same
  * state (MERGE is idempotent by key). On a transactional table format
  * the body becomes a real `MERGE INTO`; plain parquet needs the
  * read-merge-overwrite below, with `localCheckpoint` materializing
  * the merge result before the target is overwritten (reading and
  * overwriting the same path in one lazy plan would corrupt it).
  */
object StreamingUpsert {

  /** Maintain the keyed parquet table at `targetPath` from `stream`.
    * `orderBy` breaks intra-batch key collisions (highest wins — the
    * reference's arrival order made deterministic). Blocks until the
    * (AvailableNow-bounded) stream drains.
    */
  def run(spark: SparkSession, stream: DataFrame, keys: Seq[String],
          orderBy: Seq[String], targetPath: String, checkpoint: String,
          keepExistingNonNull: Boolean = false): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val incoming = Upsert.dedupByKey(batch, keys,
          orderBy.map(org.apache.spark.sql.functions.col).toSeq)
        val merged =
          if (new java.io.File(targetPath).exists()) {
            val existing = spark.read.parquet(targetPath)
            Upsert.merge(existing, incoming, keys, keepExistingNonNull)
          } else incoming
        merged.localCheckpoint(true)
          .write.mode("overwrite").parquet(targetPath)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
