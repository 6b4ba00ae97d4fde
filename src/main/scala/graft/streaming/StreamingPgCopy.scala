package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.sources.pgwire.PgWireCopySink

/** Streaming ingest driving the relational COPY sink — the Postgres
  * analog of [[StreamingCypherSink]]: a feed of fact rows lands in a
  * warehouse table over the pgwire COPY bulk path, one micro-batch per
  * tick (the reference's schedule-tick projectors,
  * main_graph_topraq.py:94-95, re-run the same idempotent load shape
  * against their relational store).
  *
  * Exactly-once is by BATCH-SCOPED TRUNCATE-AND-LOAD, not sink-side
  * transactions: each micro-batch COPYs into its own per-batch table
  * (`<prefix>_b<batchId>`), and `defineBatchTable` (re)creates that
  * table EMPTY first. Structured Streaming replays a batch under the
  * same batchId after a failure, so a replay truncates its own partial
  * leftovers and re-lands the identical rows — the classic staging-
  * partition idempotence that makes an append-only bulk protocol safe
  * under at-least-once delivery. Readers union the batch tables (real
  * warehouses ATTACH/swap them into a partitioned parent; the loopback
  * keeps them separate and the read-back entry unions through the
  * pgwire source).
  *
  * Scale shape: per tick, the batch rows fan out through
  * `df.foreachPartition` COPY statements — N executors stream N
  * concurrent COPYs into the batch table, nothing on the driver but
  * the table (re)definition. State lives entirely in the sink store.
  */
object StreamingPgCopy {

  /** Drive `feed` (a streaming DataFrame whose columns are already
    * COPY-shippable: long/double/string) to exhaustion. Per batch:
    * `defineBatchTable(name)` must (re)create the empty per-batch
    * table server-side, then the batch COPYs into it. Returns the
    * batch table names in batch order.
    */
  def runOnce(feed: DataFrame, host: String, port: Int,
              tablePrefix: String,
              defineBatchTable: String => Unit): Seq[String] = {
    require(tablePrefix.matches("\\w+"),
      s"tablePrefix must be a simple identifier: $tablePrefix")
    val tables = new java.util.concurrent.ConcurrentSkipListMap[Long, String]()
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val table = s"${tablePrefix}_b$batchId"
        defineBatchTable(table) // truncate-and-load: replay-idempotent
        PgWireCopySink.copyTo(batch, host, port, table)
        tables.put(batchId, table)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    tables.values().toArray(Array.empty[String]).toSeq
  }

  /** The orders feed, projected to the COPY-shippable shape the
    * round-trip entries use (BIGINT cents — the decimal-at-totals
    * grain policy; a double would sum order-dependently). */
  def ordersFeed(spark: SparkSession, ordersPath: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = maxFilesPerTrigger match {
      case None => StreamSource.parquet(spark, ordersPath)
      case Some(n) => // trigger cap must be set on the reader itself
        val schema = spark.read.parquet(ordersPath).schema
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", n).parquet(ordersPath)
    }
    src
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        (col("o_totalprice").cast("decimal(27,2)") * 100)
          .cast("long").as("cents"),
        col("o_orderpriority").as("priority"))
  }
}
