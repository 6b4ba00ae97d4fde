package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cypher.GraphStore

/** Streaming ingest through the Cypher WRITE surface: a feed drains
  * micro-batch by micro-batch, and each batch becomes the reference's
  * own batch idiom — `UNWIND $rows AS row MERGE … SET …` statements
  * (one per node label + one pattern-complete relationship MERGE) —
  * executed against a [[graft.cypher.GraphStore]] by the set-wise
  * write compiler.
  *
  * Exactly-once WITHOUT transactional sinks: MERGE is idempotent (the
  * fixpoint the reference's projectors rely on, and CypherWriteSpec
  * proves), so at-least-once delivery of any batch converges to the
  * same graph — the streaming twin of `stream_cypher_sink`'s
  * idempotence-as-exactly-once, now for the engine's OWN store rather
  * than a remote endpoint. The per-batch collect into a parameter
  * list is the wire-client model (Neo4j batch writers buffer
  * BATCH_SIZE rows then send one UNWIND; here the batch bound is
  * `maxFilesPerTrigger`), not engine execution: the store applies
  * each batch as broadcast-delta joins.
  */
object StreamingCypherIngest {

  /** Drain `ordersPath` into `store` (Order/Customer nodes + PLACED
    * edges). After the drain, the LAST batch is re-executed verbatim
    * (simulated at-least-once redelivery) and must change nothing —
    * the convergence proof runs inside the ingest, not beside it.
    * Returns the micro-batch count.
    */
  def ordersMergeOnce(spark: SparkSession, ordersPath: String,
                      store: GraphStore,
                      maxFilesPerTrigger: Option[Int] = None): Int = {
    val src = maxFilesPerTrigger match {
      case None => StreamSource.parquet(spark, ordersPath)
      case Some(n) =>
        val schema = spark.read.parquet(ordersPath).schema
        val rdr = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", n)
        if (new java.io.File(ordersPath).isDirectory) rdr.parquet(ordersPath)
        else {
          val dir = ordersPath.replaceAll("/[^/]+$", "")
          val fileName =
            ordersPath.substring(ordersPath.lastIndexOf('/') + 1)
          rdr.option("pathGlobFilter", fileName).parquet(dir)
        }
    }
    val ticks = new java.util.concurrent.atomic.AtomicInteger(0)
    val lastBatch = new java.util.concurrent.atomic.AtomicReference[
      Seq[Map[String, Any]]](Seq.empty)

    def applyBatch(rows: Seq[Map[String, Any]]): (Long, Long) =
      if (rows.isEmpty) (0L, 0L)
      else {
        val s1 = store.execute(
          """UNWIND $rows AS row
             MERGE (o:Order {k: row.k})
             SET o.status = row.status, o.price = row.price""",
          Map("rows" -> rows))
        val s2 = store.execute(
          """UNWIND $rows AS row
             MERGE (c:Customer {k: row.ck})-[:PLACED]->(o:Order {k: row.k})""",
          Map("rows" -> rows))
        (s1.nodesCreated + s2.nodesCreated, s1.relsCreated + s2.relsCreated)
      }

    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows: Seq[Map[String, Any]] = batch
          .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").cast("double").cast("string").as("price"))
          .collect().toSeq
          .map(r => Map[String, Any]("k" -> r.get(0), "ck" -> r.get(1),
            "status" -> r.get(2), "price" -> r.get(3)))
        applyBatch(rows)
        lastBatch.set(rows)
        ticks.incrementAndGet()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // At-least-once redelivery of the final batch must be a fixpoint.
    // The proof reads the MERGE statement stats (nodes/rels CREATED by
    // the re-apply must be zero) instead of counting the standing
    // graph before and after (r17): the stats measure exactly the
    // fixpoint property, and the old count pair cost FOUR full
    // standing-view materializations on top of the re-apply — it was
    // most of this runner's wall at the bench SF.
    val redelivered = lastBatch.get()
    if (redelivered.nonEmpty) {
      val (nCreated, rCreated) = applyBatch(redelivered)
      require(nCreated == 0L && rCreated == 0L,
        s"redelivered batch changed the graph: created $nCreated nodes, " +
          s"$rCreated rels")
    }
    ticks.get()
  }
}
