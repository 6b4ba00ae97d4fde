package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.domain.GraphAssembly
import graft.sinks.{BoltSessionFactory, CypherSink}

/** Streaming ingest driving the Cypher MERGE sink — the composition
  * the reference runs in production: a feed of fact rows lands as
  * graph writes, batched `UNWIND … MERGE` behind uniqueness
  * constraints (its projectors re-run on every schedule tick; here
  * each micro-batch IS one such tick). Exactly-once is by
  * IDEMPOTENCE, not by sink-side transactions: a replayed or
  * overlapping batch re-MERGEs to the same store, so the stream
  * converges to the batch-replay answer regardless of batch
  * boundaries or restarts — which is exactly what the oracle checks.
  *
  * Per micro-batch: Order vertices + PLACED_BY edges from the BATCH
  * rows, dimension vertices/edges (Customer/Nation/Region) from the
  * static frames — a stream-static pattern where the dims are
  * re-MERGEd each tick like the reference's idempotent dim
  * projectors. writeGraph's integrity gates run per batch (an order
  * naming an unknown customer aborts that batch BEFORE any write).
  *
  * Scale shape: state is entirely in the sink store (no Spark
  * streaming state); per-tick cost is batch-rows + dim-size, and the
  * dims ride the same `foreachPartition` fan-out as the facts.
  */
object StreamingCypherSink {

  /** Drive the orders feed to exhaustion through `factory`;
    * `maxFilesPerTrigger` forces multi-batch delivery for testing
    * batch-boundary independence. */
  def ordersGraphOnce(spark: SparkSession, ordersPath: String,
                      customer: DataFrame, nation: DataFrame,
                      region: DataFrame, factory: BoltSessionFactory,
                      batchSize: Int = 1000,
                      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val dimVerts =
      GraphAssembly.vertices(customer
          .select(col("c_custkey"), col("c_mktsegment")),
          "Customer", Seq("c_custkey"))
        .unionByName(GraphAssembly.vertices(nation
          .select(col("n_nationkey"), col("n_name")),
          "Nation", Seq("n_nationkey")))
        .unionByName(GraphAssembly.vertices(region
          .select(col("r_regionkey"), col("r_name")),
          "Region", Seq("r_regionkey")))
    val dimEdges =
      GraphAssembly.edges(customer, "IN_NATION",
          "Customer", Seq("c_custkey"), "Nation", Seq("c_nationkey"))
        .unionByName(GraphAssembly.edges(nation, "IN_REGION",
          "Nation", Seq("n_nationkey"), "Region", Seq("n_regionkey")))

    val src = maxFilesPerTrigger match {
      case None => StreamSource.parquet(spark, ordersPath)
      case Some(n) => // trigger cap must be set on the reader itself
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

    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val verts = GraphAssembly.vertices(
            batch.select(col("o_orderkey"), col("o_orderpriority")),
            "Order", Seq("o_orderkey"))
          .unionByName(dimVerts)
        val edges = GraphAssembly.edges(batch, "PLACED_BY",
            "Order", Seq("o_orderkey"), "Customer", Seq("o_custkey"))
          .unionByName(dimEdges)
        CypherSink.writeGraph(verts, edges, factory, batchSize)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
