package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.InMemoryBolt
import graft.streaming.StreamingCypherSink

/** The streaming→Cypher-sink composition under REAL multi-batch
  * delivery: the orders feed split into several files with
  * maxFilesPerTrigger=1, so dims re-MERGE on every tick and fact
  * batches land across ticks — the store must equal the single-batch
  * run bit-for-bit (idempotence-as-exactly-once across batch
  * boundaries).
  */
class StreamingCypherSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("multi-batch stream converges to the single-batch store") {
    val customer = graft.sources.Tables.read(spark, sf, "customer")
    val nation = graft.sources.Tables.read(spark, sf, "nation")
    val region = graft.sources.Tables.read(spark, sf, "region")
    val orders = graft.sources.Tables.read(spark, sf, "orders")

    // split the orders table into 4 part files in a scratch dir so
    // maxFilesPerTrigger=1 forces 4 micro-batches
    val dir = java.nio.file.Files
      .createTempDirectory("stream_cypher_parts").toString
    orders.repartition(4).write.mode("overwrite").parquet(dir)

    InMemoryBolt.drop("scs_multi"); InMemoryBolt.drop("scs_single")
    try {
      StreamingCypherSink.ordersGraphOnce(spark, dir,
        customer, nation, region, InMemoryBolt.Factory("scs_multi"),
        maxFilesPerTrigger = Some(1))
      StreamingCypherSink.ordersGraphOnce(spark, dir,
        customer, nation, region, InMemoryBolt.Factory("scs_single"))
      val multi = InMemoryBolt.store("scs_multi")
      val single = InMemoryBolt.store("scs_single")
      assert(multi.nodes == single.nodes,
        "batch boundaries must not change what lands")
      assert(multi.edges == single.edges)
      assert(multi.constraints == single.constraints)
      val nOrders = orders.count()
      assert(multi.nodes.keys.count(_._1 == "Order") == nOrders)
      assert(multi.edges.count(_._2 == "PLACED_BY") == nOrders)
      // the multi-batch run re-MERGEd the dims each tick: statement
      // volume strictly exceeds the single-batch run's
      assert(multi.statements > single.statements,
        "expected per-tick dim re-MERGE traffic in the multi-batch run")
    } finally {
      InMemoryBolt.drop("scs_multi"); InMemoryBolt.drop("scs_single")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("a batch naming an unknown customer aborts before any write") {
    val customer = graft.sources.Tables.read(spark, sf, "customer")
      .filter(col("c_custkey") =!= lit(1L)) // drop one referenced key
    val nation = graft.sources.Tables.read(spark, sf, "nation")
    val region = graft.sources.Tables.read(spark, sf, "region")
    val orders = graft.sources.Tables.read(spark, sf, "orders")
    assume(orders.filter(col("o_custkey") === 1L).count() > 0,
      "fixture must reference the dropped customer")
    InMemoryBolt.drop("scs_gate")
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        StreamingCypherSink.ordersGraphOnce(spark,
          s"$sf/orders.parquet", customer, nation, region,
          InMemoryBolt.Factory("scs_gate")))
      assert(ex.getMessage.contains("dangling") ||
        Option(ex.getCause).exists(_.getMessage.contains("dangling")))
      assert(InMemoryBolt.store("scs_gate").nodes.isEmpty,
        "failed gate must leave no partial writes")
    } finally InMemoryBolt.drop("scs_gate")
  }
}
