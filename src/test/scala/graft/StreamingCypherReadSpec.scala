package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCypherRead

/** Cypher over a streaming graph under REAL multi-batch delivery:
  * the orders feed split into several files with maxFilesPerTrigger=1
  * so the graph accretes across ticks; the final tick's answer must
  * equal the batch replay over the whole feed.
  */
class StreamingCypherReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("multi-batch stream: final tick equals the batch replay") {
    val customer = graft.sources.Tables.read(spark, sf, "customer")
    val nation = graft.sources.Tables.read(spark, sf, "nation")
    val orders = graft.sources.Tables.read(spark, sf, "orders")

    val parts = java.nio.file.Files
      .createTempDirectory("stream_cy_read_parts").toString
    orders.repartition(4).write.mode("overwrite").parquet(parts)
    val acc = java.nio.file.Files
      .createTempDirectory("stream_cy_read_acc").toString + "/acc"

    val query =
      """MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)-[:PLACED]->(o:Order)
         RETURN n.name AS nation, count(*) AS n_orders ORDER BY nation"""
    val (rows, _, ticks) = StreamingCypherRead.ordersCypherOnce(
      spark, parts, customer, nation, query, acc,
      maxFilesPerTrigger = Some(1))
    assert(ticks >= 4, s"expected >=4 micro-batches, got $ticks")

    // batch replay truth, computed relationally (not via the compiler
    // under test)
    val expected = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(got == expected)
  }
}
