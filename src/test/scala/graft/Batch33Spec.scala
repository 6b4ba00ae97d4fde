package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Batch 33: deterministic-walk picks must replay the hash formula
  * exactly, dead ends must surface as nulls (not dropped walks), and
  * the Welch-t rational must vanish on identical slices.
  */
class Batch33Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def detHash(x: Long): Long =
    (x % 94906249L) * 1103515245L % 2147483647L

  test("deterministicWalks replays the hash pick over the indexed adjacency") {
    // node 1 -> {10, 20, 30}; 10 -> {7}; 20 -> {8}; 30 -> (dead end)
    val edges = Seq((1L, 10L), (1L, 20L), (1L, 30L), (10L, 7L), (20L, 8L))
      .toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    val got = GraphOps.deterministicWalks(edges, sources, steps = 2)
      .collect()(0)
    val pick1 = detHash(1L * 1000003L + 1) % 3 // neighbors sorted: 10,20,30
    val n1 = Seq(10L, 20L, 30L)(pick1.toInt)
    assert(got.getAs[Long]("n1") == n1)
    val expected2 = n1 match {
      case 10L => Some(7L)
      case 20L => Some(8L)
      case 30L => None
    }
    assert(Option(got.getAs[Any]("n2")) == expected2)
  }

  test("deterministicWalks: dead-end source survives with all-null steps") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val sources = Seq(99L).toDF("id")
    val rows = GraphOps.deterministicWalks(edges, sources, steps = 3).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("start") == 99L)
    assert((1 to 3).forall(i => rows(0).isNullAt(rows(0).fieldIndex(s"n$i"))))
  }

  test("deterministicWalks is stable across repartitionings") {
    val r = new scala.util.Random(11)
    val edges = (1 to 300)
      .map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
      .distinct.toDF("src", "dst")
    val sources = (0L to 39L).toDF("id")
    val a = GraphOps.deterministicWalks(edges, sources, 3)
      .collect().map(_.toSeq).toSet
    val b = GraphOps.deterministicWalks(edges.repartition(7), sources, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("Welch t2_num is zero for two identical slices") {
    // same value multiset on both sides of the parity split
    val df = (1 to 50).flatMap(i =>
      Seq((i.toLong, true), (i.toLong, false)))
      .toDF("x", "cur")
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val g = df.groupBy(lit(1).as("k"))
      .agg(
        sum(when(col("cur"), 0L).otherwise(1L)).as("n1"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("cur"), 0L).otherwise(d(col("x")))).as("s1"),
        sum(when(col("cur"), d(col("x"))).otherwise(0L)).as("s2"))
      .select((col("s1") * col("n2") - col("s2") * col("n1"))
        .cast("decimal(38,0)").as("diff"))
      .collect()(0)
    assert(g.getAs[java.math.BigDecimal]("diff").longValueExact() == 0L)
  }
}
