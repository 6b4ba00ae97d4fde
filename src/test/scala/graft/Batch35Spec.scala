package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Batch 35: the non-backtracking walker must never return to the
  * node it just left, must stay uniform over the remaining
  * neighbors (index-surgery bijection), and must dead-end when the
  * only neighbor is the previous node.
  */
class Batch35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no step ever backtracks; picks stay inside the neighbor set") {
    val r = new scala.util.Random(3)
    val base = (1 to 400)
      .map(_ => (r.nextInt(30).toLong, r.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    // undirected view so every arrival can in principle go back
    val edges = (base ++ base.map(_.swap)).distinct.toDF("src", "dst")
    val adj = base.flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val sources = (0L to 29L).toDF("id")
    val rows = GraphOps.deterministicWalksNoBacktrack(edges, sources, 3)
      .collect()
    rows.foreach { row =>
      val chain = Seq(row.getAs[Long]("start")) ++ (1 to 3).map(i =>
        Option(row.getAs[Any](s"n$i")).map(_.asInstanceOf[Long]))
        .takeWhile(_.isDefined).flatten
      chain.sliding(3).foreach {
        case Seq(a, _, c) => assert(c != a,
          s"walk backtracked $a -> _ -> $c in ${chain.mkString(">")}")
        case _ =>
      }
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(adj.getOrElse(a, Set.empty).contains(b),
          s"pick $b not a neighbor of $a")
        case _ =>
      }
    }
  }

  test("pendant vertex dead-ends instead of bouncing back") {
    // 1 <-> 2 only: from 1 go to 2; at 2 the only neighbor is 1 = prev
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphOps.deterministicWalksNoBacktrack(edges,
      Seq(1L).toDF("id"), steps = 2).collect()(0)
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.isNullAt(r.fieldIndex("n2")),
      "deg-1 vertex whose neighbor is prev must dead-end")
  }
}
