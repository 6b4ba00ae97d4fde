package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Batch 44: MIS independence+maximality certificates, PQ ADC list
  * shape, scene-cut consistency. */
class Batch44Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def edgesAt(d: String) = {
    val li = graft.sources.Tables.read(spark, d, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
    li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.pk") < col("l2.pk"))
      .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
  }

  test("mis: the selected set is INDEPENDENT (no edge inside) and MAXIMAL") {
    val edges = edgesAt(dir).cache()
    val mis = GraphOps.maximalIndependentSet(edges, rounds = 6)
      .filter(col("sel_round") > 0).select(col("v")).cache()
    // independence: no canonical edge with both endpoints selected
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val inside = canon
      .join(mis.select(col("v").as("a")), Seq("a"), "left_semi")
      .join(mis.select(col("v").as("b")), Seq("b"), "left_semi")
      .count()
    assert(inside === 0, "MIS contains an edge")
    // maximality: every vertex outside the set has a selected neighbor
    val sym = canon.select(col("a").as("v"), col("b").as("n"))
      .union(canon.select(col("b").as("v"), col("a").as("n")))
    val uncovered = sym.select(col("v")).distinct()
      .join(mis, Seq("v"), "left_anti")
      .join(sym.join(mis.select(col("v").as("n")), Seq("n"), "left_semi")
        .select(col("v")).distinct(), Seq("v"), "left_anti")
      .count()
    assert(uncovered === 0, "a non-member has no selected neighbor: not maximal")
  }

  test("mis: converges within the fixed rounds on this graph (no -1 leftovers)") {
    val out = SparkEntry.queries("g_mis")(spark, dir)
    assert(out.filter(col("sel_round") === -1).count() === 0)
  }

  test("pq adc: 10 results per query, scores non-increasing along rank") {
    val rows = SparkEntry.queries("vec_pq_adc_topk")(spark, dir)
      .orderBy("qid", "rank").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 3)
    byQ.values.foreach { rs =>
      assert(rs.length === 10)
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      scores.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, "ADC scores must be rank-ordered")
        case _ =>
      }
    }
  }

  test("scene cuts: cut count bounded by transitions; first_cut consistent") {
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nFrames = r.getAs[Long]("n_frames")
      val nCuts = r.getAs[Long]("n_cuts")
      assert(nCuts <= nFrames - 1)
      if (nCuts == 0) assert(r.isNullAt(r.fieldIndex("first_cut")))
      else assert(!r.isNullAt(r.fieldIndex("first_cut")))
    }
  }
}
