package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 48: Hamming retrieval ordering, bootstrap-CI coherence. */
class Batch48Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("hamming top-k: 10 per probe, distances in [0,64] and rank-ordered") {
    val rows = SparkEntry.queries("vec_hamming_topk")(spark, dir)
      .orderBy("qid", "rank").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 3)
    byQ.values.foreach { rs =>
      assert(rs.length === 10)
      val h = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("hamming"))
      assert(h.forall(x => x >= 0 && x <= 64))
      h.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, "hamming must be ascending along rank")
        case _ =>
      }
    }
  }

  test("bootstrap ci: lo <= mean <= hi per event type, interval non-degenerate") {
    val rows = SparkEntry.queries("a_bootstrap_ci")(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getAs[Long]("mean_milli"),
        r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli"))
      assert(lo <= hi)
      assert(lo <= m && m <= hi,
        s"sample mean outside the central bootstrap interval: $r")
      // replica means vary — a zero-width interval would mean the
      // weights degenerated
      assert(hi > lo, s"degenerate interval: $r")
    }
  }
}
