package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 49: zone-map layout separation, keyphrase structural rules. */
class Batch49Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("zonemap: sorted layout overlaps strictly less than hash layout") {
    val rows = SparkEntry.queries("lake_zonemap_overlap")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("hash", "sorted"))
    val (hb, havg, _) = rows("hash")
    val (sb, savg, _) = rows("sorted")
    assert(hb === 32L && sb === 32L)
    assert(savg < havg,
      s"sorting must reduce zone-map overlap: sorted $savg vs hash $havg")
    // the hash layout's buckets each span ~the full date range
    assert(havg > 2000, s"hash layout should overlap nearly everything: $havg")
  }

  test("keyphrases: multi-word, stopword-free, rank-ordered") {
    val stops = graft.functions.TextFunctions.defaultStopwords.toSet
    val rows = SparkEntry.queries("txt_keyphrase")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("score_milli"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length >= 2 && words.length <= 4)
      assert(words.forall(w => w.matches("[a-z]+") && !stops.contains(w)),
        s"phrase contains a breaker token: ${r.getAs[String]("phrase")}")
    }
  }
}
