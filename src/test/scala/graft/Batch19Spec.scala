package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-19 analytics: semantic invariants the oracle hash can't
  * express as clearly — run on sf0.001 against the live catalog.
  */
class Batch19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("cohort retention: week zero is always 1000 milli and nothing exceeds it") {
    val rows = q("w_cohort_retention").collect()
    val w0 = rows.filter(_.getAs[Int]("weeks_since") == 0)
    assert(w0.nonEmpty)
    assert(w0.forall(_.getAs[Long]("retention_milli") == 1000L),
      "every user is active in their own first week")
    assert(rows.forall(_.getAs[Long]("retention_milli") <= 1000L),
      "no week can retain more users than the cohort has")
  }

  test("transition matrix: probabilities are per-source-state milli shares") {
    val rows = q("w_transition_matrix").collect()
    assert(rows.forall { r =>
      val p = r.getAs[Long]("p_milli"); p >= 0L && p <= 1000L })
    // floor-rounded shares per source state sum to within 1000
    val bySrc = rows.groupBy(_.getAs[String]("from_et"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("p_milli")).sum }
    assert(bySrc.forall(s => s > 900L && s <= 1000L),
      s"floor rounding loses < |targets| milli: $bySrc")
  }

  test("association rules: confidence is a probability; support >= the floor") {
    val rows = q("a_assoc_rules").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("supp") >= 2L))
    assert(rows.forall { r =>
      val c = r.getAs[Long]("conf_milli"); c > 0L && c <= 1000L })
  }

  test("link prediction: predicted pairs are never existing edges") {
    val preds = q("g_link_predict")
      .select(col("a"), col("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preds.nonEmpty)
    val b = sources.Tables.read(spark, dir, "lineitem")
      .join(sources.Tables.read(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = b.as("a").join(b.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk"), col("b.pk")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preds.intersect(edges).isEmpty,
      "anti-join must remove every direct co-purchase edge")
    assert(preds.forall { case (a, c) => a < c }, "canonical pair order")
  }

  test("rfm: every customer lands in exactly one segment with scores in 1..4") {
    val rows = q("a_rfm_segments").collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = sources.Tables.read(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust, s"segments partition the $nCust customers, got $total")
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(rows.forall { r => val v = r.getAs[Int](c); v >= 1 && v <= 4 }, c)
  }
}
