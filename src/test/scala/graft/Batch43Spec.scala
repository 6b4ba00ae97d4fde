package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 43: stream==batch top-k parity, backfill plan contiguity,
  * ANN refine monotonicity. */
class Batch43Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming window top-k equals the batch replay") {
    val streamed = SparkEntry.queries("stream_window_topk")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val batch = graft.sources.Tables.read(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("date"))
          .orderBy(col("n").desc, col("event_type").asc)))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed === batch)
  }

  test("backfill plan: jobs are contiguous, disjoint, and cover every todo day") {
    val jobs = SparkEntry.queries("lake_backfill_plan")(spark, dir).collect()
    assert(jobs.nonEmpty)
    jobs.groupBy(_.getString(0)).foreach { case (_, js) =>
      val sorted = js.sortBy(_.getInt(1))
      sorted.foreach { j =>
        val days = j.getDate(3).toLocalDate.toEpochDay -
          j.getDate(2).toLocalDate.toEpochDay + 1
        assert(days === j.getLong(4), "job range length != n_days (non-contiguous)")
      }
      // disjoint and ordered: each job starts after the previous ends
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDate(2).toLocalDate.toEpochDay >
            a.getDate(3).toLocalDate.toEpochDay + 1,
            "adjacent jobs should have been merged into one island")
        case _ =>
      }
    }
  }

  test("ann refine: refined recall is never below base recall") {
    val out = SparkEntry.queries("vec_ann_refine")(spark, dir).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("refined_found") >= r.getAs[Long]("base_found"),
        s"refinement lost recall: $r")
    }
  }
}
