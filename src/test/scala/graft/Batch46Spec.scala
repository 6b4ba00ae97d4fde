package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 46: KS null-case, decay-gate exactness, streak bounds. */
class Batch46Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("ks: identical samples give D = 0; disjoint supports give D = n1*n2") {
    def ks(pairs: Seq[(String, Long)]): (Long, Long, Long) = {
      val vf = pairs.toDF("s", "v").groupBy("v")
        .agg(sum(when(col("s") === "a", 1L).otherwise(0L)).as("f1"),
          sum(when(col("s") === "b", 1L).otherwise(0L)).as("f2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("v")
        .rowsBetween(Long.MinValue, 0)
      val whole = org.apache.spark.sql.expressions.Window.partitionBy()
      val r = vf.withColumn("c1", sum("f1").over(w))
        .withColumn("c2", sum("f2").over(w))
        .withColumn("n1", sum("f1").over(whole))
        .withColumn("n2", sum("f2").over(whole))
        .agg(max("n1"), max("n2"),
          max(abs(col("c1") * col("n2") - col("c2") * col("n1")))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val same = (1L to 50L).flatMap(v => Seq(("a", v), ("b", v)))
    assert(ks(same)._3 === 0L)
    val disjoint = (1L to 30L).map(v => ("a", v)) ++ (100L to 129L).map(v => ("b", v))
    val (n1, n2, d) = ks(disjoint)
    assert(d === n1 * n2, "disjoint supports must reach the maximal statistic")
  }

  test("decay sampling: kept rate tracks the harmonic weight per bucket") {
    val rows = SparkEntry.queries("samp_decay_weighted")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("w_permille")
      val kept = r.getAs[Long]("kept_permille")
      val n = r.getAs[Long]("n_total")
      // hash gate: expected kept = w/1000; allow binomial noise
      val tol = math.max(60L, (3000.0 / math.sqrt(n.toDouble)).toLong)
      assert(math.abs(kept - w) <= tol, s"bucket off target: $r (tol $tol)")
    }
    // weights must strictly decay with age
    val byAge = rows.sortBy(_.getAs[Long]("age_weeks")).map(_.getAs[Long]("w_permille"))
    byAge.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
  }

  test("streaks: current streak never exceeds longest; top list is rank-ordered") {
    val rows = SparkEntry.queries("w_streak_leaders")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r =>
      assert(r.getAs[Long]("current") <= r.getAs[Long]("longest")))
    val longest = rows.map(_.getAs[Long]("longest"))
    longest.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
