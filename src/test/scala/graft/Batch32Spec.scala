package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TimeSeries}

/** Batch 32 operator semantics: the CUSUM drawdown rewrite must
  * equal the sequential recursion, and the stride interleave must
  * spread each source proportionally with a total, collision-free
  * layout.
  */
class Batch32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cusum drawdown rewrite == sequential max(0, s+x) recursion") {
    val r = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (s"k${i % 3}", i.toLong, (r.nextInt(21) - 10).toLong)
    }
    val df = rows.toDF("k", "ord", "x")
    val got = TimeSeries.cusum(df, col("k"), Seq(col("ord")), col("x"))
      .select(col("k"), col("ord"), col("cusum")).collect()
      .map(r0 => (r0.getString(0), r0.getLong(1)) ->
        r0.getAs[java.math.BigDecimal](2).longValueExact())
      .toMap
    // reference: per-key sequential fold
    val want = rows.groupBy(_._1).flatMap { case (k, g) =>
      var s = 0L
      g.sortBy(_._2).map { case (_, ord, x) =>
        s = math.max(0L, s + x)
        (k, ord) -> s
      }
    }
    assert(got == want)
  }

  test("cusum never negative and resets after deep drawdown") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, -100L), ("a", 3L, 7L))
      .toDF("k", "ord", "x")
    val got = TimeSeries.cusum(df, col("k"), Seq(col("ord")), col("x"))
      .orderBy("ord").collect()
      .map(_.getAs[java.math.BigDecimal]("cusum").longValueExact()).toSeq
    assert(got == Seq(5L, 0L, 7L), "clamp at zero forgets the drawdown")
  }

  test("interleaveProportional: total order, proportional spread") {
    // source a: 80 rows, source b: 20 rows -> b should land ~every 5th
    val df = ((1 to 80).map(i => (s"a$i", "a")) ++
      (1 to 20).map(i => (s"b$i", "b"))).toDF("id", "src")
    val got = Sampling.interleaveProportional(df, col("src"),
      Seq(col("id").asc))
    val rows = got.select("src", "src_idx", "pos")
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._3).sorted.toSeq == (1L to 100L),
      "positions are a contiguous 1..N permutation")
    // the i-th b-row must sit near global fraction i/20: stride midpoint
    // key is (2i-1)*100 div 40 = 5i-3..ish; check max gap between
    // consecutive b positions stays near the stride (no clumping)
    val bPos = rows.filter(_._1 == "b").sortBy(_._2).map(_._3)
    val gaps = bPos.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(g => g >= 3 && g <= 7),
      s"b-rows spread at ~stride 5, got gaps $gaps")
    // deterministic: same input -> same layout
    val again = Sampling.interleaveProportional(df, col("src"),
      Seq(col("id").asc)).select("src", "src_idx", "pos")
      .as[(String, Long, Long)].collect()
    assert(again.sortBy(_._3).toSeq == rows.sortBy(_._3).toSeq)
  }
}
