package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Batch 37: power iteration must find a known dominant direction
  * and be partition-stable; assortativity must replay the
  * hand-computed star value (r = −1).
  */
class Batch37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("powerIteration recovers the dominant axis of an anisotropic cloud") {
    // variance along dim 0 is ~25x any other: the principal
    // direction is e0 up to sign; sup-norm puts |v(0)| = 1
    val r = new scala.util.Random(5)
    val rows = (1 to 300).map { _ =>
      Array.tabulate(8)(d =>
        (if (d == 0) r.nextGaussian() * 5 else r.nextGaussian() * 0.3).toFloat)
    }.map(Tuple1(_)).toDF("embedding")
    val v = Similarity.powerIteration(rows, "embedding", dim = 8, iters = 4)
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(math.abs(v(0)) == 1.0,
      s"sup-norm peak must sit on the dominant axis, got ${v.toSeq}")
    assert((1 until 8).forall(d => math.abs(v(d)) < 0.4),
      s"off-axis components must be small, got ${v.toSeq}")
  }

  test("powerIteration is bit-stable across repartitionings") {
    val r = new scala.util.Random(9)
    val rows = (1 to 200).map { _ =>
      Array.tabulate(6)(_ => r.nextGaussian().toFloat)
    }.map(Tuple1(_)).toDF("embedding")
    val a = Similarity.powerIteration(rows, "embedding", 6, 3)
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    val b = Similarity.powerIteration(rows.repartition(13), "embedding", 6, 3)
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    assert(a == b, s"quantized iterate must not depend on layout:\n$a\n$b")
  }

  test("assortativity moments: star graph replays r = -1 exactly") {
    // hub->3 leaves: S1=9, S2=12, S3=30, m=3
    // r_num = 4*3*9 - 144 = -36; r_den = 2*3*30 - 144 = 36  => r = -1
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val op = Seq((100L, 1L), (100L, 2L), (100L, 3L)).toDF("src", "dst")
    val deg = op.select(col("src").as("id"))
      .unionByName(op.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val wd = op
      .join(deg.select(col("id"), col("deg").as("j")), op("src") === col("id")).drop("id")
      .join(deg.select(col("id"), col("deg").as("k")), op("dst") === col("id")).drop("id")
    val row = wd.agg(count(lit(1)).as("m"),
        sum(d(col("j")) * col("k")).as("s1"),
        sum(d(col("j")) + col("k")).as("s2"),
        sum(d(col("j")) * col("j") + d(col("k")) * col("k")).as("s3"))
      .select(
        (lit(4).cast("decimal(38,0)") * col("m") * col("s1")
          - col("s2") * col("s2")).cast("decimal(38,0)").as("num"),
        (lit(2).cast("decimal(38,0)") * col("m") * col("s3")
          - col("s2") * col("s2")).cast("decimal(38,0)").as("den"))
      .collect()(0)
    assert(row.getAs[java.math.BigDecimal]("num").longValueExact() == -36L)
    assert(row.getAs[java.math.BigDecimal]("den").longValueExact() == 36L)
  }
}
