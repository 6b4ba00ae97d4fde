package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

/** Batch 51: the GlobalOrder (prefix-sum) form of pair packing must
  * emit bit-identical bins to the window form at any parallelism —
  * the whole point of the escape hatch is that switching forms under
  * a hot stratum is a pure plan change, never a semantics change.
  */
class Batch51Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    // 3 strata of very different sizes (one "hot"), deterministic
    // token lengths with ties to exercise the id tie-break
    val rows = (1 to 500).map { i =>
      val strat = if (i % 10 == 0) "de" else if (i % 7 == 0) "fr" else "en"
      (strat, i.toLong, ((i * 37) % 200 + 1).toLong)
    }
    rows.toDF("lang", "id", "toks")
  }

  test("packPairedLarge == packPaired (modulo bin_id width) on a hot-stratum fixture") {
    val w = Packing.packPaired(fixture, col("lang"), col("toks"),
        col("id"), 256L)
      .withColumn("bin_id", col("bin_id").cast("long"))
    val l = Packing.packPairedLarge(fixture, col("lang"), col("toks"),
        col("id"), 256L)
    assert(l.schema("bin_id").dataType.typeName == "long",
      "large form ranks are BIGINT")
    val cols = w.columns.sorted.map(col(_))
    assert(w.select(cols: _*).except(l.select(cols: _*)).isEmpty &&
      l.select(cols: _*).except(w.select(cols: _*)).isEmpty,
      "prefix-sum rank and window rank must produce identical bins")
  }

  test("ivfDeltaAssign: delta joins the index under existing centroids, base untouched") {
    import graft.operators.Similarity
    val mk = (id: Long, x: Double, y: Double) => (id, Array(x.toFloat, y.toFloat))
    val base = Seq(mk(1L, 1.0, 0.0), mk(2L, 0.9, 0.1),
      mk(3L, 0.0, 1.0), mk(4L, 0.1, 0.9)).toDF("vec_id", "embedding")
    val delta = Seq(mk(10L, 1.0, 0.05), mk(11L, 0.05, 1.0))
      .toDF("vec_id", "embedding")
    val (indexed, centroids) =
      Similarity.ivfKMeans(base, "embedding", "vec_id", nCells = 2, iters = 1)
    val baseCells = indexed.select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Similarity.ivfDeltaAssign(indexed, centroids, delta,
      "embedding", "vec_id")
    val rows = merged.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("cell"), r.getAs[Boolean]("is_delta"))).toSeq
    assert(rows.length == 6, "base + delta all present exactly once")
    assert(rows.filter(_._3).map(_._1).sorted == Seq(10L, 11L))
    // base assignments are unchanged by the refresh
    rows.filterNot(_._3).foreach { case (id, cell, _) =>
      assert(baseCells(id) == cell, s"base vector $id moved cells")
    }
    // each delta vector lands with the base vectors it is nearest to
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    assert(cellOf(10L) == cellOf(1L) && cellOf(11L) == cellOf(3L),
      "delta assigned to the nearest existing centroid")
  }

  test("packPairedLarge: every surviving doc lands in exactly one bin") {
    val bins = Packing.packPairedLarge(fixture, col("lang"), col("toks"),
      col("id"), 256L)
    val members = bins.select(explode(array(col("id_long"), col("id_short"))))
      .na.drop().as[Long].collect()
    assert(members.length == members.distinct.length, "no doc in two bins")
    assert(members.length == 500, "all in-budget docs binned")
    val over = bins.filter(col("bin_tokens") > 256L).count()
    assert(over == 0L, "no bin exceeds the context budget")
  }
}
