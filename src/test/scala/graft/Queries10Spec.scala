package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GlobalOrder, Sampling, Sketches}

/** Functional specs for the batch-10 operators: KMV sketches, global
  * indexing, hash-reservoir sampling, shard balance, source-priority
  * dedup, quality sweep.
  */
class Queries10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scala replica of Sampling.detHash for expected-value computation. */
  private def detHash(id: Long): Long =
    (id % 94906249L) * 1103515245L % 2147483647L

  test("KMV sketch is exact below k and within tolerance above") {
    val small = (1L to 20L).map(("a", _))
    val big = (1L to 5000L).map(("b", _))
    val df = (small ++ big).toDF("g0", "id").repartition(8)
    val out = Sketches.kmvDistinct(df, $"g0", $"id", 64)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    val (aK, aN, aEst) = out("a")
    assert(aK == 20 && aN == 20 && aEst == 20.0) // exhausted -> exact
    val (bK, bN, bEst) = out("b")
    assert(bK == 64)
    assert(bN == 5000, "no detHash collisions in 1..5000")
    // KMV stderr ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert(math.abs(bEst - bN) / bN < 0.4, s"est $bEst vs $bN")
  }

  test("KMV retention is partitioning-invariant") {
    val df = (1L to 3000L).map(("x", _)).toDF("g0", "id")
    val a = Sketches.kmvDistinct(df.repartition(3), $"g0", $"id", 32).collect()
    val b = Sketches.kmvDistinct(df.repartition(17), $"g0", $"id", 32).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("global index equals the single-reducer global window") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(20)))
      .toDF("id", "v").repartition(7)
    val got = GlobalOrder.withGlobalIndex(df, Seq($"v".desc, $"id".asc))
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy($"v".desc, $"id".asc)).cast("long"))
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("hash reservoir selection is partitioning-invariant and matches the hash order") {
    val ids = (1L to 1000L)
    val expected = ids.sortBy(id => (detHash(id), id)).take(50).toSet
    for (parts <- Seq(2, 13)) {
      val got = ids.toDF("doc_id").repartition(parts)
        .select($"doc_id", Sampling.detHash($"doc_id").as("h"))
        .orderBy($"h".asc, $"doc_id".asc).limit(50)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == expected)
    }
  }

  test("hash shards cover every row and stay balanced") {
    val n = 10000L
    val shards = (1L to n).toDF("doc_id")
      .groupBy((Sampling.detHash($"doc_id") % 64L).as("shard"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    assert(shards.map(_._2).sum == n)
    assert(shards.forall { case (s, _) => s >= 0 && s < 64 })
    assert(shards.length == 64, "every shard populated at 10k rows")
    val mean = n.toDouble / 64
    assert(shards.map(_._2).max < 2 * mean, "hash sharding stays balanced")
  }

  test("source-priority dedup keeps the most trusted copy per key") {
    val docs = Seq(
      (1L, 9, "k1"), (2L, 0, "k1"), (3L, 9, "k1"),
      (4L, 5, "k2"), (5L, 5, "k2"),
      (6L, 7, "k3")).toDF("doc_id", "prio", "fp")
    val out = Dedup.exactByOrd(docs, $"fp", struct($"prio", $"doc_id"))
      .select($"fp", $"doc_id").as[(String, Long)].collect().toMap
    // k1: best prio wins; k2: prio tie -> lowest id; k3: singleton
    assert(out == Map("k1" -> 2L, "k2" -> 4L, "k3" -> 6L))
  }

  test("quality-threshold sweep keep counts are monotone in the cutoff") {
    val rows = SparkEntry.queries("txt_quality_sweep")(
        spark, "/root/testdata/sf0.001")
      .orderBy($"t_bp").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, k1, _, _), (_, k2, _, _)) => assert(k2 <= k1)
      case _ =>
    }
    rows.foreach { case (_, k, n, bp) =>
      assert(k >= 0 && k <= n && bp == k * 10000 / n)
    }
  }
}
