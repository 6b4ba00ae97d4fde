package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Checksum, Percentiles, SnapshotDiff}

/** Functional specs for the batch-9 operators: snapshot diff,
  * continuous percentiles, table checksums.
  */
class Queries9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0))
      .toDF("k", "t", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "a", 25.0), (4L, "a", 40.0))
      .toDF("k", "t", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k", "t"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshot diff value compare is null-safe") {
    val old = Seq((1L, Some(1.0)), (2L, None: Option[Double]), (3L, None: Option[Double]))
      .toDF("k", "v")
    val neu = Seq((1L, None: Option[Double]), (2L, None: Option[Double]), (3L, Some(3.0)))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // null vs value = changed both directions; null vs null = unchanged
    assert(out == Map(1L -> "changed", 3L -> "changed"))
  }

  test("quantilesCont interpolates like the standard linear (type-7) rule") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0) // h = p*(n-1)
    val df = vals.map(("a", _)).toDF("g0", "v0")
    val q = Percentiles.quantilesCont(df, $"g0", $"v0", Seq(0, 2500, 5000, 9000, 10000))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(q(0) == 10.0)
    assert(q(2500) == 17.5)  // h=0.75 -> 10 + 0.75*10
    assert(q(5000) == 25.0)
    assert(q(9000) == 37.0)  // h=2.7 -> 30 + 0.7*10
    assert(q(10000) == 40.0)
    // ties compress into the frequency table without changing ranks
    val tied = (Seq.fill(3)(1.0) ++ Seq(5.0)).map(("a", _)).toDF("g0", "v0")
    val qt = Percentiles.quantilesCont(tied, $"g0", $"v0", Seq(5000))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(qt(5000) == 1.0) // h=1.5, both neighbors are 1.0
  }

  test("shortestPaths: multi-source BFS distances with unreachable as null") {
    //  1 -> 2 -> 3 -> 4   and isolated pair 10 -> 11; sources {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("id")
    val out = graft.operators.GraphOps.shortestPaths(edges, sources, iterations = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 10L -> Some(0L), 11L -> Some(1L)))
    // truncated horizon leaves the far vertex null, not wrong
    val short = graft.operators.GraphOps.shortestPaths(edges, sources, iterations = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(short(4L).isEmpty)
  }

  test("semanticNearDup pairs within cells only (the documented recall trade)") {
    val indexed = Seq(
      (1L, Seq(1.0f, 0.0f), 0L), (2L, Seq(1.0f, 0.001f), 0L), // same cell, near-dup
      (3L, Seq(1.0f, 0.002f), 1L),                            // similar but other cell
      (4L, Seq(0.0f, 1.0f), 0L)                               // same cell, dissimilar
    ).toDF("id", "v", "cell")
    val pairs = graft.operators.Dedup.semanticNearDup(indexed, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("table checksum is order/partitioning-independent and content-sensitive") {
    val base = (1L to 500L).map(i => (i, s"name$i", i % 7)).toDF("id", "name", "grp")
    def sum(df: org.apache.spark.sql.DataFrame) =
      Checksum.tableChecksum(df, "t", Seq($"id", $"name", $"grp"))
        .collect().head.getLong(2)
    val a = sum(base)
    val b = sum(base.orderBy($"id".desc).repartition(13))
    assert(a == b, "checksum must not depend on row order or partitioning")
    val tampered = base.withColumn("grp",
      when($"id" === 250L, $"grp" + 1).otherwise($"grp"))
    assert(sum(tampered) != a, "single-cell change must move the checksum")
  }
}
