package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{RangeJoin, SkewJoin}
import graft.sources.Tables

class JoinStrategiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalJoin matches the naive theta join, including multi-bucket spans") {
    val points = Seq(
      (1, "2025-06-01 10:00:00", 1.0),
      (1, "2025-06-01 10:59:59", 2.0),   // inclusive end boundary
      (1, "2025-06-01 11:00:01", 3.0),   // just outside
      (1, "2025-06-02 09:00:00", 4.0),   // inside the long interval only
      (2, "2025-06-01 10:30:00", 5.0)    // right key, different user
    ).map { case (u, t, v) => (u, ts(t), v) }.toDF("user_id", "ts", "value")
    val intervals = Seq(
      (10, 1, "2025-06-01 10:00:00", "2025-06-01 10:59:59"), // 1-hour window
      (11, 1, "2025-06-01 12:00:00", "2025-06-03 00:00:00")  // spans many buckets
    ).map { case (id, u, a, b) => (id, u, ts(a), ts(b)) }
      .toDF("iv_id", "user_id", "start_ts", "end_ts")

    // bucket (15 min) much smaller than the long interval: exercises the
    // explode-to-many-buckets path and the match-exactly-once guarantee
    val got = RangeJoin.intervalJoin(points, intervals, Seq("user_id"),
        "ts", "start_ts", "end_ts", bucketSeconds = 900L)
      .select("user_id", "iv_id", "ts", "value")
    val naive = points.as("p").join(intervals.as("i"),
        $"p.user_id" === $"i.user_id" &&
          $"p.ts" >= $"i.start_ts" && $"p.ts" <= $"i.end_ts")
      .select($"p.user_id", $"iv_id", $"p.ts", $"value")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      s"got:\n${got.collect().mkString("\n")}\nnaive:\n${naive.collect().mkString("\n")}")
    assert(got.count() == 3) // (10:00, 10:59:59) in iv 10; 06-02 09:00 in iv 11
  }

  test("salted join returns exactly the plain join, preserving multiplicity") {
    val skewed = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) "cold" else "hot", i * 1.5))
      .toDF("id", "k", "v")
    val dim = Seq(("hot", 100.0), ("cold", 200.0), ("absent", 0.0)).toDF("k", "w")
    val got = SkewJoin.salted(skewed, dim, Seq("k"), numSalts = 4, saltBy = "id")
      .select("id", "k", "v", "w")
    val plain = skewed.join(dim, Seq("k")).select("id", "k", "v", "w")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    assert(got.count() == 1000)
  }

  test("salted join shuffles on the salt, spreading the hot key") {
    val skewed = (1 to 100).map(i => (i.toLong, "hot", 1.0)).toDF("id", "k", "v")
    val dim = Seq(("hot", 2.0)).toDF("k", "w")
    val plan = SkewJoin.salted(skewed, dim.hint("shuffle_hash"), Seq("k"), 4, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("property: intervalJoin == theta join on seeded random data, any bucket size") {
    // deterministic pseudo-random corpus: timestamps across 3 days,
    // interval spans from zero-length to multi-day, 5 keys
    def rnd(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    val base = java.sql.Timestamp.valueOf("2025-06-01 00:00:00").getTime
    def t(off: Long) = new java.sql.Timestamp(base + math.floorMod(off, 3L * 86400) * 1000)
    val r = rnd(1234)
    val points = (1 to 400).map(i => (math.floorMod(r.next(), 5L), i.toLong, t(r.next())))
      .toDF("k", "pid", "ts")
    val intervals = (1 to 120).map { i =>
      val s = math.floorMod(r.next(), 3L * 86400)
      val span = math.floorMod(r.next(), 100000L) // 0 .. ~28h
      (math.floorMod(r.next(), 5L), i.toLong,
        new java.sql.Timestamp(base + s * 1000),
        new java.sql.Timestamp(base + (s + span) * 1000))
    }.toDF("k", "iid", "start_ts", "end_ts")
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.ts" >= $"i.start_ts" && $"p.ts" <= $"i.end_ts")
      .select($"pid", $"iid")
    for (bucket <- Seq(60L, 3600L, 86400L, 7L * 86400)) {
      val got = RangeJoin.intervalJoin(points, intervals, Seq("k"),
        "ts", "start_ts", "end_ts", bucketSeconds = bucket).select("pid", "iid")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"bucket=$bucket diverged")
    }
  }

  test("property: salted join == plain join for any salt count, with dup keys both sides") {
    def rnd(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    val r = rnd(99)
    val left = (1 to 300).map(i => (i.toLong, s"k${math.floorMod(r.next(), 4L)}"))
      .toDF("id", "k")
    // right side intentionally has duplicate keys: multiplicity must
    // be preserved through the salt replication
    val right = (1 to 20).map(i => (s"k${math.floorMod(r.next(), 6L)}", i * 1.0))
      .toDF("k", "w")
    val plain = left.join(right, Seq("k")).select("id", "k", "w")
    for (salts <- Seq(1, 2, 7, 32)) {
      val got = SkewJoin.salted(left, right, Seq("k"), salts, "id")
        .select("id", "k", "w")
      assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty,
        s"salts=$salts diverged")
    }
  }

  test("s7 staging is per-dataset: interleaved runs over two dirs don't clobber") {
    // run A (sf0.001) → run B (sf0.01) → run A again: with per-dir
    // bucket paths and table names, B's write cannot overwrite A's
    // buckets, so A's re-run matches its own first result exactly
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    val q = Queries5.all("s7_bucketed_join").fn
    val first = q(spark, dirA).collect().toSeq
    val other = q(spark, dirB).collect().toSeq
    val again = q(spark, dirA).collect().toSeq
    assert(first == again, "re-run after interleaved dir diverged")
    assert(first != other, "scale factors unexpectedly identical — test is vacuous")
  }

  test("bucketed tables sort-merge-join with no exchange on either side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_spec").toString
    val left = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "a")
    val right = (1 to 200).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "b")
    Tables.writeBucketed(left, "spec_left_b", Seq("k"), 4, s"$dir/left")
    Tables.writeBucketed(right, "spec_right_b", Seq("k"), 4, s"$dir/right")
    val joined = spark.table("spec_left_b")
      .join(spark.table("spec_right_b").hint("merge"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(joined.count() == 500L * 200 / 50) // 10 left x 4 right per key x 50 keys
  }
}
