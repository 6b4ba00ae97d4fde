package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, DailyRollup, Upsert}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- Upsert / MERGE layer -------------------------------------

  test("S3 dedupByKey keeps newest by the order chain") {
    val df = Seq((1, 1, "a"), (1, 3, "b"), (1, 2, "c"), (2, 1, "d"))
      .toDF("k", "v", "p")
    val out = Upsert.dedupByKey(df, Seq("k"), Seq(col("v")))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(2)))
    assert(out.toSeq == Seq((1, "b"), (2, "d")))
  }

  test("S3 merge: incoming wins, null incoming keeps existing") {
    val existing = Seq((1, "old", Some(10.0)), (2, "keep", Some(20.0))).toDF("k", "name", "bal")
    val incoming = Seq((1, "new", None: Option[Double]), (3, "ins", Some(30.0))).toDF("k", "name", "bal")
    val out = Upsert.merge(existing, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1), r.get(2)))
    assert(out.toSeq == Seq((1, "new", 10.0), (2, "keep", 20.0), (3, "ins", 30.0)))
  }

  test("S3 merge last-write-wins mode overwrites with null") {
    val existing = Seq((1, Some(10.0))).toDF("k", "bal")
    val incoming = Seq((1, None: Option[Double])).toDF("k", "bal")
    val out = Upsert.merge(existing, incoming, Seq("k"), keepExistingNonNull = false)
      .collect()(0)
    assert(out.get(1) == null)
  }

  test("S3 merge is idempotent") {
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val incoming = Seq((2, "B"), (3, "c")).toDF("k", "v")
    val once = Upsert.merge(existing, incoming, Seq("k"))
    val twice = Upsert.merge(once, incoming, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("S6 duplicateKeys + orphans") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    assert(Upsert.duplicateKeys(df, Seq("k")).collect().map(_.getInt(0)).toSeq == Seq(1))
    val child = Seq((1, 10), (9, 20)).toDF("fk", "payload")
    val parent = Seq(1, 2).toDF("id")
    val orph = Upsert.orphans(child, parent, Seq(("fk", "id"))).collect()
    assert(orph.map(_.getInt(0)).toSeq == Seq(9))
  }

  // --- Daily roll-ups -------------------------------------------

  private val hourly = Seq(
    // (station, ts, metric value stats)  two days, one station
    ("s1", ts("2025-06-01 01:00:00"), Some(10.0), Some(1.0), Some(20.0), Some(10.0), Some(2.0), Some("C")),
    ("s1", ts("2025-06-01 02:00:00"), Some(20.0), Some(0.5), Some(30.0), Some(14.0), Some(3.0), Some("C")),
    ("s1", ts("2025-06-02 01:00:00"), None, None, None, None, Some(0.0), None)
  ).toDF("station", "data_at", "data", "min", "max", "avg", "sum", "unit")

  test("A1 weather flavor: mean of values, min/max/avg/sum, first unit") {
    val out = DailyRollup.weather(hourly, $"data_at", Seq($"station"),
      $"data", $"min", $"max", $"avg", $"sum", $"unit")
      .orderBy("date").collect()
    val d1 = out(0)
    assert(d1.getAs[Double]("data") == 15.0)
    assert(d1.getAs[Double]("min") == 0.5)
    assert(d1.getAs[Double]("max") == 30.0)
    assert(d1.getAs[Double]("avg") == 12.0)
    assert(d1.getAs[Double]("sum") == 5.0)
    assert(d1.getAs[String]("unit") == "C")
  }

  test("A2 sentinel flavor: sum of exactly 0.0 collapses to null (quirk §1.6.3)") {
    val out = DailyRollup.sentinel(hourly, $"data_at", Seq($"station"),
      $"min", $"max", $"avg", $"sum", $"unit")
      .orderBy("date").collect()
    assert(out(0).getAs[Double]("sum") == 5.0)
    assert(out(1).get(out(1).fieldIndex("sum")) == null) // 0.0 → null
    val kept = DailyRollup.sentinel(hourly, $"data_at", Seq($"station"),
      $"min", $"max", $"avg", $"sum", $"unit", zeroSumToNull = false)
      .orderBy("date").collect()
    assert(kept(1).getAs[Double]("sum") == 0.0) // normalized semantics
  }

  test("A3 fallback fills only the missing groups") {
    val daily = Seq(("s1", "2025-06-01", 100.0)).toDF("station", "date", "v")
    val hourlyRolled = Seq(("s1", "2025-06-01", 1.0), ("s1", "2025-06-02", 2.0))
      .toDF("station", "date", "v")
    val out = DailyRollup.withFallback(daily, hourlyRolled, Seq("station", "date"))
      .orderBy("date").collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("2025-06-01", 100.0), ("2025-06-02", 2.0)))
  }

  // --- As-of join ------------------------------------------------

  private val acts = Seq(
    (1, ts("2025-06-01 10:00:00"), "act-a"),
    (1, ts("2025-06-01 23:00:00"), "act-b"),
    (2, ts("2025-06-01 10:00:00"), "act-c")
  ).toDF("grp", "a_ts", "act")

  private val evs = Seq(
    (1, ts("2025-06-01 09:00:00"), 101),
    (1, ts("2025-06-01 12:00:00"), 102),
    (3, ts("2025-06-01 10:00:00"), 301)
  ).toDF("grp", "e_ts", "eid")

  test("J5 nearest: abs-min with tiebreak, unmatched left kept as null") {
    val out = AsOfJoin.nearest(acts, evs, Seq("grp"), "a_ts", "e_ts",
      tiebreak = Seq("eid"))
      .orderBy("act").collect().map(r => (r.getAs[String]("act"), r.get(r.fieldIndex("eid"))))
    assert(out.toSeq == Seq(("act-a", 101), ("act-b", 102), ("act-c", null)))
  }

  test("J5 backward/forward directions and tolerance") {
    val back = AsOfJoin.nearest(acts, evs, Seq("grp"), "a_ts", "e_ts",
      direction = "backward", tiebreak = Seq("eid"))
      .orderBy("act").collect().map(r => (r.getAs[String]("act"), r.get(r.fieldIndex("eid"))))
    assert(back.toSeq == Seq(("act-a", 101), ("act-b", 102), ("act-c", null)))
    val fwd = AsOfJoin.nearest(acts, evs, Seq("grp"), "a_ts", "e_ts",
      direction = "forward", tiebreak = Seq("eid"))
      .orderBy("act").collect().map(r => (r.getAs[String]("act"), r.get(r.fieldIndex("eid"))))
    assert(fwd.toSeq == Seq(("act-a", 102), ("act-b", null), ("act-c", null)))
    val tol = AsOfJoin.nearest(acts, evs, Seq("grp"), "a_ts", "e_ts",
      tolerance = Some(3600), tiebreak = Seq("eid"))
      .orderBy("act").collect().map(r => (r.getAs[String]("act"), r.get(r.fieldIndex("eid"))))
    assert(tol.toSeq == Seq(("act-a", 101), ("act-b", null), ("act-c", null)))
  }

  test("J5 tiebreak picks the lower idx on equal distance") {
    val l = Seq((1, ts("2025-06-01 10:00:00"), "x")).toDF("grp", "a_ts", "act")
    val r = Seq((1, ts("2025-06-01 09:00:00"), 2), (1, ts("2025-06-01 11:00:00"), 1))
      .toDF("grp", "e_ts", "eid")
    val out = AsOfJoin.nearest(l, r, Seq("grp"), "a_ts", "e_ts", tiebreak = Seq("eid"))
      .collect()(0)
    assert(out.getAs[Int]("eid") == 1)
  }

  test("BadRecords splits parse failures to the side channel, keeps legit nulls") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1, "42", "1.5"),      // both parse
      (2, "oops", "2.5"),    // first fails
      (3, null, "bad"),      // null raw is NOT a failure; second fails
      (4, null, "3.5")       // null raw only -> good
    ).toDF("id", "a_raw", "b_raw")
    val (good, bad) = graft.operators.BadRecords.partition(df, Map(
      "a" -> ("a_raw", col("a_raw").cast("double")),
      "b" -> ("b_raw", col("b_raw").cast("double"))))
    assert(good.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 4))
    val badRows = bad.select("id", "__failed").collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(badRows == Map(2 -> List("a"), 3 -> List("b")))
    // nothing vanishes: the two branches partition the input
    assert(good.count() + bad.count() == df.count())
  }
}
