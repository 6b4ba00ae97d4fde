package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Funnel, TimeSeries, Upsert}

/** Batch-21 operators: windowed funnel, schema-evolving MERGE, exact
  * trend slope, volume anomaly — semantics pinned on hand-built toys.
  */
class Batch21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "us")

  private val steps = Seq(
    "signup" -> (col("event_type") === "signup"),
    "click" -> (col("event_type") === "click"),
    "purchase" -> (col("event_type") === "purchase"))

  test("windowed funnel: late steps fall outside the entry window") {
    // u1 converts fully inside the window; u2 clicks in-window but
    // purchases after it; u3's click itself is already too late
    val events = ev(
      (1L, "signup", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "signup", 0L), (2L, "click", 10L), (2L, "purchase", 200L),
      (3L, "signup", 0L), (3L, "click", 150L), (3L, "purchase", 160L))
    val out = Funnel.conversion(events, col("user_id"), col("us"), steps,
        windowUs = Some(100L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("signup" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("windowed funnel: the window anchors at ENTRY, not the previous step") {
    // click at 90 (in-window), purchase at 180: within 100 of the
    // click but NOT of the signup — must not count
    val events = ev(
      (1L, "signup", 0L), (1L, "click", 90L), (1L, "purchase", 180L))
    val out = Funnel.conversion(events, col("user_id"), col("us"), steps,
        windowUs = Some(100L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("purchase") == 0L)
  }

  test("merge widens the schema: unseen columns surface NULL on old rows") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val delta = Seq((2L, "b2", "x")).toDF("k", "v", "extra")
    val out = Upsert.merge(base, delta, Seq("k"), keepExistingNonNull = false)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)))).toMap
    assert(out(1L) == ("a", None), "old row keeps NULL in the new column")
    assert(out(2L) == ("b2", Some("x")), "delta row carries its value")
  }

  test("trend slope: an exact linear series yields num = 2 * den") {
    // y = 2x + 5 over x = 0..4 per key: slope must be exactly 2
    val df = (0 to 4).map(x => ("a", x.toLong, (2 * x + 5).toLong))
      .toDF("k", "x", "y")
    val m = df.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select((col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .collect()(0)
    assert(m.getLong(0) == 2 * m.getLong(1) && m.getLong(1) > 0)
  }

  test("volume anomaly: a collapsed day flags against its trailing week") {
    // steady 100/day, then a day at 10 — the drop must flag; the
    // steady days must not
    val daily = ((1 to 8).map(d => ("t", d, 100L)) :+ (("t", 9, 10L)))
      .toDF("k", "day", "n")
    val out = TimeSeries.anomalyZscore(daily, col("k"), col("n"),
        Seq(col("day")), win = 7, k = 2, minN = 5)
      .collect().map(r => r.getAs[Int]("day") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(out(9), "the collapse must flag")
    assert((1 to 8).forall(d => !out(d)), "steady days must not flag")
  }
}
