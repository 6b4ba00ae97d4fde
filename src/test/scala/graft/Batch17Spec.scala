package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DataQuality, Funnel, GraphOps, TimeSeries}

/** Batch-17 operators: ordered funnel, HITS, integer z-score anomaly
  * flags — semantics pinned on hand-built toys.
  */
class Batch17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Funnel ----

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "us")

  private val steps = Seq(
    "signup" -> (col("event_type") === "signup"),
    "click" -> (col("event_type") === "click"),
    "purchase" -> (col("event_type") === "purchase"))

  test("funnel: steps must happen strictly in order") {
    // u1 completes all three in order; u2 purchases BEFORE clicking
    // (purchase must not count); u3 never signs up (contributes to no
    // step, not even later ones it performed)
    val events = ev(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "signup", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      (3L, "click", 10L), (3L, "purchase", 20L))
    val out = Funnel.conversion(events, col("user_id"), col("us"), steps)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("signup") == (2L, 1000L, 1000L))
    assert(out("click") == (2L, 1000L, 1000L))   // u1 and u2 both clicked after signup
    assert(out("purchase") == (1L, 500L, 500L))  // only u1 purchased after the click
  }

  test("funnel: step time is the FIRST qualifying occurrence") {
    // u1's first click is before signup — the later one qualifies, and
    // the purchase between them must not count (it precedes the
    // qualifying click)
    val events = ev(
      (1L, "click", 5L), (1L, "signup", 10L), (1L, "purchase", 12L),
      (1L, "click", 15L), (1L, "purchase", 25L))
    val r = Funnel.reachTimes(events, col("user_id"), col("us"), steps)
      .collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 15L && r.getLong(3) == 25L)
  }

  // ---- HITS ----

  test("hits: hubs and authorities separate on a directed star") {
    // a points at both sinks, b at one; x is cited twice, y once.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("src", "dst")
    val out = GraphOps.hits(edges, iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (hubA, hubB) = (out(1L)._1, out(2L)._1)
    val (authX, authY) = (out(10L)._2, out(11L)._2)
    assert(hubA > hubB && authX > authY)
    // pure sinks are no hubs; pure sources are no authorities
    assert(out(10L)._1 == 0.0 && out(1L)._2 == 0.0)
    // each vector is L1-normalized on the 1e-9 grid
    val hubSum = out.values.map(_._1).sum
    val authSum = out.values.map(_._2).sum
    assert(math.abs(hubSum - 1.0) < 1e-6 && math.abs(authSum - 1.0) < 1e-6)
  }

  // ---- anomaly z-score ----

  private def series(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("user_id", "us", "value")

  test("anomaly: spike against a steady baseline is flagged, baseline is not") {
    val flat = (1L to 10L).map(i => (1L, i, 100.0 + (i % 2))) // 100/101 alternating
    val out = TimeSeries.anomalyZscore(
      series(flat :+ ((1L, 11L, 500.0)): _*),
      col("user_id"), col("value"), Seq(col("us")), win = 10, k = 2)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out(11L))                       // the spike
    assert((1L to 10L).forall(i => !out(i))) // the baseline (incl. cold start)
  }

  test("anomaly: cold start below minN is never flagged") {
    val out = TimeSeries.anomalyZscore(
      series((1L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1000.0)),
      col("user_id"), col("value"), Seq(col("us")), win = 10, k = 2, minN = 3)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out.values.forall(!_)) // only 2 trailing rows at the spike
  }

  test("anomaly: zero-variance baseline flags any deviation") {
    val flat = (1L to 6L).map(i => (1L, i, 50.0))
    val out = TimeSeries.anomalyZscore(
      series(flat :+ ((1L, 7L, 50.001)): _*),
      col("user_id"), col("value"), Seq(col("us")), win = 10, k = 2)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out(7L)) // (x·n−s)² > 0 = k²·0 — any milli deviation trips
    assert((1L to 6L).forall(i => !out(i)))
  }

  // ---- data-quality expectations ----

  test("dq: violations fail their check, clean checks pass, nulls are violations") {
    import DataQuality._
    val df = Seq(
      (Some(1L), Some("a"), 10.0),
      (Some(1L), Some("b"), -5.0),   // dup id + negative value
      (None, Some("c"), 20.0),       // null id
      (Some(2L), None, 30.0)         // null name
    ).toDF("id", "name", "v")
    val out = report(df, Seq(
      Check("rows", count(lit(1)), 1L, _ >= 1L),
      Check("id_complete", nullCount(col("id")), 0L, _ === 0L),
      Check("name_complete", nullCount(col("name")), 0L, _ === 0L),
      Check("id_unique", dupCount(col("id")), 0L, _ === 0L),
      Check("v_positive", violations(col("v") > 0.0), 0L, _ === 0L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out("rows") == (4L, true))
    assert(out("id_complete") == (1L, false))
    assert(out("name_complete") == (1L, false))
    // 4 rows; the struct wrap makes the null id its OWN distinct
    // bucket (struct(null) is non-null) → {1},{2},{null} = 3 distinct
    // ⇒ dups = 1. Null-key presence is id_complete's job, not this
    // check's — matching SQL's (a,b) row-value distinct semantics.
    assert(out("id_unique") == (1L, false))
    assert(out("v_positive") == (1L, false))
  }
}
