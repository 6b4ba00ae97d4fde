package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Percentiles, TimeSeries}

/** Functional specs for the batch-8 operators: gap sessionization,
  * date-spine gap fill, frequency-compressed exact percentiles,
  * sequence packing, span-level duplication profiling.
  */
class Queries8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold and numbers sessions per key") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:10:00")), // 10 min -> same session
      (1L, 12L, ts("2024-01-01 11:00:00")), // 50 min -> new session
      (2L, 20L, ts("2024-01-01 09:00:00"))  // other key: own numbering
    ).toDF("user_id", "event_id", "ts")
    val out = TimeSeries.sessionize(events, $"user_id", $"ts",
        gapSeconds = 1800, ord = Seq($"ts".asc, $"event_id".asc))
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 1L && out(11L) == 1L)
    assert(out(12L) == 2L)
    assert(out(20L) == 1L)
  }

  test("sessionize is tie-stable: equal timestamps never split a session") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:00:00")), // exact tie
      (1L, 3L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val sids = TimeSeries.sessionize(events, $"user_id", $"ts",
        gapSeconds = 1, ord = Seq($"ts".asc, $"event_id".asc))
      .select("session_idx").collect().map(_.getLong(0)).distinct
    assert(sids.sameElements(Array(1L)))
  }

  test("gapFillDaily densifies the per-key span and carries values forward") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-04"), 40.0), // 2 missing days between
      (2L, Date.valueOf("2024-01-02"), 7.0)   // single-day key: no spine growth
    ).toDF("user_id", "obs_day", "v")
    val out = TimeSeries.gapFillDaily(daily, "user_id", "obs_day", "v")
    val rows = out.collect().map(r => (r.getLong(0), r.getDate(1).toString,
      Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).sorted
    assert(rows.length == 5) // 4 days for key 1, 1 day for key 2
    assert(rows.contains((1L, "2024-01-02", Some(10.0), true)))  // carried
    assert(rows.contains((1L, "2024-01-03", Some(10.0), true)))  // carried
    assert(rows.contains((1L, "2024-01-04", Some(40.0), false))) // observed
    assert(rows.contains((2L, "2024-01-02", Some(7.0), false)))
  }

  test("quantilesDisc picks the nearest-rank element, exactly") {
    // group a: values 1..10 once each -> p50 = 5 (rank ceil(0.5*10)=5),
    // p95 -> rank ceil(9.5)=10 -> value 10
    // group b: heavy ties -> 1 x7, 9 x3: p50 rank 5 -> 1; p95 rank 10 -> 9
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      (Seq.fill(7)(1.0) ++ Seq.fill(3)(9.0)).map(("b", _))).toDF("g0", "v0")
    val q = Percentiles.quantilesDisc(df, $"g0", $"v0", Seq(5000, 9500))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(q(("a", 5000)) == 5.0)
    assert(q(("a", 9500)) == 10.0)
    assert(q(("b", 5000)) == 1.0)
    assert(q(("b", 9500)) == 9.0)
  }

  test("quantilesDisc matches a brute-force sorted reference on random-ish data") {
    val df = (0 until 500).map(i => (s"g${i % 3}", (i * 37 % 41).toDouble))
      .toDF("g0", "v0")
    val got = Percentiles.quantilesDisc(df, $"g0", $"v0", Seq(2500, 5000, 9900))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val byG = (0 until 500).map(i => (s"g${i % 3}", (i * 37 % 41).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; bp <- Seq(2500, 5000, 9900)) {
      val rank = (bp.toLong * vs.length + 9999) / 10000 // ceil
      assert(got((g, bp)) == vs(rank.toInt - 1),
        s"group $g p$bp: got ${got((g, bp))}, want ${vs(rank.toInt - 1)}")
    }
  }

  test("packSequential lays out a contiguous stream and window spans") {
    val df = Seq(
      (1L, "en", 1000L), (2L, "en", 1500L), (3L, "en", 600L),
      (4L, "de", 2048L), (5L, "de", 1L)
    ).toDF("doc_id", "lang", "toks")
    val out = Packing.packSequential(df, $"lang", $"toks",
        Seq($"doc_id".asc), ctxLen = 2048L)
      .select("doc_id", "stream_off", "pack_first", "pack_last", "n_windows")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (0L, 0L, 0L, 1L))        // fits window 0
    assert(out(2L) == (1000L, 0L, 1L, 2L))     // crosses 0->1
    assert(out(3L) == (2500L, 1L, 1L, 1L))     // inside window 1
    assert(out(4L) == (0L, 0L, 0L, 1L))        // exactly one window
    assert(out(5L) == (2048L, 1L, 1L, 1L))     // starts window 1
  }

  test("packSequential stream offsets are gap-free per stratum") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 7 + 1))
      .toDF("doc_id", "lang", "toks")
    val rows = Packing.packSequential(df, $"lang", $"toks",
        Seq($"doc_id".asc), ctxLen = 64L)
      .select("lang", "doc_id", "stream_off", "toks")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      sorted.zip(sorted.drop(1)).foreach { case ((_, _, off, t), (_, _, next, _)) =>
        assert(next == off + t, "stream must be contiguous")
      }
      assert(sorted.head._3 == 0L)
    }
  }

  test("spanDupStats flags shared chunks and ignores sub-span tails") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " " + (1 to 8).map(i => s"a$i").mkString(" ")), // 2 spans, 1 dup
      (2L, shared + " tail words only"),                            // 1 span (tail < 8 dropped)
      (3L, (1 to 8).map(i => s"c$i").mkString(" ")),                // unique span
      (4L, "too short")                                             // < 8 words: excluded
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(docs, "text", "doc_id", span = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == (2, 1))
    assert(out(2L) == (1, 1))
    assert(out(3L) == (1, 0))
    assert(!out.contains(4L))
  }
}
