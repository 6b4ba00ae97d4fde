package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}
import graft.operators.GraphOps

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    Event(1, ts("2024-01-01 10:00:00"), 1.0),
    Event(1, ts("2024-01-01 10:10:00"), 2.0),   // same session (gap 10m < 30m)
    Event(1, ts("2024-01-01 12:00:00"), 3.0),   // new session
    Event(2, ts("2024-01-01 09:00:00"), 5.0))

  test("stateful streaming sessionization emits gap-closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    input.addData(evs: _*)
    q.processAllAvailable()
    // close all open sessions with far-future sentinels
    input.addData(Event(1, ts("2024-06-01 00:00:00"), 0.0),
      Event(2, ts("2024-06-01 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_out").as[Session].collect()
      .filter(_.start.before(ts("2024-06-01 00:00:00"))).sortBy(s => (s.user_id, s.start.getTime))
    assert(got.length == 3)
    assert(got(0) == Session(1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2, 3.0))
    assert(got(1) == Session(1, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1, 3.0))
    assert(got(2) == Session(2, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1, 5.0))
  }

  test("batch sessionization agrees with the stateful form") {
    import spark.implicits._
    val batch = Sessionize.sessionizeBatch(spark, evs.toDS(), 1800)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    assert(batch.length == 3)
    assert(batch(0).n_events == 2 && batch(0).sum_value == 3.0)
  }

  test("GraphX PageRank agrees ordinally with the deterministic DataFrame form") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L), (5L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val df = GraphOps.pageRank(edges, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gx = GraphOps.pageRankGraphX(edges, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df.keySet == gx.keySet)
    // same recurrence → values agree to float-ordering noise
    df.foreach { case (id, r) => assert(math.abs(r - gx(id)) < 1e-6, s"node $id: $r vs ${gx(id)}") }
  }
}
