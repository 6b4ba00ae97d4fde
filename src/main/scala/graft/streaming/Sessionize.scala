package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` (SURVEY §2.8 streaming extension — the
  * custom-state form the built-in windowed aggregates can't express).
  *
  * A session is a maximal run of one user's events with inter-event
  * gaps below `gapSeconds`; sessions are emitted when the gap closes
  * them (or at end-of-stream via processing-time timeout in a bounded
  * run).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     n_events: Int, sum_value: Double)

  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[SessionState]) =>
          // events arrive batched per group; order within the group is
          // not guaranteed by the runtime, so sort the batch
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapSeconds * 1000 =>
                cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                out += Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Bounded batch-parity helper: the same sessionization as a batch
    * window program (lag + cumulative session ids) — the oracle for
    * the stateful form, and independently useful.
    */
  def sessionizeBatch(spark: SparkSession, events: Dataset[Event],
                      gapSeconds: Long): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    events.toDF()
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev".isNull ||
          (unix_timestamp($"ts") - unix_timestamp($"prev")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("start"), max($"ts").as("end"),
        count(lit(1)).cast("int").as("n_events"),
        sum($"value").as("sum_value"))
      .select($"user_id", $"start", $"end", $"n_events", $"sum_value")
      .as[Session]
  }
}
