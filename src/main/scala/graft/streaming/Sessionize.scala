package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Run gap sessionization over a bounded parquet events table and
    * return the closed sessions — the verify-against-batch runner
    * (same pattern as [[StreamingRollup.dailyRollupOnce]]).
    *
    * Two replayability measures:
    *  - `value` is scaled to an integer (`floor(value * 1000)`) before
    *    streaming, so the stateful form's sequential double
    *    accumulation and the oracle's unordered SUM are both exact and
    *    agree bit-for-bit;
    *  - a far-future sentinel event per user flushes every open
    *    session at end-of-stream (NoTimeout state never otherwise
    *    emits them); sentinel-started sessions are filtered out.
    * The normalized input + sentinels are staged as ONE parquet file
    * so the bounded stream is a single batch — a sentinel-first batch
    * would absorb all earlier events into the sentinel's session. The
    * single-file stage (and the driver-memory sink) size this runner
    * for verify-scale inputs only; the production path is [[sessionize]]
    * on a real stream. The staging directory and the memory sink's
    * catalog entry are both released before returning — the returned
    * frame is already analyzed against the sink relation, so dropping
    * the name binding does not invalidate it.
    */
  def sessionizeParquetOnce(spark: SparkSession, eventsPath: String,
                            gapSeconds: Long,
                            queryName: String = "stream_sessionize"): DataFrame = {
    import spark.implicits._
    val base0 = spark.read.parquet(eventsPath)
    val base =
      if (base0.schema.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
        base0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else base0
    val sentinelTs = lit("2099-01-01 00:00:00").cast("timestamp")
    val ev = base.select(col("user_id"), col("ts"),
      floor(col("value") * 1000).cast("double").as("value"))
    val sentinels = base.select(col("user_id")).distinct()
      .select(col("user_id"), sentinelTs.as("ts"), lit(0.0).as("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sessionize")
    try {
      ev.unionByName(sentinels).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val stream = spark.readStream
        .schema(spark.read.parquet(tmp.toString).schema)
        .parquet(tmp.toString).as[Event]
      val q = sessionize(stream, gapSeconds).writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
      // spark.table analyzes eagerly (Dataset.ofRows), so the sink
      // relation is bound into the plan here — the name can go
      spark.table(queryName).filter(col("start") < sentinelTs)
    } finally {
      spark.catalog.dropTempView(queryName)
      deleteRecursively(tmp.toFile)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
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
