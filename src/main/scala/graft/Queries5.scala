package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{RangeJoin, SkewJoin}
import Queries.Q

/** Batch 5: scale-path join strategies — the three shuffle shapes a
  * 100 TB deployment lives or dies by, each verified against the same
  * DuckDB oracle as the plain form it replaces:
  *
  *  - interval containment without a cartesian product (J9 — the
  *    set-wise form of the reference's per-event window fetch,
  *    /root/reference/app/graph_irrigation_event.py:119-152);
  *  - salted joins for dominant keys (J10);
  *  - bucketed co-located joins that eliminate the shuffle entirely
  *    (S7).
  */
object Queries5 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def decSum(c: Column, scale: Int = 8): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  private def decAvg(c: Column, scale: Int = 8): Column =
    (sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c)).cast("double")

  /** J9 — interval join via bucket-explode equi-join: every error
    * event opens a 30-minute window; enrich it with the count/sum of
    * the same user's other events inside the window. The oracle states
    * the range predicate directly; the engine's plan is a hash join on
    * (user_id, bucket), never a nested loop.
    */
  val j9_interval_join = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
      val pts = ev.filter(col("event_type") =!= "error")
        .select("user_id", "ts", "value")
      RangeJoin.intervalJoin(pts, err, Seq("user_id"),
          "ts", "start_ts", "end_ts", bucketSeconds = 1800L)
        .groupBy("user_id", "err_id")
        .agg(count(lit(1)).as("n_in_window"),
          decSum(col("value")).as("sum_value"))
        .orderBy("user_id", "err_id")
    },
    Some("""SELECT e.user_id, err.err_id, COUNT(*) AS n_in_window,
        CAST(SUM(CAST(e.value AS DECIMAL(27,8))) AS DOUBLE) AS sum_value
      FROM events e
      JOIN (SELECT event_id AS err_id, user_id, ts AS start_ts,
                   ts + INTERVAL 30 MINUTE AS end_ts
            FROM events WHERE event_type = 'error') err
        ON e.user_id = err.user_id
       AND e.ts BETWEEN err.start_ts AND err.end_ts
      WHERE e.event_type <> 'error'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J10 — salted join on the most skewed key in the dataset
    * (event_type: 5 values over the whole events table). Classic
    * above-average enrichment: join each event to its type's mean,
    * keep the ones above it. Results provably identical to the
    * unsalted join — that is exactly what the oracle checks.
    */
  val j10_salted_skew = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val dim = ev.groupBy("event_type")
        .agg(decAvg(col("value")).as("avg_v"))
      // shuffle_hash hint: keep it a shuffle join so the salt actually
      // spreads the hot keys (a broadcast would hide the skew locally
      // but is not available once the dim side no longer fits)
      SkewJoin.salted(ev, dim.hint("shuffle_hash"), Seq("event_type"),
          numSalts = 8, saltBy = "event_id")
        .filter(col("value") > col("avg_v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_above"))
        .orderBy("event_type")
    },
    Some("""WITH d AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS avg_v
        FROM events GROUP BY 1)
      SELECT e.event_type, COUNT(*) AS n_above
      FROM events e JOIN d USING (event_type)
      WHERE e.value > d.avg_v
      GROUP BY 1 ORDER BY 1"""))

  /** S7 — bucketed co-located join: cluster both tables by the join
    * key once, then sort-merge-join them with no exchange on either
    * side (PlanSpec asserts the shuffle-free plan). The write cost is
    * paid here too, deliberately: bucketing is a pay-once-save-per-
    * consumer trade. Excluded from BENCH (it measures a sink write,
    * not a query plan).
    */
  val s7_bucketed_join = Q(
    (s, dir) => {
      // per-dataset staging path + catalog names (graft.sources.Staging):
      // interleaved runs against different scale dirs keep distinct
      // bucket dirs AND distinct saved-table entries, so neither run
      // reads the other's buckets
      val base = graft.sources.Staging.path(dir, "bucketed")
      val liName = graft.sources.Staging.tableName("graft_li_b", dir)
      val ordName = graft.sources.Staging.tableName("graft_ord_b", dir)
      Tables.writeBucketed(
        T_(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        liName, Seq("l_orderkey"), 8, s"$base/li")
      Tables.writeBucketed(
        T_(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderdate")),
        ordName, Seq("l_orderkey"), 8, s"$base/ord")
      s.table(liName)
        .join(s.table(ordName).hint("merge"), "l_orderkey")
        .groupBy(year(col("o_orderdate")).as("yr"))
        // BIGINT micro-units, not a decSum double: the per-year sum's
        // scaled units pass 2^53 at ~10x this bench scale, where the
        // decimal->double cast splits 1 ulp between engines (round-8
        // amplified sweep, same class as a_winsorize)
        .agg(sum((col("l_extendedprice").cast("decimal(27,6)") * 1000000)
            .cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("long").as("rev_micro"))
        .orderBy("yr")
    },
    Some("""SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
        CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(27,6)) * 1000000
          AS DECIMAL(38,0))) AS BIGINT) AS rev_micro
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1"""),
    bench = false)

  /** S8 — bad-record side channel (SURVEY §4.1 error containment):
    * total parses + a set-wise good/bad split replace the reference's
    * per-row try/except-and-log. The query reports both branches —
    * good rows aggregate, bad rows are counted, nothing silently
    * vanishes.
    */
  val s8_bad_records = Q(
    (s, dir) => {
      val raw = when(col("p_partkey") % 4 === 0, lit("N/A"))
        .when(col("p_partkey") % 4 === 1,
          concat(lit(">= "), col("p_size").cast("string")))
        .when(col("p_partkey") % 4 === 2,
          concat(col("p_size").cast("string"), lit(",25")))
        .otherwise(col("p_size").cast("string"))
      val parts = T_(s, dir, "part").select(col("p_partkey"), raw.as("raw"))
      val (good, bad) = graft.operators.BadRecords.partition(parts,
        Map("size_val" -> ("raw", graft.functions.Functions.toFloatOrNull(col("raw")))))
      good.agg(count(lit(1)).as("n"), decSum(col("size_val")).as("sum_val"))
        .select(lit("good").as("status"), col("n"), col("sum_val"))
        .unionByName(
          bad.agg(count(lit(1)).as("n")).select(lit("bad").as("status"),
            col("n"), lit(null).cast("double").as("sum_val")))
        .orderBy("status")
    },
    Some("""WITH t AS (SELECT p_partkey,
        CASE WHEN p_partkey % 4 = 0 THEN 'N/A'
             WHEN p_partkey % 4 = 1 THEN '>= ' || CAST(p_size AS VARCHAR)
             WHEN p_partkey % 4 = 2 THEN CAST(p_size AS VARCHAR) || ',25'
             ELSE CAST(p_size AS VARCHAR) END AS raw
      FROM part),
      p AS (SELECT raw,
        coalesce(TRY_CAST(raw AS DOUBLE),
                 TRY_CAST(trim(regexp_replace(raw, '^\s*[<>=]+\s*', '')) AS DOUBLE)) AS size_val
      FROM t)
      SELECT 'good' AS status, COUNT(*) AS n,
             CAST(SUM(CAST(size_val AS DECIMAL(27,8))) AS DOUBLE) AS sum_val
      FROM p WHERE NOT (size_val IS NULL AND raw IS NOT NULL)
      UNION ALL
      SELECT 'bad', COUNT(*), CAST(NULL AS DOUBLE)
      FROM p WHERE size_val IS NULL AND raw IS NOT NULL
      ORDER BY status"""))

  /** Multimodal frame sampling: 1→N generation per payload inside the
    * partition iterator (the video-clip shape). The oracle replays the
    * stub codec's frame count/offsets over the same bytes in SQL —
    * genuinely byte-based (hex-pair extraction from the UTF-8 blob),
    * so it agrees with the engine's `payload(off) & 0xff` on
    * non-ASCII documents too, where a code-point oracle would
    * diverge.
    */
  val mm_frame_sample = Q(
    (s, dir) => {
      val media = T_(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
      graft.operators.Multimodal.sampleFrames(media)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH b AS (SELECT doc_id AS media_id,
          octet_length(encode(text)) AS n,
          lower(hex(encode(text))) AS h
        FROM documents),
      f AS (SELECT media_id, n, h, UNNEST(range(n % 16)) AS frame_idx
        FROM b WHERE n % 16 > 0),
      g AS (SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
          CAST(frame_idx * (n // (n % 16)) AS INTEGER) AS "offset", h FROM f)
      SELECT media_id, frame_idx, "offset",
        CAST((strpos('0123456789abcdef', substr(h, 2 * "offset" + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 2 * "offset" + 2, 1)) - 1)
           AS INTEGER) AS fingerprint
      FROM g ORDER BY media_id, frame_idx"""))

  /** Streaming stream-stream window join (incremental J9): purchases
    * within 30 minutes after a click by the same user, as both sides
    * arrive continuously. Watermarks on both sides + the bounded time
    * range let Spark expire join state — runnable forever at ingest
    * scale. The oracle is the equivalent batch interval join.
    */
  val stream_join = Q(
    (s, dir) => graft.streaming.StreamingJoin.eventWindowJoinOnce(
        s, s"$dir/events.parquet", "click", "purchase",
        windowSeconds = 1800, queryName = "stream_join_q")
      .orderBy("user_id", "click_id", "purchase_id"),
    Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      FROM events c JOIN events p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      ORDER BY 1, 2, 3"""),
    bench = false)

  /** Stateful streaming sessionization (flatMapGroupsWithState) over
    * the bounded events table. Gap and output timestamps live in the
    * MILLISECOND domain (java.sql.Timestamp.getTime truncates the
    * micros the parquet carries), so the oracle works on epoch_ms and
    * re-truncates session bounds; `value` is integer-scaled by the
    * runner so both accumulation orders are exact (see
    * [[graft.streaming.Sessionize.sessionizeParquetOnce]]).
    */
  val stream_sessionize = Q(
    (s, dir) => graft.streaming.Sessionize.sessionizeParquetOnce(
        s, s"$dir/events.parquet", gapSeconds = 3600,
        queryName = "stream_sessionize_q")
      .orderBy("user_id", "start"),
    Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
          floor(value * 1000) AS v FROM events),
      -- ORDER BY (tms, event_id), not tms alone: with tied
      -- timestamps (normal in real feeds; the 10x fixture has them)
      -- the lag window and the running-sum window may order ties
      -- DIFFERENTLY, splitting a tied group across two sessions.
      -- Any consistent total order yields the correct sessions (ties
      -- chain at gap 0); the stream side is tie-order-invariant.
      l AS (SELECT user_id, event_id, tms, v,
          lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id)
            AS prev FROM e),
      s AS (SELECT user_id, event_id, tms, v,
          CASE WHEN prev IS NULL OR tms - prev > 3600000 THEN 1 ELSE 0 END AS ns
        FROM l),
      g AS (SELECT user_id, tms, v,
          sum(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
            ROWS UNBOUNDED PRECEDING) AS sid FROM s)
      SELECT user_id, make_timestamp(min(tms) * 1000) AS start,
        make_timestamp(max(tms) * 1000) AS "end",
        CAST(count(*) AS INTEGER) AS n_events,
        CAST(sum(v) AS DOUBLE) AS sum_value
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, start"""),
    bench = false)

  /** Streaming MERGE upsert maintaining a keyed parquet table (the
    * reference's idempotent Cypher MERGE run continuously); final
    * table = per-(user, type) argmax by (ts, event_id).
    */
  val stream_upsert = Q(
    (s, dir) => graft.streaming.StreamingUpsert.upsertParquetOnce(
        s, s"$dir/events.parquet",
        keys = Seq("user_id", "event_type"), orderBy = Seq("ts", "event_id"))
      .select("user_id", "event_type", "event_id", "ts", "value")
      .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, event_id, ts, value FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) = 1
      ORDER BY user_id, event_type"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "j9_interval_join" -> j9_interval_join,
    "j10_salted_skew" -> j10_salted_skew,
    "s7_bucketed_join" -> s7_bucketed_join,
    "s8_bad_records" -> s8_bad_records,
    "mm_frame_sample" -> mm_frame_sample,
    "stream_join" -> stream_join,
    "stream_sessionize" -> stream_sessionize,
    "stream_upsert" -> stream_upsert,
  )
}
