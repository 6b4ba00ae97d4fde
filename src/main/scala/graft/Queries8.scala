package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Packing, Percentiles, TimeSeries}
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 8: OLAP breadth + the loader-facing curation stages.
  * Batch gap-sessionization and date-spine gap fill (the dense-axis
  * assumption the reference's daily pipelines make, made explicit —
  * main_graph_topraq.py:79-80), hierarchical ROLLUP totals, exact
  * distributed percentiles via value-frequency compression, sequence
  * packing into training context windows, and sub-document span-level
  * duplication profiling. Every query replays bit-for-bit in the
  * DuckDB oracle (integer rank/offset arithmetic, decimal-cast sums).
  */
object Queries8 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(27,8)")).cast("double")
  private def sqlDecSum(expr: String) =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,8))) AS DOUBLE)"

  /** Batch gap-sessionization (30-min gap) of the events feed, with
    * per-session aggregates — the batch twin of `stream_sessionize`
    * (same boundary rule, micros precision instead of the streaming
    * path's milliseconds). One shuffle on user_id: the lag, the
    * running boundary sum, and the map-side-combined session aggregate
    * all live in the same per-user partition.
    */
  val w_sessionize = Q(
    (s, dir) => TimeSeries.sessionize(T_(s, dir, "events"),
        col("user_id"), col("ts"), gapSeconds = 1800,
        ord = Seq(col("ts").asc, col("event_id").asc))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        decSum(col("value")).as("sum_value")),
    Some("""WITH l AS (SELECT user_id, event_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
      b AS (SELECT user_id, event_id, ts, value,
        CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
             THEN 1 ELSE 0 END AS nb FROM l),
      g AS (SELECT user_id, ts, value,
        CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b)
      SELECT user_id, session_idx, min(ts) AS session_start,
        max(ts) AS session_end, CAST(count(*) AS INTEGER) AS n_events,
        """ + sqlDecSum("value") + """ AS sum_value
      FROM g GROUP BY user_id, session_idx"""))

  /** Date-spine gap fill with forward carry: densify each user's daily
    * value series between its first and last active day, carrying the
    * last observed daily total across the 460 missing user-days the
    * events table actually has. The explicit form of the dense-day
    * assumption in the reference's daily roll-ups. Spine explode is
    * bounded per user; fill is one `last(ignoreNulls)` window — a
    * single shuffle on user_id after the daily aggregate.
    */
  val ts_gapfill = Q(
    (s, dir) => {
      val daily = T_(s, dir, "events")
        .groupBy(col("user_id"), col("ts").cast("date").as("obs_day"))
        .agg(decSum(col("value")).as("v"))
      TimeSeries.gapFillDaily(daily, "user_id", "obs_day", "v")
        .select(col("user_id"), col("obs_day"), col("value_filled"), col("is_gap"))
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS obs_day,
        """ + sqlDecSum("value") + """ AS v
      FROM events GROUP BY 1, 2),
      sp AS (SELECT user_id,
          unnest(generate_series(min(obs_day), max(obs_day), INTERVAL 1 DAY))::DATE AS obs_day
        FROM daily GROUP BY user_id),
      j AS (SELECT sp.user_id, sp.obs_day, d.v
        FROM sp LEFT JOIN daily d
          ON d.user_id = sp.user_id AND d.obs_day = sp.obs_day)
      SELECT user_id, obs_day,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY obs_day
          ROWS UNBOUNDED PRECEDING) AS value_filled,
        v IS NULL AS is_gap
      FROM j"""))

  /** Hierarchical totals: revenue and order counts by region, by
    * region+nation, and the grand total in ONE pass (ROLLUP expand +
    * a single map-side-combining hash aggregate — not three scans).
    * `lvl` is the grouping bitmask (0 = leaf, 1 = nation rolled up,
    * 3 = grand total), identical in both engines. Dims broadcast;
    * the only shuffle is orders x customer on the join key and the
    * post-expand aggregate.
    *
    * Revenue ships as BIGINT cents, not double and not DECIMAL:
    * these are the LARGEST sums in the catalog (region/grand
    * totals), and at sf0.1 the scaled value exceeds 2^53 — a final
    * decimal→double cast is where engines diverge (1-ulp
    * double-rounding on int128→double, observed on two region rows
    * at sf0.1), while a wide DECIMAL output doesn't hash portably.
    * Per-row money → exact cents (lossless for 2-dp), 64-bit sums;
    * fits BIGINT through sf1000 (grand total ~2.3e16 cents).
    */
  val a_rollup_totals = Q(
    (s, dir) => T_(s, dir, "orders")
      .join(T_(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T_(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T_(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)"))
          .as("revenue_cents")),
    Some("""SELECT r.r_name, n.n_name,
        CAST(GROUPING(r.r_name, n.n_name) AS INTEGER) AS lvl,
        count(*) AS n_orders,
        CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP(r.r_name, n.n_name)"""))

  /** Exact p25/p50/p95 of line quantity per return flag — computed
    * from the (group, value, count) frequency table, so the only pass
    * over the fact table is a hash aggregate and no full-group sort
    * exists in the plan (the group would be the single-reducer
    * bottleneck at 100 TB; the frequency table is |groups| x
    * |distinct values| rows). Nearest-rank semantics with exact
    * integer rank arithmetic.
    */
  val a_quantile_disc = Q(
    (s, dir) => Percentiles.quantilesDisc(T_(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), Seq(2500, 5000, 9500))
      .select(col("g").as("l_returnflag"), col("pct_bp"), col("value")),
    Some("""WITH f AS (SELECT l_returnflag AS g, l_quantity AS v, count(*) AS c
        FROM lineitem GROUP BY 1, 2),
      cum AS (SELECT g, v,
          sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
          sum(c) OVER (PARTITION BY g) AS tot FROM f),
      p AS (SELECT unnest([2500, 5000, 9500]) AS pct_bp)
      SELECT g AS l_returnflag, pct_bp, min(v) AS value
      FROM cum, p WHERE cum >= (pct_bp * tot + 9999) // 10000
      GROUP BY 1, 2"""))

  /** Sequence packing: lay each language's documents end-to-end (in
    * stable doc_id order) and chunk the stream into 2048-token
    * context windows — the manifest (stream offset + window span per
    * document) a pretraining loader consumes. Pure prefix-sum shape;
    * for one huge stratum the distributed prefix sum of
    * `samp_token_budget_large` applies unchanged.
    */
  val pack_sequence = Q(
    (s, dir) => Packing.packSequential(
        T_(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            T.wsTokenCount(col("text")).as("toks"))
          .filter(col("toks") > 0),
        col("lang"), col("toks"),
        ord = Seq(col("doc_id").asc), ctxLen = 2048L)
      .select(col("doc_id"), col("lang"), col("stream_off"),
        col("pack_first"), col("pack_last"), col("n_windows")),
    Some("""WITH t AS (SELECT doc_id, lang,
        CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
             ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
      FROM documents),
      f AS (SELECT doc_id, lang, CAST(toks AS BIGINT) AS toks FROM t WHERE toks > 0),
      c AS (SELECT doc_id, lang, toks,
        CAST(coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS stream_off
      FROM f)
      SELECT doc_id, lang, stream_off,
        CAST(stream_off // 2048 AS BIGINT) AS pack_first,
        CAST((stream_off + toks - 1) // 2048 AS BIGINT) AS pack_last,
        CAST((stream_off + toks - 1) // 2048 - stream_off // 2048 + 1 AS BIGINT) AS n_windows
      FROM c"""))

  /** Span-level duplication profile (8-word chunks): per document, the
    * fraction of its chunks appearing verbatim in other documents —
    * the sub-document boilerplate signal document-level dedup cannot
    * see. Chunking (not sliding shingles) bounds the explode at
    * words/8 rows per document.
    */
  val dd_span_frac = Q(
    (s, dir) => Dedup.spanDupStats(T_(s, dir, "documents"),
        "text", "doc_id", span = 8),
    Some("""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
      s AS (SELECT doc_id, ws, CAST(len(ws) // 8 AS INT) AS ns
        FROM w WHERE len(ws) // 8 >= 1),
      sp AS (SELECT doc_id, array_to_string(ws[i*8+1 : i*8+8], ' ') AS span
        FROM s, UNNEST(range(ns)) AS t(i)),
      d AS (SELECT span FROM sp GROUP BY span HAVING count(DISTINCT doc_id) >= 2)
      SELECT sp.doc_id, CAST(count(*) AS INTEGER) AS n_spans,
        CAST(count(d.span) AS INTEGER) AS dup_spans,
        CAST(count(d.span) AS DOUBLE) / count(*) AS dup_frac
      FROM sp LEFT JOIN d ON sp.span = d.span
      GROUP BY sp.doc_id"""))

  val all: Map[String, Q] = Map(
    "w_sessionize" -> w_sessionize,
    "ts_gapfill" -> ts_gapfill,
    "a_rollup_totals" -> a_rollup_totals,
    "a_quantile_disc" -> a_quantile_disc,
    "pack_sequence" -> pack_sequence,
    "dd_span_frac" -> dd_span_frac,
  )
}
