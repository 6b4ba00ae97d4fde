package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 24: Pareto concentration, lag-1 autocorrelation, and the
  * per-language curation run report — workload-concentration,
  * serial-dependence, and corpus-health summaries, all in exact
  * integer arithmetic.
  */
object Queries24 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Pareto concentration ("do 20% of users drive 80% of events?"):
    * the smallest heavy-user set covering ≥ 80% of event volume, as
    * exact integers. Raw events meet ONE count aggregate; the
    * cumulative walk runs over the count-of-counts table (how many
    * users emitted exactly c events — bounded by the activity value
    * domain, not the user count), descending from the heaviest tier.
    */
  val a_pareto_share = Q(
    (s, dir) => {
      val perUser = T_(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val tiers = perUser.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val wCum = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walked = tiers
        .withColumn("cum_events", sum(col("c") * col("m")).over(wCum))
        .withColumn("cum_users", sum(col("m")).over(wCum))
      val tot = perUser.agg(sum(col("c")).as("total_events"),
        count(lit(1)).as("total_users"))
      walked.crossJoin(broadcast(tot))
        .filter(col("cum_events") * 10 >= col("total_events") * 8)
        .orderBy(col("c").desc)
        .limit(1)
        .select(col("cum_users").as("users_needed"), col("total_users"),
          col("cum_events").as("events_covered"), col("total_events"),
          expr("1000L * cum_users div total_users").as("user_share_milli"),
          expr("1000L * cum_events div total_events").as("event_share_milli"))
    },
    Some("""WITH pu AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        tiers AS (SELECT c, count(*) AS m FROM pu GROUP BY 1),
        walked AS (SELECT c,
            sum(c * m) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS cum_events,
            sum(m) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS cum_users
          FROM tiers),
        tot AS (SELECT sum(c) AS total_events, count(*) AS total_users FROM pu)
      SELECT CAST(cum_users AS BIGINT) AS users_needed, total_users,
        CAST(cum_events AS BIGINT) AS events_covered,
        CAST(total_events AS BIGINT) AS total_events,
        CAST(1000 * cum_users // total_users AS BIGINT) AS user_share_milli,
        CAST(1000 * cum_events // total_events AS BIGINT) AS event_share_milli
      FROM walked CROSS JOIN tot
      WHERE cum_events * 10 >= total_events * 8
      ORDER BY c DESC LIMIT 1"""))

  /** Lag-1 autocorrelation of event values, pooled per event type
    * from consecutive same-user pairs (one per-user window — single
    * shuffle), emitted as the exact rational num/den of the Pearson
    * form over milli-scaled integers:
    * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²)) —
    * the two denominator factors ship unsquare-rooted (den_x, den_y),
    * so no libm touches the row. Values are DECI-scaled (×10), and
    * every moment (product and sum) runs in decimal(38,0) on the
    * Spark side / HUGEINT (int128) in the oracle, so NOTHING can wrap
    * at any realistic scale: with |y| ≤ 10⁶ deci-units and n ≤ 10¹²
    * rows per type, the worst term n·Σxy stays under 10³⁶ < 10³⁸.
    * Outputs ship as canonical integer strings on both sides — exact
    * integers, engine bit-parity by construction, and hash-portable
    * where wide DECIMAL is not (round-7 verdict task 1).
    */
  val ts_autocorr_lag1 = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val pairs = T_(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("y",
          col("value").cast("decimal(27,1)").*(lit(10)).cast("long"))
        .withColumn("x", lag(col("y"), 1).over(w))
        .filter(col("x").isNotNull)
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(d(col("x"))).as("sx"),
          sum(d(col("y"))).as("sy"), sum(d(col("x")) * col("y")).as("sxy"),
          sum(d(col("x")) * col("x")).as("sxx"),
          sum(d(col("y")) * col("y")).as("syy"))
        .select(col("event_type"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("decimal(38,0)").cast("string").as("r_num"),
          (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("decimal(38,0)").cast("string").as("r_den_x"),
          (col("n") * col("syy") - col("sy") * col("sy"))
            .cast("decimal(38,0)").cast("string").as("r_den_y"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
            CAST(CAST(value AS DECIMAL(27,1)) * 10 AS BIGINT) AS y FROM events),
        p AS (SELECT event_type, y,
            lag(y) OVER (PARTITION BY user_id ORDER BY us, event_id) AS x
          FROM e),
        q AS (SELECT event_type, x, y FROM p WHERE x IS NOT NULL),
        m AS (SELECT event_type, count(*) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM q GROUP BY 1)
      SELECT event_type, n,
        CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS VARCHAR) AS r_num,
        CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS VARCHAR) AS r_den_x,
        CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0)) AS VARCHAR) AS r_den_y
      FROM m"""))

  private val toksSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END"""
  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  /** The curation run report: per-language corpus health — document
    * and token volume, short-document and exact-duplicate rates — the
    * one-page summary a dataset curator reads after every ingest.
    * ONE scan computes every per-doc metric; the struct-distinct
    * duplicate count and milli rates are the s6/dq counter idioms at
    * corpus granularity.
    */
  val pipeline_curation_report = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("lang"), col("n_chars"),
        T.wsTokenCount(col("text")).as("toks"),
        T.normText(col("text")).as("norm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(col("toks")).as("tokens_total"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("short_docs"),
        (count(lit(1)) - countDistinct(col("norm"))).as("dup_docs"))
      .select(col("lang"), col("n_docs"), col("n_chars_total"),
        col("tokens_total"),
        expr("1000L * short_docs div n_docs").as("short_rate_milli"),
        expr("1000L * dup_docs div n_docs").as("dup_rate_milli")),
    Some(s"""WITH d AS (SELECT lang, n_chars, $toksSql AS toks,
            $normSql AS norm FROM documents),
        g AS (SELECT lang, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
            CAST(sum(toks) AS BIGINT) AS tokens_total,
            sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS short_docs,
            count(*) - count(DISTINCT norm) AS dup_docs
          FROM d GROUP BY 1)
      SELECT lang, n_docs, n_chars_total, tokens_total,
        CAST(1000 * short_docs // n_docs AS BIGINT) AS short_rate_milli,
        CAST(1000 * dup_docs // n_docs AS BIGINT) AS dup_rate_milli
      FROM g"""))

  val all: Map[String, Q] = Map(
    "a_pareto_share" -> a_pareto_share,
    "ts_autocorr_lag1" -> ts_autocorr_lag1,
    "pipeline_curation_report" -> pipeline_curation_report,
  )
}
