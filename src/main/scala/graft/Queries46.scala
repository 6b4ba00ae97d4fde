package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Sampling
import Queries.Q

/** Batch 46 (round 7): exact Kolmogorov-Smirnov two-sample drift,
  * time-decay sampling, and activity-streak leaderboards.
  */
object Queries46 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def detHash2Sql(k: String) =
    graft.operators.Sampling.detHash2Sql(k)

  // ===========================================================
  // Exact two-sample Kolmogorov-Smirnov statistic
  // ===========================================================

  /** KOLMOGOROV-SMIRNOV two-sample drift (click vs view values) as
    * an EXACT RATIONAL: D = max over the merged support of
    * |F1(v) − F2(v)|, carried as (d_num = max|c1·n2 − c2·n1|,
    * d_den = n1·n2) — the distribution-shape drift test that catches
    * what `dq_chi2_drift` (categories) and `dq_ttest_value` (means)
    * both miss: same mean, same categories, different shape.
    *
    * Plan: values milli-quantize and collapse to a (value, n1, n2)
    * frequency table FIRST (one keyed aggregate over the scan); both
    * cumulative walks run in ONE unpartitioned window over that
    * compressed support — the documented value-frequency window
    * pattern (support size, not row count).
    */
  val dq_ks_drift = Q(
    (s, dir) => {
      val vals = T_(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT)").as("v"))
      val vf = vals.groupBy(col("v"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("f1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("f2"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.partitionBy()
      vf
        .withColumn("c1", sum(col("f1")).over(w))
        .withColumn("c2", sum(col("f2")).over(w))
        .withColumn("n1", sum(col("f1")).over(whole))
        .withColumn("n2", sum(col("f2")).over(whole))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          expr("(d_num * 1000) div (n1 * n2)").as("d_milli"))
    },
    Some("""WITH vals AS (SELECT event_type,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS v
          FROM events WHERE event_type IN ('click', 'view')),
        vf AS (SELECT v,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS f1,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS f2
          FROM vals GROUP BY 1),
        cum AS (SELECT v, f1, f2,
            SUM(f1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS c1,
            SUM(f2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS c2,
            SUM(f1) OVER () AS n1, SUM(f2) OVER () AS n2
          FROM vf)
      SELECT CAST(any_value(n1) AS BIGINT) AS n1,
        CAST(any_value(n2) AS BIGINT) AS n2,
        CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
        CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) * 1000
          // (CAST(any_value(n1) AS BIGINT) * CAST(any_value(n2) AS BIGINT))
          AS d_milli
      FROM cum"""))

  // ===========================================================
  // Time-decay sampling
  // ===========================================================

  /** TIME-DECAY SAMPLING: keep recent data at full rate and decay
    * older data harmonically — weight_permille = 1000 div
    * (1 + age_weeks) against the corpus high-water mark, gated by
    * the deterministic hash (the same inverse-probability gate as
    * the stratified family, so the sample is reproducible and the
    * expected kept mass per bucket is exactly weight/1000). Output:
    * per age-week bucket, total vs kept vs the target weight — the
    * freshness-biased retention table a continually-trained model's
    * data loader mounts.
    */
  val samp_decay_weighted = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
        .select(col("event_id"), to_date(col("ts")).as("d"))
      val hwm = ev.agg(max(col("d")).as("hwm"))
      ev.crossJoin(broadcast(hwm))
        .withColumn("age_weeks", expr("datediff(hwm, d) div 7"))
        .withColumn("w_permille", expr("1000 div (1 + age_weeks)"))
        .withColumn("kept",
          Sampling.detHash2(col("event_id")) % 1000 < col("w_permille"))
        .groupBy(col("age_weeks"), col("w_permille"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("kept_permille", expr("(n_kept * 1000) div n_total"))
        .orderBy(col("age_weeks"))
    },
    Some(s"""WITH ev AS (SELECT event_id, CAST(ts AS DATE) AS d FROM events),
        hw AS (SELECT max(d) AS hwm FROM ev),
        aged AS (SELECT event_id,
            date_diff('day', d, hwm) // 7 AS age_weeks
          FROM ev, hw),
        gated AS (SELECT age_weeks,
            1000 // (1 + age_weeks) AS w_permille,
            CASE WHEN (${detHash2Sql("event_id")}) % 1000
              < 1000 // (1 + age_weeks) THEN 1 ELSE 0 END AS kept
          FROM aged)
      SELECT age_weeks, CAST(w_permille AS BIGINT) AS w_permille,
        count(*) AS n_total,
        CAST(SUM(kept) AS BIGINT) AS n_kept,
        CAST(SUM(kept) AS BIGINT) * 1000 // count(*) AS kept_permille
      FROM gated GROUP BY 1, 2 ORDER BY 1"""))

  // ===========================================================
  // Activity-streak leaderboard (gaps-and-islands summary)
  // ===========================================================

  /** STREAK LEADERBOARD: each user's LONGEST run of consecutive
    * active days and whether their CURRENT streak touches the
    * table's high-water day — top 20 by longest streak. The island
    * key is the day-index minus the per-user row index (the
    * gaps-and-islands rewrite over the distinct (user, day) table,
    * which is the only corpus-sized pass).
    */
  val w_streak_leaders = Q(
    (s, dir) => {
      val ud = T_(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .withColumn("di", datediff(col("d"), lit("2024-01-01").cast("date")))
      val hwm = ud.agg(max(col("di")).as("hw"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("di"))
      val islands = ud
        .withColumn("island", col("di") - row_number().over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"), max(col("di")).as("last_di"))
      islands.crossJoin(broadcast(hwm))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest"),
          max(when(col("last_di") === col("hw"), col("len")).otherwise(0L))
            .as("current"))
        .orderBy(col("longest").desc, col("user_id").asc)
        .limit(20)
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di
          FROM events),
        hw AS (SELECT max(di) AS hwm FROM ud),
        isl AS (SELECT user_id, di,
            di - row_number() OVER (PARTITION BY user_id ORDER BY di) AS island
          FROM ud),
        runs AS (SELECT user_id, island, count(*) AS len, max(di) AS last_di
          FROM isl GROUP BY 1, 2)
      SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest,
        CAST(MAX(CASE WHEN last_di = hwm THEN len ELSE 0 END) AS BIGINT)
          AS current
      FROM runs, hw GROUP BY user_id
      ORDER BY longest DESC, user_id ASC LIMIT 20"""))

  val all: Map[String, Q] = Map(
    "dq_ks_drift" -> dq_ks_drift,
    "samp_decay_weighted" -> samp_decay_weighted,
    "w_streak_leaders" -> w_streak_leaders,
  )
}
