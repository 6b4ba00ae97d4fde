package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.{Funnel, TimeSeries, Upsert}
import Queries.Q

/** Batch 21: windowed funnel conversion, exact trend slopes, MERGE
  * schema evolution, per-group top-k, and partition-volume anomaly
  * detection — the data-ops / product-analytics layer.
  */
object Queries21 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val funnelSteps = Seq("signup", "click", "purchase")
  private val funnelWindowUs = 3L * 86400L * 1000000L // 3 days

  /** Windowed funnel: every step must land within 3 days of the
    * entity's funnel ENTRY (the "convert within N days" attribution
    * form). Same one-exchange join chain as `funnel_conversion`; the
    * window bound rides the entity-key join, no extra shuffle.
    */
  val funnel_windowed = Q(
    (s, dir) => Funnel.conversion(
      T_(s, dir, "events"), col("user_id"), unix_micros(col("ts")),
      funnelSteps.map(n => n -> (col("event_type") === n)),
      windowUs = Some(funnelWindowUs)),
    Some(s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) AS t FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.us) AS t FROM e
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.us > s1.t
            AND e.us <= s1.t + $funnelWindowUs GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.us) AS t FROM e
          JOIN s2 ON e.user_id = s2.user_id
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'purchase' AND e.us > s2.t
            AND e.us <= s1.t + $funnelWindowUs GROUP BY 1),
        c AS (SELECT (SELECT count(*) FROM s1) AS u1,
                     (SELECT count(*) FROM s2) AS u2,
                     (SELECT count(*) FROM s3) AS u3)
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name, u1 AS users,
        u1 * 1000 // u1 AS conv_prev_milli, u1 * 1000 // u1 AS conv_first_milli FROM c
      UNION ALL SELECT CAST(2 AS BIGINT), 'click', u2, u2 * 1000 // u1, u2 * 1000 // u1 FROM c
      UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', u3, u3 * 1000 // u2, u3 * 1000 // u1 FROM c"""))

  /** Per-type least-squares trend slope over (day-index, milli-value)
    * as an EXACT RATIONAL: slope = num/den with
    * num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² — one hash aggregate
    * per type. Moment products and sums run in decimal(38,0) on the
    * Spark side / HUGEINT in the oracle (milli-scaled y times a day
    * index would wrap int64 well below sf1 — round-6 advice), and the
    * outputs ship as canonical integer strings on both sides: exact
    * at any scale, divided only at display time, and hashed
    * identically by every checker (wide DECIMAL is not).
    */
  val ts_trend_slope = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      ev.crossJoin(broadcast(d0))
        .select(col("event_type"),
          datediff(to_date(col("ts")), col("d0")).cast("long").as("x"),
          col("value").cast("decimal(27,3)").*(lit(1000)).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(d(col("x"))).as("sx"),
          sum(d(col("y"))).as("sy"), sum(d(col("x")) * col("y")).as("sxy"),
          sum(d(col("x")) * col("x")).as("sxx"))
        .select(col("event_type"), col("n"),
          // canonical integer strings — exact at int128 range and
          // hash-portable, which DECIMAL(38,0) outputs are not
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("decimal(38,0)").cast("string").as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("decimal(38,0)").cast("string").as("slope_den"))
    },
    Some("""WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        e AS (SELECT event_type,
            CAST(date_diff('day', d0, CAST(ts AS DATE)) AS BIGINT) AS x,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS y
          FROM events CROSS JOIN d0),
        m AS (SELECT event_type, count(*) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx
          FROM e GROUP BY 1)
      SELECT event_type, n,
        CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS VARCHAR) AS slope_num,
        CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS VARCHAR) AS slope_den
      FROM m"""))

  /** MERGE with schema evolution: the delta carries a column the base
    * has never seen (`loyalty_tier`) plus an updated value; the merge
    * widens the schema (`unionByName(allowMissingColumns)`) — old
    * rows surface NULL, delta rows their value — while staying the
    * same single keyed aggregate as every other MERGE here. The
    * Delta-Lake `mergeSchema` semantics as a pure transform.
    */
  val s20_schema_evolution = Q(
    (s, dir) => {
      val base = T_(s, dir, "customer")
      val delta = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_mktsegment", lit("VIP"))
        .withColumn("loyalty_tier", lit("gold"))
      Upsert.merge(base, delta, Seq("c_custkey"), keepExistingNonNull = false)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"), col("loyalty_tier"))
    },
    Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        CASE WHEN c_custkey % 10 = 0 THEN 'VIP' ELSE c_mktsegment END AS c_mktsegment,
        CASE WHEN c_custkey % 10 = 0 THEN 'gold' END AS loyalty_tier
      FROM customer"""))

  /** Top-k per group (k = 3 customers per nation by balance): the one
    * shape where a per-key rank window IS the scalable plan — one
    * shuffle on the group key, per-group sort bounded by group size,
    * no global ordering anywhere. (Top-1 stays an argmin aggregate —
    * o3; k > 1 has no aggregate form without collecting the group.)
    */
  val o6_topk_per_group = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      T_(s, dir, "customer")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_acctbal"))
    },
    Some("""SELECT c_nationkey, rk, c_custkey, c_acctbal
      FROM (SELECT c_nationkey, c_custkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        FROM customer)
      WHERE rk <= 3"""))

  /** Partition-volume anomaly detection: daily row counts per event
    * type, each series z-scored against its own trailing week with
    * the integer-exact cross-multiplied test of `ts_anomaly` — the
    * "did yesterday's ingest silently halve?" data-ops check, on the
    * 5x30 day-count matrix rather than raw events.
    */
  val dq_volume_anomaly = Q(
    (s, dir) => {
      val daily = T_(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeries.anomalyZscore(daily, col("event_type"), col("n"),
          Seq(col("day")), win = 7, k = 2, minN = 5)
        .select(col("event_type"), col("day"), col("n"), col("is_anomaly"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, day, n, n * 1000 AS x FROM daily),
        w AS (SELECT event_type, day, n, x,
            count(x) OVER win AS wn, sum(x) OVER win AS s, sum(x * x) OVER win AS q
          FROM b WINDOW win AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, n,
        wn >= 5 AND (x * wn - s) * (x * wn - s) > 4 * (q * wn - s * s) AS is_anomaly
      FROM w"""))

  val all: Map[String, Q] = Map(
    "funnel_windowed" -> funnel_windowed,
    "ts_trend_slope" -> ts_trend_slope,
    "s20_schema_evolution" -> s20_schema_evolution,
    "o6_topk_per_group" -> o6_topk_per_group,
    "dq_volume_anomaly" -> dq_volume_anomaly,
  )
}
