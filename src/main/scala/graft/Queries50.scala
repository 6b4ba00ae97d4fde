package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Queries.Q

/** Batch 50 (round 7): Wald–Wolfowitz runs test for serial
  * randomness.
  */
object Queries50 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** RUNS TEST (Wald–Wolfowitz) on the daily revenue series: is the
    * sequence of above/below-median days serially random, or does it
    * trend/cluster? Observed run count vs the exact expectation
    * E[R] = 1 + 2·n1·n2/(n1+n2), both as integers (expectation in
    * milli) — too FEW runs means momentum/trending, too many means
    * oscillation; the serial-randomness check `dq_ks_drift` (shape)
    * and `ts_autocorr_lag1` (linear correlation) both complement.
    * Median-valued days drop, per the classic test. Everything after
    * the daily collapse runs on the calendar-bounded series.
    */
  val ts_runs_test = Q(
    (s, dir) => {
      val daily = T_(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)"))
          .as("cents"))
      val n = Window.partitionBy()
      val med = daily
        .withColumn("rn", row_number().over(Window.orderBy(col("cents"), col("d"))))
        .withColumn("nn", count(lit(1)).over(n))
        .filter(col("rn") === expr("CAST((nn + 1) div 2 AS INT)"))
        .select(col("cents").as("med"))
      val signed = daily.crossJoin(broadcast(med))
        .filter(col("cents") =!= col("med"))
        .withColumn("above", col("cents") > col("med"))
      signed
        .withColumn("flip",
          when(lag(col("above"), 1).over(Window.orderBy(col("d"))).isNull, 1L)
            .when(lag(col("above"), 1).over(Window.orderBy(col("d"))) =!= col("above"), 1L)
            .otherwise(0L))
        .agg(sum(when(col("above"), 1L).otherwise(0L)).as("n_above"),
          sum(when(!col("above"), 1L).otherwise(0L)).as("n_below"),
          sum(col("flip")).as("n_runs"))
        .withColumn("e_runs_milli",
          expr("1000 + (2 * n_above * n_below * 1000) div (n_above + n_below)"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        med AS (SELECT cents AS med FROM (
            SELECT cents,
              row_number() OVER (ORDER BY cents, d) AS rn,
              count(*) OVER () AS nn
            FROM daily)
          WHERE rn = CAST((nn + 1) // 2 AS BIGINT)),
        signed AS (SELECT d, cents > med AS above
          FROM daily, med WHERE cents != med),
        flips AS (SELECT above,
            CASE WHEN lag(above, 1) OVER (ORDER BY d) IS NULL THEN 1
                 WHEN lag(above, 1) OVER (ORDER BY d) != above THEN 1
                 ELSE 0 END AS flip
          FROM signed)
      SELECT CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        CAST(SUM(flip) AS BIGINT) AS n_runs,
        1000 + (2 * CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
          * CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT) * 1000)
          // (CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
            + CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT))
          AS e_runs_milli
      FROM flips"""))

  val all: Map[String, Q] = Map(
    "ts_runs_test" -> ts_runs_test,
  )
}
