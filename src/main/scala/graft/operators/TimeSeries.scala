package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch time-series operators: gap-based sessionization and
  * date-spine gap filling.
  *
  * The reference processes per-station daily series with explicit
  * date windows (main_graph_topraq.py:79-80) and its weather roll-up
  * assumes a dense day axis; these operators make the dense-axis
  * assumption explicit (gap fill) and generalize the event grouping
  * a sessionized activity feed needs. The streaming counterpart is
  * [[graft.streaming.Sessionize]] — same semantics, unbounded input.
  *
  * Scale design: both operators are a single hash shuffle on the
  * entity key. Per-entity state (one user's events, one user's day
  * span) is bounded and independent, so a 1000-executor cluster
  * processes entities embarrassingly parallel; there is no global
  * window and no driver-side loop.
  */
object TimeSeries {

  /** Assign a gap-based session index per key: a new session starts
    * when the time since the previous event exceeds `gapSeconds`.
    * Returns the input plus `session_idx` (1-based, per key, in
    * `ord` order). `ord` must start with the event timestamp and end
    * with a unique tiebreak so the assignment is total-order
    * deterministic.
    *
    * One window partition per key — a single shuffle on `key`; the
    * lag and the running boundary sum evaluate in the same sort.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column,
                 gapSeconds: Long, ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(ts, 1).over(w)
    val boundary = when(prev.isNull ||
      unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx", sum(boundary).over(wRun))
  }

  /** Gaps-and-islands: collapse each key's set of active days into
    * maximal runs of CONSECUTIVE days. Returns one row per island:
    * (key, start_day, end_day, days) — the classic retention /
    * streak shape (dual of [[gapFillDaily]], which densifies the
    * gaps instead of naming the islands).
    *
    * Uses the row_number difference trick: within a key, consecutive
    * days d with ranks r share a constant d − r, which becomes the
    * island grouping key. One shuffle on `key` for the window, then a
    * hash aggregate on (key, anchor) that reuses the same
    * partitioning — per-key state is bounded by its own day span, so
    * keys process embarrassingly parallel at any cluster width.
    *
    * `df` must have one row per (key, day) — pre-aggregate with
    * `.select(key, to_date(ts)).distinct()` from an event feed.
    */
  def islands(df: DataFrame, keyName: String, dayName: String): DataFrame = {
    val w = Window.partitionBy(col(keyName)).orderBy(col(dayName).asc)
    df.withColumn("__anchor",
        date_sub(col(dayName), row_number().over(w)))
      .groupBy(col(keyName), col("__anchor"))
      .agg(min(col(dayName)).as("start_day"),
        max(col(dayName)).as("end_day"),
        count(lit(1)).as("days"))
      .drop("__anchor")
  }

  /** Fill a per-key daily series to a dense day axis and forward-fill
    * the value: for each key, generate every day between its first
    * and last observed day, left-join the observed values, and carry
    * the last non-null value forward. Days before the first
    * observation stay null (nothing to carry). Returns
    * (key, day, value_filled, is_gap).
    *
    * `df` must be (key, day, value) with one row per (key, day).
    *
    * The spine explode is bounded by each key's own span (not the
    * global calendar), the join key (key, day) matches the spine's
    * natural distribution, and the forward fill is ONE window
    * partitioned by key — `last(ignoreNulls)` in the same sort that
    * the session window would use, so the whole operator is a single
    * shuffle on `key` after the daily aggregate.
    */
  def gapFillDaily(df: DataFrame, keyName: String, dayName: String,
                   valueName: String): DataFrame = {
    val spine = df.groupBy(col(keyName))
      .agg(min(col(dayName)).as("__mn"), max(col(dayName)).as("__mx"))
      .select(col(keyName), explode(sequence(col("__mn"), col("__mx"))).as(dayName))
    val w = Window.partitionBy(col(keyName)).orderBy(col(dayName).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyName, dayName), "left")
      .withColumn("value_filled", last(col(valueName), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueName).isNull)
      .drop(valueName)
  }

  /** Rolling z-score anomaly detection, INTEGER-EXACT: flag each
    * observation whose deviation from the trailing-window mean
    * exceeds `k` sample standard deviations. The test
    * (x − s/n)² > k²·(q·n − s²)/n²  is cross-multiplied to
    * (x·n − s)² > k²·(q·n − s²) over milli-scaled integer values, so
    * there is no float mean, no float variance, no sqrt — the flags
    * replay bit-for-bit in any engine (a double-stddev z-score would
    * hash-diverge on summation order and libm sqrt).
    *
    * The window is the `win` PRECEDING rows, excluding the current
    * row (self-exclusion keeps the baseline uncontaminated by the
    * point under test); rows with fewer than `minN` trailing
    * observations are never flagged (cold start).
    *
    * `ord` must be a total order (timestamp + unique tiebreak).
    * Plan: ONE hash shuffle on `key`; both rolling sums evaluate in
    * the same per-key sort. Per-row state is two bigint sums — with
    * |value| ≤ ~10⁶ milli and win ≤ ~10³ everything fits int64
    * (q ≤ win·x² ≤ 10³·10¹² = 10¹⁵; the cross-multiplied sides peak
    * near (x·n)² ≤ 10¹⁸).
    */
  def anomalyZscore(df: DataFrame, key: Column, value: Column,
                    ord: Seq[Column], win: Int, k: Int,
                    minN: Int = 5): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(-win, -1)
    val x = value.cast("decimal(27,3)").*(lit(1000)).cast("long")
    // pre-project x² so all three rolling aggregates share ONE Window
    // node (sum(x*x) would otherwise interpose a projection that
    // blocks window collapsing — two passes over the sorted rows)
    val base = df.withColumn("__x", x)
      .withColumn("__x2", col("__x") * col("__x"))
      .withColumn("__n", count(col("__x")).over(w))
      .withColumn("__s", sum(col("__x")).over(w))
      .withColumn("__q", sum(col("__x2")).over(w))
    val dev = col("__x") * col("__n") - col("__s")
    val varN2 = col("__q") * col("__n") - col("__s") * col("__s")
    base.withColumn("is_anomaly",
        col("__n") >= minN && dev * dev > lit(k.toLong * k) * varN2)
      .drop("__x", "__x2", "__n", "__s", "__q")
  }

  /** Finite-window EWMA smoother, INTEGER-EXACT: a lag-truncated
    * exponential moving average with power-of-two weights
    * 2^(depth−1−i) on lag i (current row heaviest). Truncating the
    * tail turns the recursive EWMA — which no engine can window and
    * no oracle can replay without per-row recursion — into a fixed
    * linear combination of `depth` lags: one window, one shuffle on
    * `key`, and weights that decay exactly like α = 1/2 EWMA up to a
    * 2^−depth tail (≤ 0.4% at depth 8). Values are milli-scaled
    * integers (decimal-cast, never float), so the smoothed series
    * replays bit-for-bit in any engine. Warm-up rows average over the
    * lags that exist (integer numerator div integer denominator;
    * inputs must be nonneg for truncate-div == floor-div parity
    * across engines). Emits input + `ewma_milli`.
    *
    * NULL semantics: a NULL current value contributes nothing to
    * num/den, so the row emits the weighted average of its non-null
    * lags; when the current value AND all `depth` lags are NULL the
    * denominator is 0 and `ewma_milli` is NULL (guarded explicitly —
    * without the guard Spark's non-ANSI div yields NULL while a
    * DuckDB `//` replay raises, an engine-parity hazard).
    *
    * `ord` must be a total order (timestamp + unique tiebreak).
    */
  def ewmaLag(df: DataFrame, key: Column, value: Column,
              ord: Seq[Column], depth: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 62, "depth must be in [1, 62]")
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val x = value.cast("decimal(27,3)").*(lit(1000)).cast("long")
    val base = df.withColumn("__x", x)
    val terms = (0 until depth).map { i =>
      val wt = 1L << (depth - 1 - i)
      val xi = if (i == 0) col("__x") else lag(col("__x"), i).over(w)
      (when(xi.isNotNull, xi * wt), when(xi.isNotNull, lit(wt)))
    }
    val num = terms.map(t => coalesce(t._1, lit(0L))).reduce(_ + _)
    val den = terms.map(t => coalesce(t._2, lit(0L))).reduce(_ + _)
    base
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma_milli",
        when(col("__den") > 0, expr("__num div __den")))
      .drop("__x", "__num", "__den")
  }

  /** One-sided CUSUM drift statistic over an integer deviation
    * series: S_d = max(0, S_{d−1} + x_d) — the standard
    * change-point accumulator (Page 1954), which looks like per-row
    * recursion no SQL engine can window… until the DRAWDOWN REWRITE:
    *   S_d = cum_d − min(0, min_{j≤d} cum_j)
    * (cum = running sum of x), which IS two window functions over
    * one sort. Proof sketch: min(cum_d, m_{d−1}) = m_d, so
    * cum_d − m_d = max(0, cum_{d−1} − m_{d−1} + x_d). The rewrite
    * turns an inherently sequential scan into ONE hash shuffle on
    * `key` + one sorted window pass — the same plan shape as every
    * other window op here, and the reason this runs on a 1000-
    * executor cluster instead of a driver loop.
    *
    * `x` must be integer-scaled (caller multiplies deviations out —
    * e.g. n_d·T − total so the mean is subtracted exactly); sums run
    * in decimal(38,0) so lake-scale counts cannot wrap. Emits
    * `cusum` (decimal(38,0)) alongside the input row. `ord` must be
    * a total order per key.
    */
  def cusum(df: DataFrame, key: Column, ord: Seq[Column],
            x: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum",
        sum(x.cast("decimal(38,0)")).over(w).cast("decimal(38,0)"))
      .withColumn("__low", min(col("__cum")).over(w))
      .withColumn("cusum",
        (col("__cum") - least(col("__low"), lit(0).cast("decimal(38,0)")))
          .cast("decimal(38,0)"))
      .drop("__cum", "__low")
  }
}
