package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed roll-up family (SURVEY §2.4 A1–A3).
  *
  * The reference rolls hourly telemetry up to daily stats in Python
  * dict loops, in two flavors:
  *  - "weather": daily value = mean of hourly values, min=min(min),
  *    max=max(max), avg=mean(avg), sum=sum(sum), unit=first
  *    (/root/reference/app/graph_weather_day.py:69-117);
  *  - "sentinel": same but value=null, unit=last, and a quirk where a
  *    daily sum of exactly 0.0 collapses to null
  *    (graph_irrigation_day.py:77-135 and two clones).
  *
  * Both are a single hash aggregate here — partial (map-side) combine
  * then a final reduce, one shuffle on the group keys. At 100 TB the
  * input would be date-partitioned so the groupBy shuffles only within
  * partitions touched by the time window.
  */
object DailyRollup {

  /** A1 — weather-flavor roll-up of a long-layout metric table
    * `(keys..., ts, value, vmin, vmax, vavg, vsum, unit)` to one row per
    * (keys..., day).
    */
  def weather(df: DataFrame, ts: Column, keys: Seq[Column],
              value: Column, vmin: Column, vmax: Column,
              vavg: Column, vsum: Column, unit: Column): DataFrame =
    df.groupBy((keys :+ to_date(ts).as("date")): _*)
      .agg(
        avg(value).as("data"),
        min(vmin).as("min"),
        max(vmax).as("max"),
        avg(vavg).as("avg"),
        sum(vsum).as("sum"),
        first(unit, ignoreNulls = true).as("unit"))

  /** A2 — sentinel-flavor roll-up: data=null, unit=last,
    * sum-of-0 → null (quirk §1.6.3, kept behind a flag so the oracle can
    * choose either semantics).
    */
  def sentinel(df: DataFrame, ts: Column, keys: Seq[Column],
               vmin: Column, vmax: Column, vavg: Column, vsum: Column,
               unit: Column, zeroSumToNull: Boolean = true): DataFrame = {
    val rawSum = sum(vsum)
    val sumCol =
      if (zeroSumToNull) when(rawSum =!= 0.0, rawSum).as("sum")
      else rawSum.as("sum")
    df.groupBy((keys :+ to_date(ts).as("date")): _*)
      .agg(
        min(vmin).as("min"),
        max(vmax).as("max"),
        avg(vavg).as("avg"),
        sumCol,
        last(unit, ignoreNulls = true).as("unit"))
  }

  /** A3 — daily-first with hourly fallback: keep daily rows where they
    * exist; fill the (keys, day) combinations daily lacks from the
    * hourly roll-up. Set-wise form of the reference's "if daily empty,
    * fetch hourly" branch (graph_weather_day.py:199-224) that also works
    * per-group instead of all-or-nothing. Anti-join on the group keys,
    * then union — two shuffles, both on the same keys so the exchange
    * is reusable.
    */
  def withFallback(daily: DataFrame, hourlyRollup: DataFrame, keys: Seq[String]): DataFrame =
    daily.unionByName(
      hourlyRollup.join(daily.select(keys.map(col): _*).distinct(), keys, "left_anti"),
      allowMissingColumns = true)
}
