package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.operators.{DailyRollup, Reshape, Upsert}

/** M3 — the parameterized day-metric pipeline family.
  *
  * The reference clones this flow five times — WeatherDay
  * (graph_weather_day.py), SoilDay, IrrigationDay, CanopyDay, SAPDay —
  * each: discover available measurements, intersect with a wanted
  * list, fetch daily stats (fall back to rolling up hourly), resolve
  * property base names, pivot to a wide per-day node row, and MERGE
  * node + parent edge. Here it is ONE parameterized pipeline; the five
  * label configs are data ([[DayMetricPipeline.weather]] etc.).
  *
  * Input contract (FIXTURES.md §3): long telemetry
  * `(device_id, serial_number, data_at, fw_key, label, unit,
  * data, min, max, avg, sum)`.
  *
  * Scale: one hash-aggregate shuffle for the roll-up, one for the
  * pivot (bounded metric universe — no distinct-collection pass), and
  * the dedup-upsert rides the pivot's partitioning. Day-partitioned
  * storage prunes the scan to the queried window.
  */
final case class DayMetricConfig(
    label: String,
    edge: String,
    wantedFwKeys: Seq[String],
    aliases: Map[String, String],
    /** A1 weather flavor (data=mean, unit=first) vs A2 sentinel flavor
      * (data=null, sum-0→null, unit=last). */
    weatherFlavor: Boolean,
    /** normalize the reference's sum-0→null quirk away (§1.6.3)? */
    zeroSumToNull: Boolean = true)

object DayMetricPipeline {

  val weather = DayMetricConfig("WeatherDay", "HAS_WEATHER_DAY",
    Seq("6", "8", "10", "12", "17", "19", "25", "28", "30", "33", "43"),
    Map("6" -> "air_temp", "8" -> "humidity", "10" -> "wind_speed",
      "12" -> "rain", "17" -> "pressure", "19" -> "solar_radiation",
      "25" -> "wind_dir", "28" -> "dew_point", "30" -> "uv_index",
      "33" -> "gust_speed", "43" -> "et0"),
    weatherFlavor = true)

  val soil = DayMetricConfig("SoilDay", "HAS_SOIL_DAY",
    Seq("166", "167"),
    Map("166" -> "soil_temp", "167" -> "soil_moisture"),
    weatherFlavor = false)

  val irrigation = DayMetricConfig("IrrigationDay", "HAS_IRRIGATION_DAY",
    Seq("88", "89", "90"),
    Map("88" -> "flow_1", "89" -> "flow_2", "90" -> "pressure"),
    weatherFlavor = false)

  val canopy = DayMetricConfig("CanopyDay", "HAS_CANOPY_DAY",
    Seq("50", "51", "52"),
    Map("50" -> "canopy_temp", "51" -> "leaf_wetness", "52" -> "fruit_diameter"),
    weatherFlavor = false)

  val sap = DayMetricConfig("SAPDay", "HAS_SAP_DAY",
    Seq("60", "61"),
    Map("60" -> "sap_flow", "61" -> "leaf_temp"),
    weatherFlavor = false)

  /** P5/P6 — intersect the discovered fw_keys with the wanted list;
    * empty discovery falls back to the full wanted set
    * (graph_weather_day.py:176-197).
    */
  def presentKeys(discovered: Seq[String], cfg: DayMetricConfig): Seq[String] = {
    val present = discovered.filter(cfg.wantedFwKeys.contains)
    if (present.isEmpty) cfg.wantedFwKeys else present
  }

  /** Run one label's pipeline: telemetry (daily + hourly grain) → the
    * wide per-(station, date) node table. Columns:
    * `station_serial, date, {base}{,_min,_max,_avg,_sum}` per metric.
    */
  def nodeTable(daily: DataFrame, hourly: DataFrame,
                cfg: DayMetricConfig): DataFrame = {
    def prep(df: DataFrame): DataFrame = df
      .filter(col("serial_number").isNotNull && col("data_at").isNotNull)  // P3
      .filter(col("fw_key").isin(cfg.wantedFwKeys: _*))                    // P5
    def roll(df: DataFrame): DataFrame =
      if (cfg.weatherFlavor)
        DailyRollup.weather(prep(df), col("data_at"),
          Seq(col("serial_number"), col("fw_key"), col("label")),
          col("data"), col("min"), col("max"), col("avg"), col("sum"), col("unit"))
      else
        DailyRollup.sentinel(prep(df), col("data_at"),
          Seq(col("serial_number"), col("fw_key"), col("label")),
          col("min"), col("max"), col("avg"), col("sum"), col("unit"),
          zeroSumToNull = cfg.zeroSumToNull)
          .withColumn("data", lit(null).cast("double"))
    // daily stats where present; hourly rolled up for missing groups (A3)
    val dailyPrep = prep(daily)
      .groupBy(col("serial_number"), col("fw_key"), col("label"),
        to_date(col("data_at")).as("date"))
      .agg(first(col("data"), ignoreNulls = true).as("data"),
        min(col("min")).as("min"), max(col("max")).as("max"),
        first(col("avg"), ignoreNulls = true).as("avg"),
        first(col("sum"), ignoreNulls = true).as("sum"),
        first(col("unit"), ignoreNulls = true).as("unit"))
    val merged = DailyRollup.withFallback(dailyPrep, roll(hourly),
      Seq("serial_number", "fw_key", "label", "date"))
    // F1 — resolve the property base name, then R1 — stat-family pivot
    val named = merged.withColumn("base",
      F.resolvePropertyBase(col("fw_key"), col("label"), cfg.aliases))
    val bases = cfg.wantedFwKeys.map(k => cfg.aliases.getOrElse(k, k)).distinct
    val wide = Reshape.statPivot(
      named.withColumnRenamed("serial_number", "station_serial"),
      Seq("station_serial", "date"), "base", bases)
    // S3 — idempotent upsert by the label's uniqueness key (§1.2)
    Upsert.dedupByKey(wide, Seq("station_serial", "date"), Seq(col("date")))
  }

  /** The parent edge table (§1.3): Station→<label> on the embedded key. */
  def edgeTable(nodes: DataFrame, cfg: DayMetricConfig): DataFrame =
    nodes.select(
      col("station_serial").as("src_serial"),
      col("station_serial").as("dst_station_serial"),
      col("date").as("dst_date"),
      lit(cfg.edge).as("rel"))
}
