package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / unpivot / reshaping family (SURVEY §2.5 R1–R7).
  *
  * The reference builds its wide per-day node rows by looping Python
  * dicts (e.g. /root/reference/app/graph_weather_day.py:235-248); here
  * the long→wide step is a `groupBy().pivot()` whose value universe is
  * bounded up front (the reference's "wanted measurement" lists do the
  * same bounding, graph_weather_day.py:17-29), so the pivot compiles to
  * a single hash aggregate — no second pass to collect distinct values,
  * which matters when the input is 100 TB.
  */
object Reshape {

  /** R1 — stat-family long→wide pivot: one row per `keys`, and for each
    * metric in `metrics` the 5 columns `{m}, {m}_min, {m}_max, {m}_avg,
    * {m}_sum`. Metric names must be pre-resolved (F1) and bounded.
    */
  def statPivot(df: DataFrame, keys: Seq[String], metricCol: String,
                metrics: Seq[String]): DataFrame = {
    val wide = df.groupBy(keys.map(col): _*)
      .pivot(metricCol, metrics)
      .agg(
        first(col("data"), ignoreNulls = true).as("v"),
        first(col("min"), ignoreNulls = true).as("min"),
        first(col("max"), ignoreNulls = true).as("max"),
        first(col("avg"), ignoreNulls = true).as("avg"),
        first(col("sum"), ignoreNulls = true).as("sum"))
    // Spark names pivot columns "<metric>_<alias>"; flatten to the
    // reference's "{base}" / "{base}_min" ... convention.
    val renamed = wide.columns.map { c =>
      if (c.endsWith("_v")) col(c).as(c.dropRight(2)) else col(c)
    }
    wide.select(renamed.toIndexedSeq: _*)
  }

  /** R2 — map column → wide columns `{key}_{field}` for a bounded key
    * universe (forecast measurements map,
    * graph_weather_forecast.py:44-61). Pure projection — no shuffle.
    */
  def mapToWide(df: DataFrame, mapCol: String, keys: Seq[String],
                fields: Seq[String]): DataFrame = {
    val cols = for (k <- keys; f <- fields)
      yield col(mapCol).getItem(k).getField(f).as(s"${k}_$f")
    df.select((df.columns.filterNot(_ == mapCol).map(col) ++ cols).toIndexedSeq: _*)
  }

  /** R4 — unpivot a fixed set of column groups to rows via `stack`.
    * `groups` maps a tag value (e.g. "young"/"old",
    * graph_sap_analysis.py:144-177) to the columns that become the row
    * payload. Generator — narrow, no shuffle.
    */
  def unpivotGroups(df: DataFrame, tagName: String, valueNames: Seq[String],
                    groups: Seq[(String, Seq[Column])], keep: Seq[String]): DataFrame = {
    val structs = groups.map { case (tag, cols) =>
      struct((lit(tag).as(tagName) +: cols.zip(valueNames).map { case (c, n) => c.as(n) }): _*)
    }
    df.withColumn("__g", explode(array(structs: _*)))
      .select((keep.map(col) :+ col("__g.*")).toIndexedSeq: _*)
  }

  /** R5 — explode an array-of-struct column into child rows, keeping
    * the parent key columns. */
  def explodeChildren(df: DataFrame, arrayCol: String, parentKeys: Seq[String]): DataFrame =
    df.select((parentKeys.map(col) :+ explode(col(arrayCol)).as("child")).toIndexedSeq: _*)
      .select((parentKeys.map(col) :+ col("child.*")).toIndexedSeq: _*)
}
