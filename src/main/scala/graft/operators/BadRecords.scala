package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error containment as dataflow — SURVEY §4.1: the reference wraps
  * every row in try/except, skips failures, and prints [DBG] samples
  * (e.g. /root/reference/app/graph_weather_day.py:205-224,
  * graph_soil_layer.py:264-268). Row-at-a-time exception handling does
  * not exist in a vectorized engine; the equivalent is total parse
  * functions (the F-series returns null instead of throwing) plus a
  * set-wise split: rows whose parse failed go to a bad-record side
  * channel instead of silently vanishing into nulls.
  *
  * One projection, two filters on it — Catalyst computes the parse
  * expressions once per consumed branch and both branches stay inside
  * whole-stage codegen; no exception unwinding in the hot path.
  */
object BadRecords {

  /** Split `df` by parse success. `parses` maps an output column name
    * to (raw input column, total parse expression). A row is BAD when
    * any parse came back null for a non-null raw input (a null raw is
    * legitimately-missing data, not a parse failure).
    *
    * Returns (good, bad): good carries the parsed columns, bad the
    * original rows plus `__failed` — the names of the parses that
    * failed, the [DBG] sample made queryable.
    */
  def partition(df: DataFrame,
                parses: Map[String, (String, Column)]): (DataFrame, DataFrame) = {
    val withParsed = parses.foldLeft(df) { case (d, (out, (_, e))) =>
      d.withColumn(out, e)
    }
    val failureOf: Map[String, Column] = parses.map { case (out, (raw, _)) =>
      out -> (col(out).isNull && col(raw).isNotNull)
    }
    val anyFailed = failureOf.values.reduce(_ || _)
    val good = withParsed.filter(!anyFailed)
    val bad = withParsed.filter(anyFailed)
      .withColumn("__failed", array_compact(array(
        failureOf.toSeq.sortBy(_._1).map { case (out, failed) =>
          when(failed, lit(out))
        }: _*)))
      .drop(parses.keys.toSeq: _*)
    (good, bad)
  }
}
