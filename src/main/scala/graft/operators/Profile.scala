package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: the ANALYZE-style statistics sweep a lake ingest
  * runs per table — row/null/distinct counts and value range per
  * column, the inputs to data-quality gates (null-rate regressions,
  * cardinality drift) and to cost-based planning. Extends the
  * reference's table-level telemetry counters (SURVEY §2.4 A13,
  * main_graph_topraq.py counters) to column granularity.
  *
  * Shape: one narrow aggregate per column, unioned — each branch scans
  * ONLY its column (parquet column pruning), so profiling k columns
  * costs k pruned scans that schedule in parallel, never a wide scan
  * of the table. Exact distinct counts (oracle-replayable); swap
  * `approx_count_distinct` in when 2% error is acceptable and the
  * corpus is 100 TB — the frame shape is identical.
  */
object Profile {

  /** Profile `cols` of `df`: (column, n_rows, n_nonnull, n_distinct,
    * min_s, max_s) — min/max stringified so heterogeneous column types
    * share one schema.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.unionByName(_))
  }
}
