package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact distributed percentiles via value-frequency compression.
  *
  * A naive exact percentile sorts every row of a group on one
  * reducer — the group IS the bottleneck at 100 TB. But measurement
  * columns (quantities, grades, sensor readings — the reference's
  * lab values are a handful of assay levels) have value cardinality
  * orders of magnitude below row count (the reference's SAP element
  * values are per-element assay readings — graph_sap_element_result.py:127-131
  * — exactly this shape), so the scalable exact plan is:
  * aggregate to (group, value, count) — a map-side-combining shuffle
  * that compresses 10^12 rows to |group|x|distinct values| — then
  * cumulative-sum the tiny frequency table and pick the target rank.
  * The expensive pass is a plain hash aggregate; only the compressed
  * table ever meets a window.
  */
object Percentiles {

  /** Discrete (type-1 / nearest-rank) percentiles per group: for each
    * percentile `p` (basis points, 0..10000), the smallest value whose
    * cumulative frequency reaches `ceil(p/10000 * n)` — the same
    * element `percentile_disc` / DuckDB `quantile_disc` selects, but
    * computed from the frequency table so no full-group sort exists
    * anywhere in the plan. The rank arithmetic is pure integer
    * (`(p*n + 9999) div 10000`), so it replays bit-for-bit in any
    * engine. Returns (group, pct_bp, value).
    */
  /** The shared (group, value, count) frequency table with cumulative
    * and total counts — the ONLY pass over raw rows in both quantile
    * flavors. */
  private def freqTable(df: DataFrame, group: Column, value: Column): DataFrame = {
    // Null measurements are excluded up front: Spark windows sort NULLS
    // FIRST while DuckDB's ASC default is NULLS LAST, so a (g, NULL)
    // frequency row would shift every cumulative count differently in
    // the two engines. Percentiles over no values are undefined anyway.
    val freq = df.where(value.isNotNull)
      .groupBy(group.as("g"), value.as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("g"))
    freq
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
  }

  def quantilesDisc(df: DataFrame, group: Column, value: Column,
                    pctsBp: Seq[Int]): DataFrame = {
    require(pctsBp.nonEmpty && pctsBp.forall(p => p > 0 && p <= 10000),
      "percentiles must be basis points in (0, 10000]")
    freqTable(df, group, value)
      .withColumn("pct_bp", explode(typedLit(pctsBp)))
      // smallest v with cum >= ceil(pct/10000 * tot), in exact ints
      .filter(col("cum") >= expr("(cast(pct_bp as bigint) * tot + 9999) div 10000"))
      .groupBy(col("g"), col("pct_bp"))
      .agg(min(col("v")).as("value"))
  }

  /** Continuous (linearly interpolated, `percentile_cont`-style)
    * percentiles from the same frequency table. The interpolation
    * position `h = (n-1) * p` is carried as the exact integer
    * `h * 10000` (`p` arrives in basis points), so the lower/upper
    * neighbor ranks and the fractional weight replay bit-for-bit; the
    * final `a + (m/10000) * (b - a)` is the one float expression, and
    * it is written identically in the SQL oracle so both engines round
    * the same way. Same scale shape as [[quantilesDisc]]: the fact
    * table only ever meets a hash aggregate.
    */
  def quantilesCont(df: DataFrame, group: Column, value: Column,
                    pctsBp: Seq[Int]): DataFrame = {
    require(pctsBp.nonEmpty && pctsBp.forall(p => p >= 0 && p <= 10000),
      "percentiles must be basis points in [0, 10000]")
    freqTable(df, group, value.cast("double"))
      .withColumn("pct_bp", explode(typedLit(pctsBp)))
      .withColumn("h10k", expr("cast(pct_bp as bigint) * (tot - 1)"))
      .withColumn("r1", expr("h10k div 10000 + 1"))
      .withColumn("r2", least(expr("h10k div 10000 + 2"), col("tot")))
      .groupBy(col("g"), col("pct_bp"))
      .agg(min(when(col("cum") >= col("r1"), col("v"))).as("a"),
        min(when(col("cum") >= col("r2"), col("v"))).as("b"),
        max(expr("h10k % 10000")).as("m"))
      .withColumn("value",
        col("a") + (col("m") / lit(10000.0)) * (col("b") - col("a")))
      .drop("a", "b", "m")
  }
}
