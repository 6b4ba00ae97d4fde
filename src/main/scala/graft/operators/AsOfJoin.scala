package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-timestamp (as-of) join — SURVEY §2.3 J5, the one nontrivial
  * join the reference owns: among candidate rows sharing an equi-key,
  * pick the one whose timestamp minimizes |left.ts - right.ts|, with a
  * deterministic tiebreak (/root/reference/app/
  * graph_product_application.py:179-216).
  *
  * Implementation: equi-join on the group key, then a `min_by`
  * argmin aggregate keyed by a per-left-row id. The join task emits
  * each left row's candidates contiguously, so the partial aggregate
  * collapses them map-side and the one post-join shuffle carries a
  * single row per LEFT row — a window rank over the candidates would
  * shuffle every candidate pair. For skewed keys AQE's skew-join
  * splitting applies to the equi-join stage.
  *
  * This is deliberately NOT a custom SparkPlan: the candidate sets per
  * key are bounded (events per (field,day,crop,type)), so the
  * join+aggregate form is both simpler and AQE-optimizable. A
  * sort-merge `ASOF` physical operator only pays off when the right
  * side is a huge ordered stream per key.
  */
object AsOfJoin {

  /** For every left row, attach the single right row sharing `keys`
    * whose `rightTs` is nearest `leftTs`. Direction: "nearest",
    * "backward" (right.ts <= left.ts), or "forward". Left rows with no
    * candidate are kept (left join) with nulls.
    *
    * @param tiebreak extra deterministic ordering after the time
    *        difference (the reference uses the event idx, O2/O3).
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              direction: String = "nearest",
              tolerance: Option[Long] = None,
              tiebreak: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val diff = abs(unix_timestamp(col(leftTs)) - unix_timestamp(col(rightTs)))
    val dirFilter: Column = direction match {
      case "backward" => unix_timestamp(col(rightTs)) <= unix_timestamp(col(leftTs))
      case "forward"  => unix_timestamp(col(rightTs)) >= unix_timestamp(col(leftTs))
      case _          => lit(true)
    }
    val tolFilter = tolerance.map(t => diff <= t).getOrElse(lit(true))
    val joined = l.join(right, keys, "left")
      .withColumn("__diff", when(dirFilter && tolFilter, diff))
    // argmin per left row: order by (diff nulls-last, tiebreaks) as a
    // struct — coalescing a null diff to Long.MaxValue reproduces
    // asc_nulls_last, and struct field comparison gives the tiebreaks
    // the same asc-nulls-first order the window form used
    val ordKey = struct(
      (coalesce(col("__diff"), lit(Long.MaxValue)).as("__d") +:
        tiebreak.zipWithIndex.map { case (t, i) => col(t).as(s"__t$i") }): _*)
    val rightPayload = right.columns.filterNot(keys.contains)
    val carried = struct((rightPayload :+ "__diff").map(col).toIndexedSeq: _*)
    // left columns are constant per __lid, carried with first(); the
    // right payload rides inside the min_by value struct (min_by, not
    // a struct min, so non-orderable payload types like maps are fine)
    val leftCols = joined.columns.filterNot(c =>
      rightPayload.contains(c) || c == "__lid" || c == "__diff")
    val aggs = leftCols.map(c => first(col(c)).as(c)) :+
      min_by(carried, ordKey).as("__best")
    val best = joined.groupBy(col("__lid"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    // A surviving candidate that failed direction/tolerance is "no
    // match": null out the right-side payload instead of dropping the
    // left row (left-join semantics).
    val projected = leftCols.map(col) ++ rightPayload.map { c =>
      when(col("__best").getField("__diff").isNotNull,
        col("__best").getField(c)).as(c)
    }
    best.select(projected.toIndexedSeq: _*)
  }
}
