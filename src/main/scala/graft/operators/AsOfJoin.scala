package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Nearest-timestamp (as-of) join — SURVEY §2.3 J5, the one nontrivial
  * join the reference owns: among candidate rows sharing an equi-key,
  * pick the one whose timestamp minimizes |left.ts - right.ts|, with a
  * deterministic tiebreak (/root/reference/app/
  * graph_product_application.py:179-216).
  *
  * Implementation: equi-join on the group key, then a window rank over
  * the absolute time difference. One shuffle for the join + one for the
  * window, both partitioned by the same keys, so Catalyst reuses the
  * exchange. For skewed keys AQE's skew-join splitting applies to the
  * equi-join stage.
  *
  * This is deliberately NOT a custom SparkPlan: the candidate sets per
  * key are bounded (events per (field,day,crop,type)), so the
  * join+window form is both simpler and AQE-optimizable. A sort-merge
  * `ASOF` physical operator only pays off when the right side is a
  * huge ordered stream per key.
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
    val w = Window.partitionBy(col("__lid"))
      .orderBy((col("__diff").asc_nulls_last +: tiebreak.map(col(_).asc)): _*)
    val best = joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // A surviving candidate that failed direction/tolerance is "no
    // match": null out the right-side payload instead of dropping the
    // left row (left-join semantics).
    val rightPayload = right.columns.filterNot(keys.contains).toSet
    val projected = best.columns.filterNot(Set("__rn", "__diff", "__lid")).map { c =>
      if (rightPayload.contains(c)) when(col("__diff").isNotNull, col(c)).as(c)
      else col(c)
    }
    best.select(projected.toIndexedSeq: _*)
  }
}
