package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (point-in-range) join — the scale-safe form of the
  * reference's event-window enrichment (readings inside an irrigation
  * event's [start, end], /root/reference/app/
  * graph_irrigation_event.py:119-152, which fetches per-event with a
  * pushed-down time window — an N+1 the engine turns into one join).
  *
  * A naive `points.join(intervals, ts BETWEEN start AND end)` has no
  * equi-key, so Spark plans a broadcast-nested-loop / cartesian product
  * — O(|points| × |intervals|), unusable at scale. Here each interval
  * is exploded into the time buckets it covers and each point falls in
  * exactly one bucket, turning the range predicate into an equi-join on
  * (keys, bucket) + a residual filter. Work is
  * O(points + intervals × span/bucket), one shuffled hash join, and
  * AQE skew splitting applies to hot buckets.
  *
  * Pick `bucketSeconds` near the typical interval span: each interval
  * then lands in ≤2 buckets while bucket populations stay small.
  * A point matches a covering interval exactly once (its bucket is
  * unique), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` (sharing `keys`)
    * whose [startCol, endCol] contains `pointTs`. Both bounds
    * inclusive. Column names other than `keys` must not collide.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   pointTs: String, startCol: String, endCol: String,
                   bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointTs)) / bucketSeconds))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(unix_timestamp(col(startCol)) / bucketSeconds),
                       floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(i, keys :+ "__bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }
}
