package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff (change-data-capture between two states of a
  * keyed table): full-outer compare of two one-row-per-key frames,
  * classifying every key as added / removed / changed and carrying
  * both sides' values. The reference's MERGE pipelines are idempotent
  * re-applies (SURVEY §2.1 S3, graph_weather_day.py:231-254); this is
  * the complementary audit — WHAT
  * changed between two runs, the primitive behind incremental
  * downstream refresh and ingest regression checks.
  *
  * Scale design: one hash shuffle per side on the key columns (and
  * none at all if both snapshots were produced by a keyed aggregate
  * like [[Upsert.dedupByKey]] in the same plan — the full-outer join
  * reuses their (key) partitioning). Unchanged keys — the
  * overwhelming majority between adjacent runs — are filtered
  * pre-output so the delta, not the corpus, flows downstream.
  */
object SnapshotDiff {

  /** Compare `oldSnap` and `newSnap` (each one row per `keys`) on
    * `cols`. Returns keys + `old_<c>`/`new_<c>` for each compared
    * column + `change` in ('added', 'removed', 'changed');
    * unchanged keys are dropped. Value comparison is null-safe
    * (null vs non-null = changed, null vs null = equal).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String], cols: Seq[String]): DataFrame = {
    val o = oldSnap.select(keys.map(col) ++
      cols.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__op"): _*)
    val n = newSnap.select(keys.map(col) ++
      cols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__np"): _*)
    // empty cols = key-presence-only CDC: nothing can be 'changed'
    val anyDiff = cols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .foldLeft(lit(false))(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(anyDiff, "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .drop("__op", "__np")
  }
}
