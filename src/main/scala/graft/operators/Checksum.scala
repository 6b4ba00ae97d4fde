package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table content checksums — the anti-entropy
  * primitive for 100 TB ingest (the reference trusts its uniqueness
  * constraints alone for integrity, graph_constraints.py:5-133; this
  * adds the content-level audit): fingerprint every row with the
  * replayable poly31 hash ([[graft.plans.TextExpressions.fingerprintFast]],
  * the same family the dedup oracles replay in SQL), then SUM the
  * fingerprints. Addition commutes, so the checksum is independent of
  * partitioning, task order, and engine — two sides of a migration
  * (or a source system and the lake copy) agree iff their canonical
  * row multisets agree (sum collisions are possible but need
  * coordinated multi-row tampering, not the random drift this guards
  * against).
  *
  * Scale: one codegen'd projection + a partial-aggregating global sum
  * — no shuffle wider than one row per partition. Callers must
  * canonicalize float columns to scaled integers (e.g.
  * `floor(x * 100)`) and timestamps to epoch integers before
  * concatenation: float-to-string formatting is NOT engine-portable,
  * integer strings are.
  */
object Checksum {

  /** One-row frame (tbl, n_rows, checksum) for `df` canonicalized to
    * `cols` (already-canonical expressions — integers, strings,
    * scaled integers). Rows are joined with '|' before hashing; pick
    * a separator that cannot occur in the data. NULL cells are
    * canonicalized to a sentinel ('␀') BEFORE concatenation —
    * `concat_ws` would otherwise silently skip them, making
    * (a, NULL, b) and (a, b, NULL) hash identical and breaking the
    * multiset-equality guarantee for nullable columns.
    */
  def tableChecksum(df: DataFrame, tbl: String, cols: Seq[Column]): DataFrame = {
    val rowStr = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("␀"))): _*)
    df.select(graft.plans.TextExpressions.fingerprintFast(rowStr).as("__fp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__fp")).as("checksum"))
      .select(lit(tbl).as("tbl"), col("n_rows"), col("checksum"))
  }
}
