package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-semantics layer (SURVEY §2.1 S3/S4/S6).
  *
  * The reference upserts every node row-at-a-time with Cypher
  * `MERGE ... SET` under per-label uniqueness constraints
  * (/root/reference/app/graph_constraints.py:2-133, e.g.
  * graph_fields.py:14-30). Re-expressed set-wise: an upsert is a
  * key-deduplicated union where the newest non-null wins, and a
  * constraint is an assertion `count == countDistinct(keys)`.
  *
  * All three merges below are single-shuffle (one hash aggregate or one
  * window over the key) and scale linearly; at cluster scale the same
  * operators back a Delta/Iceberg `MERGE INTO` writer.
  */
object Upsert {

  /** Deduplicate by key, deterministically: for colliding keys keep the
    * row that sorts last by `orderBy` (newest wins — MERGE/SET parity).
    * An argmax aggregate, not a rank-1 window: the partial max_by
    * collapses colliding keys map-side, so the one shuffle on `keys`
    * carries surviving rows only (the window form sort-shuffled every
    * input row). Lexicographic max of the ordering struct ==
    * (desc, desc, ...) rank order, nulls losing on both forms.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val best = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col).toIndexedSeq: _*),
        struct(orderBy: _*)).as("__best"))
    val outCols = df.columns.map { c =>
      if (keys.contains(c)) col(c) else col("__best").getField(c).as(c)
    }
    best.select(outCols.toIndexedSeq: _*)
  }

  /** Upsert `incoming` into `existing` on `keys`: incoming rows replace
    * existing rows with the same key; per non-key column the incoming
    * value wins unless null (Cypher `SET n.x = $x` with COALESCE
    * keep-existing, reference graph_fertilizer_product.py:211-219).
    *
    * `keepExistingNonNull = false` gives plain last-write-wins
    * (`SET n += props`).
    */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            keepExistingNonNull: Boolean = true): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)), allowMissingColumns = true)
    val valueCols = tagged.columns.filterNot(c => keys.contains(c) || c == "__src")
    // one hash aggregate (partial map-side) instead of a full-frame
    // window + rank-1 filter: per column, "incoming non-null wins,
    // else existing" is max_by over (is-non-null, source) — or plain
    // max_by over source for last-write-wins.
    val aggs = valueCols.map { c =>
      if (keepExistingNonNull)
        max_by(col(c), struct(col(c).isNotNull.cast("int").as("nn"),
          col("__src").as("s"))).as(c)
      else
        max_by(col(c), col("__src")).as(c)
    }
    tagged.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** S6 — uniqueness constraint as an assertion. Returns the duplicate
    * keys (empty = constraint holds). Aggregate-only, no collect.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Referential-integrity check (SURVEY §5.4): child rows whose FK has
    * no parent. Left-anti join — broadcastable when the parent is a dim.
    */
  def orphans(child: DataFrame, parent: DataFrame, fk: Seq[(String, String)]): DataFrame = {
    val cond = fk.map { case (c, p) => child(c) <=> parent(p) }.reduce(_ && _)
    child.join(parent, cond, "left_anti")
  }
}
