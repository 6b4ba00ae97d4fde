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

  /** Apply a change-data-capture feed onto a base snapshot: the
    * latest feed row per key (by `ordCols`, e.g. a sequence number or
    * commit timestamp) decides the key's fate — `deleteOp` removes
    * it, anything else replaces the full row; keys the feed never
    * touches pass through unchanged. This is the Delta/Iceberg
    * "apply CDF" semantics as a pure DataFrame transform.
    *
    * Feed schema: `keys` ++ base's non-key columns ++ `opCol` ++
    * `ordCols`. A delete-then-reinsert within one batch resolves by
    * `ordCols` order, not arrival order, so replayed/out-of-order
    * feeds converge to the same snapshot (idempotent by construction:
    * applying the same feed twice is a fixpoint).
    *
    * Determinism under tied sequence numbers: if two feed rows for a
    * key share the same `ordCols` value (duplicate change records —
    * real feeds produce them), the remaining feed columns break the
    * tie in schema order, so the winner is a pure function of the
    * DATA, never of partition layout. (Found live: the sf0.001
    * fixture carries duplicated PK rows whose composite sequence
    * collides; a bare max_by(seq) picked per-run winners while the
    * SQL oracle kept both rows.) Fully identical rows still "tie",
    * harmlessly — every candidate is the same row.
    *
    * Scale shape: ONE map-side-combining max_by aggregate collapses
    * the feed to its latest row per key (no window, no rank-1
    * filter); ONE anti equi-join on the key removes touched rows from
    * the base — the touched-key side is delta-sized, so AQE
    * broadcasts it in the common case and the base never shuffles;
    * the union appends the survivors. Compose with
    * [[overwritePartitions]] to land the result physically while
    * rewriting only touched partitions.
    */
  def applyCdc(base: DataFrame, feed: DataFrame, keys: Seq[String],
               opCol: String, ordCols: Seq[String],
               deleteOp: String = "D"): DataFrame = {
    val tiebreak = feed.columns
      .filterNot(c => keys.contains(c) || ordCols.contains(c)).map(col)
    val latest = dedupByKey(feed, keys, ordCols.map(col) ++ tiebreak)
    val touched = latest.select(keys.map(col): _*)
    val survivors = latest.filter(col(opCol) =!= deleteOp)
      .drop(opCol +: ordCols: _*)
    base.join(touched, keys, "left_anti").unionByName(survivors)
  }

  /** Partition-level MERGE: upsert `incoming` into the partitioned
    * parquet table at `targetPath`, rewriting ONLY the partitions
    * `incoming` touches — the reference's idempotent row-MERGE
    * (graph_weather_day.py:230-248) at lake granularity, and the op a
    * daily 100 TB ingest actually runs (the day's delta rewrites the
    * day's partitions; yesterday's terabytes are never read or
    * written).
    *
    * Mechanics:
    *  1. the touched-partition values are a tiny distinct set,
    *     broadcast into a semi-join against the existing table — at
    *     scan time Spark's dynamic partition pruning turns that into
    *     a partition filter, so untouched partitions are never READ;
    *  2. existing-touched ∪ incoming goes through [[merge]] (one hash
    *     aggregate keyed on `keys`);
    *  3. the merged rows land via dynamic partition overwrite
    *     (`partitionOverwriteMode=dynamic`), so untouched partitions
    *     are never WRITTEN. The merge result is staged to a temp
    *     sibling first because its lazy plan reads the live table
    *     (same no-self-overwrite discipline as
    *     [[graft.streaming.StreamingUpsert]]).
    *
    * Re-running with the same `incoming` is a fixpoint: MERGE is
    * idempotent by key and the same partitions are rewritten with the
    * same rows. `partitionCol` must be one of `keys` (a partition is a
    * horizontal slice of the key space; merging across partitions
    * would move rows between partitions and break the
    * rewrite-only-touched contract). `incoming` must be key-unique —
    * pre-collapse with [[dedupByKey]] when it isn't. Single-writer per
    * table, like every sink here (the stage sibling is keyed off
    * `targetPath`, so concurrent writers to the SAME table would race;
    * concurrent tables are fine). `partitionCol` values must be
    * non-null: a null never equi-joins, so existing rows in the
    * default partition would be replaced rather than merged — filter
    * or default the column upstream, or use
    * [[overwritePartitionsQuarantine]] to route null-key rows to a
    * side channel automatically.
    */
  def overwritePartitions(incoming: DataFrame, keys: Seq[String],
                          partitionCol: String, targetPath: String,
                          keepExistingNonNull: Boolean = false): Unit = {
    require(keys.contains(partitionCol),
      s"partitionCol $partitionCol must be one of the merge keys $keys")
    val spark = incoming.sparkSession
    import org.apache.hadoop.fs.Path
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(target)) {
        val touched = incoming.select(col(partitionCol)).distinct()
        val existingTouched = spark.read.parquet(targetPath)
          .join(broadcast(touched), Seq(partitionCol), "left_semi")
        merge(existingTouched, incoming, keys, keepExistingNonNull)
      } else incoming
    val stage = new Path(targetPath + ".merge-stage")
    merged.write.mode("overwrite").parquet(stage.toString)
    spark.read.parquet(stage.toString)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(targetPath)
    fs.delete(stage, true)
  }

  /** [[overwritePartitions]] with a null-key QUARANTINE instead of a
    * non-null precondition: rows whose `partitionCol` is null cannot
    * take part in a partition-level MERGE (a null never equi-joins,
    * and "the null partition" is not a rewritable slice), but at
    * ingest scale dropping them silently loses data and failing the
    * job loses the day. [[BadRecords]] discipline instead: null-key
    * rows are APPENDED to `quarantinePath` with a `__reason` column
    * (the [DBG] sample made queryable, reference
    * graph_weather_day.py:205-224), and the non-null remainder MERGEs
    * exactly as [[overwritePartitions]].
    *
    * The MERGE side keeps the fixpoint property (re-running the same
    * `incoming` rewrites the same partitions with the same rows); the
    * quarantine is an append-only LOG — re-ingesting the same bad rows
    * records them again, which is the audit trail you want, not a
    * defect. Dedup downstream if consuming the quarantine as a table.
    */
  def overwritePartitionsQuarantine(incoming: DataFrame, keys: Seq[String],
                                    partitionCol: String, targetPath: String,
                                    quarantinePath: String,
                                    keepExistingNonNull: Boolean = false): Unit = {
    incoming.filter(col(partitionCol).isNull)
      .withColumn("__reason", lit(s"null partition key: $partitionCol"))
      .write.mode("append").parquet(quarantinePath)
    overwritePartitions(incoming.filter(col(partitionCol).isNotNull),
      keys, partitionCol, targetPath, keepExistingNonNull)
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
