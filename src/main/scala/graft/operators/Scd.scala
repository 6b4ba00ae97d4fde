package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension Type 2 history: turn an append-only
  * change feed (key, ts, value) into versioned validity intervals
  * (key, value, valid_from, valid_to, is_current) — the lake-side
  * shape every point-in-time join / feature-store backfill reads.
  *
  * Reference capability: graph_db re-MERGEs the latest value onto the
  * node and loses history (app/graph_fields.py:14-30 overwrites
  * properties on every ingest); Type 2 is what its users would need
  * the moment "what was this field last March" is asked. Composes
  * with [[AsOfJoin]]: an as-of join against the change feed and an
  * equi-join against these intervals answer the same question; the
  * intervals answer it without re-sorting the feed every query.
  *
  * Scale design: everything is window functions over ONE hash
  * partition per key — a single shuffle of the change feed, no
  * self-join, no driver state. Consecutive-duplicate collapse and the
  * lead() that closes each interval reuse the same sort order, so
  * Catalyst plans one Exchange + one Sort for both Window operators.
  */
object Scd {

  /** Build the Type 2 history. `ord` orders each key's changes and
    * must end in a unique tiebreak (e.g. Seq(ts, eventId)) so the
    * collapse is deterministic. Rows whose value equals the previous
    * value in `ord` order are dropped (no-op updates); each surviving
    * row opens an interval at its `ts` that closes at the next
    * surviving row's `ts` (null = still current).
    */
  def type2(changes: DataFrame, key: Column, value: Column, ts: Column,
            ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val collapsed = changes
      .withColumn("__prev", lag(value, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= value)
      .drop("__prev")
    val w2 = Window.partitionBy(key).orderBy(ord: _*)
    collapsed
      .select(key.as("key"), value.as("value"), ts.as("valid_from"),
        lead(ts, 1).over(w2).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** POINT-IN-TIME join: enrich each fact row with the dimension
    * version that was valid at the fact's own time — the lakehouse
    * idiom every feature-store backfill and "report as the world
    * looked then" query runs against a [[type2]] history. The
    * interval predicate is half-open (`valid_from <= t < valid_to`,
    * null `valid_to` = still open), so facts at a version boundary
    * land in exactly one version and no fact double-matches. Facts
    * before the key's first version (or with no dim key) keep their
    * row with null dim columns — a left join, because silently
    * dropping early facts is the classic PIT bug.
    *
    * Scale design: this is an EQUI-join on the key with the interval
    * filter as a residual join condition — never a range cross-join.
    * A Type-2 dimension has few versions per key (bounded by change
    * frequency, not table size), so the per-key match work is O(
    * versions) and the only shuffle is the fact table's hash on the
    * key; AQE broadcasts the dimension when it fits. Differs from
    * [[AsOfJoin]] (sort-based nearest over a point feed) in
    * consuming the materialized interval table — no re-sort of the
    * change history per query.
    *
    * `dim` must carry `key`, `value`, `valid_from`, `valid_to`
    * (the [[type2]] output shape); fact columns pass through, the
    * dim value lands as `pit_value` with its `valid_from` as
    * `pit_from`.
    */
  def pitJoin(fact: DataFrame, factKey: Column, factTime: Column,
              dim: DataFrame): DataFrame = {
    val d = dim.select(col("key").as("__pk"), col("value").as("pit_value"),
      col("valid_from").as("pit_from"), col("valid_to").as("__pto"))
    fact.join(d,
        factKey === col("__pk") && factTime >= col("pit_from") &&
          (col("__pto").isNull || factTime < col("__pto")),
        "left")
      .drop("__pk", "__pto")
  }

  /** SORT-BASED point-in-time join — the HOT-KEY-SAFE form of
    * [[pitJoin]]. The equi-join form's per-key cost is
    * facts × versions (the round-7 skew soak measured 3.9× on a 5%
    * hot user — quadratic in the key's mass); this form never joins
    * at all: dim openings and facts UNION into one stream, ONE sort
    * per key on (time, dim-first), and a last-non-null window carries
    * the newest version forward onto each fact — per-key cost
    * (f+v)·log(f+v), hot keys included. Same output contract as
    * [[pitJoin]] (fact columns + pit_value + pit_from, facts before
    * the first version keep nulls).
    *
    * PRECONDITION: `dim` must be a [[type2]] history — per-key
    * validity intervals CONTIGUOUS (each valid_to = the next
    * valid_from) — which makes the explicit valid_to check
    * redundant: the newest version with valid_from <= t is by
    * construction the one covering t (a fact at a boundary sorts
    * after the opening dim row and picks the newer version, matching
    * pitJoin's half-open interval). PitJoinEquivalenceSpec pins the
    * two forms row-equal on seeded random histories.
    */
  def pitJoinSorted(fact: DataFrame, factKey: Column, factTime: Column,
                    dim: DataFrame): DataFrame = {
    val factCols = fact.columns
    val reserved = Seq("__k", "__t", "__isdim", "__pv", "__cur")
    require(!factCols.exists(reserved.contains),
      s"pitJoinSorted reserves ${reserved.mkString(", ")}")
    val dimRows = dim.select(col("key").as("__k"),
      col("valid_from").as("__t"), lit(1).as("__isdim"),
      struct(col("value").as("pit_value"),
        col("valid_from").as("pit_from")).as("__pv"))
    val factRows = fact.select(
      factKey.as("__k") +: factTime.as("__t") +: lit(0).as("__isdim") +:
        lit(null).cast(dimRows.schema("__pv").dataType).as("__pv") +:
        factCols.map(c => fact(c)).toIndexedSeq: _*)
    val dimPadded = dimRows.select(
      col("__k") +: col("__t") +: col("__isdim") +: col("__pv") +:
        factCols.map(c =>
          lit(null).cast(fact.schema(c).dataType).as(c)).toIndexedSeq: _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isdim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factRows.unionByName(dimPadded)
      .withColumn("__cur", last(col("__pv"), ignoreNulls = true).over(w))
      .filter(col("__isdim") === 0)
      .select(factCols.map(col) :+
        col("__cur.pit_value").as("pit_value") :+
        col("__cur.pit_from").as("pit_from"): _*)
  }
}
