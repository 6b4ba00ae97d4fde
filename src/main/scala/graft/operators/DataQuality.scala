package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the Deequ/
  * Great-Expectations shape): a set of named checks — completeness,
  * key uniqueness, bounds, domain membership — evaluated in ONE pass
  * over the table, emitted as a (check, observed, expected, passed)
  * report the pipeline gate can act on.
  *
  * The reference enforces its integrity contract as per-table
  * constraints + orphan probes (schema DDL; the s6_* family here);
  * this operator is the batch-audit generalization: the SAME
  * invariants as data, computed without mutating anything.
  *
  * Scale design: every check lowers to an aggregate expression over
  * one scan — a single partial+final HashAggregate, no joins, no
  * windows. Key-uniqueness uses count(distinct struct) which Spark
  * plans as one Expand + two-level aggregate in the same job. The
  * report explodes from the single 1-row aggregate, so the output
  * stage is constant-size regardless of table size.
  */
object DataQuality {

  /** A named expectation: `observed` is an integer aggregate over the
    * table; the check passes when `pass(observed)` holds. `expected`
    * is the reported reference value.
    */
  final case class Check(name: String, observed: Column,
                         expected: Long, pass: Column => Column)

  /** count of rows where `c` is null */
  def nullCount(c: Column): Column =
    sum(when(c.isNull, 1L).otherwise(0L))

  /** count of rows violating predicate `ok` (nulls count as violations) */
  def violations(ok: Column): Column =
    sum(when(ok, 0L).otherwise(1L))

  /** Duplicate count of a composite key: rows − distinct keys. The
    * struct wrap makes an all-null key its own distinct bucket
    * (struct(null) is non-null — SQL row-value semantics), so null
    * keys don't inflate the dup count; pair with [[nullCount]] for
    * the completeness half of a PK check.
    */
  def dupCount(keys: Column*): Column =
    count(lit(1)) - count_distinct(struct(keys: _*))

  /** Evaluate all checks in one aggregate pass; returns one row per
    * check: (check, observed, expected, passed).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(
      checks.head.observed.cast("long").as(s"o_${checks.head.name}"),
      checks.tail.map(c => c.observed.cast("long").as(s"o_${c.name}")): _*)
    val rows = array(checks.map { c =>
      struct(
        lit(c.name).as("check"),
        col(s"o_${c.name}").as("observed"),
        lit(c.expected).as("expected"),
        c.pass(col(s"o_${c.name}")).as("passed"))
    }: _*)
    agg.select(explode(rows).as("r")).select(col("r.*"))
  }

  /** CATEGORICAL-DISTRIBUTION DRIFT between a reference slice and a
    * current slice — Pearson's chi-square statistic, the standard
    * "did the category mix shift between yesterday's snapshot and
    * today's" monitor a 100 TB ingest runs per partition. For each
    * category with reference count o_a and current count o_b (totals
    * t_a, t_b), the expected current count is e = o_a·t_b/t_a and
    * the chi-square term (o_b − e)²/e rewrites to the EXACT RATIONAL
    *   chi2_num = (o_b·t_a − o_a·t_b)²,   chi2_den = o_a·t_b·t_a
    * emitted as decimal(38,0) pairs per category (the
    * ts_trend_slope no-division convention; d² wraps int64 already
    * near |d| ≈ 3·10⁹, i.e. two ~50k-row slices of a billion-row
    * table). Σ num/den over categories is the statistic. Categories
    * present in only one slice are emitted with the zero count —
    * o_a = 0 makes the term undefined (den 0), which is exactly the
    * signal "a brand-new category appeared"; the monitor sees it as
    * a row, not a silent drop.
    *
    * One scan, one (category, side) count aggregate, a pivot to the
    * two columns, a 1-row totals broadcast — no window, no join of
    * the raw rows.
    */
  def chi2Drift(df: DataFrame, category: Column, isCurrent: Column): DataFrame =
    chi2FromCounts(df
      .groupBy(category.as("category"))
      .agg(
        sum(when(isCurrent, 0L).otherwise(1L)).as("n_ref"),
        sum(when(isCurrent, 1L).otherwise(0L)).as("n_cur")))

  /** The rational tail of [[chi2Drift]], factored out so an
    * incrementally-maintained counts table (e.g. the streaming
    * twin's state) feeds the same exact arithmetic. `counts` must
    * carry (category, n_ref, n_cur) with long counts.
    */
  def chi2FromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.agg(
      sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    counts.crossJoin(broadcast(totals))
      .withColumn("__d",
        (d(col("n_cur")) * col("t_ref") - d(col("n_ref")) * col("t_cur"))
          .cast("decimal(38,0)"))
      .select(col("category"), col("n_ref"), col("n_cur"),
        // rational pair ships as canonical integer strings: exact at
        // int128 range and hash-portable (wide DECIMAL is not)
        (col("__d") * col("__d")).cast("decimal(38,0)")
          .cast("string").as("chi2_num"),
        (d(col("n_ref")) * col("t_cur") * col("t_ref"))
          .cast("decimal(38,0)").cast("string").as("chi2_den"))
  }
}
