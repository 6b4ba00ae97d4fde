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
}
