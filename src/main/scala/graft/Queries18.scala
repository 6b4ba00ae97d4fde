package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.DataQuality
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 18: data-quality expectation suite, co-purchase bipartite
  * projection, cumulative new-entity curve, corpus bigram counts.
  */
object Queries18 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Deequ-style expectation report over lineitem: completeness, PK
    * uniqueness, bounds, domain membership, positivity — ONE scan,
    * one aggregate, report rows exploded from it. The oracle computes
    * the same counters and the same pass logic.
    */
  val dq_expectations = Q(
    (s, dir) => {
      import DataQuality._
      val checks = Seq(
        Check("rows_nonempty", count(lit(1)), 1L, _ >= 1L),
        Check("shipdate_complete", nullCount(col("l_shipdate")), 0L, _ === 0L),
        Check("pk_unique", dupCount(col("l_orderkey"), col("l_linenumber")),
          0L, _ === 0L),
        Check("quantity_min_ge_1",
          violations(col("l_quantity") >= 1.0), 0L, _ === 0L),
        Check("quantity_max_le_50",
          violations(col("l_quantity") <= 50.0), 0L, _ === 0L),
        Check("returnflag_domain",
          violations(col("l_returnflag").isin("R", "A", "N")), 0L, _ === 0L),
        Check("price_positive",
          violations(col("l_extendedprice") > 0.0), 0L, _ === 0L))
      DataQuality.report(T_(s, dir, "lineitem"), checks)
    },
    Some("""WITH a AS (SELECT
          count(*) AS n,
          CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ship,
          count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dups,
          CAST(SUM(CASE WHEN l_quantity >= 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS v_qmin,
          CAST(SUM(CASE WHEN l_quantity <= 50.0 THEN 0 ELSE 1 END) AS BIGINT) AS v_qmax,
          CAST(SUM(CASE WHEN l_returnflag IN ('R','A','N') THEN 0 ELSE 1 END) AS BIGINT) AS v_flag,
          CAST(SUM(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price
        FROM lineitem)
      SELECT 'rows_nonempty' AS "check", n AS observed, CAST(1 AS BIGINT) AS expected, n >= 1 AS passed FROM a
      UNION ALL SELECT 'shipdate_complete', nulls_ship, 0, nulls_ship = 0 FROM a
      UNION ALL SELECT 'pk_unique', dups, 0, dups = 0 FROM a
      UNION ALL SELECT 'quantity_min_ge_1', v_qmin, 0, v_qmin = 0 FROM a
      UNION ALL SELECT 'quantity_max_le_50', v_qmax, 0, v_qmax = 0 FROM a
      UNION ALL SELECT 'returnflag_domain', v_flag, 0, v_flag = 0 FROM a
      UNION ALL SELECT 'price_positive', v_price, 0, v_price = 0 FROM a"""))

  /** Bipartite co-purchase projection: parts that ship together in
    * the same order, weighted by co-occurrence, top 100. The order-
    * local self-join fans out quadratically in ORDER SIZE (TPC-H
    * bounds it at 7 lines — at 100 TB the cap is the per-entity line
    * count, not the table size) and the pair aggregate map-side
    * combines; the ranking is a TakeOrdered merge, no global sort.
    */
  val g_copurchase = Q(
    (s, dir) => {
      val l = T_(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = l.as("a").join(l.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("p1"), col("b.pk").as("p2"))
      pairs.groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
        .orderBy(col("w").desc, col("p1").asc, col("p2").asc)
        .limit(100)
    },
    Some("""SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS w
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      ORDER BY w DESC, p1 ASC, p2 ASC LIMIT 100"""))

  /** Cumulative new-user curve: each user's first active day, daily
    * new-user counts, and the running total — the growth-accounting
    * shape. The running sum is a window over the per-DAY aggregate
    * (≤ a few thousand rows at any corpus size), never over raw
    * events, so the unpartitioned frame is a deliberate single-task
    * tail on a constant-size input.
    */
  val w_cum_new_users = Q(
    (s, dir) => {
      val firstDay = T_(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = firstDay.groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_users", sum(col("new_users")).over(w))
        .select(col("day"), col("new_users"), col("cum_users"))
    },
    Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
          FROM events GROUP BY 1),
        d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT day, new_users,
        CAST(SUM(new_users) OVER (ORDER BY day ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      FROM d"""))

  private val tokensSqlD =
    """string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""

  /** Corpus bigram counts, top 100: the n-gram LM count table at
    * n = 2. The bigram explode is scan-local (array HOF over the
    * token array — no per-token shuffle) and the count map-side
    * combines; ranking is a TakeOrdered merge.
    */
  val txt_bigram_topk = Q(
    (s, dir) => {
      val toks = split(T.normText(col("text")), " ")
      val bigrams = when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))
      // the corpus parquet compresses ~100:1, so BYTES give the scan
      // one partition while the per-row token work is the real cost
      // (measured 9.6 s in a single task at sf0.1) — widen explicitly;
      // the round-robin shuffle moves only the raw text once and is
      // noise next to the bigram build it parallelizes
      T_(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
        .select(explode(bigrams).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(100)
    },
    Some(s"""WITH tk AS (SELECT doc_id, $tokensSqlD AS ws FROM documents),
        bg AS (SELECT unnest(list_transform(range(len(ws) - 1),
            i -> ws[i + 1] || ' ' || ws[i + 2])) AS bigram FROM tk)
      SELECT bigram, count(*) AS n FROM bg GROUP BY 1
      ORDER BY n DESC, bigram ASC LIMIT 100"""))

  val all: Map[String, Q] = Map(
    "dq_expectations" -> dq_expectations,
    "g_copurchase" -> g_copurchase,
    "w_cum_new_users" -> w_cum_new_users,
    "txt_bigram_topk" -> txt_bigram_topk,
  )
}
