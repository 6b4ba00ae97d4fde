package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Queries.Q

/** Batch 45 (round 7): the Pareto-frontier window rewrite, a
  * one-table engine quality report composed from the audit family,
  * and cross-table freshness monitoring.
  */
object Queries45 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // 2-D Pareto frontier (skyline) as a cummax window
  // ===========================================================

  /** PARETO FRONTIER per priority — the cheapest-price /
    * freshest-date skyline: an order point survives iff nothing
    * strictly cheaper is at least as recent. The naive skyline is an
    * O(n²) dominance self-join; the 2-D rewrite is: collapse to one
    * row per price (max date + count — the value-frequency
    * compression), then ONE cummax window along ascending price —
    * frontier rows are exactly those whose best date strictly beats
    * the running max of every cheaper tier. Ties inside a price
    * collapse first, so no frame-peer (RANGE vs ROWS) divergence
    * exists by construction.
    */
  val w_pareto_frontier = Q(
    (s, dir) => {
      val tiers = T_(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)")
            .as("cents"))
        .agg(max(to_date(col("o_orderdate"))).as("best_date"),
          count(lit(1)).as("n_orders"))
      val w = Window.partitionBy(col("pri")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      tiers
        .withColumn("prev_best", max(col("best_date")).over(w))
        .filter(col("prev_best").isNull || col("best_date") > col("prev_best"))
        .select(col("pri"), col("cents"), col("best_date"), col("n_orders"))
        .orderBy(col("pri"), col("cents"))
    },
    Some("""WITH tiers AS (SELECT o_orderpriority AS pri,
            CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT) AS cents,
            max(CAST(o_orderdate AS DATE)) AS best_date,
            count(*) AS n_orders
          FROM orders GROUP BY 1, 2),
        wmax AS (SELECT pri, cents, best_date, n_orders,
            max(best_date) OVER (PARTITION BY pri ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
          FROM tiers)
      SELECT pri, cents, best_date, n_orders
      FROM wmax WHERE prev_best IS NULL OR best_date > prev_best
      ORDER BY pri, cents"""))

  // ===========================================================
  // Engine quality report (audit-family roll-up)
  // ===========================================================

  /** ENGINE QUALITY REPORT: the audit family rolled into one
    * (metric, value) table — the page an operator of this engine
    * reads before trusting the approximate components: IVF recall
    * (min and corpus-weighted average over the probe set), the
    * refinement round's gain, and language-ID accuracy. Each metric
    * aggregates the SAME audit queries the catalog already verifies
    * row-by-row, so this report cannot drift from them.
    */
  val pipeline_quality_report = Q(
    (s, dir) => {
      val ivf = Queries35.vec_ivf_recall.fn(s, dir)
        .agg(min(col("recall_bp")).as("mn"),
          expr("10000L * sum(n_found) div sum(n_true)").as("avg"))
        .select(explode(map(
          lit("ann_ivf_recall_min_bp"), col("mn"),
          lit("ann_ivf_recall_avg_bp"), col("avg"))).as(Seq("metric", "value")))
      val refine = Queries43.vec_ann_refine.fn(s, dir)
        .agg(expr("10000L * sum(refined_found) div sum(n_true)").as("r"),
          expr("10000L * sum(base_found) div sum(n_true)").as("b"))
        .select(explode(map(
          lit("ann_refine_recall_bp"), col("r"),
          lit("ann_refine_gain_bp"), col("r") - col("b"))).as(Seq("metric", "value")))
      val lang = Queries35.txt_lang_confusion.fn(s, dir)
        .agg(expr("10000L * sum(CASE WHEN lang_label = lang_guess THEN n ELSE 0 END) div sum(n)")
          .as("acc"))
        .select(lit("langid_accuracy_bp").as("metric"), col("acc").as("value"))
      ivf.unionByName(refine).unionByName(lang).orderBy(col("metric"))
    },
    Some(s"""WITH ivf AS (SELECT * FROM (${Queries35.vec_ivf_recall.oracle.get})),
        refine AS (SELECT * FROM (${Queries43.vec_ann_refine.oracle.get})),
        lang AS (SELECT * FROM (${Queries35.txt_lang_confusion.oracle.get}))
      SELECT metric, value FROM (
        SELECT 'ann_ivf_recall_min_bp' AS metric,
          CAST(min(recall_bp) AS BIGINT) AS value FROM ivf
        UNION ALL
        SELECT 'ann_ivf_recall_avg_bp',
          10000 * CAST(SUM(n_found) AS BIGINT) // CAST(SUM(n_true) AS BIGINT)
          FROM ivf
        UNION ALL
        SELECT 'ann_refine_recall_bp',
          10000 * CAST(SUM(refined_found) AS BIGINT) // CAST(SUM(n_true) AS BIGINT)
          FROM refine
        UNION ALL
        SELECT 'ann_refine_gain_bp',
          10000 * CAST(SUM(refined_found) AS BIGINT) // CAST(SUM(n_true) AS BIGINT)
          - 10000 * CAST(SUM(base_found) AS BIGINT) // CAST(SUM(n_true) AS BIGINT)
          FROM refine
        UNION ALL
        SELECT 'langid_accuracy_bp',
          10000 * CAST(SUM(CASE WHEN lang_label = lang_guess THEN n ELSE 0 END)
            AS BIGINT) // CAST(SUM(n) AS BIGINT)
          FROM lang)
      ORDER BY metric"""),
    bench = false)

  // ===========================================================
  // Cross-table freshness monitor
  // ===========================================================

  /** FRESHNESS MONITOR: each time-bearing table's newest record
    * against the lake's global high-water mark, with the staleness
    * verdict an ingest pager keys on (stale = more than 3 days
    * behind the freshest table). One min/max aggregate per table —
    * at 100 TB these come off partition/zone-map metadata, not a
    * data scan (see `s11_partition_prune`).
    */
  val dq_freshness = Q(
    (s, dir) => {
      val marks = Seq(
        T_(s, dir, "events").agg(max(to_date(col("ts"))).as("newest"))
          .select(lit("events").as("tbl"), col("newest")),
        T_(s, dir, "orders").agg(max(to_date(col("o_orderdate"))).as("newest"))
          .select(lit("orders").as("tbl"), col("newest")),
        T_(s, dir, "lineitem").agg(max(to_date(col("l_shipdate"))).as("newest"))
          .select(lit("lineitem").as("tbl"), col("newest")))
        .reduce(_ unionByName _)
      val hw = marks.agg(max(col("newest")).as("hwm"))
      marks.crossJoin(broadcast(hw))
        .select(col("tbl"), col("newest"),
          datediff(col("hwm"), col("newest")).as("lag_days"),
          (datediff(col("hwm"), col("newest")) > 3).as("stale"))
        .orderBy(col("tbl"))
    },
    Some("""WITH marks AS (
          SELECT 'events' AS tbl, max(CAST(ts AS DATE)) AS newest FROM events
          UNION ALL
          SELECT 'orders', max(CAST(o_orderdate AS DATE)) FROM orders
          UNION ALL
          SELECT 'lineitem', max(CAST(l_shipdate AS DATE)) FROM lineitem),
        hw AS (SELECT max(newest) AS hwm FROM marks)
      SELECT tbl, newest,
        CAST(date_diff('day', newest, hwm) AS INTEGER) AS lag_days,
        date_diff('day', newest, hwm) > 3 AS stale
      FROM marks, hw ORDER BY tbl"""))

  val all: Map[String, Q] = Map(
    "w_pareto_frontier" -> w_pareto_frontier,
    "pipeline_quality_report" -> pipeline_quality_report,
    "dq_freshness" -> dq_freshness,
  )
}
