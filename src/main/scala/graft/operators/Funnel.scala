package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel analysis over an event feed: for each
  * entity, step k counts only if it happens STRICTLY AFTER the
  * entity's first completion of step k-1 (the classic conversion
  * funnel — signup → click → purchase — not mere set membership).
  *
  * The reference's event pipeline materializes per-day event
  * aggregates (app/models.py event tables; §3.2 trace); the funnel is
  * the sequential composition a product-analytics user runs on top.
  *
  * Scale design: step 1 is ONE hash aggregate on the entity key; each
  * later step is an equi-join (entity key) against the previous
  * step's reach times followed by the same keyed aggregate. All
  * shuffles share the entity key, so after the first exchange the
  * join/agg chain is co-partitioned; per-step state is one row per
  * surviving entity (monotonically shrinking). No windows, no
  * collects — a 1000-executor run is bottlenecked only by the first
  * scan. Step count is static (funnel definitions are small), so the
  * linear join chain compiles into one pipelined plan.
  */
object Funnel {

  /** Per-entity first-completion times for each funnel step.
    * `steps` are (name, predicate) in funnel order; time is an epoch-
    * micros column (total-ordered identically in any engine). Returns
    * one row per entity that completed step 1, with nullable
    * `t_<name>` micros for each step (null = never reached).
    */
  def reachTimes(events: DataFrame, entity: Column, us: Column,
                 steps: Seq[(String, Column)],
                 windowUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(entity.as("entity") +: us.as("us") +:
      steps.map { case (n, p) => p.as(s"is_$n") }: _*)
    val (n0, _) = steps.head
    var reach = e.filter(col(s"is_$n0"))
      .groupBy(col("entity")).agg(min(col("us")).as(s"t_$n0"))
    for (Seq((prev, _), (cur, _)) <- steps.sliding(2).toSeq if steps.size > 1) {
      // windowed funnels additionally bound every step by the
      // entry time: us <= t_first + windowUs (the "convert within N
      // days" form). The join carries t_first alongside t_prev; both
      // ride the same entity-key exchange.
      val carry =
        if (windowUs.isDefined && prev != n0)
          reach.select(col("entity"), col(s"t_$prev"), col(s"t_$n0"))
        else reach.select(col("entity"), col(s"t_$prev"))
      val inWindow = windowUs
        .map(w => col("us") <= col(s"t_$n0") + lit(w))
        .getOrElse(lit(true))
      val next = e.filter(col(s"is_$cur"))
        .join(carry, Seq("entity"))
        .filter(col("us") > col(s"t_$prev") && inWindow)
        .groupBy(col("entity")).agg(min(col("us")).as(s"t_$cur"))
      reach = reach.join(next, Seq("entity"), "left")
    }
    reach
  }

  /** The funnel summary: one row per step with the entity count that
    * reached it in order, plus integer-milli conversion rates from
    * the previous step and from step 1 (div-quantized — float-free,
    * so the numbers replay bit-for-bit in any engine).
    */
  def conversion(events: DataFrame, entity: Column, us: Column,
                 steps: Seq[(String, Column)],
                 windowUs: Option[Long] = None): DataFrame = {
    val r = reachTimes(events, entity, us, steps, windowUs)
    val counts = r.agg(
      count(col(s"t_${steps.head._1}")).as(s"u_${steps.head._1}"),
      steps.tail.map { case (n, _) => count(col(s"t_$n")).as(s"u_$n") }: _*)
    // one row per step out of the single-row aggregate via explode —
    // one job, not one aggregation pass per funnel step
    val stepRows = array(steps.zipWithIndex.map { case ((n, _), i) =>
      val prev = if (i == 0) s"u_$n" else s"u_${steps(i - 1)._1}"
      val first = s"u_${steps.head._1}"
      struct(
        lit(i + 1L).as("step"),
        lit(n).as("step_name"),
        col(s"u_$n").as("users"),
        expr(s"u_$n * 1000 div $prev").as("conv_prev_milli"),
        expr(s"u_$n * 1000 div $first").as("conv_first_milli"))
    }: _*)
    counts.select(explode(stepRows).as("s")).select(col("s.*"))
  }
}
