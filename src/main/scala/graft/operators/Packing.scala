package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing: lay documents end-to-end into fixed-length
  * training context windows (concat-and-chunk, the standard
  * pretraining loader layout). Each document gets its token offset in
  * the per-stratum stream and the range of context windows it lands
  * in — the manifest a training data loader consumes to build batches
  * without materializing the concatenated stream.
  *
  * Scale design: the layout is a prefix sum over a total order, i.e.
  * the same shape as [[Sampling.tokenBudget]] — one window partition
  * per stratum. Strata are languages/domains (few, large), and for a
  * single huge stratum the distributed-prefix-sum form of
  * [[Sampling.tokenBudgetLarge]] applies unchanged (stamp partition
  * offsets, broadcast, add) because every derived column here is
  * arithmetic on the prefix sum. All window/offset math is integer
  * (`div`), so the manifest replays bit-for-bit in the SQL oracle.
  */
object Packing {

  /** Pack rows into `ctxLen`-token windows per stratum, in `ord`
    * order (MUST be total for a deterministic layout). Adds:
    *  - `stream_off`  token offset of the row in its stratum's stream
    *  - `pack_first`  index of the first context window it touches
    *  - `pack_last`   index of the last window (crossing rows span >1)
    *  - `n_windows`   how many windows the row spans
    *
    * Rows with `tokens <= 0` are DROPPED (an empty document has no
    * position in the stream) — enforced here, not left to call
    * sites: a zero-token row at a window boundary would otherwise
    * emit pack_last < pack_first and n_windows = 0, corrupting the
    * manifest a loader consumes.
    */
  def packSequential(df: DataFrame, stratum: Column, tokens: Column,
                     ord: Seq[Column], ctxLen: Long): DataFrame = {
    require(ctxLen > 0, "context length must be positive")
    val wPrior = Window.partitionBy(stratum).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(tokens > 0)
      .withColumn("__toks", tokens.cast("long"))
      .withColumn("stream_off", coalesce(sum(col("__toks")).over(wPrior), lit(0L)))
      .withColumn("pack_first", expr(s"stream_off div ${ctxLen}L"))
      .withColumn("pack_last", expr(s"(stream_off + __toks - 1) div ${ctxLen}L"))
      .withColumn("n_windows", col("pack_last") - col("pack_first") + 1L)
      .drop("__toks")
  }
}
