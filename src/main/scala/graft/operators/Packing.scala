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

  /** RANK-COMPLEMENT pairing: the deterministic distributed
    * approximation of best-fit packing for the no-cross-document
    * regime (each bin = one or two whole documents, never split —
    * the SFT/long-context fine-tuning layout, where an example may
    * not straddle bins the way [[packSequential]]'s concat-and-chunk
    * stream does). Within each stratum, rows sorted by tokens
    * descending get rank r; the r-th longest is paired with the r-th
    * shortest (complement rank n+1−r) iff the two fit in `ctxLen`
    * together — the classic sorted-complement heuristic, which is a
    * 2-approximation of optimal first-fit-decreasing but needs ONE
    * rank window and ONE equi-join instead of the inherently
    * sequential FFD state. Rows longer than half the context stay
    * single (their complement partner can never help), and the
    * unpaired middle row of an odd stratum is its own bin.
    *
    * Emits one row per BIN: (stratum, bin_id, id_long, id_short =
    * null when single, n_docs, bin_tokens, fill_bp = 10000·
    * bin_tokens div ctxLen). bin_id is the member's descending rank
    * (the long side's for a pair or long single; a REJECTED partner
    * — pair over budget — bins alone under its own rank, so ids stay
    * unique per stratum and every document lands in exactly one
    * bin). All integer math — replays exactly. Rows with tokens <= 0 or tokens > ctxLen are
    * dropped (an over-long document cannot be binned whole; count
    * them upstream).
    *
    * Scale shape: one rank window per stratum (same single-shuffle
    * discipline as [[packSequential]]; a single huge stratum takes
    * the [[GlobalOrder]] prefix-sum form), one self-equi-join on
    * (stratum, rank) = complement — shuffle-sized by the row count,
    * never quadratic.
    */
  def packPaired(df: DataFrame, stratum: Column, tokens: Column,
                 id: Column, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, "context length must be positive")
    val base = prepare(df, stratum, tokens, id, ctxLen)
    val wDesc = Window.partitionBy(col("stratum"))
      .orderBy(col("toks").desc, col("id").asc)
    val ranked = base
      .withColumn("r", row_number().over(wDesc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("stratum"))))
    pairBins(ranked, ctxLen)
  }

  /** The single-mega-stratum form of [[packPaired]]: identical bins
    * (bin_id is BIGINT instead of INT — ranks can exceed 2^31 at this
    * scale), but the per-stratum descending rank comes from
    * [[GlobalOrder.withGlobalIndex]] over the total order (stratum,
    * toks desc, id) minus a broadcast per-stratum prefix offset,
    * instead of a `partitionBy(stratum)` window. The window form
    * funnels a hot stratum through ONE task (the round-7 soak measured
    * it at 1.2–2.3× on a dominant source); here the sort is a range
    * shuffle at full parallelism and the offset/count table is one
    * tiny broadcast (#strata rows). Output is order-identical because
    * the order is total.
    */
  def packPairedLarge(df: DataFrame, stratum: Column, tokens: Column,
                      id: Column, ctxLen: Long,
                      scope: CacheScope = CacheScope.global): DataFrame = {
    require(ctxLen > 0, "context length must be positive")
    val base = prepare(df, stratum, tokens, id, ctxLen)
    // per-stratum size + prefix offset: strata are few (languages,
    // sources), so this is a tiny aggregate; the single-partition
    // window runs over #strata rows, never data
    val offsets = base.groupBy(col("stratum")).agg(count(lit(1)).as("n"))
      .withColumn("__soff",
        coalesce(sum(col("n")).over(Window.orderBy(col("stratum").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val indexed = GlobalOrder.withGlobalIndex(base,
      Seq(col("stratum").asc, col("toks").desc, col("id").asc), scope)
    val ranked = indexed
      .join(broadcast(offsets), Seq("stratum"))
      .withColumn("r", col("pos") - col("__soff"))
      .drop("pos", "__soff")
    pairBins(ranked, ctxLen)
  }

  private def prepare(df: DataFrame, stratum: Column, tokens: Column,
                      id: Column, ctxLen: Long): DataFrame =
    df.filter(tokens > 0 && tokens <= ctxLen)
      .select(stratum.as("stratum"), id.as("id"),
        tokens.cast("long").as("toks"))

  /** Complement-rank pairing over a ranked frame (stratum, id, toks,
    * r, n): shared tail of [[packPaired]] / [[packPairedLarge]].
    */
  private def pairBins(ranked: DataFrame, ctxLen: Long): DataFrame = {
    val longSide = ranked.filter(col("r") * 2 <= col("n") + 1)
    val shortSide = ranked.filter(col("r") * 2 > col("n") + 1)
      .select(col("stratum"), (col("n") + 1 - col("r")).cast(
          ranked.schema("r").dataType).as("r"),
        col("r").as("r_short"),
        col("id").as("id_short"), col("toks").as("toks_short"))
    val joined = longSide.join(shortSide, Seq("stratum", "r"), "left")
      .withColumn("paired",
        col("id_short").isNotNull && col("toks") + col("toks_short") <= ctxLen)
    val longBins = joined.select(
      col("stratum"), col("r").as("bin_id"), col("id").as("id_long"),
      when(col("paired"), col("id_short")).as("id_short"),
      when(col("paired"), 2).otherwise(1).as("n_docs"),
      when(col("paired"), col("toks") + col("toks_short"))
        .otherwise(col("toks")).as("bin_tokens"))
    // a rejected partner (pair over budget) is still a document — it
    // becomes its own bin under its OWN rank, which is disjoint from
    // every long-side rank, so bin_id stays unique per stratum
    val shortBins = joined.filter(col("id_short").isNotNull && !col("paired"))
      .select(col("stratum"), col("r_short").as("bin_id"),
        col("id_short").as("id_long"),
        lit(null).cast(joined.schema("id_short").dataType).as("id_short"),
        lit(1).as("n_docs"), col("toks_short").as("bin_tokens"))
    longBins.unionByName(shortBins)
      .withColumn("fill_bp", expr(s"10000L * bin_tokens div ${ctxLen}L"))
  }
}
