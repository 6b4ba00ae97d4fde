package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Sort, Window => LWindow}

/** Parallelism widening for CPU-bound work over byte-small inputs.
  *
  * AQE sizes scan and post-shuffle partitions by BYTES; a corpus
  * parquet compressing ~100:1 scans as one partition while the
  * per-row work (gram builds, segmentation, codecs) is the real
  * cost — measured whole-corpus passes in a single task. The fix is
  * an explicit-count repartition (never coalesced), but ONLY for
  * scan-shaped inputs:
  *
  *   - a frame with an upstream shuffle-producing operator (join,
  *     aggregate, window, sort, repartition) already has
  *     `spark.sql.shuffle.partitions` width — widening is redundant,
  *     and probing its partition count via `.rdd` under AQE would
  *     EXECUTE the upstream stages once just to read a number, then
  *     the real action re-runs them;
  *   - for a plain scan the `.rdd` probe finalizes a plan with no
  *     exchanges — no jobs run — and the count is the file-split
  *     count, exactly the thing that under-reports.
  */
object Width {

  /** `docs` repartitioned to `spark.sql.shuffle.partitions` when it
    * is a scan-shaped frame with fewer partitions; `docs` unchanged
    * otherwise. */
  def widenIfNarrowScan(docs: DataFrame): DataFrame = {
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    val shuffledUpstream = docs.queryExecution.optimizedPlan.find {
      case _: Join | _: Aggregate | _: LWindow | _: Sort |
           _: RepartitionOperation => true
      case _ => false
    }.isDefined
    if (!shuffledUpstream && docs.rdd.getNumPartitions < n)
      docs.repartition(n)
    else docs
  }
}
