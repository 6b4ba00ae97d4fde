package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LeafNode, LogicalPlan, Project}

/** Parallelism widening for CPU-bound work over byte-small inputs.
  *
  * AQE sizes scan and post-shuffle partitions by BYTES; a corpus
  * parquet compressing ~100:1 scans as one partition while the
  * per-row work (gram builds, segmentation, codecs) is the real
  * cost — measured whole-corpus passes in a single task. The fix is
  * an explicit-count repartition (never coalesced), but ONLY for
  * scan-shaped inputs:
  *
  *   - for a plain scan the `.rdd` probe finalizes a plan with no
  *     exchanges — no jobs run — and the count is the file-split
  *     count, exactly the thing that under-reports;
  *   - for ANYTHING else the probe is unsafe: under AQE,
  *     `.rdd.getNumPartitions` on a frame with an upstream exchange
  *     EXECUTES the upstream stages once just to read a number, then
  *     the real action re-runs them. So the guard is an ALLOWLIST of
  *     scan shapes (leaf / project / filter / generate), not a
  *     denylist of known shuffle producers — an op we didn't
  *     enumerate (GlobalLimit, a future extension node) fails safe
  *     by skipping the widen, never by double-executing.
  */
object Width {

  /** True when every node of the optimized plan is a leaf relation or
    * a narrow per-row op (project/filter/generate) — the only shapes
    * whose `.rdd` probe runs zero jobs. */
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: Project | _: Filter | _: Generate => p.children.forall(scanShaped)
    case _: LeafNode => true
    case _ => false
  }

  /** `docs` repartitioned to `spark.sql.shuffle.partitions` when it
    * is a scan-shaped frame with fewer partitions; `docs` unchanged
    * otherwise. */
  def widenIfNarrowScan(docs: DataFrame): DataFrame = {
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    if (scanShaped(docs.queryExecution.optimizedPlan) &&
        docs.rdd.getNumPartitions < n)
      docs.repartition(n)
    else docs
  }
}
