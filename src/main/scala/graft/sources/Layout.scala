package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton) clustering, the
  * OPTIMIZE-ZORDER shape lakehouse tables use so selective filters on
  * EITHER of two keys skip most parquet row groups — single-column
  * sort gives min/max locality on one key only; bit-interleaving gives
  * it on both at once.
  *
  * Scale mechanics: parquet stores per-row-group min/max for every
  * column, and the reader prunes row groups whose range misses the
  * pushed filter. Data written in Z-value order clusters BOTH keys,
  * so both columns' per-group ranges are narrow — LayoutSpec measures
  * the scan-output collapse versus an unclustered write. The write is
  * one range shuffle + local sort (exactly what a sorted write costs);
  * no reader-side change at all, which is why the round-trip is
  * byte-equal to the source table (s18 oracle).
  */
object Layout {

  /** Morton code: interleave the low `bits` of `a` (even positions)
    * and `b` (odd). Both inputs must be non-negative and fit `bits`
    * bits for the ordering to be the true Z-curve; 2*bits <= 62.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite `df` Z-ordered on (ca, cb) into `path`: one range
    * shuffle on the Z-value into `numFiles` output files, rows sorted
    * by Z within each. `blockBytes` bounds the parquet row-group size
    * — smaller groups = finer skipping granularity at slightly more
    * footer overhead.
    */
  def zorderWrite(df: DataFrame, ca: String, cb: String, bits: Int,
                  path: String, numFiles: Int,
                  blockBytes: Long = 128L * 1024 * 1024): Unit = {
    val z = zValue(col(ca), col(cb), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(path)
  }
}
