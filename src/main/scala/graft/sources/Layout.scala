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

  /** Small-file compaction — the other half of a lake OPTIMIZE next
    * to [[zorderWrite]]: rewrite the table at `inPath` into
    * ceil(totalBytes / targetBytes) files at `outPath`. Streaming
    * sinks and incremental MERGEs accrete small files; every scan
    * then pays per-file open/footer costs and the driver pays listing
    * — compaction restores healthy file sizes with one round-robin
    * shuffle (no ordering assumed or preserved; compose with
    * [[zorderWrite]] when clustering matters). Returns the file count
    * written.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hadoopPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
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
