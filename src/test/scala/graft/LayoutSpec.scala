package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** Z-order layout: correctness of the Morton code and a MEASURED
  * data-skipping payoff — the point of the rewrite is that parquet
  * row-group pruning fires on BOTH clustered keys, which shows up as
  * the scan emitting far fewer rows for the same pushed filter.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (Morton order)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    def morton(a: Long, b: Long): Long =
      (0 until 8).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    assert(rows.toSeq == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 5), morton(255, 255)))
    assert(morton(3, 5) == 39L) // 3=011 interleaved with 5=101 -> 100111
  }

  /** Rows the parquet scan actually emitted (post row-group pruning,
    * pre any further filtering) for a count over `df`.
    */
  private def scanOutputRows(df: DataFrame): Long = {
    // run THIS QueryExecution's physical plan (df.count() would build
    // its own, leaving these metrics untouched)
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    plan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("compact collapses a shattered table to size-targeted files, losslessly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = spark.range(100000L).select(col("id"),
      concat(lit("payload_"), col("id")).as("s"))
    src.repartition(50).write.mode("overwrite").parquet(s"$tmp/shattered")
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files(s"$tmp/shattered").length == 50)
    val n = Layout.compact(spark, s"$tmp/shattered", s"$tmp/compacted",
      targetBytes = 1L * 1024 * 1024)
    val out = files(s"$tmp/compacted")
    assert(out.length == n && n < 10,
      s"expected a handful of files, got $n")
    // lossless: same content
    val a = spark.read.parquet(s"$tmp/shattered")
    val b = spark.read.parquet(s"$tmp/compacted")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // degenerate target still writes at least one file
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$tmp/shattered", s"$tmp/x", 0L)
    }
  }

  test("z-ordered write skips row groups on BOTH keys; unclustered does not") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // synthetic 2-key table: 200k rows, keys independent
    val src = spark.range(200000L).select(
      pmod(xxhash64(lit(1), col("id")), lit(4096L)).as("k1"),
      pmod(xxhash64(lit(2), col("id")), lit(4096L)).as("k2"),
      col("id").as("payload"))
    // small row groups so sf-test-sized files still have many groups
    src.coalesce(2).write.mode("overwrite")
      .option("parquet.block.size", 64L * 1024)
      .parquet(s"$tmp/plain")
    Layout.zorderWrite(src, "k1", "k2", bits = 12, s"$tmp/zorder",
      numFiles = 2, blockBytes = 64L * 1024)
    val plain = spark.read.parquet(s"$tmp/plain")
    val zord = spark.read.parquet(s"$tmp/zorder")
    // same content
    assert(plain.count() == zord.count())
    for (key <- Seq("k1", "k2")) {
      val p = scanOutputRows(plain.filter(col(key) < 100))
      val z = scanOutputRows(zord.filter(col(key) < 100))
      // hash-scattered keys defeat min/max pruning on the unclustered
      // layout (every group spans the domain) while the Z-layout
      // confines each key range to a small fraction of the groups
      assert(p >= 190000L, s"$key: unclustered scan unexpectedly pruned ($p)")
      assert(z <= p / 3, s"$key: z-order pruned too little (z=$z, plain=$p)")
    }
  }
}
