package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // permissive-cast semantics (null on bad parse) to mirror the
      // DuckDB oracle's TRY_CAST-based SQL
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the test-data generator writes timestamp[us] with
      // isAdjustedToUTC=false; without this, Spark 4 infers
      // TIMESTAMP_NTZ and unix_micros/watermarks reject the column.
      // Reading as TIMESTAMP under the UTC session zone yields the
      // same values DuckDB sees for the same bytes.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan ON TOP of cached plans too: persisted frames
      // otherwise pin their shuffle partitioning, and a union of many
      // small cached branches schedules partitions-per-branch tiny
      // tasks (measured 2x wall on g_assembly at local[32])
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // scale-adaptive parallelism floor — see GraftSession.minCoalescedDefault
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        GraftSession.minCoalescedDefault)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // manifest: query → row count + order-independent content hash of
    // the WRITTEN parquet (read back, so it attests exactly the bytes
    // the driver's checker will compare). Makes an empty/zeroed driver
    // correctness artifact distinguishable from a failed Verify: if
    // the manifest has 150+ hashed entries, the gate ran and the data
    // exists — any later emptiness is a checker-side hand-off failure.
    // Round 13 (after the third empty driver artifact): the manifest
    // is rewritten INCREMENTALLY after every query, so even a sweep
    // killed by an external timeout leaves a partial manifest proving
    // exactly how far the dump got and that its rows were hashed.
    val manifest = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def flushManifest(): Unit =
      Files.writeString(Paths.get(s"$outDir/manifest.json"),
        manifest.map { case (k, v) => s""""$k": $v""" }
          .mkString("{", ",\n ", "}"))
    // oracle_sql.json is static (SparkEntry.oracleSql) — write it
    // BEFORE the sweep. Round 13: if an external timeout kills the
    // dump mid-sweep, the checker still has the oracle map and the
    // already-dumped queries compare instead of the whole round's
    // correctness zeroing to {} (the r05/r08/r12 failure shape).
    // JSON string escape: backslash, quote, and ALL control chars
    // (<0x20) — a tab or CR in builder-authored SQL would otherwise
    // make the driver's json.load fail and silently zero the round.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Round 15 (after the FOURTH empty driver artifact): dump order is
    // CHEAPEST-FIRST, so an external wall-clock timeout truncates the
    // expensive tail (wire/cy_ entries cost seconds of plan/codegen
    // each) instead of zeroing the round. Tiers are static so the
    // order stays deterministic; within a tier, name-sorted.
    def tier(n: String): Int =
      if (n.startsWith("cy_")) 3 // wire statements: ~1-5 s each
      else if (n.startsWith("stream_")) 2 // micro-batch engine spin-up
      else if (n.startsWith("pipeline_") || n.startsWith("g_") ||
               n.startsWith("vec_") || n.startsWith("eval_")) 1
      else 0
    val sweepT0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy { case (n, _) => (tier(n), n) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // deterministic (tiered, sorted) order + a start line: a sweep
      // that wedges mid-query is then attributable from the log alone
      System.err.println(f"[verify] start $name (t+${(System.nanoTime() - sweepT0) / 1e9}%.1fs)")
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val back = spark.read.parquet(s"$outDir/$name")
        import org.apache.spark.sql.functions._
        // xxhash64 of the canonical (name-sorted) JSON row, summed as
        // decimal — partition-order-free, overflow-free
        val cols = back.columns.sorted.map(col)
        val agg = back.agg(
          count(lit(1)).as("n"),
          coalesce(sum(xxhash64(to_json(struct(cols: _*)))
            .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("h"))
          .collect()(0)
        manifest += name ->
          s"""{"rows": ${agg.getLong(0)}, "hash": "${agg.getDecimal(1)}"}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ")
          .take(200)
        manifest += name -> s"""{"error": "$msg"}"""
      }
      finally {
        flushManifest()
        graft.operators.CacheScope.global.release()
        // let ContextCleaner reclaim broadcast/shuffle state between
        // queries — GC-driven by design; a 80-query single-JVM loop
        // never triggers it on its own (see Bench for the measurement)
        System.gc()
      }
    }
    flushManifest()
    System.err.println(
      f"[verify] sweep done in ${(System.nanoTime() - sweepT0) / 1e9}%.1fs")
    spark.stop()
  }
}
