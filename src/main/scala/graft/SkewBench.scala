package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.{CacheScope, Dedup, GraphOps, SkewJoin}
import graft.sources.Tables

/** Skew soak: run the skew-sensitive operator families — the dedup
  * band joins, the iterative graph family, and the salted join —
  * against the [[SkewGen]] SKEWED fixture and its matched-size UNIFORM
  * control, and report per-query wall clock plus the skew/uniform
  * ratio.
  *
  * What "pass" means: the engine's scale claims say none of these
  * operators goes superlinear on hot keys (banded dedup + bucket caps,
  * degree-ordered triangle orientation, aggregate-based peeling,
  * salt-spread joins) — so on matched row counts the skewed fixture
  * must cost a modest constant factor over uniform, never a blowup.
  * The recorded numbers live in BASELINE.md's skew-soak section.
  *
  * The uncapped minhash/simhash entries are the documented exception:
  * with a 20%-frequency boilerplate cluster the TRUE near-dup pair set
  * is itself quadratic in the cluster (~(N/5)²/2 pairs), so uncapped
  * pair emission is output-bound, not engine waste — the capped
  * variants (`maxBucket=64`, star-collapsed buckets) are the
  * production form at scale and must stay near-uniform cost.
  *
  * Usage: `runMain graft.SkewBench [skewDir] [uniformDir]`
  * (defaults `/tmp/graft_skew/skew`, `/tmp/graft_skew/uniform`;
  * `SPARK_GRAFT_SOAK_UNCAPPED=0` skips the output-bound uncapped
  * entries, `SPARK_GRAFT_REPS` medians as in Bench).
  */
object SkewBench {

  private def docs(s: SparkSession, dir: String) = Tables.read(s, dir, "documents")

  private def liPairs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(s, dir, "lineitem").filter(col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
    li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.pk") < col("l2.pk"))
      .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
  }

  private def graphEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.read(s, dir, "orders")
      .select((col("o_orderkey") + 10000000L).as("src"), (col("o_custkey") + 10000L).as("dst"))
    val c = Tables.read(s, dir, "customer")
      .select((col("c_custkey") + 10000L).as("src"), (col("c_nationkey").cast("long") + 100L).as("dst"))
    val n = Tables.read(s, dir, "nation")
      .select((col("n_nationkey").cast("long") + 100L).as("src"), col("n_regionkey").cast("long").as("dst"))
    o.unionByName(c).unionByName(n)
  }

  private def simhashFp(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashBulk(
      docs(s, dir)
        .select(col("doc_id"), split(T.normText(col("text")), " ").as("toks"))
        .select(col("doc_id"), T.wordShinglesFrom(col("toks"), 2).as("sh")),
      "doc_id", "sh")

  /** The soak set: production operator forms (fast hash families, no
    * oracle orderBy), mirroring the catalog queries' shapes.
    */
  def soakQueries(uncapped: Boolean): Seq[(String, (SparkSession, String) => DataFrame)] = {
    val capped: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dd_exact" -> ((s, d) => Dedup.exact(docs(s, d), "text", "doc_id")
        .select("doc_id", "source")),
      "dd_minhash_capped" -> ((s, d) =>
        Dedup.minhashLsh(docs(s, d), "text", "doc_id", maxBucket = Some(64))),
      "dd_simhash_capped" -> ((s, d) =>
        Dedup.simhashNearDup(simhashFp(s, d), "doc_id", "simhash",
          maxHamming = 3, maxBucket = Some(64))),
      // incremental ingest under skew: the boilerplate cluster
      // straddles the base/delta split (even/odd ids), so the delta's
      // band join hits the hot buckets — capped, it must stay
      // delta-proportional
      "dd_minhash_delta_capped" -> ((s, d) => {
        val all = docs(s, d)
        Dedup.minhashLshDelta(
          Dedup.minhashSignatures(all.filter(col("doc_id") % 2 === 0),
            "text", "doc_id"),
          all.filter(col("doc_id") % 2 === 1), "text", "doc_id",
          maxBucket = Some(64))
      }),
      "dd_ngram_jaccard" -> ((s, d) =>
        Dedup.ngramJaccard(docs(s, d), "text", "doc_id",
          tokenize = t => split(T.normText(t), " "),
          gramLen = 3, threshold = 0.2, maxDf = Some(10))),
      "g_pagerank" -> ((s, d) => GraphOps.pageRank(graphEdges(s, d), 10)),
      "g_triangles" -> ((s, d) => GraphOps.triangleCount(liPairs(s, d))),
      "g_kcore" -> ((s, d) => GraphOps.kCoreConverged(liPairs(s, d), k = 4)),
      // fuzzy multi-key blocking under skew: boilerplate docs share a
      // 24-char prefix, so both families' block keys (edge chars and
      // the rarest corpus gram) concentrate — the soak asserts the
      // union blocking stays candidate-bound, not all-pairs. Names
      // are value-deduped first (production linkage links VALUES);
      // identical-name clusters would make the TRUE output quadratic
      // and measure output size, not blocking skew.
      "f_fuzzy_multi" -> ((s, d) => {
        val names = docs(s, d)
          .select(substring(T.normText(col("text")), 1, 24).as("c_name"))
          .distinct()
          .withColumn("c_id", xxhash64(col("c_name")))
        val dirty = names.select(xxhash64(col("c_name"), lit(1)).as("d_id"),
          concat(lit("z"), substring(col("c_name"), 2, 100)).as("d_name"))
        Dedup.fuzzyJoinBlockedMulti(dirty, "d_name", "d_id",
          names, "c_name", "c_id", maxDist = 2, q = 6, maxDf = Some(64))
      }),
      "j10_salted_skew" -> ((s, d) => {
        val ev = Tables.read(s, d, "events")
        val dim = ev.groupBy("event_type")
          .agg((sum(col("value").cast("decimal(27,8)")).cast("double") /
            count(col("value"))).as("avg_v"))
        SkewJoin.salted(ev, dim.hint("shuffle_hash"), Seq("event_type"),
            numSalts = 8, saltBy = "event_id")
          .filter(col("value") > col("avg_v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_above"))
      }),
      // PIT-join hot key: the skew fixture concentrates ~5% of events
      // on one user, so that key carries BOTH a fact pile AND a long
      // version history — per-key cost is facts×versions, the
      // classic PIT blowup. The consecutive-dup collapse in
      // Scd.type2 is what keeps versions sublinear in events; the
      // soak asserts the product stays bounded.
      "j11_pit_skew" -> ((s, d) => {
        val ev = Tables.read(s, d, "events")
          .withColumn("us", unix_micros(col("ts")))
        val dim = graft.operators.Scd.type2(
          ev.filter(col("event_id") % 2 === 1),
          col("user_id"), col("event_type"), col("us"),
          Seq(col("us"), col("event_id")))
        graft.operators.Scd.pitJoin(
            ev.filter(col("event_id") % 2 === 0)
              .select(col("event_id"), col("user_id"), col("us")),
            col("user_id"), col("us"), dim)
          .groupBy(col("pit_value")).agg(count(lit(1)).as("n"))
      }),
      // the hot-key-SAFE form: union + sort + last-non-null carries
      // the version forward — per-key (f+v)log(f+v), no product; the
      // soak pair (j11_pit_skew vs this) is the documented evidence
      // for when to switch forms
      "j11_pit_sorted_skew" -> ((s, d) => {
        val ev = Tables.read(s, d, "events")
          .withColumn("us", unix_micros(col("ts")))
        val dim = graft.operators.Scd.type2(
          ev.filter(col("event_id") % 2 === 1),
          col("user_id"), col("event_type"), col("us"),
          Seq(col("us"), col("event_id")))
        graft.operators.Scd.pitJoinSorted(
            ev.filter(col("event_id") % 2 === 0)
              .select(col("event_id"), col("user_id"), col("us")),
            col("user_id"), col("us"), dim)
          .groupBy(col("pit_value")).agg(count(lit(1)).as("n"))
      }),
      // pair packing under a hot stratum: one source dominating the
      // corpus makes one rank-window partition carry most rows — the
      // soak tracks that the sort stays a single-shuffle cost, not a
      // blowup (the GlobalOrder form is the documented escape hatch
      // for a single mega-stratum)
      "pack_paired_skew" -> ((s, d) => {
        val t = docs(s, d).select(col("doc_id"), col("source"),
          T.wsTokenCount(col("text")).as("toks"))
        graft.operators.Packing.packPaired(t, col("source"), col("toks"),
            col("doc_id"), 256L)
          .groupBy(col("stratum"))
          .agg(count(lit(1)).as("bins"), sum(col("bin_tokens")).as("toks"))
      }),
      // the hot-stratum-SAFE form: GlobalOrder prefix-sum rank — the
      // soak pair (pack_paired_skew vs this) is the documented
      // evidence for when to switch, the j11 pit pattern repeated
      "pack_paired_large_skew" -> ((s, d) => {
        val t = docs(s, d).select(col("doc_id"), col("source"),
          T.wsTokenCount(col("text")).as("toks"))
        graft.operators.Packing.packPairedLarge(t, col("source"),
            col("toks"), col("doc_id"), 256L)
          .groupBy(col("stratum"))
          .agg(count(lit(1)).as("bins"), sum(col("bin_tokens")).as("toks"))
      }))
    val unc: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dd_minhash_uncapped" -> ((s, d) =>
        Dedup.minhashLsh(docs(s, d), "text", "doc_id")),
      "dd_simhash_uncapped" -> ((s, d) =>
        Dedup.simhashNearDup(simhashFp(s, d), "doc_id", "simhash",
          maxHamming = 3)))
    if (uncapped) capped ++ unc else capped
  }

  /** Median elapsed over `reps` runs. A crashing run is a FAILED
    * measurement, not a fast one: it poisons the median to NaN (and is
    * logged), so a broken soak query can never report a healthy-looking
    * skew/uniform ratio.
    */
  private def timeOne(s: SparkSession, fn: (SparkSession, String) => DataFrame,
                      dir: String, reps: Int): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(s, dir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[soak] FAILED: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      CacheScope.global.release()
      System.gc()
      if (ok) dt else Double.NaN
    }.sorted
    if (times.exists(_.isNaN)) Double.NaN
    else if (times.length % 2 == 1) times(times.length / 2)
    else (times(times.length / 2 - 1) + times(times.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val skewDir = args.headOption.getOrElse("/tmp/graft_skew/skew")
    val uniformDir = if (args.length > 1) args(1) else "/tmp/graft_skew/uniform"
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val uncapped = sys.env.getOrElse("SPARK_GRAFT_SOAK_UNCAPPED", "1") == "1"
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "events", "orders", "customer", "nation", "lineitem")
      .foreach { t =>
        Tables.read(spark, skewDir, t).count()
        Tables.read(spark, uniformDir, t).count()
      }
    val rows = soakQueries(uncapped)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
      val ts = timeOne(spark, fn, skewDir, reps)
      val tu = timeOne(spark, fn, uniformDir, reps)
      System.err.println(f"[soak] $name%-22s skew $ts%7.2fs uniform $tu%7.2fs ratio ${ts / tu}%5.2f")
      name -> (ts, tu)
    }
    val qs = rows.map { case (k, (ts, tu)) =>
      if (ts.isNaN || tu.isNaN) s""""$k":{"failed":true}"""
      else f""""$k":{"skew":$ts%.3f,"uniform":$tu%.3f,"ratio":${ts / tu}%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_soak","queries":$qs,"skew_dir":"$skewDir","uniform_dir":"$uniformDir"}""")
    spark.stop()
  }
}
