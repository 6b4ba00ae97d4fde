package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions => T}
import graft.plans.TextExpressions.fingerprintFast

class TextExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native fingerprint is bit-identical to the HOF form on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(T.normText($"text").as("norm"))
    val diff = docs.select(
      T.fingerprintHof($"norm").as("hof"),
      fingerprintFast($"norm").as("native"))
      .filter(not($"hof" <=> $"native")).count()
    assert(diff == 0)
  }

  test("native fingerprint edge cases: empty, null, unicode") {
    val df = Seq(Some(""), None, Some("a"), Some("héllo wörld 漢字"), Some("x" * 5000))
      .toDF("s")
    val rows = df.select(
      T.fingerprintHof($"s").as("hof"),
      fingerprintFast($"s").as("native")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"hof=${r.get(0)} native=${r.get(1)}")
    }
    // null in → null out; empty string → 0 (same as the HOF form)
    assert(rows(1).isNullAt(1))
    assert(rows(0).getLong(1) == 0L)
  }

  test("native distinct-shingle count equals size(charShinglesFrom) on real + edge input") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(T.normText($"text").as("norm"))
      .union(Seq("", "abcd", "aaaaa", "héllo wörld 漢字漢字").toDF("norm"))
    val diff = docs.select(
      size(T.charShinglesFrom($"norm", 5)).as("hof"),
      T.distinctShingleCount($"norm", 5).as("native"))
      .filter(not($"hof" <=> $"native")).count()
    assert(diff == 0)
  }

  test("native minhash signature is bit-identical to the explode+aggregate form") {
    val n = 5
    val k = 8
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val mults = (0 until k).map(i => mix(2L * i) | 1L)
    val adds = (0 until k).map(i => mix(2L * i + 1))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), T.normText($"text").as("norm"))
      .union(Seq((9001L, "abcd"), (9002L, "abcde"), (9003L, ""),
        (9004L, "héllo wörld 漢字漢字 with a much longer tail of text"))
        .toDF("id", "norm"))
    // reference: per-window explode + min aggregate (the pre-native
    // formulation, kept here as the semantic oracle)
    val hashFamily = (0 until k).map { i =>
      min(lit(mults(i)) * col("h") + lit(adds(i)))
    }
    val want = docs
      .select(col("id"), explode(when(length(col("norm")) >= n,
        sequence(lit(1), length(col("norm")) - (n - 1)))
        .otherwise(array().cast("array<int>"))).as("i"),
        col("norm"))
      .select(col("id"), xxhash64(col("norm").substr(col("i"), lit(n))).as("h"))
      .groupBy("id").agg(array(hashFamily: _*).as("sig"))
    val got = docs.select(col("id"),
      graft.plans.TextExpressions.minhashSigFast(col("norm"), n, mults, adds).as("sig"))
      .filter(col("sig").isNotNull)
    val joined = got.as("g").join(want.as("w"), Seq("id"), "full_outer")
      .filter(not($"g.sig" <=> $"w.sig"))
    assert(joined.isEmpty, joined.collect().take(5).mkString("\n"))
    // short/empty docs are excluded by both forms
    assert(got.filter($"id".isin(9003L)).isEmpty)
    assert(got.filter($"id" === 9002L).count() == 1)
  }

  test("langIdFast / stopwordRatioFast match the HOF forms on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      T.langId($"text").as("a"), T.langIdFast($"text").as("b"),
      T.stopwordRatio($"text").as("c"), T.stopwordRatioFast($"text").as("d"))
      .filter(not($"a" <=> $"b") || not($"c" <=> $"d")).count()
    assert(diff == 0)
  }

  test("wordSetCounts edge cases: null, empty, leading tab, unicode, marker-only") {
    // leading tab survives trim (trim strips spaces only) -> empty first
    // token; empty string tokenizes to [""], n_toks = 1 — both must
    // match the split()-based HOF semantics exactly
    val df = Seq(None, Some(""), Some("\tthe fox"), Some("the the the"),
      Some("der h\u00e9llo w\u00f6rld \u6f22\u5b57"), Some("  the  "))
      .toDF("text")
    val rows = df.select(
      T.langId($"text").as("a"), T.langIdFast($"text").as("b"),
      T.stopwordRatio($"text").as("c"), T.stopwordRatioFast($"text").as("d")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"langId: ${r.get(0)} vs ${r.get(1)}")
      assert(r.get(2) == r.get(3), s"stopRatio: ${r.get(2)} vs ${r.get(3)}")
    }
  }
}
