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
}
