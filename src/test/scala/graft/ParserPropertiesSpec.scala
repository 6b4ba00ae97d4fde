package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Functions => F, TextFunctions => T}

/** Property tests (SURVEY §5.2): parser totality — every parser is
  * null-or-value on arbitrary input, never an exception — plus
  * structural invariants. Generators are driven with a fixed seed so
  * the corpus is deterministic (no scalatest-scalacheck bridge in the
  * offline cache; sampling is done directly).
  */
class ParserPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val messyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.oneOf("", " ", "≈1,5", "<=", ">=-3", "1-", "-", "1,2,3", "%%", "()", "(1,)",
      "<0,5", "22,5 cm", "2024-13-45", "1e309", "NaN", "∞", "-0"),
    Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.3f"),
    Gen.chooseNum(-100, 100).flatMap(a =>
      Gen.chooseNum(-100, 100).map(b => s"$a-$b")))

  private def sample(n: Int, seed: Long): List[String] =
    Gen.listOfN(n, messyString)(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("parsers are total on 500 adversarial strings") {
    val ss = (0 until 10).flatMap(i => sample(50, 42L + i)).toList
    assert(ss.size >= 400)
    val df = ss.toDF("s")
    val n = df.select(
      F.parseNumber($"s"), F.parseRange($"s"), F.toFloatOrNull($"s"),
      F.toNumberPctTolerant($"s"), F.depthFromLabel($"s"),
      F.coerceToTimestamp($"s"), F.parsePoint($"s"), F.sanitizeName($"s"),
      T.fingerprint($"s"), T.wsTokenCount($"s"), T.qualityScore($"s"),
      T.langId($"s"), size(T.charShingles($"s", 5))).count()
    assert(n == ss.length)
  }

  test("token counts and ratios stay in range on arbitrary text") {
    val df = sample(200, 7L).toDF("s")
    val bad = df.select(
      T.wsTokenCount($"s").as("w"), T.approxBpeTokenCount($"s").as("b"),
      T.punctRatio($"s").as("p"), T.stopwordRatio($"s").as("sw"),
      T.qualityScore($"s").as("q"))
      .filter($"w" < 0 || $"b" < 0
        || $"p" < 0 || $"p" > 1 || $"sw" < 0 || $"sw" > 1
        || $"q" < 0 || $"q" > 1).count()
    assert(bad == 0)
  }

  test("roll-up invariant on random data: min <= avg <= max") {
    val vs = Gen.listOfN(500, Gen.chooseNum(-1000.0, 1000.0))(
      Gen.Parameters.default, Seed(99L)).getOrElse(Nil)
    val df = vs.zipWithIndex
      .map { case (v, i) => (s"s${i % 3}", java.sql.Timestamp.valueOf(f"2025-06-${i % 28 + 1}%02d 01:00:00"), v) }
      .toDF("station", "data_at", "v")
    val out = graft.operators.DailyRollup.weather(df, $"data_at", Seq($"station"),
      $"v", $"v", $"v", $"v", $"v", lit("u"))
    val bad = out.filter($"min" > $"avg" + 1e-9 || $"avg" > $"max" + 1e-9).count()
    assert(bad == 0)
  }

  test("upsert idempotence on random keyed rows") {
    val ks = Gen.listOfN(300, Gen.chooseNum(0, 40))(
      Gen.Parameters.default, Seed(5L)).getOrElse(Nil)
    val df = ks.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val deduped = graft.operators.Upsert.dedupByKey(df, Seq("k"), Seq($"v"))
    val again = graft.operators.Upsert.dedupByKey(deduped, Seq("k"), Seq($"v"))
    assert(deduped.orderBy("k").collect().toSeq == again.orderBy("k").collect().toSeq)
    assert(deduped.count() == df.select("k").distinct().count())
  }
}
