package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("s").select(c.as("r")).collect()(0).get(0)

  test("F4 parseNumber: first numeric token, comma decimals, signs, noise") {
    assert(one(F.parseNumber($"s"), "≈ 2,5 ppm") == 2.5)
    assert(one(F.parseNumber($"s"), "<0,5") == 0.5)
    assert(one(F.parseNumber($"s"), "value -3.25 ok") == -3.25)
    assert(one(F.parseNumber($"s"), "no digits") == null)
  }

  test("F5 parseRange: pair, bare, >=, <=") {
    def r(s: String) = Seq(s).toDF("s")
      .select(F.parseRange($"s").as("r"))
      .select($"r.range_min", $"r.range_max").collect()(0)
    assert(r("1-4").toSeq == Seq(1.0, 4.0))
    assert(r("3").toSeq == Seq(3.0, 3.0))
    assert(r(">=2.5").toSeq == Seq(2.5, null))
    assert(r("<=7").toSeq == Seq(null, 7.0))
    assert(r("2,5-4,5").toSeq == Seq(2.5, 4.5))
    assert(r("garbage").toSeq == Seq(null, null))
  }

  test("F3 depthFromLabel: comma decimals, rounding, unparseable") {
    assert(one(F.depthFromLabel($"s"), "VWC 22,5 cm") == 23)
    assert(one(F.depthFromLabel($"s"), "Soil Temp 30 cm") == 30)
    assert(one(F.depthFromLabel($"s"), "no depth here") == null)
    // reference's -1 sentinel is a coalesce at the call site
    assert(Seq("nope").toDF("s")
      .select(coalesce(F.depthFromLabel($"s"), lit(-1)).as("d"))
      .collect()(0).get(0) == -1)
  }

  test("F6 toFloatOrNull strips inequality prefixes") {
    assert(one(F.toFloatOrNull($"s"), "<= 5") == 5.0)
    assert(one(F.toFloatOrNull($"s"), "3.75") == 3.75)
    assert(one(F.toFloatOrNull($"s"), "abc") == null)
  }

  test("F8/F9 unit conversions") {
    val df = Seq(("ml", 1500.0), ("L", 2.0), ("kg", 7.0)).toDF("u", "amt")
    val out = df.select(F.toLiters($"amt", $"u").as("l")).collect().map(_.get(0))
    assert(out.toSeq == Seq(1.5, 2.0, null))
    val fa = Seq("da", "ha", "m2", "acre").toDF("u")
      .select(F.areaUnitToDaFactor($"u").as("f")).collect().map(_.get(0))
    assert(fa.toSeq == Seq(1.0, 10.0, 0.01, null))
  }

  test("F11 tzToOffset fixed table") {
    val out = Seq("UTC", "Europe/Istanbul", "TR", "America/New_York").toDF("s")
      .select(F.tzToOffset($"s").as("o")).collect().map(_.get(0))
    assert(out.toSeq == Seq("+00:00", "+03:00", "+03:00", null))
  }

  test("F2 sanitize + F16 pickLabel + F14 normStr") {
    assert(one(F.sanitizeName($"s"), "Air Temp (°C)") == "air_temp___c_")
    assert(one(F.normStr($"s"), "  ") == null)
    val df = Seq(("short", "longer label"), ("keep", ""), ("", "cand")).toDF("a", "b")
    val out = df.select(F.pickLabel($"a", $"b").as("l")).collect().map(_.get(0))
    assert(out.toSeq == Seq("longer label", "keep", "cand"))
  }

  test("F10 coerceToTimestamp formats") {
    val outs = Seq("2024-03-01", "2024-03-01 10:30", "2024-03-01T10:30:05",
      "2024-03-01 10:30:05", "2024-03-01garbage")
      .toDF("s").select(F.coerceToTimestamp($"s").cast("string").as("t"))
      .collect().map(_.get(0))
    assert(outs(0) == "2024-03-01 00:00:00")
    assert(outs(1) == "2024-03-01 10:30:00")
    assert(outs(2) == "2024-03-01 10:30:05")
    assert(outs(3) == "2024-03-01 10:30:05")
    assert(outs(4) == "2024-03-01 00:00:00") // first-10-chars fallback
  }

  test("F22 parsePoint") {
    val p = Seq("(41.02,28.97)").toDF("s")
      .select(F.parsePoint($"s").as("p")).select($"p.x", $"p.y").collect()(0)
    assert(p.toSeq == Seq(41.02, 28.97))
  }

  test("F1 resolvePropertyBase: alias, label, fw_key, fallback") {
    val aliases = Map("42" -> "air_temp")
    val df = Seq(("42", "whatever"), ("7", "Leaf Wetness"), ("9", ""), ("", ""))
      .toDF("fw", "label")
    val out = df.select(F.resolvePropertyBase($"fw", $"label", aliases).as("b"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("air_temp", "leaf_wetness", "9", "m"))
  }
}
