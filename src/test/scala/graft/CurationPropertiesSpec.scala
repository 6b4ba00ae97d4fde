package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Sampling
import graft.functions.{VectorFunctions => V}

/** Property tests for the curation operators: invariants that must
  * hold on ARBITRARY inputs, not just the harness tables. Generators
  * use a fixed seed (same rationale as ParserPropertiesSpec — no
  * scalatest-scalacheck bridge in the offline cache).
  */
class CurationPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, seed: Long): List[List[Float]] = {
    val g = Gen.chooseNum(1, 24).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-1e6f, 1e6f)))
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
  }

  test("property: quantize→dequantize error is within half a step for arbitrary vectors") {
    val df = vecs(300, 7L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val z = V.quantizeInt8($"v")
    val bad = df.select($"id", $"v", z.as("z"))
      .select($"id", $"z.mn".as("mn"), $"z.mx".as("mx"),
        array_max(zip_with(transform($"v", _.cast("double")),
          V.dequantizeInt8($"z.mn", $"z.mx", $"z.q"),
          (x, y) => abs(x - y))).as("err"))
      .filter($"err" > ($"mx" - $"mn") / 510.0 * 1.000001)
      .count()
    assert(bad == 0)
  }

  test("property: quantized codes are always within int8 range") {
    val df = vecs(300, 11L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val outOfRange = df.select(explode(V.quantizeInt8($"v").getField("q")).as("c"))
      .filter($"c" < -128 || $"c" > 127).count()
    assert(outOfRange == 0)
  }

  test("property: detHash lands in [0, 2^31) for arbitrary non-negative ids") {
    val ids = Gen.listOfN(2000, Gen.chooseNum(0L, Long.MaxValue / 2))(
      Gen.Parameters.default, Seed(13L)).getOrElse(Nil)
    val bad = ids.toDF("id")
      .select(Sampling.detHash($"id").as("h"))
      .filter($"h" < 0L || $"h" >= 2147483647L).count()
    assert(bad == 0)
  }

  test("property: stratifiedBp keep-set is a subset, stable, and rate-monotone") {
    val df = (0L until 3000L).map(i => (i, s"s${i % 7}")).toDF("id", "s")
    val lo = Sampling.stratifiedBp(df, $"s", $"id", Map.empty, defaultBp = 2000)
      .select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.stratifiedBp(df, $"s", $"id", Map.empty, defaultBp = 6000)
      .select("id").collect().map(_.getLong(0)).toSet
    // a higher rate admits a SUPERSET (the gate is hash < threshold)
    assert(lo.subsetOf(hi))
    assert(lo.size < hi.size && hi.size < 3000)
  }

  test("property: capPerGroup output per group is min(cap, group size)") {
    val df = (0L until 1000L).map(i => (i, s"g${i % 13}")).toDF("id", "g")
    val sizes = Sampling.capPerGroup(df, $"g", $"id", cap = 40)
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(sizes.forall(n => n == math.min(40L, 1000L / 13 + 1)
      || n == math.min(40L, 1000L / 13)))
    val total = Sampling.capPerGroup(df, $"g", $"id", cap = 2000).count()
    assert(total == 1000L) // cap above group size is the identity
  }
}
