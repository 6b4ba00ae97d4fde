package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (0L until 2000L)
    .map(i => (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "zh",
      s"src${i % 7}", 10L + i % 90))
    .toDF("doc_id", "lang", "source", "toks")

  test("stratified sampling is deterministic and rate-proportional") {
    val kept = Sampling.stratifiedBp(docs, $"lang", $"doc_id",
      Map("en" -> 2000, "zh" -> 8000), defaultBp = 5000)
    val again = Sampling.stratifiedBp(docs, $"lang", $"doc_id",
      Map("en" -> 2000, "zh" -> 8000), defaultBp = 5000)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 en at 20%, 500 de at 50% (default), 1000 zh at 80%; the
    // integer mix is uniform enough for a loose band
    assert(byLang("en") > 50 && byLang("en") < 160)
    assert(byLang("de") > 180 && byLang("de") < 320)
    assert(byLang("zh") > 680 && byLang("zh") < 920)
    // a filter, not a sample(): identical output every run
    assert(kept.collect().map(_.getLong(0)).sorted
      sameElements again.collect().map(_.getLong(0)).sorted)
  }

  test("stratified sampling rejects out-of-range rates") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedBp(docs, $"lang", $"doc_id", Map("en" -> 10001), 0)
    }
  }

  test("capPerGroup keeps exactly cap rows for oversized groups, deterministically") {
    val capped = Sampling.capPerGroup(docs, $"source", $"doc_id", cap = 9)
    val sizes = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 9)) // every src group has ~286 rows, all capped
    // the chosen rows match the global-window reference selection
    val ref = docs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy(Sampling.detHash($"doc_id").asc, $"doc_id".asc)))
      .filter($"rn" <= 9).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(capped.select("doc_id").collect().map(_.getLong(0)).sorted
      sameElements ref)
  }

  test("capPerGroup leaves undersized groups whole") {
    val small = docs.filter($"doc_id" < 20)
    val capped = Sampling.capPerGroup(small, $"source", $"doc_id", cap = 50)
    assert(capped.count() == 20)
  }

  test("tokenBudget admits best-first and never exceeds the budget") {
    val sel = Sampling.tokenBudget(docs, $"lang", $"toks",
      Seq($"toks".desc, $"doc_id".asc), budget = 1000L)
    val perLang = sel.groupBy("lang").agg(max("cum_tokens").as("m"),
        sum("toks").as("s")).collect()
    perLang.foreach { r =>
      assert(r.getLong(1) <= 1000L)     // running max within budget
      assert(r.getLong(2) <= 1000L)     // total admitted within budget
    }
    // best-first: every admitted row has toks >= the best rejected row
    // of its stratum minus the boundary effect (cum constraint), i.e.
    // the admitted set per lang is a prefix of the (toks desc) order
    val en = sel.filter($"lang" === "en").orderBy($"cum_tokens".asc)
      .select("toks").collect().map(_.getLong(0))
    assert(en.sameElements(en.sorted(Ordering[Long].reverse)))
  }

  test("int8 quantization: error within half a step; constant vectors roundtrip exactly") {
    import graft.functions.{VectorFunctions => V}
    val vecs = Seq(
      (1L, Seq(0.1f, -0.5f, 2.0f, 0.7f)),
      (2L, Seq(3.0f, 3.0f, 3.0f)),          // constant -> mx == mn
      (3L, Seq(-1e6f, 1e6f, 0.0f))
    ).toDF("id", "v")
    val z = V.quantizeInt8($"v")
    val out = vecs.select($"id", $"v", z.as("z"))
      .select($"id", $"v", $"z.mn".as("mn"), $"z.mx".as("mx"),
        V.dequantizeInt8($"z.mn", $"z.mx", $"z.q").as("d"))
      .withColumn("err", array_max(zip_with(
        transform($"v", _.cast("double")), $"d", (x, y) => abs(x - y))))
      .collect()
    out.foreach { r =>
      val (mn, mx, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(err <= (mx - mn) / 510.0 * 1.000001, s"id=${r.getLong(0)} err=$err")
    }
    // constant vector dequantizes to exactly mn
    assert(out.find(_.getLong(0) == 2L).get.getDouble(5) == 0.0)
  }

  test("tokenBudgetLarge (distributed prefix sum) equals the window form exactly") {
    val a = Sampling.tokenBudget(docs, $"lang", $"toks",
      Seq($"toks".desc, $"doc_id".asc), budget = 7000L)
      .select($"doc_id", $"cum_tokens")
    val b = Sampling.tokenBudgetLarge(docs, $"lang", $"toks",
      Seq($"toks".desc, $"doc_id".asc), budget = 7000L)
      .select($"doc_id", $"cum_tokens")
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("mixtureRates: scarcest stratum keeps all; achieved mixture hits the target") {
    val rates = Sampling.mixtureRates(docs, $"lang",
      Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // corpus: en 500, de 500, zh 1000 -> N = min(500/0.5, 500/0.3, 1000/0.2) = 1000
    // kept: en 500 (rate 1.0, the binding stratum), de 300, zh 200
    assert(rates("en")._2 == 1.0)
    assert(math.abs(rates("de")._2 - 300.0 / 500.0) < 1e-12)
    assert(math.abs(rates("zh")._2 - 200.0 / 1000.0) < 1e-12)
    // achieved mixture = targets exactly
    val kept = rates.map { case (l, (n, r)) => l -> n * r }
    val total = kept.values.sum
    assert(math.abs(kept("en") / total - 0.5) < 1e-12)
    assert(math.abs(kept("de") / total - 0.3) < 1e-12)
  }

  test("mixtureRates: strata without a target share get rate 0") {
    val rates = Sampling.mixtureRates(docs, $"lang", Map("en" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rates("en") == 1.0)
    assert(rates("de") == 0.0 && rates("zh") == 0.0)
  }
}
