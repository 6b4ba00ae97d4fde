package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Functions => F, TextFunctions => T}

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SQL-registered scalar library matches the Column forms exactly") {
    graft.plans.GraftExtensions.register(spark)
    Seq("≈1,5", "<= 7", "3-9", "42%", "  MiXeD Case  Text  ", "(1.5,-2.25)",
      "2025-06-01 10:30", "", "ml", "depth 22,5 cm")
      .toDF("s").createOrReplaceTempView("ext_v")
    val viaSql = spark.sql("""SELECT
        graft_parse_number(s) pn, graft_parse_range(s) pr,
        graft_to_float_or_null(s) fl, graft_to_number_pct(s) pct,
        graft_sanitize_name(s) sn, graft_depth_from_label(s) d,
        graft_coerce_ts(s) ts, graft_iso_day(graft_coerce_ts(s)) day,
        graft_parse_point(s) pt, graft_norm_str(s) ns,
        graft_ws_tokens(s) wt, graft_bpe_tokens(s) bt,
        graft_quality(s) q, graft_lang_id(s) lang,
        graft_fingerprint(s) fp, graft_norm_text(s) nt,
        graft_to_liters(graft_parse_number(s), 'ml') li,
        graft_area_to_da(s) da, graft_tz_to_offset(s) tz
      FROM ext_v""").collect().toSeq
    val viaCol = spark.table("ext_v").select(
      F.parseNumber($"s").as("pn"), F.parseRange($"s").as("pr"),
      F.toFloatOrNull($"s").as("fl"), F.toNumberPctTolerant($"s").as("pct"),
      F.sanitizeName($"s").as("sn"), F.depthFromLabel($"s").as("d"),
      F.coerceToTimestamp($"s").as("ts"), F.isoDay(F.coerceToTimestamp($"s")).as("day"),
      F.parsePoint($"s").as("pt"), F.normStr($"s").as("ns"),
      T.wsTokenCount($"s").as("wt"), T.approxBpeTokenCount($"s").as("bt"),
      T.qualityScore($"s").as("q"), T.langId($"s").as("lang"),
      T.fingerprint($"s").as("fp"), T.normText($"s").as("nt"),
      F.toLiters(F.parseNumber($"s"), lit("ml")).as("li"),
      F.areaUnitToDaFactor($"s").as("da"), F.tzToOffset($"s").as("tz")
    ).collect().toSeq
    assert(viaSql == viaCol)
  }

  test("native kernels are SQL-callable and match their Column forms") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_simhash64(array('ab','bc','cd')) sh,
                graft_fingerprint_fast('hello world') fp""").collect()(0)
    val viaCol = Seq(1).toDF("x").select(
      graft.plans.TextExpressions.simhash64Fast(
        array(lit("ab"), lit("bc"), lit("cd"))).as("sh"),
      graft.plans.TextExpressions.fingerprintFast(lit("hello world")).as("fp"))
      .collect()(0)
    assert(viaSql == viaCol)
  }

  test("wrong argument count raises a clean AnalysisException, not IOOBE") {
    graft.plans.GraftExtensions.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_quality()")
    }
    assert(e1.getMessage.contains("graft_quality"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array(1.0))")
    }
    assert(e2.getMessage.contains("cosine_similarity"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_to_liters(1.0, 'ml', 'extra')")
    }
    assert(e3.getMessage.contains("graft_to_liters"))
  }
}
