package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge.{toColumn => column, toExpression => expression}

import graft.functions.{Functions => F, TextFunctions => T}

/** SparkSessionExtensions entry point: registers the engine's native
  * expression plus the whole scalar library for SQL use, so
  * `SELECT cosine_similarity(a.embedding, b.embedding)`,
  * `graft_parse_range(txt)`, `graft_lang_id(doc)` … work from
  * `spark.sql` on any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * The scalar library is `Column`-composed (zero UDFs), so SQL
  * registration is just unwrapping the caller's expressions into the
  * same composition — the generated plan is identical to the
  * DataFrame-API form, codegen included.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Wrong argument count must surface as the analyzer's standard
    * WRONG_NUM_ARGS AnalysisException, not an
    * IndexOutOfBoundsException out of the builder closure.
    */
  private def checkArity(name: String, expected: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def fn1(name: String, f: Column => Column): (String, Seq[Expression] => Expression) =
    name -> ((exprs: Seq[Expression]) => {
      checkArity(name, 1, exprs)
      expression(f(column(exprs.head)))
    })

  private def fn2(name: String, f: (Column, Column) => Column): (String, Seq[Expression] => Expression) =
    name -> ((exprs: Seq[Expression]) => {
      checkArity(name, 2, exprs)
      expression(f(column(exprs(0)), column(exprs(1))))
    })

  /** name → expression builder, shared by the extensions path and
    * [[register]].
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      (exprs: Seq[Expression]) => {
        checkArity("cosine_similarity", 2, exprs)
        CosineSimilarity(exprs(0), exprs(1))
      }),
    fn1("graft_sanitize_name", F.sanitizeName),
    fn1("graft_depth_from_label", F.depthFromLabel),
    fn1("graft_parse_number", F.parseNumber),
    fn1("graft_parse_range", F.parseRange),
    fn1("graft_to_float_or_null", F.toFloatOrNull),
    fn1("graft_to_number_pct", F.toNumberPctTolerant),
    fn2("graft_to_liters", F.toLiters),
    fn1("graft_area_to_da", F.areaUnitToDaFactor),
    fn1("graft_coerce_ts", F.coerceToTimestamp),
    fn1("graft_tz_to_offset", F.tzToOffset),
    fn1("graft_iso_day", F.isoDay),
    fn1("graft_norm_str", F.normStr),
    fn1("graft_parse_point", F.parsePoint),
    fn1("graft_ws_tokens", T.wsTokenCount),
    fn1("graft_bpe_tokens", T.approxBpeTokenCount),
    fn1("graft_quality", T.qualityScore),
    fn1("graft_lang_id", T.langIdFast),
    fn1("graft_fingerprint", T.fingerprint),
    fn1("graft_norm_text", T.normText),
    fn1("graft_quantize_int8", graft.functions.VectorFunctions.quantizeInt8),
    // native one-pass kernels
    ("graft_simhash64",
      (exprs: Seq[Expression]) => {
        checkArity("graft_simhash64", 1, exprs)
        Simhash64(exprs.head)
      }),
    ("graft_fingerprint_fast",
      (exprs: Seq[Expression]) => {
        checkArity("graft_fingerprint_fast", 1, exprs)
        PolyFingerprint(exprs.head)
      }))

  /** Register the same functions on an already-running session (for
    * sessions not built with the extensions class — tests, Verify).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
