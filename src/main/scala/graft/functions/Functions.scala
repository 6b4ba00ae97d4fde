package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — the engine's equivalent of the reference's
  * per-module Python helpers (SURVEY §2.6 F1–F22). Everything here is a
  * pure `Column` expression built from `org.apache.spark.sql.functions`,
  * so every call site stays inside whole-stage codegen; there are no
  * UDFs on the hot path.
  */
object Functions {

  /** F2 — property-name sanitizer: lowercase, any char outside
    * [a-z0-9_] becomes '_'. (reference: graph_weather_day.py:46-51)
    */
  def sanitizeName(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9_]", "_")

  /** F1 — measurement property-base resolution: alias-map hit on the
    * firmware key wins, else sanitized label, else sanitized key, else
    * the literal "m". (reference: graph_weather_day.py:53-67)
    */
  def resolvePropertyBase(fwKey: Column, label: Column, aliases: Map[String, String]): Column = {
    val aliasCol =
      if (aliases.isEmpty) lit(null).cast("string")
      else {
        val m = map(aliases.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        element_at(m, fwKey)
      }
    coalesce(
      aliasCol,
      when(length(trim(label)) > 0, sanitizeName(label)),
      when(length(trim(fwKey)) > 0, sanitizeName(fwKey)),
      lit("m"))
  }

  /** F3 — depth (cm) from a free-text sensor label: first numeric token,
    * comma decimals allowed, round-half-up to int.
    * (reference: graph_soil_layer.py:28-42) Missing → null; callers that
    * want the reference's `-1` sentinel wrap with `coalesce(_, lit(-1))`.
    */
  def depthFromLabel(c: Column): Column = {
    val tok = regexp_extract(c, "(\\d+(?:[.,]\\d+)?)", 1)
    when(tok =!= "",
      round(regexp_replace(tok, ",", ".").cast("double")).cast("int"))
  }

  /** F4 — first numeric token from free text (tolerates `≈`, inequality
    * prefixes, comma decimals, signs) → double.
    * (reference: graph_sap_element_result.py:16-29)
    */
  def parseNumber(c: Column): Column = {
    val tok = regexp_extract(c, "([-+]?\\d+(?:[.,]\\d+)?)", 1)
    when(tok =!= "", regexp_replace(tok, ",", ".").cast("double"))
  }

  /** F5 — optimum-range text → (min, max) struct:
    * `"1-4"` → (1,4); `"3"` → (3,3); `">=2.5"` → (2.5,null);
    * `"<=7"`/`"<7"` → (null,7).
    * (reference: graph_optimum_element_range.py:16-61)
    */
  def parseRange(c: Column): Column = {
    val s = regexp_replace(trim(c), ",", ".")
    val num = "([-+]?\\d+(?:\\.\\d+)?)"
    val pair = regexp_extract(s, s"^$num\\s*-\\s*$num$$", 1)
    val pairHi = regexp_extract(s, s"^$num\\s*-\\s*$num$$", 2)
    val ge = regexp_extract(s, s"^>=?\\s*$num$$", 1)
    val le = regexp_extract(s, s"^<=?\\s*$num$$", 1)
    val single = regexp_extract(s, s"^$num$$", 1)
    val lo = when(pair =!= "", pair.cast("double"))
      .when(ge =!= "", ge.cast("double"))
      .when(single =!= "", single.cast("double"))
    val hi = when(pairHi =!= "", pairHi.cast("double"))
      .when(le =!= "", le.cast("double"))
      .when(single =!= "", single.cast("double"))
    struct(lo.as("range_min"), hi.as("range_max"))
  }

  /** F6 — inequality-tolerant float parse: plain cast, else strip a
    * leading `[<>=]+` run and retry, else null.
    * (reference: graph_tnd_analysis.py:24-37)
    */
  def toFloatOrNull(c: Column): Column =
    coalesce(c.cast("double"),
      trim(regexp_replace(c, "^\\s*[<>=]+\\s*", "")).cast("double"))

  /** F7 — percent-tolerant numeric parse: drop `%`, first numeric token,
    * comma→dot. (reference: graph_app_nutrient_content.py:91-106)
    */
  def toNumberPctTolerant(c: Column): Column =
    parseNumber(regexp_replace(c, "%", ""))

  /** F8 — volume unit → liters factor applied to the amount.
    * (reference: graph_application_event.py:51-60)
    */
  def toLiters(amount: Column, unit: Column): Column = {
    val u = lower(trim(unit))
    when(u.isin("l", "lt", "ltr"), amount)
      .when(u === "ml", amount / 1000.0)
  }

  /** F9 — area unit → decare factor. (reference:
    * graph_application_event.py:38-49)
    */
  def areaUnitToDaFactor(unit: Column): Column = {
    val u = lower(trim(unit))
    when(u.isin("da", "decare", "dekar"), lit(1.0))
      .when(u === "ha", lit(10.0))
      .when(u === "m2", lit(0.01))
  }

  /** F10 — permissive timestamp coercion: ISO date (midnight), ISO
    * datetime, `yyyy-MM-dd HH:mm`, fallback to the first 10 chars as a
    * date. (reference: app/utils.py:19-32)
    */
  def coerceToTimestamp(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm")),
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      try_to_timestamp(substring(c, 1, 10), lit("yyyy-MM-dd")))

  /** F11 — IANA-ish zone name → fixed offset string; the reference only
    * knows two offsets (app/utils.py:34-43). Spark knows real zones, so
    * production conversions use `convert_timezone`; this is the parity
    * shim.
    */
  def tzToOffset(c: Column): Column = {
    val t = trim(c)
    when(t.isin("UTC", "GMT"), lit("+00:00"))
      .when(t.isin("Europe/Istanbul", "Turkey", "TRT", "TR"), lit("+03:00"))
  }

  /** F13 — anything date-like → ISO day string. (reference:
    * graph_sap_analysis.py:15-21)
    */
  def isoDay(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** F14 — trim; empty → null. (reference: graph_application_event.py:23-28) */
  def normStr(c: Column): Column = nullif(trim(c), lit(""))

  /** F14 variant — lowercase parameter key. */
  def normKey(c: Column): Column = lower(normStr(c))

  /** F15 — first non-empty of a coalesce chain, else a default.
    * (reference: graph_application_event.py:30-36)
    */
  def pickFirst(default: String, cols: Column*): Column =
    coalesce((cols.map(normStr) :+ lit(default)): _*)

  /** F16 — prefer the non-empty, then the longer, of two strings.
    * (reference: graph_soil_layer.py:45-51)
    */
  def pickLabel(current: Column, candidate: Column): Column = {
    val cur = normStr(current)
    val cand = normStr(candidate)
    when(cur.isNull, cand)
      .when(cand.isNull, cur)
      .when(length(cand) > length(cur), cand)
      .otherwise(cur)
  }

  /** F17 — surrogate id: `:`-joined key columns with per-column null
    * defaults. (reference: graph_sap_element_result.py:65-67 etc.)
    */
  def surrogateId(parts: Column*): Column = concat_ws(":", parts: _*)

  /** F22 — `"(x,y)"` point text → (x, y) struct of doubles.
    * (reference: app/patches.py:17-27)
    */
  def parsePoint(c: Column): Column = {
    val num = "([-+]?\\d+(?:\\.\\d+)?)"
    val x = regexp_extract(c, s"\\(\\s*$num\\s*,", 1)
    val y = regexp_extract(c, s",\\s*$num\\s*\\)", 1)
    struct(
      when(x =!= "", x.cast("double")).as("x"),
      when(y =!= "", y.cast("double")).as("y"))
  }
}
