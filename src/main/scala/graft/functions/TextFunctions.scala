package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting). All
  * pure `Column` expressions over built-ins — codegen-friendly, and
  * each has an exact ANSI-SQL equivalent for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = {
    val t = trim(text)
    when(t.isNull || t === "", lit(0L))
      .otherwise(size(split(t, "\\s+")).cast("long"))
  }

  /** BPE-ish token count: runs of word chars count ceil(len/4) tokens
    * (a common ~4-chars-per-token heuristic), every non-word non-space
    * char counts 1. Deterministic, oracle-expressible.
    */
  def approxBpeTokenCount(text: Column): Column = {
    val wordChars = length(regexp_replace(text, "[^A-Za-z0-9]", ""))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    (ceil(wordChars.cast("double") / 4.0) + punct).cast("long")
  }

  /** Quality-score components: length, punctuation ratio, digit ratio,
    * uppercase ratio, mean word length, stopword ratio. Returned as a
    * struct so pipelines can threshold on any component.
    */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isInCollection(stopwords))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Native one-pass form of [[stopwordRatio]] (the HOF form splits
    * the text and runs an interpreted membership lambda per token;
    * this is one tokenization + hash probes — bit-identical, parity
    * spec in TextExpressionSpec). Preferred on bulk paths.
    */
  def stopwordRatioFast(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val c = graft.plans.TextExpressions.wordSetCountsFast(
      lower(trim(text)), Seq(stopwords))
    // null text → null counts → 0.0, matching the HOF otherwise-branch
    coalesce(c.getField("c0").cast("double") / c.getField("n_toks").cast("double"),
      lit(0.0))
  }

  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: high stopword presence and sane
    * punctuation/digit ratios read as "natural language".
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatioFast(text) * 4.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 3.0, lit(1.0))
    val digitPenalty = least(digitRatio(text) * 3.0, lit(1.0))
    round((lenScore + stopScore + (lit(1.0) - punctPenalty) + (lit(1.0) - digitPenalty)) / 4.0, 6)
  }

  /** Language-ID heuristic: score per language = stopword-hit ratio
    * over that language's marker list; argmax with "und" fallback when
    * nothing scores. N-gram-free so both Spark and the SQL oracle
    * compute identical numbers.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "por", "con", "para", "del"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "olarak", "daha", "çok", "gibi", "ama"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(markers))).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  def langId(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(langScore(text, ms).as("s"), lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0.0, best.getField("l")).otherwise(lit("und"))
  }

  /** Native one-pass form of [[langId]]: ONE tokenization feeds all
    * language marker sets (the HOF form re-split the text once per
    * language with an interpreted filter each). Same scores, same
    * argmax/tie/und semantics — parity spec in TextExpressionSpec.
    */
  def langIdFast(text: Column): Column = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val c = graft.plans.TextExpressions.wordSetCountsFast(
      lower(trim(text)), langs.map(_._2))
    val n = c.getField("n_toks").cast("double")
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      struct(coalesce(c.getField(s"c$i").cast("double") / n, lit(0.0)).as("s"),
        lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0.0, best.getField("l")).otherwise(lit("und"))
  }

  /** Polynomial rolling-hash fingerprint of the normalized text
    * (document fingerprinting): base 31, mod 2^31-1, over the
    * lowercased text with whitespace collapsed. The modulus keeps the
    * accumulator < 2^36 so the arithmetic never overflows a signed
    * 64-bit int — identical results in Spark and the DuckDB oracle.
    */
  def fingerprintFrom(norm: Column): Column =
    graft.plans.TextExpressions.fingerprintFast(norm)

  /** Built-in-composition form of [[fingerprintFrom]] — kept as the
    * reference implementation the native expression is parity-tested
    * against (it walks a per-character string array with an
    * interpreted lambda, so the native form is preferred on bulk
    * paths).
    */
  def fingerprintHof(norm: Column): Column = {
    val codes = transform(split(norm, ""), ch => ascii(ch).cast("long"))
    val mod = lit(2147483647L) // 2^31 - 1
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * 31L + c, mod))
  }

  def fingerprint(text: Column): Column = fingerprintFrom(normText(text))

  /** Whitespace-collapsed lowercase normalization — the shared
    * canonical form for dedup/fingerprinting. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Character n-gram shingles over an ALREADY-MATERIALIZED normalized
    * string column (an attribute, not a composed expression).
    *
    * PERF: higher-order-function lambdas re-evaluate captured
    * expressions per array element — capturing `normText(text)`
    * directly would recompute the regex normalization for every
    * substring, turning shingling O(len²). Callers must project the
    * norm into its own column first (the multi-reference below also
    * stops CollapseProject from inlining it back).
    */
  def charShinglesFrom(norm: Column, n: Int): Column = {
    val grams = when(length(norm) >= n,
      array_distinct(transform(
        sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n)))))
    coalesce(grams, array().cast("array<string>"))
  }

  /** Convenience one-shot form for short strings / tests. On bulk
    * paths use `normText` projection + `charShinglesFrom`. */
  def charShingles(text: Column, n: Int): Column =
    charShinglesFrom(normText(text), n)

  /** Distinct character-n-gram count — native one-pass kernel;
    * equals `size(charShinglesFrom(norm, n))` (parity-tested). */
  def distinctShingleCount(norm: Column, n: Int): Column =
    graft.plans.TextExpressions.distinctShingleCountFast(norm, n)

  /** Word n-gram shingles over an already-materialized token-array
    * column (see charShinglesFrom for why). */
  def wordShinglesFrom(toks: Column, n: Int): Column = {
    val grams = when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    coalesce(grams, array().cast("array<string>"))
  }

  /** Convenience one-shot form. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFrom(split(normText(text), " "), n)
}
