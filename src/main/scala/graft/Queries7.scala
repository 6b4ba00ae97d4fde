package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Sampling
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import Queries.Q

/** Batch 7: deterministic corpus sampling — the curation step between
  * dedup/quality scoring and training (downsample the dominant
  * language, cap per-source contribution, fill a per-language token
  * budget best-first). The reference has no sampling stage (its ETL
  * moves everything it fetches); these are the operations its data
  * model needs the moment the corpus outgrows one machine, and every
  * gate is a deterministic integer filter — reproducible across runs,
  * engines, and cluster sizes, never `rand()`.
  */
object Queries7 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** detHash as SQL (exact: inner % keeps the product below 2^63). */
  private val hashSql = "(doc_id % 94906249) * 1103515245 % 2147483647"

  /** Stratified downsampling by language: keep 30% of English (the
    * dominant stratum), 80% of Chinese, 50% of everything else —
    * one shuffle-free filter whatever the corpus size.
    */
  val samp_stratified = Q(
    (s, dir) => Sampling.stratifiedBp(T_(s, dir, "documents"),
        col("lang"), col("doc_id"),
        Map("en" -> 3000, "zh" -> 8000), defaultBp = 5000)
      .select(col("doc_id"), col("lang"), col("source")),
    Some(s"""SELECT doc_id, lang, source FROM documents
      WHERE $hashSql % 10000 <
        CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 8000 ELSE 5000 END"""))

  /** Per-source contribution cap (at most 15 docs per source, chosen
    * by deterministic hash order): no single crawl source dominates
    * the mixture. Two-phase rank — the per-source shuffle carries at
    * most partitions x cap rows per source, so a pathological
    * mega-source cannot pin one reducer.
    */
  val samp_capped_per_source = Q(
    (s, dir) => Sampling.capPerGroup(T_(s, dir, "documents"),
        col("source"), col("doc_id"), cap = 15)
      .select(col("doc_id"), col("source")),
    Some(s"""SELECT doc_id, source
      FROM (SELECT doc_id, source, row_number() OVER (
              PARTITION BY source ORDER BY $hashSql ASC, doc_id ASC) AS rn
            FROM documents)
      WHERE rn <= 15"""))

  /** Per-language token budget, filled best-first: rank each language
    * by document size (a quality proxy with a total tiebreak) and keep
    * documents while the running whitespace-token total stays within
    * 2.5k. The mixture a curriculum loader actually consumes.
    */
  val samp_token_budget = Q(
    (s, dir) => Sampling.tokenBudget(
        T_(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            T.wsTokenCount(col("text")).as("toks")),
        col("lang"), col("toks"),
        Seq(col("n_chars").desc, col("doc_id").asc), budget = 2500L)
      .select(col("doc_id"), col("lang"), col("cum_tokens")),
    Some("""WITH t AS (SELECT doc_id, lang, n_chars,
        CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
             ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
      FROM documents)
      SELECT doc_id, lang, cum_tokens FROM (
        SELECT doc_id, lang, CAST(sum(toks) OVER (
          PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM t)
      WHERE cum_tokens <= 2500"""))

  /** Int8 scalar quantization of the embedding store (SQ8 — 4x
    * smaller at rest than float32): per-vector (mn, mx) + int8 codes,
    * dequantized reconstruction error checked against the analytic
    * half-step bound (mx - mn) / 510 per vector. Every arithmetic step
    * (explicit floor(+0.5) rounding, fixed association) replays
    * bit-for-bit in the SQL oracle.
    */
  val vec_quantize_int8 = Q(
    (s, dir) => {
      val qz = V.quantizeInt8(col("embedding"))
      val base = T_(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"), qz.as("z"))
      val deq = V.dequantizeInt8(col("z.mn"), col("z.mx"), col("z.q"))
      base.select(col("vec_id"), col("z.mn").as("mn"), col("z.mx").as("mx"),
          concat_ws(",", transform(col("z.q"), _.cast("string"))).as("q_str"),
          array_max(zip_with(col("v"), deq, (x, y) => abs(x - y))).as("max_abs_err"))
        .withColumn("within_bound",
          col("max_abs_err") <= (col("mx") - col("mn")) / 510.0 * 1.000001)
    },
    Some("""WITH e AS (SELECT vec_id,
        [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
      s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
      qd AS (SELECT vec_id, v, mn, mx,
          [CASE WHEN mx > mn
                THEN CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS INTEGER) - 128
                ELSE -128 END FOR x IN v] AS q
        FROM s),
      r AS (SELECT vec_id, mn, mx, q,
          list_max([abs(v[i] - (mn + (CAST(q[i] AS DOUBLE) + 128) / 255 * (mx - mn)))
                    FOR i IN range(1, len(v) + 1)]) AS max_abs_err
        FROM qd)
      SELECT vec_id, mn, mx, array_to_string(q, ',') AS q_str, max_abs_err,
        max_abs_err <= (mx - mn) / 510 * 1.000001 AS within_bound
      FROM r"""))

  val all: Map[String, Q] = Map(
    "samp_stratified" -> samp_stratified,
    "samp_capped_per_source" -> samp_capped_per_source,
    "samp_token_budget" -> samp_token_budget,
    "vec_quantize_int8" -> vec_quantize_int8,
  )
}
