package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Sampling, Similarity}
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.plans.VectorExpressions.cosineFast
import Queries.Q

/** Batch 7: corpus curation — the stages between dedup/quality
  * scoring and training. Deterministic sampling (stratified rates,
  * per-source caps, token budgets — integer-hash gates, never
  * `rand()`), pretraining filters (repetition, benchmark
  * decontamination), embedding-store compression + memory-bound
  * search (SQ8 quantize / quantized top-k with exact re-rank), and
  * the audio chunking shape. The reference has no curation stage (its
  * ETL moves everything it fetches); these are the operations its
  * data model needs the moment the corpus outgrows one machine, and
  * every one replays bit-for-bit in the SQL oracle.
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

  /** The same budget fill via the distributed prefix sum
    * ([[Sampling.tokenBudgetLarge]]) — per-partition parallel windows
    * + a tiny broadcast offset table instead of one reducer per
    * stratum. Identical output by construction (SamplingSpec proves
    * exact equality), so it shares the window form's oracle SQL.
    */
  val samp_token_budget_large = Q(
    (s, dir) => Sampling.tokenBudgetLarge(
        T_(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            T.wsTokenCount(col("text")).as("toks")),
        col("lang"), col("toks"),
        Seq(col("n_chars").desc, col("doc_id").asc), budget = 2500L)
      .select(col("doc_id"), col("lang"), col("cum_tokens")),
    samp_token_budget.oracle)

  /** Int8 scalar quantization of the embedding store (SQ8 — 4x
    * smaller at rest than float32): per-vector (mn, mx) + int8 codes,
    * dequantized reconstruction error checked against the analytic
    * half-step bound (mx - mn) / 510 per vector. Every arithmetic step
    * (explicit floor(+0.5) rounding, fixed association) replays
    * bit-for-bit in the SQL oracle.
    */
  val vec_quantize_int8 = Q(
    (s, dir) => {
      val base = Similarity.sq8Store(T_(s, dir, "embeddings"), "embedding", "vec_id")
        .withColumnRenamed("id", "vec_id")
      base.select(col("vec_id"), col("mn"), col("mx"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_str"),
          array_max(zip_with(col("v"),
            V.dequantizeInt8(col("mn"), col("mx"), col("q")),
            (x, y) => abs(x - y))).as("max_abs_err"))
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

  /** Mixture solver: the per-language keep rates that turn the
    * observed corpus into a 40% en / 15% each de-es-fr-zh mixture by
    * downsampling only — the table [[samp_stratified]]'s rate map
    * comes from. The scarcest language relative to its target keeps
    * 100%.
    */
  val samp_mixture_rates = Q(
    (s, dir) => Sampling.mixtureRates(T_(s, dir, "documents"), col("lang"),
        Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15))
      .select(col("stratum"), col("n_rows"), col("target_share"),
        col("keep_rate"), col("keep_bp"))
      .orderBy(col("stratum")),
    Some("""WITH c AS (SELECT lang AS stratum, count(*) AS n_rows
        FROM documents GROUP BY lang),
      t AS (SELECT stratum, n_rows,
          CASE stratum WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15
               WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15 WHEN 'zh' THEN 0.15
          END AS target_share
        FROM c),
      n AS (SELECT min(CAST(n_rows AS DOUBLE) / target_share) AS nv
        FROM t WHERE target_share IS NOT NULL)
      SELECT stratum, n_rows, CAST(target_share AS DOUBLE) AS target_share,
        coalesce(CAST(target_share AS DOUBLE) * nv / n_rows, 0.0) AS keep_rate,
        CAST(floor(coalesce(CAST(target_share AS DOUBLE) * nv / n_rows, 0.0)
          * 10000) AS INTEGER) AS keep_bp
      FROM t, n
      ORDER BY stratum"""))

  /** Incremental ingest dedup (continual pretraining): a NEW batch
    * (doc_id >= 400 stands in for today's crawl) is admitted only
    * where its content fingerprint appears in neither the ingested
    * corpus (doc_id < 400) nor earlier in the batch itself —
    * batch-vs-corpus LEFT ANTI on the fingerprint, then first-wins
    * within the batch. The anti-join shuffles only fingerprints
    * (8 bytes/doc), never text; the streaming twin
    * (StreamingDedup) handles the at-ingest form, this is the
    * batch-vs-store form.
    */
  val dd_incremental = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.fingerprint(col("text")).as("fp"))
      val corpus = docs.filter(col("doc_id") < 400)
      val batch = docs.filter(col("doc_id") >= 400)
      Dedup.exactBy(batch, col("fp"), "doc_id")
        .join(corpus.select(col("fp")).distinct(), Seq("fp"), "left_anti")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (SELECT doc_id, source,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
            c -> CAST(ord(c) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 2147483647) AS fp
      FROM documents),
      corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id < 400),
      batch AS (SELECT doc_id, source, fp,
          row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
        FROM f WHERE doc_id >= 400)
      SELECT doc_id, source FROM batch
      WHERE rn = 1 AND fp NOT IN (SELECT fp FROM corpus)
      ORDER BY doc_id"""))

  /** Within-document repetition score (the Gopher/C4-style repetition
    * filter): 1 − distinct/total word-3-grams — boilerplate and
    * looping generations score high. One per-row kernel pass (the
    * native distinct-gram counter from the dedup family), no shuffle.
    */
  val txt_repetition = Q(
    (s, dir) => {
      val toks = split(T.normText(col("text")), " ")
      T_(s, dir, "documents").select(
          col("doc_id"),
          greatest(size(toks) - 2, lit(0)).cast("long").as("n_grams"),
          // greatest-with-0 also absorbs NULL text: size(null) is -1
          // with ANSI off, while the oracle's CASE yields 0
          greatest(size(graft.plans.TextExpressions.distinctWordGramsFast(toks, 3)),
            lit(0)).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          when(col("n_grams") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
            .otherwise(lit(0.0)))
        .withColumn("flagged", col("rep_ratio") > 0.2)
    },
    Some("""WITH t AS (SELECT doc_id,
        string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      FROM documents),
      c AS (SELECT doc_id,
        CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_grams,
        CAST(CASE WHEN len(t) >= 3 THEN len(list_distinct([
            concat_ws(' ', t[i], t[i+1], t[i+2]) FOR i IN range(1, len(t) - 1)]))
          ELSE 0 END AS BIGINT) AS n_distinct
      FROM t)
      SELECT doc_id, n_grams, n_distinct,
        CASE WHEN n_grams > 0
             THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
             ELSE 0.0 END AS rep_ratio,
        CASE WHEN n_grams > 0
             THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
             ELSE 0.0 END > 0.2 AS flagged
      FROM c"""))

  /** Benchmark decontamination: flag corpus documents sharing any word
    * 4-gram with the held-out set (source src0 stands in for an eval
    * benchmark). The benchmark's gram set is DISTINCT-ed and broadcast
    * — benchmarks are small by nature, so the corpus side is never
    * shuffled; the only aggregate is the per-document hit count.
    */
  val txt_contamination = Q(
    (s, dir) => {
      val toks = split(T.normText(col("text")), " ")
      val grams = T_(s, dir, "documents").select(col("doc_id"), col("source"),
        explode(graft.plans.TextExpressions.distinctWordGramsFast(toks, 4)).as("gram"))
      val bench = grams.filter(col("source") === "src0").select("gram").distinct()
      grams.filter(col("source") =!= "src0")
        .join(broadcast(bench), Seq("gram"))
        .groupBy("doc_id")
        // grams are already distinct per document (kernel dedupes), so
        // a plain count is the distinct-hit count without a distinct agg
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, source,
        string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      FROM documents),
      g AS (SELECT doc_id, source, unnest(list_distinct([
          concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]) FOR i IN range(1, len(t) - 2)])) AS gram
        FROM t WHERE len(t) >= 4),
      bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
      SELECT g.doc_id, count(*) AS n_hits
      FROM g JOIN bench USING (gram)
      WHERE g.source <> 'src0'
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""))

  /** Fixed-window payload chunking (the audio modality shape: one
    * clip → N fixed-duration windows). Payload excluded from the
    * checked projection — the oracle verifies the full chunk
    * accounting (count, offsets, sizes) from byte lengths, same
    * discipline as `mm_resize`.
    */
  val mm_chunk_audio = Q(
    (s, dir) => {
      val media = T_(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
      graft.operators.Multimodal.chunkPayloads(media, chunkBytes = 100)
        .select(col("media_id"), col("chunk_idx"), col("offset"), col("n_bytes"))
    },
    Some("""WITH b AS (SELECT doc_id AS media_id,
        octet_length(encode(text)) AS n FROM documents)
      SELECT media_id, CAST(i AS INTEGER) AS chunk_idx,
        CAST(i * 100 AS INTEGER) AS offset,
        CAST(least(100, n - i * 100) AS INTEGER) AS n_bytes
      FROM b, unnest(range(0, CAST(ceil(n / 100.0) AS BIGINT))) AS t(i)"""))

  private def cosSql(a: String, b: String): String = {
    def ss(x: String, y: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          [CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) FOR i IN range(1, len($x) + 1)]),
          (p, r) -> p + r)"""
    s"""CASE WHEN sqrt(${ss(a, a)}) > 0 AND sqrt(${ss(b, b)}) > 0
        THEN ${ss(a, b)} / (sqrt(${ss(a, a)}) * sqrt(${ss(b, b)})) END"""
  }

  /** Top-k search over the SQ8 store with exact re-scoring: candidates
    * rank by cosine on the DEQUANTIZED int8 vectors (the 4x-smaller
    * memory-resident form), then only the k survivors are re-scored
    * against full-precision vectors — the memory-bound search pattern
    * of a large embedding store. Corpus is never shuffled (broadcast
    * query side + two-phase top-k); the exact re-score touches
    * k x queries rows.
    */
  val vec_topk_quantized = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      // corpus → SQ8 codes → dequantized approximate vectors (store
      // built by the same helper as vec_quantize_int8 — no drift)
      val store = Similarity.sq8Store(emb, "embedding", "vec_id")
        .select(col("id"), col("v"),
          V.dequantizeInt8(col("mn"), col("mx"), col("q")).as("d"))
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val approx = store.crossJoin(broadcast(queries))
        .withColumn("cos", cosineFast(col("d"), col("qv")))
      val top = Similarity.twoPhaseTopK(approx.select("qid", "id", "cos"), k = 10)
        .withColumnRenamed("cos", "cos_q")
      // exact re-score of the k survivors only (tiny joins by key)
      top.join(store.select(col("id"), col("v")), Seq("id"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("id"), col("cos_q"),
          cosineFast(col("v"), col("qv")).as("cos_exact"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH c0 AS (SELECT vec_id AS id,
        [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
      s AS (SELECT id, v, list_min(v) AS mn, list_max(v) AS mx FROM c0),
      qd AS (SELECT id, v, mn, mx, [CASE WHEN mx > mn
          THEN CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS INTEGER) - 128
          ELSE -128 END FOR x IN v] AS q FROM s),
      dq AS (SELECT id, v,
          [mn + (CAST(qi AS DOUBLE) + 128) / 255 * (mx - mn) FOR qi IN q] AS d
        FROM qd),
      qs AS (SELECT vec_id AS qid, [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
        FROM embeddings WHERE vec_id < 3),
      sc AS (SELECT qid, id, v, qv, ${cosSql("d", "qv")} AS cos_q FROM dq, qs),
      top AS (SELECT qid, id, v, qv, cos_q, CAST(row_number() OVER (
          PARTITION BY qid ORDER BY cos_q DESC NULLS LAST, id ASC) AS INTEGER) AS rank
        FROM sc)
      SELECT qid, id, cos_q, ${cosSql("v", "qv")} AS cos_exact, rank
      FROM top WHERE rank <= 10 ORDER BY qid, rank"""))

  val all: Map[String, Q] = Map(
    "samp_stratified" -> samp_stratified,
    "samp_capped_per_source" -> samp_capped_per_source,
    "samp_token_budget" -> samp_token_budget,
    "samp_token_budget_large" -> samp_token_budget_large,
    "samp_mixture_rates" -> samp_mixture_rates,
    "vec_quantize_int8" -> vec_quantize_int8,
    "dd_incremental" -> dd_incremental,
    "txt_repetition" -> txt_repetition,
    "txt_contamination" -> txt_contamination,
    "mm_chunk_audio" -> mm_chunk_audio,
    "vec_topk_quantized" -> vec_topk_quantized,
  )
}
