package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, Sampling, Sketches}
import Queries.Q

/** Batch 12: RAG-prep chunking and frequency sketching — overlapping
  * text windows with per-chunk fingerprints, and a count-min sketch
  * estimating heavy-hitter frequencies in d×w integers. Both replay
  * bit-for-bit in the DuckDB oracle.
  */
object Queries12 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val chunkW = 120
  private val chunkS = 80

  /** The shared chunk pipeline (doc_id, chunk_idx, start, chunk_len,
    * fp) over any (doc_id, text) frame — factored so the single-op
    * query and the composed RAG pipeline cannot drift. */
  private[graft] def chunked(docs: org.apache.spark.sql.DataFrame) = docs
    .filter(length(col("text")) > 0)
    .select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("len"))
    .select(col("doc_id"),
      expr(s"explode(sequence(0L, (len - 1) div $chunkS))").as("chunk_idx"),
      col("text"))
    .select(col("doc_id"), col("chunk_idx"),
      (col("chunk_idx") * chunkS).as("start"),
      expr(s"substring(text, cast(chunk_idx * $chunkS + 1 as int), $chunkW)")
        .as("chunk"))
    .select(col("doc_id"), col("chunk_idx"), col("start"),
      length(col("chunk")).as("chunk_len"),
      T.fingerprintFrom(col("chunk")).as("fp"))

  /** The chunk pipeline as DuckDB SQL over a relation exposing
    * (doc_id, text). */
  private def chunkedSql(rel: String) =
    s"""SELECT doc_id, idx AS chunk_idx, idx * $chunkS AS start,
        CAST(length(ch) AS INTEGER) AS chunk_len,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(ch, ''), c -> CAST(ord(c) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 2147483647) AS fp
      FROM (SELECT doc_id, idx,
          substr(text, CAST(idx * $chunkS + 1 AS INTEGER), $chunkW) AS ch
        FROM (SELECT doc_id, text,
            unnest(range((length(text) - 1) // $chunkS + 1)) AS idx
          FROM $rel WHERE length(text) > 0))"""

  /** Overlapping text chunks (window 120 chars, stride 80 — 40-char
    * overlap): the retrieval-prep step that cuts documents into
    * embedding-sized passages without losing sentence boundaries to a
    * hard cut. Start offsets are `sequence`-generated per row (no join,
    * no shuffle — the only wide operation is the output itself), and
    * each chunk carries the poly31 fingerprint for downstream
    * chunk-level dedup (`dd_span_frac` is the span twin over fixed
    * blocks). Integer division is guarded non-negative: Spark `div`
    * truncates toward zero while DuckDB `//` floors, so `(len-1)`
    * must never be negative — empty docs are filtered, not chunked.
    */
  val txt_chunk_overlap = Q(
    (s, dir) => chunked(T_(s, dir, "documents")),
    Some(chunkedSql("documents")))

  private val cmsD = 4
  private val cmsW = 512

  /** Count-min frequency estimates for the event heavy hitters: the
    * d×w-integer sketch answering "how often does user u appear"
    * without a per-key table ([[Sketches.cmsCounters]] — one scan,
    * counters always broadcast-sized). Candidates are the exact top-10
    * (`a_heavy_hitters` form), so the output exposes estimate vs truth
    * side by side; `cms_est >= n` by construction (collisions only
    * add). At 100 TB the counters stand in for the full per-user
    * count table wherever only hot-key magnitudes matter.
    */
  val a_cms_heavy = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val counters = Sketches.cmsCounters(ev, col("user_id"), cmsD, cmsW)
      val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id").asc).limit(10)
      Sketches.cmsLookup(counters, top, col("user_id"), cmsD, cmsW)
    },
    Some(s"""WITH params AS (SELECT unnest(range($cmsD)) AS j),
      hashed AS (SELECT j,
        ((user_id + j * 1000003) % 94906249) * 1103515245 % 2147483647 % $cmsW AS b
        FROM events CROSS JOIN params),
      counters AS (SELECT j, b, count(*) AS c FROM hashed GROUP BY 1, 2),
      exact AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1
        ORDER BY n DESC, user_id ASC LIMIT 10),
      cand AS (SELECT user_id, n, j,
        ((user_id + j * 1000003) % 94906249) * 1103515245 % 2147483647 % $cmsW AS b
        FROM exact CROSS JOIN params)
      SELECT cand.user_id, any_value(cand.n) AS n,
        CAST(min(c.c) AS BIGINT) AS cms_est
      FROM cand JOIN counters c ON cand.j = c.j AND cand.b = c.b
      GROUP BY cand.user_id"""))

  private val ragQualityMin = 0.5
  private val ragShards = 16

  /** End-to-end RAG corpus prep, composed from the round's single-op
    * pieces (whose SQL fragments it shares, so the pipeline and the
    * unit queries cannot drift): quality-gate the corpus → cut
    * overlapping passages → drop duplicate chunks corpus-wide (argmin
    * on the chunk fingerprint — boilerplate passages repeat ACROSS
    * documents) → hash-shard the survivors and emit the per-shard
    * loader manifest. Plan: scan → codegen chunker → one dedup
    * shuffle → one manifest aggregate; nothing else moves data.
    */
  val pipeline_rag_prep = Q(
    (s, dir) => {
      val gated = T_(s, dir, "documents")
        .filter(T.qualityScore(col("text")) >= ragQualityMin)
        .select(col("doc_id"), col("text"))
      val survivors = Dedup.exactByOrd(chunked(gated), col("fp"),
        struct(col("doc_id"), col("chunk_idx")))
      survivors
        .groupBy((Sampling.detHash2(col("fp")) % ragShards).as("shard"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("chunk_len").cast("long")).as("chars"))
    },
    Some {
      val h2 = "(((fp % 94906249) * 1103515245 % 2147483647) % 94906249)" +
        " * 1103515245 % 2147483647"
      s"""WITH gated AS (SELECT doc_id, text FROM documents
        WHERE ${Queries3.qualitySqlExpr} >= $ragQualityMin),
      chunks AS (${chunkedSql("gated")}),
      survivors AS (SELECT * FROM chunks QUALIFY
        row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) = 1)
      SELECT $h2 % $ragShards AS shard, count(*) AS n_chunks,
        count(DISTINCT doc_id) AS n_docs,
        CAST(SUM(chunk_len) AS BIGINT) AS chars
      FROM survivors GROUP BY 1"""
    })

  /** The library's SQL surface end-to-end: a corpus profile written
    * entirely in `spark.sql` against the `graft_*` functions that
    * [[graft.plans.GraftExtensions]] registers — the UX a SQL-first
    * user of the engine gets (the analog of the reference's Cypher
    * surface). The scalar library is `Column`-composed, so the SQL
    * path plans IDENTICALLY to the DataFrame form — codegen included —
    * and the oracle is the same generated fragment set as
    * `txt_langid`/`txt_quality`/`txt_token_counts`.
    */
  val sql_text_profile = Q(
    (s, dir) => {
      graft.plans.GraftExtensions.register(s)
      T_(s, dir, "documents").createOrReplaceTempView("documents_sql_v")
      s.sql("""SELECT graft_lang_id(text) AS lang_guess,
          count(*) AS n,
          sum(graft_ws_tokens(text)) AS tokens,
          CAST(SUM(CAST(graft_quality(text) AS DECIMAL(27,8))) AS DOUBLE)
            / COUNT(*) AS avg_quality
        FROM documents_sql_v GROUP BY lang_guess""")
    },
    Some {
      s"""WITH sc AS (SELECT text, ${Queries3.langScoreExprsSql} FROM documents),
      lg AS (SELECT ${Queries3.langGuessCaseSql} AS lang_guess,
        ${Queries3.wsTokensSql} AS ws_tokens,
        ${Queries3.qualitySqlExpr} AS quality FROM sc)
      SELECT lang_guess, count(*) AS n,
        CAST(SUM(ws_tokens) AS BIGINT) AS tokens,
        CAST(SUM(CAST(quality AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*) AS avg_quality
      FROM lg GROUP BY 1"""
    })

  val all: Map[String, Q] = Map(
    "txt_chunk_overlap" -> txt_chunk_overlap,
    "a_cms_heavy" -> a_cms_heavy,
    "pipeline_rag_prep" -> pipeline_rag_prep,
    "sql_text_profile" -> sql_text_profile,
  )
}
