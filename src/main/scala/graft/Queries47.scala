package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 47 (round 7): preference-pair construction, exact-rational
  * retrieval eval metrics, and duplication-inflation accounting.
  */
object Queries47 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private val toksSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
      ELSE len(string_split_regex(trim(text), '\s+')) END"""

  // ===========================================================
  // Preference pairs from duplicate clusters
  // ===========================================================

  /** PREFERENCE PAIRS from near-duplicate variants: for every
    * MinHash-LSH candidate pair with estimated Jaccard >= 0.5
    * (`dd_minhash_lsh`'s own pair table — same machinery, same
    * coefficients), orient the pair by quality: chosen = the
    * higher-quality variant, rejected = the lower (micro-quantized
    * through decimal, so the ordering replays exactly; strict gap
    * only — equal-quality pairs carry no preference signal). This is
    * the cheapest real source of same-content/different-quality
    * training pairs a preference tuner (DPO / reward data) mines
    * from a raw crawl, where variants differ in mojibake, casing
    * damage, or truncation.
    *
    * Plan: the LSH candidate generation is the banded bucket join
    * the dedup family already runs; orientation is two broadcast-
    * size joins against the per-doc quality table.
    */
  val pipeline_dpo_pairs = Q(
    (s, dir) => {
      val quality = T_(s, dir, "documents")
        .select(col("doc_id"),
          T.qualityScore(col("text")).cast("decimal(10,6)")
            .*(lit(1000000)).cast("long").as("q_micro"))
      val pairs = Queries3.dd_minhash_lsh.fn(s, dir)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      pairs
        .join(quality.select(col("doc_id").as("id_a"),
          col("q_micro").as("qa")), "id_a")
        .join(quality.select(col("doc_id").as("id_b"),
          col("q_micro").as("qb")), "id_b")
        .filter(col("qa") =!= col("qb"))
        .select(
          when(col("qa") > col("qb"), col("id_a")).otherwise(col("id_b"))
            .as("chosen_id"),
          when(col("qa") > col("qb"), col("id_b")).otherwise(col("id_a"))
            .as("rejected_id"),
          abs(col("qa") - col("qb")).as("gap_micro"))
        .orderBy(col("chosen_id"), col("rejected_id"))
    },
    Some(s"""WITH pairs AS (SELECT id_a, id_b
          FROM (${Queries3.dd_minhash_lsh.oracle.get})
          WHERE est_jaccard >= 0.5),
        quality AS (SELECT doc_id,
            CAST(CAST(${Queries3.qualitySqlExpr} AS DECIMAL(10,6)) * 1000000
              AS BIGINT) AS q_micro
          FROM documents)
      SELECT CASE WHEN qa.q_micro > qb.q_micro THEN id_a ELSE id_b END
          AS chosen_id,
        CASE WHEN qa.q_micro > qb.q_micro THEN id_b ELSE id_a END
          AS rejected_id,
        abs(qa.q_micro - qb.q_micro) AS gap_micro
      FROM pairs
      JOIN quality qa ON pairs.id_a = qa.doc_id
      JOIN quality qb ON pairs.id_b = qb.doc_id
      WHERE qa.q_micro != qb.q_micro
      ORDER BY chosen_id, rejected_id"""))

  // ===========================================================
  // Retrieval eval: hits@k + exact-rational MRR
  // ===========================================================

  /** RETRIEVAL EVAL for the hybrid fusion stack: grade
    * `rag_rrf_fusion`'s top-10 against the exact-cosine truth
    * (`vec_topk_bruteforce`, self excluded): hits@1, hits@10, and
    * MRR as an EXACT rational — reciprocal ranks carried in
    * 2520ths (2520 = lcm(1..10), so every 1/rank is an integer) —
    * the leaderboard row a retrieval deploy publishes, float-free.
    */
  val eval_retrieval_metrics = Q(
    (s, dir) => {
      val fused = Queries41.rag_rrf_fusion.fn(s, dir)
        .select(col("qid"), col("cand"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid"))
            .orderBy(col("rrf_milli").desc, col("cand").asc)).as("rank"))
      val truth = Queries3.vec_topk_bruteforce.fn(s, dir)
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id").as("cand"))
      val hits = fused.join(truth, Seq("qid", "cand"))
      val firstHit = hits.groupBy(col("qid"))
        .agg(min(col("rank")).as("first_rank"),
          count(lit(1)).as("n_hits"))
      firstHit
        .agg(count(lit(1)).as("n_queries_with_hit"),
          sum(when(col("first_rank") === 1, 1L).otherwise(0L)).as("hits_at_1"),
          sum(col("n_hits")).as("hits_at_10"),
          sum(expr("2520 div first_rank")).as("mrr_2520_sum"))
    },
    Some {
      val fusedSql = Queries41.rag_rrf_fusion.oracle.get
      val truthSql = Queries3.vec_topk_bruteforce.oracle.get
      s"""WITH fused AS (SELECT qid, cand,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY rrf_milli DESC, cand ASC) AS INTEGER) AS rank
          FROM ($fusedSql)),
        truth AS (SELECT qid, id AS cand FROM ($truthSql) WHERE id != qid),
        hits AS (SELECT f.qid, f.rank FROM fused f
          JOIN truth t ON f.qid = t.qid AND f.cand = t.cand),
        fh AS (SELECT qid, min(rank) AS first_rank, count(*) AS n_hits
          FROM hits GROUP BY 1)
      SELECT count(*) AS n_queries_with_hit,
        CAST(SUM(CASE WHEN first_rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS hits_at_1,
        CAST(SUM(n_hits) AS BIGINT) AS hits_at_10,
        CAST(SUM(2520 // first_rank) AS BIGINT) AS mrr_2520_sum
      FROM fh"""
    })

  // ===========================================================
  // Duplication-inflation accounting
  // ===========================================================

  /** DUPLICATION INFLATION per source: how much of each source's
    * token mass is inflation from exact-dup clusters (tokens beyond
    * one copy per cluster) — the number that justifies a dedup pass
    * to whoever pays for the training tokens. One scan → cluster
    * sizes meet rows in one aggregate pair (the soft-dedup shape).
    */
  val dd_dup_inflation = Q(
    (s, dir) => {
      val keyed = T_(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.normText(col("text")).as("ck"),
          T.wsTokenCount(col("text")).cast("long").as("toks"))
      val clusters = keyed.groupBy(col("ck"))
        .agg(count(lit(1)).as("cn"), min(col("doc_id")).as("keep_id"))
      keyed.join(clusters, "ck")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens"),
          sum(when(col("doc_id") =!= col("keep_id"), col("toks"))
            .otherwise(0L)).as("dup_tokens"))
        .withColumn("inflation_permille",
          expr("(dup_tokens * 1000) div tokens"))
        .orderBy(col("source"))
    },
    Some(s"""WITH keyed AS (SELECT doc_id, source,
            $normSql AS ck,
            CAST($toksSql AS BIGINT) AS toks
          FROM documents),
        cl AS (SELECT ck, count(*) AS cn, min(doc_id) AS keep_id
          FROM keyed GROUP BY 1)
      SELECT source, count(*) AS n_docs,
        CAST(SUM(toks) AS BIGINT) AS tokens,
        CAST(SUM(CASE WHEN doc_id != keep_id THEN toks ELSE 0 END) AS BIGINT)
          AS dup_tokens,
        CAST(SUM(CASE WHEN doc_id != keep_id THEN toks ELSE 0 END) AS BIGINT)
          * 1000 // CAST(SUM(toks) AS BIGINT) AS inflation_permille
      FROM keyed JOIN cl USING (ck)
      GROUP BY 1 ORDER BY 1"""))

  val all: Map[String, Q] = Map(
    "pipeline_dpo_pairs" -> pipeline_dpo_pairs,
    "eval_retrieval_metrics" -> eval_retrieval_metrics,
    "dd_dup_inflation" -> dd_dup_inflation,
  )
}
