package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Packing, Sampling, Similarity}
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 40 (round 7): the end-to-end loader-manifest pipeline
  * (quality → soft dedup → curriculum order → context packing) and
  * the semantic-dedup threshold sweep.
  */
object Queries40 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val hash1 = "(doc_id % 94906249) * 1103515245 % 2147483647"
  private val hash2 = s"(($hash1) % 94906249) * 1103515245 % 2147483647"

  private val toksSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
      ELSE len(string_split_regex(trim(text), '\s+')) END"""

  /** END-TO-END LOADER MANIFEST: quality-gate the corpus, thin exact
    * duplicates with the soft-dedup gate (expected one copy's mass
    * per cluster), lay the survivors out in curriculum order
    * (shortest length-tier first, deterministic shuffle within the
    * tier), pack the stream into 512-token context windows per
    * language, and emit the per-language manifest (docs, tokens,
    * windows, window-crossing docs) a training loader would mount.
    * Every stage is a catalog-verified operator; the pipeline pins
    * their composition. One scan + one cluster aggregate + one
    * rank window per language — nothing else touches the corpus.
    */
  val pipeline_loader_manifest = Q(
    (s, dir) => {
      val gated = T_(s, dir, "documents")
        .filter(T.qualityScore(col("text")) >= 0.4)
      val kept = Dedup.softDedupWeights(gated, "text", "doc_id")
        .filter(col("kept"))
        .withColumn("toks", T.wsTokenCount(col("text")))
        .withColumn("tier", (length(bin(col("toks") + 1)) - 1).cast("int"))
      val packed = Packing.packSequential(kept, col("lang"), col("toks"),
        Seq(col("tier").asc, Sampling.detHash2(col("doc_id")).asc,
          col("doc_id").asc), ctxLen = 512L)
      packed.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens"),
          (max(col("pack_last")) + 1).as("windows"),
          sum(when(col("n_windows") > 1, 1L).otherwise(0L))
            .as("n_crossing"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH gated AS (SELECT doc_id, text, lang FROM documents
          WHERE ${Queries3.qualitySqlExpr} >= 0.4),
        sd AS (SELECT *, count(*) OVER (PARTITION BY
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
            AS cluster_n FROM gated),
        kept AS (SELECT doc_id, lang,
            CAST($toksSql AS BIGINT) AS toks,
            CAST(length(bin(CAST($toksSql AS BIGINT) + 1)) - 1 AS INTEGER)
              AS tier,
            ($hash2) AS h
          FROM sd
          WHERE ($hash2) % 10000 < 10000 // cluster_n),
        packed AS (SELECT lang, toks,
            coalesce(sum(toks) OVER (PARTITION BY lang
              ORDER BY tier ASC, h ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS stream_off
          FROM kept WHERE toks > 0),
        w AS (SELECT lang, toks, stream_off // 512 AS pack_first,
            (stream_off + toks - 1) // 512 AS pack_last
          FROM packed)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(toks) AS BIGINT) AS tokens,
        CAST(max(pack_last) + 1 AS BIGINT) AS windows,
        CAST(SUM(CASE WHEN pack_last > pack_first THEN 1 ELSE 0 END)
          AS BIGINT) AS n_crossing
      FROM w GROUP BY 1 ORDER BY 1"""))

  /** SEMANTIC-DEDUP THRESHOLD SWEEP: the dd_semantic cell-bucketed
    * pair generator run once at the loosest threshold (0.20), then
    * swept across {20, 25, 30, 35} centi-cosine cuts (dialed to this corpus's diffuse cosine range — max pairwise cos ≈ 0.44) — pair counts
    * and greedy-drop counts per cut, the calibration table a
    * curation deploy reads before committing to a threshold. The
    * sweep itself costs one explode over the (small) pair table.
    */
  val dd_semantic_sweep = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val (indexed, _) =
        Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 16,
          iters = 2)
      Dedup.semanticNearDup(indexed, threshold = 0.20)
        .withColumn("thr_centi",
          explode(typedLit(Seq(20, 25, 30, 35))))
        .filter(col("cos") >= col("thr_centi") / lit(100.0))
        .groupBy(col("thr_centi"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_b")).as("n_dropped"))
        .orderBy(col("thr_centi"))
    },
    Some(s"""WITH c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      cent0 AS (
        SELECT id AS cell,
          [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
        FROM c
        QUALIFY row_number() OVER (ORDER BY
          (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
          id ASC) <= 16),
      ${Queries3.lloydRoundSql(1, "cent0")},
      ${Queries3.lloydRoundSql(2, "cent1")},
      assigned AS (
        SELECT id, v, cell FROM (
          SELECT c.id, c.v, cent2.cell,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST,
                cent2.cell ASC) AS rn
          FROM c, cent2) WHERE rn = 1),
      pairs AS (SELECT * FROM (
          SELECT a.cell, a.id AS id_a, b.id AS id_b,
            ${Queries3.cosineSql("a.v", "b.v")} AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.id < b.id)
        WHERE cos >= 0.20)
      SELECT thr_centi, count(*) AS n_pairs,
        CAST(count(DISTINCT id_b) AS BIGINT) AS n_dropped
      FROM pairs, (SELECT unnest([20, 25, 30, 35]) AS thr_centi) t
      WHERE cos >= thr_centi / 100.0
      GROUP BY 1 ORDER BY 1"""))

  val all: Map[String, Q] = Map(
    "pipeline_loader_manifest" -> pipeline_loader_manifest,
    "dd_semantic_sweep" -> dd_semantic_sweep,
  )
}
