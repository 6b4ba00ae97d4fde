package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Bloom, Sampling}
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import Queries.Q

/** Batch 41 (round 7): bloom-filter join pruning with a measured
  * false-positive audit, hybrid dense+sparse retrieval fusion (RRF),
  * bigram-LM surprisal scoring, rolling exact medians, quality-vs-dup
  * calibration, and cluster-aware k-fold assignment.
  */
object Queries41 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val tokensSqlD =
    """string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""
  private def detHashSql(k: String) = Sampling.detHashSql(k)
  private def detHash2Sql(k: String) = Sampling.detHash2Sql(k)

  // ===========================================================
  // Bloom-filter semi-join pruning (audited)
  // ===========================================================

  /** BLOOM-PRUNE AUDIT: build a 64512-bit / 2-hash Bloom bitmap over
    * the order keys of URGENT orders, probe every distinct lineitem
    * order key, and tally the three verdicts — `pruned` (bloom no:
    * guaranteed non-member, the rows a runtime filter would skip
    * before the shuffle), `hit_true` (candidate, real member) and
    * `hit_false` (candidate, NOT a member — the false-positive cost).
    * Zero `pruned` true-members is the bloom guarantee; the driver
    * hash-checks it because a violated guarantee changes the counts.
    *
    * Scale: the bitmap collapses to <=1024 rows in one keyed shuffle
    * and re-enters as an 8 KiB broadcast; the probe side is one scan
    * with two broadcast lookups — the exact dataflow of Spark's
    * runtime bloom-filter join, made measurable.
    */
  val j12_bloom_prune = Q(
    (s, dir) => {
      val dim = T_(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")).distinct()
      val bits = Bloom.build(dim, col("k"))
      val probe = T_(s, dir, "lineitem")
        .select(col("l_orderkey").as("k")).distinct()
      Bloom.probe(bits, probe, col("k"))
        .join(dim.withColumn("is_true", lit(true)), Seq("k"), "left")
        .withColumn("status",
          when(!col("bloom_pass"), "pruned")
            .when(col("is_true"), "hit_true").otherwise("hit_false"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
        .orderBy(col("status"))
    },
    Some {
      val Seq(p1, p2) = Bloom.posSql("k")
      s"""WITH dim AS (SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'),
        pos AS (SELECT unnest([$p1, $p2]) AS pos FROM dim),
        bits AS (SELECT pos // 63 AS word,
            bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bm
          FROM pos GROUP BY 1),
        probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        pr AS (SELECT k, ($p1) AS pp1, ($p2) AS pp2 FROM probe),
        fl AS (SELECT pr.k,
            (coalesce(b1.bm, 0) & (CAST(1 AS BIGINT) << CAST(pp1 % 63 AS INTEGER))) != 0
            AND
            (coalesce(b2.bm, 0) & (CAST(1 AS BIGINT) << CAST(pp2 % 63 AS INTEGER))) != 0
              AS pass
          FROM pr
          LEFT JOIN bits b1 ON pp1 // 63 = b1.word
          LEFT JOIN bits b2 ON pp2 // 63 = b2.word)
      SELECT CASE WHEN NOT pass THEN 'pruned'
               WHEN dim.k IS NOT NULL THEN 'hit_true'
               ELSE 'hit_false' END AS status,
        count(*) AS n_keys
      FROM fl LEFT JOIN dim ON fl.k = dim.k
      GROUP BY 1 ORDER BY 1"""
    })

  // ===========================================================
  // Hybrid retrieval: dense cosine + sparse rare-token, RRF-fused
  // ===========================================================

  private val rrfProbes = 4
  private val rrfDepth = 20
  private val rrfTop = 10
  private val rrfMaxDf = 50

  /** HYBRID RETRIEVAL FUSION (query-by-example): for 4 hash-chosen
    * probe documents, rank the corpus two independent ways — DENSE
    * (embedding cosine, exact top-20) and SPARSE (sum of integer idf
    * over shared rare tokens, df <= 50, top-20) — then combine with
    * reciprocal-rank fusion: rrf = Σ 60000 div (60 + rank), summed
    * over the lists that retrieved the candidate. Top-10 fused per
    * probe, with both source ranks exposed (NULL = that ranker
    * missed it) — the standard hybrid-RAG retriever head.
    *
    * Scale: the probe side is k rows broadcast into both rankers;
    * the sparse join runs on the df-pruned inverted index (rare
    * tokens only, the same recall-bound pruning as the n-gram dedup
    * family), and the fusion joins two k·20-row lists. Nothing
    * quadratic in the corpus.
    */
  val rag_rrf_fusion = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val probes = emb
        .withColumn("h", Sampling.detHash2(col("vec_id")))
        .orderBy(col("h").asc, col("vec_id").asc).limit(rrfProbes)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val dense = emb.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cand"),
          V.cosine(col("embedding"), col("qv")).as("cos"))
        .withColumn("rank_dense", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(desc_nulls_last("cos"), col("cand").asc)))
        .filter(col("rank_dense") <= rrfDepth)
        .select(col("qid"), col("cand"), col("rank_dense"))

      val dtok = T_(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(T.normText(col("text")), " "))).as("tok"))
        .filter(col("tok") =!= "")
      val ndocs = T_(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val idf = dtok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= rrfMaxDf)
        .crossJoin(broadcast(ndocs))
        .select(col("tok"), expr("(n_docs * 1000) div df").as("idf"))
      val qtok = dtok.join(broadcast(probes.select(col("qid"))),
          dtok("doc_id") === col("qid"))
        .select(col("qid"), col("tok"))
        .join(idf, "tok")
      val sparse = broadcast(qtok)
        .join(dtok.select(col("doc_id").as("cand"), col("tok")), Seq("tok"))
        .filter(col("cand") =!= col("qid"))
        .groupBy(col("qid"), col("cand"))
        .agg(sum(col("idf")).as("s"))
        .withColumn("rank_sparse", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("s").desc, col("cand").asc)))
        .filter(col("rank_sparse") <= rrfDepth)
        .select(col("qid"), col("cand"), col("rank_sparse"))

      dense.join(sparse, Seq("qid", "cand"), "full_outer")
        .withColumn("rrf_milli",
          expr("""CAST(coalesce(60000 div (60 + rank_dense), 0)
                     + coalesce(60000 div (60 + rank_sparse), 0) AS BIGINT)"""))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("rrf_milli").desc, col("cand").asc)))
        .filter(col("rank") <= rrfTop)
        .select(col("qid"), col("cand"), col("rrf_milli"),
          col("rank_dense"), col("rank_sparse"))
        .orderBy(col("qid"), col("rrf_milli").desc, col("cand"))
    },
    Some(s"""WITH probes AS (
          SELECT vec_id AS qid, embedding AS qv FROM embeddings
          QUALIFY row_number() OVER (ORDER BY ${detHash2Sql("vec_id")} ASC,
            vec_id ASC) <= $rrfProbes),
        c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
        dense AS (SELECT qid, cand, rank_dense FROM (
            SELECT p.qid, c.id AS cand,
              CAST(row_number() OVER (PARTITION BY p.qid
                ORDER BY ${Queries3.cosineSql("v", "qv")} DESC NULLS LAST,
                  c.id ASC) AS INTEGER) AS rank_dense
            FROM c JOIN probes p ON c.id != p.qid)
          WHERE rank_dense <= $rrfDepth),
        dtok AS (SELECT DISTINCT doc_id, unnest($tokensSqlD) AS tok
          FROM documents),
        dtok2 AS (SELECT doc_id, tok FROM dtok WHERE tok != ''),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        idf AS (SELECT tok, (n_docs * 1000) // df AS idf FROM
            (SELECT tok, count(*) AS df FROM dtok2 GROUP BY 1) t, nd
          WHERE df <= $rrfMaxDf),
        qtok AS (SELECT p.qid, d.tok, i.idf
          FROM dtok2 d JOIN probes p ON d.doc_id = p.qid
          JOIN idf i ON d.tok = i.tok),
        sparse AS (SELECT qid, cand, rank_sparse FROM (
            SELECT q.qid, d.doc_id AS cand,
              CAST(row_number() OVER (PARTITION BY q.qid
                ORDER BY sum(q.idf) DESC, d.doc_id ASC) AS INTEGER)
                AS rank_sparse
            FROM qtok q JOIN dtok2 d ON q.tok = d.tok AND d.doc_id != q.qid
            GROUP BY q.qid, d.doc_id)
          WHERE rank_sparse <= $rrfDepth),
        fused AS (SELECT coalesce(de.qid, sp.qid) AS qid,
            coalesce(de.cand, sp.cand) AS cand,
            CAST(coalesce(60000 // (60 + rank_dense), 0)
               + coalesce(60000 // (60 + rank_sparse), 0) AS BIGINT)
              AS rrf_milli,
            rank_dense, rank_sparse
          FROM dense de FULL OUTER JOIN sparse sp
            ON de.qid = sp.qid AND de.cand = sp.cand)
      SELECT qid, cand, rrf_milli, rank_dense, rank_sparse FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY rrf_milli DESC, cand ASC) AS rnk FROM fused)
      WHERE rnk <= $rrfTop
      ORDER BY qid, rrf_milli DESC, cand"""))

  // ===========================================================
  // Bigram-LM surprisal (integer log2, float-free)
  // ===========================================================

  /** BIGRAM-LM SURPRISAL: score each document's fluency against the
    * corpus's own bigram table with integer log2 — surprisal of
    * bigram (w1,w2) is ilog2(C(w1,·)) − ilog2(C(w1,w2)) where
    * ilog2(x) = len(bin(x)), both counts from ONE corpus bigram
    * pass. A document's score is the tf-weighted mean in milli
    * (lower = assembled from common continuations — fluent; higher =
    * improbable token transitions). The float-free stand-in for
    * KenLM-style perplexity filtering.
    *
    * Plan: bigrams collapse to per-doc (w1,w2,tf) map-side first, the
    * corpus table and its w1-marginal are keyed aggregates of that
    * same relation, and scoring is two equi-joins on the bigram/token
    * key followed by a per-doc re-aggregate — the txt_rarity_score
    * shape one n up.
    */
  val txt_lm_score = Q(
    (s, dir) => {
      val toks = split(T.normText(col("text")), " ")
      // the bigram build is CPU-bound on a byte-small scan — widen
      // (see Width.widenIfNarrowScan; measured 2×0.85 s single-task)
      val pairs = graft.operators.Width.widenIfNarrowScan(
          T_(s, dir, "documents"))
        .select(col("doc_id"), toks.as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(slice(tk, 1, size(tk) - 1), (x, i) -> struct(x AS w1, tk[i + 1] AS w2))"))
          .as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      val c12 = pairs.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      pairs.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .withColumn("sp",
          (length(bin(col("c1"))) - length(bin(col("c12")))).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          sum(col("sp") * col("tf")).as("sp_sum"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("(sp_sum * 1000) div n_bigrams").as("surprisal_milli"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, $tokensSqlD AS ws FROM documents
            WHERE len($tokensSqlD) >= 2),
        bg0 AS (SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
            i -> struct_pack(w1 := ws[i + 1], w2 := ws[i + 2]))) AS bg FROM tk),
        pairs AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS tf
          FROM bg0 GROUP BY 1, 2, 3),
        c12 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM pairs
          GROUP BY 1, 2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        sc AS (SELECT p.doc_id, p.tf,
            CAST(len(bin(c1.c1)) - len(bin(c12.c12)) AS BIGINT) AS sp
          FROM pairs p JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
          JOIN c1 ON p.w1 = c1.w1)
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        CAST(CAST(SUM(sp * tf) AS BIGINT) * 1000 AS BIGINT)
          // CAST(SUM(tf) AS BIGINT) AS surprisal_milli
      FROM sc GROUP BY 1 ORDER BY 1"""))

  // ===========================================================
  // Rolling exact median (order-statistic window)
  // ===========================================================

  /** 7-POINT ROLLING MEDIAN of daily revenue per order priority — the
    * robust trend line a spike-polluted daily series needs (a mean
    * window follows the spike; the median ignores it). Exact lower
    * median over the trailing 7 PRESENT days (row frame = trading-day
    * semantics): the window collects at most 7 cents-exact values,
    * sorts, and indexes (n+1) div 2 — deterministic in both engines,
    * no interpolation.
    *
    * Plan: the raw scan collapses to one row per (priority, day)
    * FIRST (keyed aggregate), so the order-statistic window runs over
    * a frame of 7 longs on the already-tiny daily series — the
    * documented compressed-input window pattern.
    */
  val w_rolling_median = Q(
    (s, dir) => {
      val daily = T_(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").as("d"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)"))
          .as("cents"))
      val w = Window.partitionBy(col("pri")).orderBy(col("d"))
        .rowsBetween(-6, 0)
      daily
        .withColumn("n_days", count(lit(1)).over(w))
        .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
        .select(col("pri"), col("d"), col("n_days"),
          expr("element_at(arr, CAST((n_days + 1) div 2 AS INT))").as("med_cents"))
        .orderBy(col("pri"), col("d"))
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS pri, o_orderdate AS d,
            CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        w AS (SELECT pri, d,
            count(*) OVER win AS n_days,
            list_sort(list(cents) OVER win) AS arr
          FROM daily WINDOW win AS (PARTITION BY pri ORDER BY d
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT pri, d, n_days, arr[CAST((n_days + 1) // 2 AS INTEGER)] AS med_cents
      FROM w ORDER BY pri, d"""))

  // ===========================================================
  // Quality-score vs duplication calibration
  // ===========================================================

  /** CALIBRATION BINS: does the heuristic quality score actually
    * separate duplicated boilerplate from unique text? Bin every
    * document by quality decile and tally the exact-duplicate rate
    * (normText cluster size > 1) per bin — the reliability table a
    * curation team reads before trusting one signal to gate the
    * other. One scan, one cluster window, one 10-row aggregate.
    */
  val dq_score_calibration = Q(
    (s, dir) => {
      val w = Window.partitionBy(T.normText(col("text")))
      T_(s, dir, "documents")
        .withColumn("cluster_n", count(lit(1)).over(w))
        .withColumn("bin",
          least(greatest(floor(T.qualityScore(col("text")) * 10), lit(0)), lit(9))
            .cast("int"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cluster_n") > 1, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_permilli", expr("(n_dup * 1000) div n"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH cl AS (SELECT text,
            count(*) OVER (PARTITION BY
              regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS cluster_n
          FROM documents),
        b AS (SELECT CAST(least(greatest(floor((${Queries3.qualitySqlExpr}) * 10),
              0), 9) AS INTEGER) AS bin,
            cluster_n
          FROM cl)
      SELECT bin, count(*) AS n,
        CAST(SUM(CASE WHEN cluster_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        CAST(SUM(CASE WHEN cluster_n > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000
          // count(*) AS dup_permilli
      FROM b GROUP BY 1 ORDER BY 1"""))

  // ===========================================================
  // Cluster-aware k-fold assignment
  // ===========================================================

  private val kFolds = 5

  /** CLUSTER-AWARE K-FOLD split: assign documents to 5 folds by the
    * hash of their exact-dup cluster's min doc_id — every copy of a
    * duplicated text lands in the SAME fold, so cross-validation
    * never trains on fold A's near-copy of fold B's eval row (the
    * leakage that inflates CV scores). Per fold: size, token mass,
    * language spread, and the dominant language's share — the
    * balance check before trusting fold symmetry.
    */
  val samp_kfold = Q(
    (s, dir) => {
      val keyed = T_(s, dir, "documents")
        .withColumn("ck", T.normText(col("text")))
      val cmin = keyed.groupBy(col("ck")).agg(min(col("doc_id")).as("cmin"))
      val folded = keyed.join(cmin, "ck")
        .withColumn("fold", (Sampling.detHash2(col("cmin")) % kFolds).cast("int"))
        .withColumn("toks", T.wsTokenCount(col("text")))
      val perLang = folded.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("nl"), sum(col("toks")).as("tl"))
      perLang.groupBy(col("fold"))
        .agg(sum(col("nl")).as("n_docs"),
          sum(col("tl")).as("tokens"),
          count(lit(1)).as("n_langs"),
          max(col("nl")).as("top_lang_n"))
        .withColumn("top_lang_permilli", expr("(top_lang_n * 1000) div n_docs"))
        .select(col("fold"), col("n_docs"), col("tokens"), col("n_langs"),
          col("top_lang_permilli"))
        .orderBy(col("fold"))
    },
    Some {
      val toksSql =
        """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
          ELSE len(string_split_regex(trim(text), '\s+')) END"""
      s"""WITH keyed AS (SELECT doc_id, lang,
            CAST($toksSql AS BIGINT) AS toks,
            min(doc_id) OVER (PARTITION BY
              regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS cmin
          FROM documents),
        folded AS (SELECT CAST((${detHash2Sql("cmin")}) % $kFolds AS INTEGER)
              AS fold, lang, toks
          FROM keyed),
        pl AS (SELECT fold, lang, count(*) AS nl, CAST(SUM(toks) AS BIGINT) AS tl
          FROM folded GROUP BY 1, 2)
      SELECT fold, CAST(SUM(nl) AS BIGINT) AS n_docs,
        CAST(SUM(tl) AS BIGINT) AS tokens,
        count(*) AS n_langs,
        CAST(MAX(nl) AS BIGINT) * 1000 // CAST(SUM(nl) AS BIGINT)
          AS top_lang_permilli
      FROM pl GROUP BY 1 ORDER BY 1"""
    })

  val all: Map[String, Q] = Map(
    "j12_bloom_prune" -> j12_bloom_prune,
    "rag_rrf_fusion" -> rag_rrf_fusion,
    "txt_lm_score" -> txt_lm_score,
    "w_rolling_median" -> w_rolling_median,
    "dq_score_calibration" -> dq_score_calibration,
    "samp_kfold" -> samp_kfold,
  )
}
