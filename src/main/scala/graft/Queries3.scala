package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.{Dedup, GraphOps, Multimodal, Similarity}
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.streaming.StreamingRollup
import Queries.Q

/** Batch 3 of the query catalog: training-data pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing),
  * graph analytics, and the streaming roll-up. Oracles are generated
  * programmatically where they share parameter lists (stopwords,
  * language markers, iteration counts) with the Scala implementation,
  * so the two sides cannot drift.
  */
object Queries3 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Text analysis
  // ===========================================================

  private val sqlToks =
    """string_split_regex(lower(trim(text)), '\s+')"""

  // Shared oracle fragments (all referencing a `text` column in scope)
  // — factored so the single-op queries and the composed corpus-prep
  // pipeline cannot drift from each other.
  private lazy val stopsSql = T.defaultStopwords.map(s => s"'$s'").mkString(", ")

  private[graft] val wsTokensSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END"""

  private[graft] lazy val qualitySqlExpr =
    s"""round((
         least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         + least((CASE WHEN len($sqlToks) > 0
                  THEN CAST(len(list_filter($sqlToks, t -> t IN ($stopsSql))) AS DOUBLE) / len($sqlToks)
                  ELSE CAST(0.0 AS DOUBLE) END) * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         + (CAST(1.0 AS DOUBLE) - least(CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) * CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
         + (CAST(1.0 AS DOUBLE) - least(CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) * CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
       ) / CAST(4.0 AS DOUBLE), 6)"""

  /** Per-language stopword-hit score columns `s_<lang>`. */
  private[graft] lazy val langScoreExprsSql: String = {
    val langs = T.langMarkers.toSeq.sortBy(_._1)
    langs.map { case (l, ms) =>
      val in = ms.map(m => s"'$m'").mkString(", ")
      s"""CASE WHEN len($sqlToks) > 0
          THEN CAST(len(list_filter($sqlToks, t -> t IN ($in))) AS DOUBLE) / len($sqlToks)
          ELSE CAST(0.0 AS DOUBLE) END AS s_$l"""
    }.mkString(",\n       ")
  }

  /** Argmax over the `s_<lang>` columns, tie → lexicographically
    * larger code, all-zero → 'und'.
    */
  private[graft] lazy val langGuessCaseSql: String = {
    val langs = T.langMarkers.toSeq.sortBy(_._1)
    val desc = langs.map(_._1).sorted.reverse
    val winner = desc.map { l =>
      val conds = langs.map(_._1).filterNot(_ == l)
        .map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n         ")
    val best = langs.map(x => s"s_${x._1}").mkString("greatest(", ", ", ")")
    s"""CASE WHEN $best > 0 THEN
          CASE $winner END
        ELSE 'und' END"""
  }

  /** Token counting: whitespace + BPE-ish heuristic. */
  val txt_token_counts = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("doc_id"),
        T.wsTokenCount(col("text")).as("ws_tokens"),
        T.approxBpeTokenCount(col("text")).as("bpe_tokens")),
    Some("""SELECT doc_id,
       CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
       CAST(ceil(len(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) / CAST(4.0 AS DOUBLE)) AS BIGINT)
         + len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS bpe_tokens
      FROM documents"""))

  /** Quality-score components + composite (length/punct/digit/stopword
    * signals — the heuristics a pretraining filter thresholds on).
    */
  val txt_quality = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("doc_id"),
        T.punctRatio(col("text")).as("punct_ratio"),
        T.digitRatio(col("text")).as("digit_ratio"),
        T.stopwordRatioFast(col("text")).as("stopword_ratio"),
        T.meanWordLen(col("text")).as("mean_word_len"),
        T.qualityScore(col("text")).as("quality")),
    Some {
      s"""SELECT doc_id,
       CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / greatest(length(text), 1) AS digit_ratio,
       CASE WHEN len($sqlToks) > 0
            THEN CAST(len(list_filter($sqlToks, t -> t IN ($stopsSql))) AS DOUBLE) / len($sqlToks)
            ELSE CAST(0.0 AS DOUBLE) END AS stopword_ratio,
       CASE WHEN len(string_split_regex(trim(text), '\\s+')) > 0
            THEN CAST(list_reduce(list_prepend(0,
                   list_transform(string_split_regex(trim(text), '\\s+'), t -> length(t))),
                   (a, b) -> a + b) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+'))
            ELSE CAST(0.0 AS DOUBLE) END AS mean_word_len,
       $qualitySqlExpr AS quality
      FROM documents"""
    })

  /** Language-ID heuristic: argmax of per-language stopword-hit
    * ratios, tie → lexicographically larger code, all-zero → 'und'.
    * The marker lists in the SQL are generated from the same Map the
    * Scala side uses.
    */
  val txt_langid = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("lang_label"),
        T.langIdFast(col("text")).as("lang_guess")),
    Some {
      s"""WITH sc AS (SELECT doc_id, lang AS lang_label,
       $langScoreExprsSql
      FROM documents)
      SELECT doc_id, lang_label,
        $langGuessCaseSql AS lang_guess
      FROM sc"""
    })

  /** Document fingerprinting: polynomial rolling hash of the
    * normalized text + 5-gram shingle count.
    */
  val txt_fingerprint = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("doc_id"), T.normText(col("text")).as("norm"))
      .select(col("doc_id"),
        T.fingerprintFrom(col("norm")).as("fp"),
        T.distinctShingleCount(col("norm"), 5).as("n_shingles")),
    Some("""WITH n AS (SELECT doc_id,
        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(norm, ''), c -> CAST(ord(c) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 2147483647) AS fp,
        CAST(CASE WHEN length(norm) >= 5
             THEN len(list_distinct([substr(norm, i, 5) FOR i IN range(1, length(norm) - 3)]))
             ELSE 0 END AS INTEGER) AS n_shingles
      FROM n"""))

  // ===========================================================
  // Deduplication
  // ===========================================================

  /** Exact dedup by normalized content: first doc_id per text wins. */
  val dd_exact = Q(
    (s, dir) => Dedup.exact(T_(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("source")),
    Some("""SELECT doc_id, source
      FROM (SELECT doc_id, source, row_number() OVER (
              PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
              ORDER BY doc_id ASC) AS rn
            FROM documents)
      WHERE rn = 1"""))

  /** N-gram Jaccard near-dup pairs via inverted index with
    * document-frequency pruning (word 3-grams, df <= 10, sim >= 0.2).
    */
  val dd_ngram_jaccard = Q(
    (s, dir) => Dedup.ngramJaccard(
      T_(s, dir, "documents"), "text", "doc_id",
      tokenize = t => split(T.normText(t), " "),
      gramLen = 3,
      threshold = 0.2, maxDf = Some(10))
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct([
            concat_ws(' ', t[i], t[i+1], t[i+2]) FOR i IN range(1, len(t) - 1)]) AS g
        FROM (SELECT doc_id,
                string_split(regexp_replace(lower(trim(substr(text, 1, 10000))), '\s+', ' ', 'g'), ' ') AS t
              FROM documents)
        WHERE len(t) >= 3),
      inv0 AS (SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM sh),
      rare AS (SELECT gram FROM inv0 GROUP BY gram HAVING count(*) <= 10),
      inv AS (SELECT inv0.* FROM inv0 JOIN rare USING (gram)),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
               count(*) AS inter
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b,
        CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS sim
      FROM pairs
      WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.2
      ORDER BY id_a, id_b"""))

  /** End-to-end corpus dedup: n-gram-Jaccard near-dup pairs →
    * connected components over the pair graph → canonical doc (min id)
    * + size per cluster. Fully SQL-replayable: the oracle chains the
    * ngram-Jaccard CTEs into the same fixed-depth min-label
    * propagation the engine runs.
    */
  val dd_cluster_canonical = Q(
    (s, dir) => Dedup.dedupClusters(
      Dedup.ngramJaccard(
        T_(s, dir, "documents"), "text", "doc_id",
        tokenize = t => split(T.normText(t), " "),
        gramLen = 3, threshold = 0.2, maxDf = Some(10)),
      iterations = 3)
      .orderBy(col("comp")),
    Some {
      val ccSql = (1 to 3).map { t =>
        val prev = s"c${t - 1}"
        s"""c$t AS (SELECT c.id, least(c.comp, coalesce(m.nc, c.comp)) AS comp
           FROM $prev c LEFT JOIN (
             SELECT und.dst AS id, MIN(cc.comp) AS nc
             FROM und JOIN $prev cc ON cc.id = und.src GROUP BY und.dst) m
           ON m.id = c.id)"""
      }.mkString(",\n      ")
      s"""WITH sh AS (
        SELECT doc_id, list_distinct([
            concat_ws(' ', t[i], t[i+1], t[i+2]) FOR i IN range(1, len(t) - 1)]) AS g
        FROM (SELECT doc_id,
                string_split(regexp_replace(lower(trim(substr(text, 1, 10000))), '\\s+', ' ', 'g'), ' ') AS t
              FROM documents)
        WHERE len(t) >= 3),
      inv0 AS (SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM sh),
      rare AS (SELECT gram FROM inv0 GROUP BY gram HAVING count(*) <= 10),
      inv AS (SELECT inv0.* FROM inv0 JOIN rare USING (gram)),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
               count(*) AS inter
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4),
      e AS (SELECT id_a AS src, id_b AS dst FROM p
            WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.2),
      und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      verts AS (SELECT DISTINCT src AS id FROM und),
      c0 AS (SELECT id, id AS comp FROM verts),
      $ccSql
      SELECT comp, MIN(id) AS keep_id, count(*) AS cluster_size
      FROM c3 GROUP BY comp ORDER BY comp"""
    })

  /** MinHash + LSH near-dup candidates, oracle-checked end to end with
    * the replayable poly31 family: window hashes are base-31 code-point
    * folds mod 2^31-1, affine mixes and band buckets stay inside the
    * same field, and the SQL below is generated from the SAME
    * splitmix64-derived coefficients the engine uses
    * (Dedup.minhashCoeffs) — no constant drift possible. Production
    * callers default to the XXH64 family (same pipeline shape).
    */
  val dd_minhash_lsh = Q(
    (s, dir) => Dedup.minhashLsh(T_(s, dir, "documents"), "text", "doc_id",
      shingleLen = 5, bands = 8, rowsPerBand = 4, replayable = true)
      .orderBy(col("id_a"), col("id_b")),
    Some {
      val (mults, adds) = Dedup.minhashCoeffs(32, replayable = true)
      val ml = mults.mkString("[", ", ", "]")
      val al = adds.mkString("[", ", ", "]")
      s"""WITH co AS (SELECT $ml::BIGINT[] AS M, $al::BIGINT[] AS A),
      nrm AS (SELECT doc_id AS id,
          regexp_replace(lower(trim(substr(text, 1, 2000))), '\\s+', ' ', 'g') AS norm
        FROM documents),
      hs AS (SELECT id,
          [list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(substr(norm, i, 5), ''), c -> CAST(ord(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) FOR i IN range(1, length(norm) - 3)] AS hl
        FROM nrm WHERE length(norm) >= 5),
      sigs AS (SELECT id,
          list_transform(range(0, 32), j ->
            list_min(list_transform(hl, h -> (M[j + 1] * h + A[j + 1]) % 2147483647))) AS sig
        FROM hs, co),
      bands AS (SELECT unnest(range(0, 8)) AS b),
      banded AS (SELECT s.id, b.b AS band,
          list_reduce(list_prepend(CAST(0 AS BIGINT), s.sig[b.b * 4 + 1 : b.b * 4 + 4]),
            (a, v) -> (a * 31 + v) % 2147483647) AS bucket
        FROM sigs s, bands b),
      pairs AS (SELECT x.id AS id_a, y.id AS id_b
        FROM banded x JOIN banded y USING (band, bucket)
        WHERE x.id < y.id GROUP BY 1, 2)
      SELECT p.id_a, p.id_b,
        CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32.0 AS est_jaccard
      FROM pairs p
      JOIN sigs sa ON sa.id = p.id_a
      JOIN sigs sb ON sb.id = p.id_b
      ORDER BY id_a, id_b"""
    })

  /** Shared oracle CTE chain: word-bigram shingles → poly31 shingle
    * hashes → 64-bit SimHash fingerprint (bit b votes on hash bit
    * b % 31 — the replayable family of plans.TextExprOps.simhash64Poly;
    * bit 63 needs the literal min-long because DuckDB's checked `<<`
    * refuses 1 << 63).
    */
  private[graft] val simhashFpSql =
    """WITH t AS (SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      sh AS (SELECT doc_id,
          CASE WHEN len(toks) >= 2
               THEN list_distinct([concat_ws(' ', toks[i], toks[i + 1]) FOR i IN range(1, len(toks))])
               ELSE [] END AS g
        FROM t),
      hl AS (SELECT doc_id, list_transform(g, s ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(s, ''), c -> CAST(ord(c) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 2147483647)) AS hs
        FROM sh),
      fp AS (SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(0, 64), b ->
              CASE WHEN coalesce(list_sum(list_transform(hs, h ->
                         CASE WHEN ((h >> (b % 31)) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
                   THEN (CASE WHEN b < 63 THEN (CAST(1 AS BIGINT) << b)
                              ELSE CAST(-9223372036854775808 AS BIGINT) END)
                   ELSE CAST(0 AS BIGINT) END)),
            (a, x) -> a + x) AS simhash
        FROM hl)"""

  /** SimHash fingerprints over word bigrams, replayable poly31 family.
    * Native one-pass kernel (plans.Simhash64) — all 64 bit votes per
    * shingle accumulate in-register, no per-shingle rows.
    */
  val dd_simhash = Q(
    (s, dir) => Dedup.simhashBulk(
      T_(s, dir, "documents")
        .select(col("doc_id"), split(T.normText(col("text")), " ").as("toks"))
        .select(col("doc_id"), T.wordShinglesFrom(col("toks"), 2).as("sh")),
      "doc_id", "sh", replayable = true),
    Some(simhashFpSql + "\n      SELECT doc_id, simhash FROM fp"))

  /** SimHash near-dup pairs via pigeonhole band join + exact Hamming
    * check, oracle-replayed over the same poly31 fingerprints (the
    * band/Hamming machinery is hash-free: shifts, masks, xor,
    * bit_count).
    */
  val dd_simhash_neardup = Q(
    (s, dir) => Dedup.simhashNearDup(
      Dedup.simhashBulk(
        T_(s, dir, "documents")
          .select(col("doc_id"), split(T.normText(col("text")), " ").as("toks"))
          .select(col("doc_id"), T.wordShinglesFrom(col("toks"), 2).as("sh")),
        "doc_id", "sh", replayable = true),
      "doc_id", "simhash", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b")),
    Some(simhashFpSql + """,
      bd AS (SELECT unnest(range(0, 4)) AS b),
      banded AS (SELECT f.doc_id AS id, f.simhash AS fv, bd.b AS band,
          (f.simhash >> (bd.b * 16)) & 65535 AS bits
        FROM fp f, bd),
      cand AS (SELECT x.id AS id_a, y.id AS id_b, x.fv AS f_a, y.fv AS f_b
        FROM banded x JOIN banded y USING (band, bits)
        WHERE x.id < y.id GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b, CAST(bit_count(xor(f_a, f_b)) AS INTEGER) AS hamming
      FROM cand WHERE bit_count(xor(f_a, f_b)) <= 3
      ORDER BY id_a, id_b"""))

  /** Embedding-cosine near-dup pairs, hyperplane-LSH-bucketed, with
    * the replayable pseudo-weight stream
    * `w(q,i) = (((q*1000003 + i) * 2654435761) % (2^31-1) % 1e6)/1e6 - 0.5`
    * (plans.VectorExprOps.hyperplaneSigPoly) — both sides accumulate
    * the plane projections, norms, and pair dot products in element
    * order, so the IEEE doubles are bit-identical.
    */
  val dd_embedding_neardup = Q(
    (s, dir) => Dedup.embeddingNearDup(T_(s, dir, "embeddings"),
      "embedding", "vec_id", planes = 8, threshold = 0.3, replayable = true)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings
          WHERE len(embedding) > 0),
      sigs AS (SELECT id, v,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(0, 8), q ->
              CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(range(1, len(v) + 1), i ->
                       CAST(v[i] AS DOUBLE) *
                       (CAST(((q * 1000003 + (i - 1)) * 2654435761) % 2147483647 % 1000000 AS DOUBLE) / 1000000.0 - 0.5))),
                     (a, b) -> a + b) >= 0.0
                   THEN (CAST(1 AS BIGINT) << q) ELSE CAST(0 AS BIGINT) END)),
            (a, b) -> a + b) AS bucket,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE))),
            (a, b) -> a + b)) AS nrm
        FROM e),
      scored AS (SELECT a.id AS id_a, b.id AS id_b,
          CASE WHEN a.nrm > 0 AND b.nrm > 0 THEN
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, len(a.v) + 1), i ->
                CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))),
              (x, y) -> x + y) / (a.nrm * b.nrm) END AS cos
        FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.id < b.id)
      SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.3 ORDER BY id_a, id_b"""))

  // ===========================================================
  // Similarity search
  // ===========================================================

  private[graft] def cosineSql(v: String, qv: String): String = {
    def ss(a: String, b: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) FOR i IN range(1, len($a) + 1)]),
          (x, y) -> x + y)"""
    s"""CASE WHEN sqrt(${ss(v, v)}) > 0 AND sqrt(${ss(qv, qv)}) > 0
        THEN ${ss(v, qv)} / (sqrt(${ss(v, v)}) * sqrt(${ss(qv, qv)})) END"""
  }

  /** Brute-force exact cosine top-k (the ANN baseline): corpus never
    * shuffles; the 3-row query side is broadcast.
    */
  val vec_topk_bruteforce = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
        "embedding", "vec_id", "vec_id", k = 10)
    },
    Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      s AS (SELECT qid, id, ${cosineSql("v", "qv")} AS cos FROM c, q)
      SELECT qid, id, cos, rank
      FROM (SELECT qid, id, cos, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY cos DESC NULLS LAST, id ASC) AS INTEGER) AS rank FROM s)
      WHERE rank <= 10"""))

  /** One SQL Lloyd round: assign every vector to its argmin-cosine
    * cell from `centIn`, then recompute each cell's centroid as the
    * element-wise mean — decimal-cast sums (exact, order-independent)
    * divided in double, the exact mirror of
    * [[graft.operators.Similarity.ivfKMeans]]'s update step.
    */
  private[graft] def lloydRoundSql(i: Int, centIn: String): String =
    s"""a$i AS (
        SELECT id, v, cell FROM (
          SELECT c.id, c.v, $centIn.cell,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${cosineSql("v", "cv")} DESC NULLS LAST, $centIn.cell ASC) AS rn
          FROM c, $centIn) WHERE rn = 1),
      m$i AS (
        SELECT cell, pos,
          CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
            / count(*) AS m
        FROM (SELECT cell, unnest(v) AS x,
                unnest(range(1, len(v) + 1)) AS pos FROM a$i)
        GROUP BY cell, pos),
      cent$i AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m$i GROUP BY cell)"""

  /** IVF-bucketed ANN top-k (scale path): seeded deterministic k-means
    * centroids (2 Lloyd rounds), probe the 4 nearest cells per query.
    * Deterministic end to end — seed sample, both Lloyd rounds, and
    * the assign → probe → score pipeline all replay exactly in SQL.
    */
  val vec_ivf_ann = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val (indexed, centroids) =
        Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 16, iters = 2)
      Similarity.ivfTopK(indexed, centroids, emb.filter(col("vec_id") < 3),
        "embedding", "vec_id", k = 10, nProbe = 4)
    },
    Some(s"""WITH c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      cent0 AS (
        SELECT id AS cell,
          [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
        FROM c
        QUALIFY row_number() OVER (ORDER BY
          (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
          id ASC) <= 16),
      ${lloydRoundSql(1, "cent0")},
      ${lloydRoundSql(2, "cent1")},
      assigned AS (
        SELECT id, v, cell FROM (
          SELECT c.id, c.v, cent2.cell,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${cosineSql("v", "cv")} DESC NULLS LAST, cent2.cell ASC) AS rn
          FROM c, cent2) WHERE rn = 1),
      q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
      probes AS (
        SELECT qid, qv, cell FROM (
          SELECT q.qid, q.qv, cent2.cell,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${cosineSql("qv", "cv")} DESC NULLS LAST, cent2.cell ASC) AS rn
          FROM q, cent2) WHERE rn <= 4),
      scored AS (
        SELECT p.qid, a.id, ${cosineSql("v", "qv")} AS cos
        FROM assigned a JOIN probes p ON a.cell = p.cell)
      SELECT qid, id, cos, rank
      FROM (SELECT qid, id, cos, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY cos DESC NULLS LAST, id ASC) AS INTEGER) AS rank
            FROM scored)
      WHERE rank <= 10"""))

  /** SemDeDup-style semantic dedup audit: near-dup pairs generated
    * WITHIN the k-means cells the search index already maintains
    * (same seeded 2-round Lloyd machinery as `vec_ivf_ann`), rolled
    * up to per-cell curation stats — vectors, near-dup pairs, and
    * how many vectors greedy drop-the-higher-id would remove. The
    * oracle replays the full k-means + pairing chain in SQL.
    */
  val dd_semantic = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val (indexed, _) =
        Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 16, iters = 2)
      val pairs = Dedup.semanticNearDup(indexed, threshold = 0.95)
      indexed.groupBy(col("cell"))
        .agg(count(lit(1)).cast("int").as("n_vectors"))
        .join(pairs.groupBy(col("cell"))
          .agg(count(lit(1)).cast("int").as("n_pairs"),
            countDistinct(col("id_b")).cast("int").as("n_dropped")),
          Seq("cell"), "left")
        .select(col("cell"), col("n_vectors"),
          coalesce(col("n_pairs"), lit(0)).as("n_pairs"),
          coalesce(col("n_dropped"), lit(0)).as("n_dropped"))
    },
    Some(s"""WITH c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      cent0 AS (
        SELECT id AS cell,
          [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
        FROM c
        QUALIFY row_number() OVER (ORDER BY
          (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
          id ASC) <= 16),
      ${lloydRoundSql(1, "cent0")},
      ${lloydRoundSql(2, "cent1")},
      assigned AS (
        SELECT id, v, cell FROM (
          SELECT c.id, c.v, cent2.cell,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${cosineSql("v", "cv")} DESC NULLS LAST, cent2.cell ASC) AS rn
          FROM c, cent2) WHERE rn = 1),
      pairs AS (SELECT * FROM (
          SELECT a.cell, a.id AS id_a, b.id AS id_b,
            ${cosineSql("a.v", "b.v")} AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.id < b.id)
        WHERE cos >= 0.95),
      stats AS (SELECT cell, CAST(count(*) AS INTEGER) AS n_vectors
        FROM assigned GROUP BY cell),
      pstats AS (SELECT cell, CAST(count(*) AS INTEGER) AS n_pairs,
        CAST(count(DISTINCT id_b) AS INTEGER) AS n_dropped
        FROM pairs GROUP BY cell)
      SELECT s.cell, s.n_vectors,
        coalesce(p.n_pairs, 0) AS n_pairs,
        coalesce(p.n_dropped, 0) AS n_dropped
      FROM stats s LEFT JOIN pstats p ON s.cell = p.cell"""))

  // ===========================================================
  // Graph analytics (SURVEY §4.2.3 / M7)
  // ===========================================================

  /** Namespaced long ids so one Long id space covers all node labels. */
  private val edgesSql =
    """edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation)"""

  private def edgesDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = T_(s, dir, "orders")
      .select((col("o_orderkey") + 10000000L).as("src"), (col("o_custkey") + 10000L).as("dst"))
    val c = T_(s, dir, "customer")
      .select((col("c_custkey") + 10000L).as("src"), (col("c_nationkey").cast("long") + 100L).as("dst"))
    val n = T_(s, dir, "nation")
      .select((col("n_nationkey").cast("long") + 100L).as("src"), col("n_regionkey").cast("long").as("dst"))
    o.unionByName(c).unionByName(n)
  }

  /** Graph view: the typed edge list (vertices/edges builders, §1.3). */
  val g_edges = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"),
          (col("o_custkey") + 10000L).as("dst"), lit("PLACED_BY").as("rel"))
      val c = T_(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"),
          (col("c_nationkey").cast("long") + 100L).as("dst"), lit("IN_NATION").as("rel"))
      val n = T_(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"),
          col("n_regionkey").cast("long").as("dst"), lit("IN_REGION").as("rel"))
      o.unionByName(c).unionByName(n)
    },
    Some("""SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst, 'PLACED_BY' AS rel FROM orders
      UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey, 'IN_NATION' FROM customer
      UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT), 'IN_REGION' FROM nation"""))

  /** Degrees over the graph view. */
  val g_degree = Q(
    (s, dir) => GraphOps.degrees(edgesDf(s, dir)),
    Some(s"""WITH $edgesSql,
      o AS (SELECT src AS id, count(*) AS out_deg FROM edges GROUP BY src),
      i AS (SELECT dst AS id, count(*) AS in_deg FROM edges GROUP BY dst)
      SELECT coalesce(o.id, i.id) AS id,
        coalesce(out_deg, 0) AS out_deg, coalesce(in_deg, 0) AS in_deg,
        coalesce(out_deg, 0) + coalesce(in_deg, 0) AS degree
      FROM o FULL OUTER JOIN i ON o.id = i.id"""))

  /** Motif query: customer co-location — per nation, customer count
    * and co-located pair count (the DataFrame form of a 2-node motif).
    */
  val g_motif_pairs = Q(
    (s, dir) => T_(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation_id"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("n_pairs", (col("n_customers") * (col("n_customers") - 1) / 2).cast("long")),
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation_id, count(*) AS n_customers,
       CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
      FROM customer GROUP BY 1"""))

  private val prIters = 10

  /** Deterministic PageRank, 10 iterations, decimal-exact per-step
    * sums — identical bytes on 1 thread or 1000 executors, and the
    * oracle replays the exact iteration chain.
    */
  val g_pagerank = Q(
    (s, dir) => GraphOps.pageRank(edgesDf(s, dir), prIters),
    Some {
      val iters = (1 to prIters).map { t =>
        val prev = s"r${t - 1}"
        s"""r$t AS (SELECT v.id,
             CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0.0 AS DOUBLE)) AS rank
           FROM verts v LEFT JOIN (
             SELECT ew.dst AS id,
               CAST(CAST(round(SUM(CAST(r.rank * ew.w AS DECIMAL(27,15))) * 1000000000, 0) AS BIGINT) AS DOUBLE)
                 / CAST(1000000000.0 AS DOUBLE) AS inflow
             FROM ew JOIN $prev r ON r.id = ew.src GROUP BY ew.dst) s
           ON v.id = s.id)"""
      }.mkString(",\n      ")
      s"""WITH $edgesSql,
      verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      ew AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / outdeg AS w
             FROM edges e JOIN deg USING (src)),
      r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts),
      $iters
      SELECT id, rank FROM r$prIters"""
    })

  private val ccIters = 4

  /** Connected components by min-label propagation. The component
    * minimum is always a region vertex (smallest namespaced ids), and
    * the farthest vertex from it is an order (order→customer→nation→
    * region = 3 hops), so labels converge after 3 iterations; the 4th
    * is the convergence margin. The oracle replays the same 4.
    */
  val g_connected_components = Q(
    (s, dir) => GraphOps.connectedComponents(edgesDf(s, dir), ccIters),
    Some {
      val iters = (1 to ccIters).map { t =>
        val prev = s"c${t - 1}"
        s"""c$t AS (SELECT c.id, least(c.comp, coalesce(m.nc, c.comp)) AS comp
           FROM $prev c LEFT JOIN (
             SELECT und.dst AS id, MIN(cc.comp) AS nc
             FROM und JOIN $prev cc ON cc.id = und.src GROUP BY und.dst) m
           ON m.id = c.id)"""
      }.mkString(",\n      ")
      s"""WITH $edgesSql,
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      verts AS (SELECT DISTINCT src AS id FROM und),
      c0 AS (SELECT id, id AS comp FROM verts),
      $iters
      SELECT id, comp FROM c$ccIters"""
    })

  private val bfsIters = 4

  /** Multi-source BFS from the hierarchy roots: hop distance of every
    * vertex from its region, along the REVERSED edge set
    * (region→nation→customer→order). Radius is 3 (order is the leaf),
    * so 4 iterations carry a convergence margin; the oracle replays
    * the same unrolled min-propagation.
    */
  val g_shortest_path = Q(
    (s, dir) => GraphOps.shortestPaths(
        edgesDf(s, dir).select(col("dst").as("src"), col("src").as("dst")),
        T_(s, dir, "nation")
          .select(col("n_regionkey").cast("long").as("id")).distinct(),
        bfsIters),
    Some {
      val iters = (1 to bfsIters).map { t =>
        s"""d$t AS (SELECT h.dst AS id, CAST(min(d.dist + h.w) AS BIGINT) AS dist
           FROM hop h JOIN d${t - 1} d ON h.src = d.id GROUP BY h.dst)"""
      }.mkString(",\n      ")
      s"""WITH $edgesSql,
      rev AS (SELECT dst AS src, src AS dst FROM edges),
      verts AS (SELECT DISTINCT src AS id FROM
        (SELECT src FROM rev UNION ALL SELECT dst FROM rev)),
      hop AS (SELECT src, dst, 1 AS w FROM rev
        UNION ALL SELECT id, id, 0 FROM verts),
      d0 AS (SELECT DISTINCT CAST(n_regionkey AS BIGINT) AS id,
        CAST(0 AS BIGINT) AS dist FROM nation),
      $iters
      SELECT v.id, d.dist FROM verts v LEFT JOIN d$bfsIters d ON v.id = d.id"""
    })

  // ===========================================================
  // Multimodal + streaming
  // ===========================================================

  /** Multimodal plumbing: documents → opaque binary payloads →
    * per-partition fake decode (Multimodal.decodeFeatures — real
    * mapPartitions pipeline, stubbed codec). Oracle replays the
    * deterministic fake over the same bytes.
    */
  val mm_decode_features = Q(
    (s, dir) => {
      val media = T_(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/fake").as("media_type"))
      Multimodal.decodeFeatures(media)
    },
    Some("""WITH b AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
          list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)) AS codes
        FROM documents)
      SELECT media_id,
        CAST(n % 640 AS INTEGER) AS width,
        CAST((n * 31) % 480 AS INTEGER) AS height,
        CAST(n % 16 AS INTEGER) AS n_frames,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
             (a, b) -> (a * 31 + b) % 2147483647) % 1000 AS DOUBLE) / 1000.0 AS brightness
      FROM b"""))

  /** Multimodal resize/transcode: payload→payload with metadata kept
    * consistent (Multimodal.resizePayloads, target 256 bytes). The
    * binary payload itself is excluded from the checked projection —
    * the oracle verifies the size accounting over the same bytes.
    */
  val mm_resize = Q(
    (s, dir) => {
      val media = T_(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
      Multimodal.resizePayloads(media, targetBytes = 256)
        .select(col("media_id"), col("orig_bytes"), col("resized_bytes"))
    },
    Some("""SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS orig_bytes,
       CAST(least(octet_length(encode(text)), 256) AS INTEGER) AS resized_bytes
      FROM documents"""))

  /** End-to-end training-corpus prep: quality-score → threshold filter
    * → language-ID → exact dedup (first doc per normalized content) →
    * per-language corpus stats. Composes the already-oracled text
    * operators into the one pipeline a pretraining data curator
    * actually runs; the oracle is built from the SAME generated SQL
    * fragments as the single-op queries, so the two sides cannot
    * drift. Narrow until the dedup shuffle, then one hash aggregate.
    */
  private val corpusQualityMin = 0.7

  val pipeline_corpus_prep = Q(
    (s, dir) => {
      val scored = T_(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          T.langIdFast(col("text")).as("lang_guess"),
          T.qualityScore(col("text")).as("quality"),
          T.wsTokenCount(col("text")).as("ws_tokens"))
      val kept = Dedup.exact(scored.filter(col("quality") >= corpusQualityMin), "text", "doc_id")
      kept.groupBy(col("lang_guess"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(col("ws_tokens")).cast("long").as("total_tokens"),
          (sum(col("quality").cast("decimal(27,8)")).cast("double") /
            count(lit(1))).as("avg_quality"))
        .orderBy(col("lang_guess"))
    },
    Some {
      s"""WITH sc AS (SELECT doc_id, text, $langScoreExprsSql FROM documents),
      lg AS (SELECT doc_id, text,
        $langGuessCaseSql AS lang_guess,
        $qualitySqlExpr AS quality,
        $wsTokensSql AS ws_tokens
       FROM sc),
      filt AS (SELECT * FROM lg WHERE quality >= $corpusQualityMin),
      ded AS (SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
            ORDER BY doc_id ASC) AS rn FROM filt) WHERE rn = 1)
      SELECT lang_guess, count(*) AS docs_kept,
        CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(CAST(quality AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*) AS avg_quality
      FROM ded GROUP BY lang_guess ORDER BY lang_guess"""
    })

  /** Structured-Streaming daily roll-up driven to exhaustion against
    * the batch oracle — the streaming topology computes exactly the
    * batch aggregate.
    */
  val stream_daily_rollup = Q(
    (s, dir) => StreamingRollup.dailyRollupOnce(s, s"$dir/events.parquet"),
    Some("""SELECT CAST(ts AS DATE) AS date, event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""),
    bench = false)

  /** Streaming exact dedup over the document corpus (incremental form
    * of Dedup.exact): content-hash dropDuplicatesWithinWatermark with
    * event time synthesized from the monotone doc id. Which arrival
    * survives a dup group is racy across partitions, so the checked
    * output is the surviving NORMALIZED CONTENT set (identical for
    * every member of a dup group) — deterministic, and exactly the
    * batch DISTINCT the oracle computes.
    */
  val stream_dedup = Q(
    (s, dir) => graft.streaming.StreamingDedup.dedupOnce(
      s, s"$dir/documents.parquet", "text", "ts",
      queryName = "stream_dedup_q",
      // +1s offset: epoch-0 event time equals the initial watermark and
      // is discarded as late, silently losing doc_id 0
      prepare = _.withColumn("ts", timestamp_micros(col("doc_id") + lit(1000000L))))
      .select(T.normText(col("text")).as("norm"))
      .orderBy(col("norm")),
    Some("""SELECT DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      FROM documents ORDER BY norm"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "txt_token_counts" -> txt_token_counts,
    "txt_quality" -> txt_quality,
    "txt_langid" -> txt_langid,
    "txt_fingerprint" -> txt_fingerprint,
    "dd_exact" -> dd_exact,
    "dd_ngram_jaccard" -> dd_ngram_jaccard,
    "dd_cluster_canonical" -> dd_cluster_canonical,
    "dd_semantic" -> dd_semantic,
    "dd_minhash_lsh" -> dd_minhash_lsh,
    "dd_simhash" -> dd_simhash,
    "dd_simhash_neardup" -> dd_simhash_neardup,
    "dd_embedding_neardup" -> dd_embedding_neardup,
    "vec_topk_bruteforce" -> vec_topk_bruteforce,
    "vec_ivf_ann" -> vec_ivf_ann,
    "g_edges" -> g_edges,
    "g_degree" -> g_degree,
    "g_motif_pairs" -> g_motif_pairs,
    "g_pagerank" -> g_pagerank,
    "g_shortest_path" -> g_shortest_path,
    "g_connected_components" -> g_connected_components,
    "mm_decode_features" -> mm_decode_features,
    "mm_resize" -> mm_resize,
    "pipeline_corpus_prep" -> pipeline_corpus_prep,
    "stream_daily_rollup" -> stream_daily_rollup,
    "stream_dedup" -> stream_dedup,
  )
}
