package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Sampling, TimeSeries}
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 32 (round 7): BPE merge-candidate counting (the first
  * iteration of tokenizer training), CUSUM change-point detection
  * via the drawdown rewrite, stride-scheduled proportional source
  * interleaving, and the multimodal corpus-prep pipeline composing
  * this round's quality gate + soft dedup + quantized embedding
  * norms into one manifest.
  */
object Queries32 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  /** First BPE training iteration: weighted adjacent-character-pair
    * counts over the word-frequency table — the merge-candidate
    * ranking a byte-pair-encoding tokenizer is built from. Two
    * aggregates (word freq, then pair counts weighted by freq — the
    * pair pass runs over DISTINCT WORDS, corpus-size-independent)
    * and a TakeOrdered top-20 under the TOTAL order (count desc,
    * pair asc). Per-word pair expansion is a codegen'd
    * transform/explode, no UDF; single-char words have no pairs and
    * are filtered before the expansion on both engines (Spark's
    * sequence(1,0) would DESCEND, not empty out).
    */
  val txt_bpe_pairs = Q(
    (s, dir) => {
      val wf = T_(s, dir, "documents")
        .select(explode(split(T.normText(col("text")), " ")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy(col("word")).agg(count(lit(1)).as("f"))
      wf.select(col("f"), explode(expr(
          "transform(sequence(1, length(word) - 1)," +
            " i -> substring(word, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(20)
    },
    Some(s"""WITH w AS (SELECT unnest(string_split($normSql, ' ')) AS word
            FROM documents),
        wf AS (SELECT word, count(*) AS f FROM w
          WHERE length(word) >= 2 GROUP BY 1),
        p AS (SELECT f, unnest([word[i:i+1] FOR i IN range(1, length(word))])
            AS pair
          FROM wf)
      SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
      FROM p GROUP BY 1
      ORDER BY cnt DESC, pair ASC LIMIT 20"""))

  /** CUSUM change-point monitor ([[TimeSeries.cusum]]) on each event
    * type's daily volume: deviations are mean-subtracted EXACTLY by
    * cross-multiplying (x_d = n_d·T − total, so no rational mean is
    * ever rounded), the accumulator runs through the drawdown
    * rewrite (two windows, one shuffle — never a driver loop), and
    * the drift flag fires when the accumulated excess tops twice the
    * type's total scaled volume. Everything decimal(38,0)-exact.
    */
  /** The post-counts tail of [[ts_cusum]], factored so the streaming
    * twin's incrementally-maintained (event_type, day, n) table runs
    * the identical exact arithmetic. */
  private[graft] def cusumFromDaily(dc: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val st = dc.groupBy(col("event_type").as("__et"))
      .agg(count(lit(1)).as("t"), sum(col("n")).as("total"))
    val x = dc.join(broadcast(st), dc("event_type") === col("__et"))
      .withColumn("__x", col("n") * col("t") - col("total"))
    TimeSeries.cusum(x, col("event_type"), Seq(col("day")), col("__x"))
      .withColumn("is_drift",
        col("cusum") > (col("total") * 2).cast("decimal(38,0)"))
      .select(col("event_type"), col("day"), col("n"),
        // exact accumulator ships as a canonical integer string
        // (hash-portable; wide DECIMAL is not)
        col("cusum").cast("string").as("cusum"),
        col("is_drift"))
      .orderBy(col("event_type"), col("day"))
  }

  val ts_cusum = Q(
    (s, dir) => cusumFromDaily(
      T_(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))),
    Some("""WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n
          FROM events GROUP BY 1, 2),
        st AS (SELECT event_type, count(*) AS t,
            CAST(sum(n) AS BIGINT) AS total
          FROM dc GROUP BY 1),
        x AS (SELECT dc.event_type, day, CAST(dc.n AS BIGINT) AS n,
            CAST(dc.n AS HUGEINT) * t - total AS xv, total
          FROM dc JOIN st USING (event_type)),
        c1 AS (SELECT *, sum(xv) OVER (PARTITION BY event_type
            ORDER BY day) AS cum FROM x),
        c2 AS (SELECT *, least(min(cum) OVER (PARTITION BY event_type
            ORDER BY day), 0) AS low FROM c1)
      SELECT event_type, day, n,
        CAST(CAST(cum - low AS DECIMAL(38,0)) AS VARCHAR) AS cusum,
        cum - low > 2 * CAST(total AS HUGEINT) AS is_drift
      FROM c2 ORDER BY event_type, day"""))

  private val hash1 = "(doc_id % 94906249) * 1103515245 % 2147483647"
  private val hash2 = s"(($hash1) % 94906249) * 1103515245 % 2147483647"

  /** Stride-scheduled source interleave
    * ([[Sampling.interleaveProportional]]): every source spreads
    * evenly through the global training order at its proportional
    * share, with the per-source order seeded by the deterministic
    * hash — the loader layout between "concatenate sources" (domain
    * starvation) and "global shuffle" (loses curriculum). The oracle
    * replays the stride-midpoint key and the prefix-sum position as
    * one global row_number.
    */
  val samp_interleave = Q(
    (s, dir) => Sampling.interleaveProportional(
        T_(s, dir, "documents").select(col("doc_id"), col("source")),
        col("source"),
        Seq(Sampling.detHash2(col("doc_id")).asc, col("doc_id").asc))
      .select(col("doc_id"), col("source"), col("src_idx"), col("pos")),
    Some(s"""WITH d AS (SELECT doc_id, source, ($hash2) AS h FROM documents),
        r AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
              AS src_idx,
            count(*) OVER (PARTITION BY source) AS ns,
            count(*) OVER () AS n
          FROM d),
        k AS (SELECT doc_id, source, src_idx,
            (2 * src_idx - 1) * n // (2 * ns) AS key FROM r)
      SELECT doc_id, source, src_idx,
        row_number() OVER (ORDER BY key, source, src_idx) AS pos
      FROM k"""))

  private val toksSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
      ELSE len(string_split_regex(trim(text), '\s+')) END"""

  // float → DOUBLE before the decimal quantization: the engines'
  // float→decimal casts disagree (Spark goes through the float's
  // shortest decimal form), double→decimal agrees (vec_dim_stats)
  private val vqSql =
    "CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,6)) * 1000000 AS BIGINT)"

  /** Multimodal corpus prep: quality-gate the documents, join each
    * survivor to its embedding row, weight exact-duplicate clusters
    * softly ([[Dedup.softDedupWeights]] — copies survive at
    * 1/cluster mass), and emit the per-(lang, label) manifest with
    * doc/token tallies, total soft weight, and the micro-quantized
    * embedding energy Σ‖v‖² (integer per row via a codegen'd
    * aggregate lambda — no posexplode shuffle of 64× the rows, no
    * float summation). One scan of each table, one broadcast-sized
    * join, one aggregate.
    */
  val pipeline_multimodal_prep = Q(
    (s, dir) => {
      val gated = T_(s, dir, "documents")
        .filter(T.qualityScore(col("text")) >= 0.4)
      val joined = gated.join(T_(s, dir, "embeddings"),
        gated("doc_id") === col("vec_id"))
      Dedup.softDedupWeights(joined, "text", "doc_id")
        .withColumn("toks", T.wsTokenCount(col("text")))
        .withColumn("norm2", expr(
          "aggregate(embedding, 0L, (acc, x) -> " +
            s"acc + $vqSql * $vqSql)"))
        .groupBy(col("lang"), col("label"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("weight_bp")).as("w_bp"),
          sum(col("toks")).as("toks"),
          sum(col("norm2").cast("decimal(38,0)")).cast("decimal(38,0)")
            .cast("string").as("norm2_micro2"))
        .orderBy(col("lang"), col("label"))
    },
    Some(s"""WITH g AS (SELECT doc_id, text, lang FROM documents
          WHERE ${Queries3.qualitySqlExpr} >= 0.4),
        j AS (SELECT g.*, e.label, e.embedding FROM g
          JOIN embeddings e ON g.doc_id = e.vec_id),
        sd AS (SELECT *, count(*) OVER (PARTITION BY $normSql)
            AS cluster_n FROM j),
        t AS (SELECT lang, label, 10000 // cluster_n AS weight_bp,
            CAST($toksSql AS BIGINT) AS toks,
            list_sum([$vqSql * $vqSql FOR x IN embedding]) AS norm2
          FROM sd)
      SELECT lang, label, count(*) AS n_items,
        CAST(sum(weight_bp) AS BIGINT) AS w_bp,
        CAST(sum(toks) AS BIGINT) AS toks,
        CAST(CAST(sum(norm2) AS DECIMAL(38,0)) AS VARCHAR) AS norm2_micro2
      FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Map[String, Q] = Map(
    "txt_bpe_pairs" -> txt_bpe_pairs,
    "ts_cusum" -> ts_cusum,
    "samp_interleave" -> samp_interleave,
    "pipeline_multimodal_prep" -> pipeline_multimodal_prep,
  )
}
