package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Funnel, GraphOps, TimeSeries}
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 17: ordered funnel conversion, HITS hubs/authorities,
  * integer-exact rolling z-score anomaly flags, BM25 ranking, and a
  * corpus-rarity quality score. All scoring is float-free (integer
  * `div` quantization or the decimal→1e-9-grid hop), so every entry
  * replays bit-for-bit in DuckDB.
  */
object Queries17 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Ordered funnel (product-analytics sequential conversion)
  // ===========================================================

  private val funnelSteps = Seq("signup", "click", "purchase")

  /** signup → click → purchase, strictly ordered per user: a click
    * counts only after the user's FIRST signup, a purchase only after
    * that first qualifying click. Oracle replays the same sequential
    * min-time chain; conversion rates are integer-milli (div).
    */
  val funnel_conversion = Q(
    (s, dir) => Funnel.conversion(
      T_(s, dir, "events"), col("user_id"), unix_micros(col("ts")),
      funnelSteps.map(n => n -> (col("event_type") === n))),
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) AS t FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.us) AS t FROM e
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.us) AS t FROM e
          JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY 1),
        c AS (SELECT (SELECT count(*) FROM s1) AS u1,
                     (SELECT count(*) FROM s2) AS u2,
                     (SELECT count(*) FROM s3) AS u3)
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name, u1 AS users,
        u1 * 1000 // u1 AS conv_prev_milli, u1 * 1000 // u1 AS conv_first_milli FROM c
      UNION ALL SELECT CAST(2 AS BIGINT), 'click', u2, u2 * 1000 // u1, u2 * 1000 // u1 FROM c
      UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', u3, u3 * 1000 // u2, u3 * 1000 // u1 FROM c"""))

  // ===========================================================
  // HITS hubs/authorities over the hierarchy graph view
  // ===========================================================

  private val hitsIters = 2

  /** The pageRank-style quantization macros, as DuckDB SQL. */
  private def qsumSql(e: String) =
    s"""CAST(CAST(round(SUM(CAST($e AS DECIMAL(27,15))) * 1000000000, 0) AS BIGINT) AS DOUBLE)
        / CAST(1000000000.0 AS DOUBLE)"""
  private def qdivSql(n: String, d: String) =
    s"""CAST(CAST(round($n / $d * 1000000000, 0) AS BIGINT) AS DOUBLE)
        / CAST(1000000000.0 AS DOUBLE)"""

  private val hitsEdgesSql =
    """edges0 AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation),
      e AS (SELECT DISTINCT src, dst FROM edges0)"""

  private def hitsEdgesDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = T_(s, dir, "orders")
      .select((col("o_orderkey") + 10000000L).as("src"), (col("o_custkey") + 10000L).as("dst"))
    val c = T_(s, dir, "customer")
      .select((col("c_custkey") + 10000L).as("src"), (col("c_nationkey").cast("long") + 100L).as("dst"))
    val n = T_(s, dir, "nation")
      .select((col("n_nationkey").cast("long") + 100L).as("src"), col("n_regionkey").cast("long").as("dst"))
    o.unionByName(c).unionByName(n)
  }

  /** HITS, 2 iterations, every sum/normalization on the exact 1e-9
    * grid — the oracle unrolls both message directions of both
    * iterations. On the directed hierarchy the hub ranking (orders)
    * and authority ranking (nations/regions) genuinely diverge from
    * PageRank's random-walk mass.
    */
  val g_hits = Q(
    (s, dir) => GraphOps.hits(hitsEdgesDf(s, dir), hitsIters),
    Some {
      def round_(prev: String, t: Int): String = {
        val (ar, at, a) = (s"a${t}r", s"a${t}t", s"a$t")
        val (hr, ht, h) = (s"h${t}r", s"h${t}t", s"h$t")
        s"""$ar AS (SELECT v.id, coalesce(s.v, CAST(0.0 AS DOUBLE)) AS v
             FROM verts v LEFT JOIN (
               SELECT e.dst AS id, ${qsumSql("h.v")} AS v
               FROM e JOIN $prev h ON h.id = e.src GROUP BY e.dst) s
             ON v.id = s.id),
           $at AS (SELECT ${qsumSql("v")} AS tot FROM $ar),
           $a AS (SELECT id, ${qdivSql(s"$ar.v", s"$at.tot")} AS v
             FROM $ar CROSS JOIN $at),
           $hr AS (SELECT v.id, coalesce(s.v, CAST(0.0 AS DOUBLE)) AS v
             FROM verts v LEFT JOIN (
               SELECT e.src AS id, ${qsumSql("a.v")} AS v
               FROM e JOIN $a a ON a.id = e.dst GROUP BY e.src) s
             ON v.id = s.id),
           $ht AS (SELECT ${qsumSql("v")} AS tot FROM $hr),
           $h AS (SELECT id, ${qdivSql(s"$hr.v", s"$ht.tot")} AS v
             FROM $hr CROSS JOIN $ht)"""
      }
      val rounds = (1 to hitsIters)
        .map(t => round_(if (t == 1) "h0" else s"h${t - 1}", t))
        .mkString(",\n      ")
      s"""WITH $hitsEdgesSql,
      verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS v FROM verts),
      $rounds
      SELECT h.id, h.v AS hub, a.v AS auth
      FROM h$hitsIters h JOIN a$hitsIters a USING (id)"""
    })

  // ===========================================================
  // Rolling z-score anomaly flags (integer-exact)
  // ===========================================================

  private val (zWin, zK, zMinN) = (20, 2, 5)

  /** Per-user trailing-20-event z-score on `value`, self-excluded,
    * cross-multiplied to integer arithmetic (no float mean/var/sqrt).
    * Emits every event with its baseline count and the flag, so the
    * oracle pins cold-start, the window frame, and the flag logic.
    */
  val ts_anomaly = Q(
    (s, dir) => TimeSeries.anomalyZscore(
        T_(s, dir, "events").withColumn("us", unix_micros(col("ts"))),
        col("user_id"), col("value"),
        Seq(col("us"), col("event_id")), zWin, zK, zMinN)
      .select(col("user_id"), col("event_id"), col("value"), col("is_anomaly")),
    Some(s"""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        b AS (SELECT user_id, event_id, us, value,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS x FROM e),
        w AS (SELECT user_id, event_id, value, x,
            count(x) OVER win AS n, sum(x) OVER win AS s, sum(x * x) OVER win AS q
          FROM b WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN $zWin PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id, value,
        n >= $zMinN AND (x * n - s) * (x * n - s) > ${zK * zK} * (q * n - s * s) AS is_anomaly
      FROM w"""))

  // ===========================================================
  // BM25 ranking + corpus-rarity quality score (float-free)
  // ===========================================================

  private val searchTerms = Seq("spark", "merge", "window")
  private def tokensCol = split(T.normText(col("text")), " ")
  private val tokensSql =
    """string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""

  /** BM25 (k1 = 1.2, b = 0.75) with INTEGER-QUANTIZED arithmetic:
    * idf_milli = (N·1000) div df (the float-free idf of
    * txt_tfidf_topk), the length-normalized tf component in centi
    * units, every division a `div`. Monotone in the real BM25 on
    * these scales, and bit-replayable in any engine. Same two-pass
    * shape as tf-idf: a 1-row (N, Σdl, df_t) aggregate broadcast into
    * the scoring scan, then a TakeOrdered top-k — no inverted index,
    * no per-term shuffle.
    */
  val txt_bm25_topk = Q(
    (s, dir) => {
      val tfs = searchTerms.map(t =>
        size(filter(tokensCol, x => x === lit(t))).cast("long").as(s"tf_$t"))
      val tf = T_(s, dir, "documents")
        .select(col("doc_id") +: size(tokensCol).cast("long").as("dl") +: tfs: _*)
      val stats = tf.agg(
        count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl") +: searchTerms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
      val score = searchTerms.map { t =>
        s"""((n_docs * 1000) div df_$t) *
            ((tf_$t * 220 * 1000) div
             (tf_$t * 100 + (120 * (25 + (7500 * dl) div avgdl_c)) div 100))"""
      }.mkString(" + ")
      tf.crossJoin(broadcast(stats))
        .withColumn("avgdl_c", expr("(sum_dl * 100) div n_docs"))
        .withColumn("score", expr(score))
        .filter(col("score") > 0)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(50)
    },
    Some {
      val tfSqls = searchTerms.map(t =>
        s"CAST(len(list_filter($tokensSql, x -> x = '$t')) AS BIGINT) AS tf_$t")
      val dfSqls = searchTerms.map(t =>
        s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      val score = searchTerms.map { t =>
        s"""((n_docs * 1000) // df_$t) *
            ((tf_$t * 220 * 1000) //
             (tf_$t * 100 + (120 * (25 + (7500 * dl) // avgdl_c)) // 100))"""
      }.mkString(" + ")
      s"""WITH tf AS (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS dl,
          ${tfSqls.mkString(",\n        ")}
        FROM documents),
      st AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
          ${dfSqls.mkString(",\n        ")} FROM tf),
      sc AS (SELECT doc_id, dl, ${searchTerms.map(t => s"tf_$t").mkString(", ")},
          n_docs, ${searchTerms.map(t => s"df_$t").mkString(", ")},
          (sum_dl * 100) // n_docs AS avgdl_c
        FROM tf CROSS JOIN st)
      SELECT doc_id, CAST($score AS BIGINT) AS score FROM sc
      WHERE $score > 0
      ORDER BY score DESC, doc_id ASC LIMIT 50"""
    })

  /** Mean inverse-token-frequency quality score (the integer-exact
    * stand-in for unigram-LM negative log-likelihood — CCNet-style
    * rare-token filtering without libm): rarity_milli(t) = (N_tok ·
    * 1000) div cnt(t); a document's score is the tf-weighted mean
    * over its tokens.
    *
    * Plan shape: tokens collapse to per-doc (token, tf) FIRST (map-
    * side combinable — the hot-token skew of an occurrence-level join
    * dies here: "the" is one row per doc, not one per occurrence),
    * then ONE equi-join against the (token, count) vocabulary and one
    * keyed re-aggregate. At 100 TB the vocabulary join is AQE-skew-
    * splittable and the doc re-aggregate is the same key as the
    * input's natural layout.
    */
  val txt_rarity_score = Q(
    (s, dir) => {
      val tk = T_(s, dir, "documents")
        .select(col("doc_id"), explode(tokensCol).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val cnt = tk.groupBy(col("tok")).agg(sum(col("tf")).as("c"))
      val ntot = cnt.agg(sum(col("c")).as("n_tok"))
      tk.join(cnt, "tok").crossJoin(broadcast(ntot))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          sum(expr("((n_tok * 1000) div c) * tf")).as("r_sum"))
        .select(col("doc_id"), col("n_tokens"),
          expr("r_sum div n_tokens").as("rarity_milli"))
    },
    Some(s"""WITH tk0 AS (SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
        tk AS (SELECT doc_id, tok, count(*) AS tf FROM tk0 GROUP BY 1, 2),
        cnt AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tk GROUP BY 1),
        nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM cnt),
        j AS (SELECT t.doc_id, t.tf, ((n_tok * 1000) // c.c) AS r
          FROM tk t JOIN cnt c USING (tok) CROSS JOIN nt)
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        CAST(CAST(SUM(r * tf) AS BIGINT) // CAST(SUM(tf) AS BIGINT) AS BIGINT) AS rarity_milli
      FROM j GROUP BY 1"""))

  val all: Map[String, Q] = Map(
    "funnel_conversion" -> funnel_conversion,
    "g_hits" -> g_hits,
    "ts_anomaly" -> ts_anomaly,
    "txt_bm25_topk" -> txt_bm25_topk,
    "txt_rarity_score" -> txt_rarity_score,
  )
}
