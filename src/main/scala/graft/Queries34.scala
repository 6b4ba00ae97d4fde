package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Similarity, TimeSeries}
import Queries.Q

/** Batch 34 (round 7): evaluation and audit operators — kNN label
  * classification over the exact top-k, an LSH recall audit that
  * grades the sketch family against the exact near-dup truth set,
  * regex funnels over session paths (MATCH_RECOGNIZE-lite), and the
  * skip-gram pair corpus from deterministic walks.
  */
object Queries34 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** kNN CLASSIFICATION eval: for every 20th vector, take the exact
    * cosine top-11 (self always ranks first at cos 1), vote the
    * neighbors' labels with self excluded by ID, and emit prediction
    * vs true label — the standard embedding-quality probe. The
    * argmax is max_by over (votes, −label): an aggregate with a
    * total tiebreak, never a rank window. Corpus never shuffles;
    * the query side broadcasts (the vec_topk_bruteforce plan).
    */
  val vec_knn_classify = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val neighbors = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 20 === 0),
          "embedding", "vec_id", "vec_id", k = 11)
        .filter(col("id") =!= col("qid"))
      val labels = emb.select(col("vec_id"), col("label"))
      val votes = neighbors
        .join(labels.select(col("vec_id").as("id"),
          col("label").as("n_label")), "id")
        .groupBy(col("qid"), col("n_label"))
        .agg(count(lit(1)).as("votes"))
      val pred = votes.groupBy(col("qid"))
        .agg(max_by(struct(col("n_label"), col("votes")),
          struct(col("votes"), -col("n_label"))).as("best"))
        .select(col("qid"), col("best.n_label").as("pred_label"),
          col("best.votes").as("votes"))
      pred.join(labels.select(col("vec_id").as("qid"),
          col("label").as("true_label")), "qid")
        .select(col("qid"), col("true_label"), col("pred_label"),
          col("votes"))
        .orderBy(col("qid"))
    },
    Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label
            AS true_label FROM embeddings WHERE vec_id % 20 = 0),
        c AS (SELECT vec_id AS id, embedding AS v, label FROM embeddings),
        sc AS (SELECT qid, id, label,
            ${Queries3.cosineSql("v", "qv")} AS cos FROM c, q),
        nb AS (SELECT qid, id, label FROM (
            SELECT qid, id, label, row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC NULLS LAST, id ASC) AS rank
            FROM sc) WHERE rank <= 11),
        v AS (SELECT qid, label AS n_label, count(*) AS votes
          FROM nb WHERE id <> qid GROUP BY 1, 2),
        p AS (SELECT qid, n_label AS pred_label, votes FROM (
            SELECT qid, n_label, votes, row_number() OVER (
              PARTITION BY qid ORDER BY votes DESC, n_label ASC) AS rn
            FROM v) WHERE rn = 1)
      SELECT p.qid, q.true_label, p.pred_label, p.votes
      FROM p JOIN q ON p.qid = q.qid ORDER BY p.qid"""))

  /** LSH RECALL AUDIT: grade the MinHash+LSH candidate generator
    * against the exact n-gram Jaccard truth set, per similarity
    * decile — the honesty metric every sketch-based dedup deploy
    * needs (recall is a function of sim: banding theory says high-sim
    * pairs are near-certain, threshold-skimming pairs are lossy).
    * Composes the two CATALOG entries verbatim (same operators, same
    * parameters), so the audit can never drift from what the engine
    * actually ships. Output is decile-sized; the joins are
    * pair-table-sized, never corpus-quadratic.
    */
  val dd_lsh_recall = Q(
    (s, dir) => {
      val truth = Queries3.dd_ngram_jaccard.fn(s, dir)
        .select(col("id_a"), col("id_b"), col("sim"))
      val cand = Queries3.dd_minhash_lsh.fn(s, dir)
        .select(col("id_a"), col("id_b"), lit(1).as("__found"))
      truth.join(cand, Seq("id_a", "id_b"), "left")
        .groupBy(floor(col("sim") * 10).cast("int").as("sim_decile"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__found").isNotNull, 1L).otherwise(0L))
            .as("n_found"))
        .withColumn("recall_bp", expr("10000L * n_found div n_true"))
        .orderBy(col("sim_decile"))
    },
    Some(s"""WITH truth AS (
          SELECT id_a, id_b, sim FROM (
            ${Queries3.dd_ngram_jaccard.oracle.get})),
        cand AS (SELECT id_a, id_b FROM (
            ${Queries3.dd_minhash_lsh.oracle.get}))
      SELECT CAST(floor(sim * 10) AS INTEGER) AS sim_decile,
        count(*) AS n_true,
        CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_found,
        10000 * CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) // count(*) AS recall_bp
      FROM truth t LEFT JOIN cand c USING (id_a, id_b)
      GROUP BY 1 ORDER BY 1"""))

  private val funnelPatterns = Seq(
    ("view_then_purchase", "view>.*purchase"),
    ("starts_signup", "^signup(>|$)"),
    ("double_error", "error>error"))

  /** Regex funnels over session journey paths — MATCH_RECOGNIZE-lite:
    * sessionize (30-min gap, the r8 discipline), concatenate each
    * session's type sequence, and count sessions matching each named
    * pattern. One sessionize pass, one aggregate; the patterns stay
    * in the RE2 ∩ Java-regex common subset so both engines replay
    * the match identically.
    */
  val funnel_regex = Q(
    (s, dir) => {
      val paths = TimeSeries.sessionize(T_(s, dir, "events"),
          col("user_id"), col("ts"), gapSeconds = 1800,
          ord = Seq(col("ts").asc, col("event_id").asc))
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("us"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type"))).as("path"))
      val agg = paths.agg(
        count(lit(1)).as("n_sessions"),
        funnelPatterns.map { case (name, re) =>
          sum(when(regexp_like(col("path"), lit(re)), 1L).otherwise(0L))
            .as(s"__m_$name")
        }: _*)
      agg.select(explode(array(funnelPatterns.map { case (name, _) =>
          struct(lit(name).as("pattern"), col("n_sessions"),
            col(s"__m_$name").as("n_matched"))
        }: _*)).as("r"))
        .select(col("r.*"))
        .orderBy(col("pattern"))
    },
    Some {
      val sessions =
        """l AS (SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        b AS (SELECT user_id, event_id, ts, event_type,
            CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                 THEN 1 ELSE 0 END AS nb FROM l),
        g AS (SELECT user_id, event_id, ts, event_type,
            CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b),
        p AS (SELECT user_id, session_idx,
            string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM g GROUP BY 1, 2)"""
      val arms = funnelPatterns.map { case (name, re) =>
        s"""SELECT '$name' AS pattern, count(*) AS n_sessions,
          CAST(SUM(CASE WHEN regexp_matches(path, '$re') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched FROM p"""
      }.mkString("\n      UNION ALL ")
      s"""WITH $sessions
      SELECT * FROM ($arms) ORDER BY pattern"""
    })

  /** Skip-gram pair corpus from the deterministic walks — the
    * DeepWalk/node2vec TRAINING-DATA step: each 4-node walk
    * (start, n1..n3) yields (center, context) pairs within window 1
    * (adjacent hops), counted corpus-wide. Everything downstream of
    * [[GraphOps.deterministicWalks]] is a codegen'd explode + one
    * count aggregate — the walk corpus never materializes off-heap,
    * and the pair table is vocabulary²-bounded, not walk-bounded.
    */
  val pipeline_graph_embed = Q(
    (s, dir) => {
      val walks = Queries33.g_random_walk.fn(s, dir)
      val hops = walks.select(array(
        struct(col("start").as("a"), col("n1").as("b")),
        struct(col("n1").as("a"), col("n2").as("b")),
        struct(col("n2").as("a"), col("n3").as("b"))).as("hs"))
      hops.select(explode(col("hs")).as("h"))
        .filter(col("h.a").isNotNull && col("h.b").isNotNull)
        // undirected skip-gram: emit both directions
        .select(explode(array(
          struct(col("h.a").as("center"), col("h.b").as("context")),
          struct(col("h.b").as("center"), col("h.a").as("context"))))
          .as("p"))
        .groupBy(col("p.center").as("center"), col("p.context").as("context"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("center"), col("context"))
    },
    Some {
      val walksSql = Queries33.g_random_walk.oracle.get
      s"""WITH w AS (SELECT * FROM ($walksSql)),
        hops AS (
          SELECT start AS a, n1 AS b FROM w
          UNION ALL SELECT n1, n2 FROM w
          UNION ALL SELECT n2, n3 FROM w),
        und AS (SELECT a AS center, b AS context FROM hops
            WHERE a IS NOT NULL AND b IS NOT NULL
          UNION ALL SELECT b, a FROM hops
            WHERE a IS NOT NULL AND b IS NOT NULL)
      SELECT center, context, count(*) AS n FROM und
      GROUP BY 1, 2 ORDER BY center, context"""
    })

  val all: Map[String, Q] = Map(
    "vec_knn_classify" -> vec_knn_classify,
    "dd_lsh_recall" -> dd_lsh_recall,
    "funnel_regex" -> funnel_regex,
    "pipeline_graph_embed" -> pipeline_graph_embed,
  )
}
