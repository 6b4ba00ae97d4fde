package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{GlobalOrder, GraphOps, Sampling}
import Queries.Q

/** Batch 35 (round 7): node2vec-style non-backtracking walks,
  * deterministic negative sampling for skip-gram training, the IVF
  * recall audit (companion to dd_lsh_recall), and the language-ID
  * confusion matrix.
  */
object Queries35 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Non-backtracking walks ([[GraphOps.deterministicWalksNoBacktrack]])
    * over the order↔part bipartite graph: on a bipartite graph an
    * unbiased 2nd hop returns to the start with probability 1/deg —
    * the node2vec p-bias removes exactly that degenerate mass, so
    * these walks always explore. The oracle replays the index
    * surgery (j + 1{j ≥ prevIdx} over deg−1 slots) hop by hop.
    */
  val g_walk_nobacktrack = Q(
    (s, dir) => {
      val op = T_(s, dir, "lineitem")
        .select((col("l_orderkey") + 10000000L).as("src"),
          (col("l_partkey") + 20000000L).as("dst"))
        .distinct()
      val edges = op.unionByName(
        op.select(col("dst").as("src"), col("src").as("dst")))
      val sources = T_(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("id"))
      GraphOps.deterministicWalksNoBacktrack(edges, sources, steps = 3)
        .orderBy(col("start"))
    },
    Some {
      def pick(i: Int, cur: String, prev: Option[String]) = prev match {
        case None =>
          s"""LEFT JOIN adj a ON h.$cur = a.src
            AND a.idx = ($cur * 1000003 + $i) % 94906249
              * 1103515245 % 2147483647 % a.deg"""
        case Some(p) =>
          s"""LEFT JOIN adj pe ON h.$cur = pe.src AND pe.dst = h.$p
          LEFT JOIN adj a ON h.$cur = a.src AND a.idx = (
            CASE WHEN a.deg - (CASE WHEN pe.idx IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN (($cur * 1000003 + $i) % 94906249 * 1103515245 % 2147483647)
                % (a.deg - (CASE WHEN pe.idx IS NOT NULL THEN 1 ELSE 0 END))
              + (CASE WHEN pe.idx IS NOT NULL
                  AND (($cur * 1000003 + $i) % 94906249 * 1103515245 % 2147483647)
                    % (a.deg - 1) >= pe.idx
                 THEN 1 ELSE 0 END)
            END)"""
      }
      s"""WITH op AS (SELECT DISTINCT 10000000 + l_orderkey AS src,
            20000000 + l_partkey AS dst FROM lineitem),
        e AS (SELECT src, dst FROM op UNION ALL SELECT dst, src FROM op),
        adj AS (SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY dst ASC) - 1 AS idx,
            count(*) OVER (PARTITION BY src) AS deg
          FROM e),
        h0 AS (SELECT 10000000 + o_orderkey AS start,
            10000000 + o_orderkey AS n0
          FROM orders WHERE o_orderkey % 500 = 0),
        h1 AS (SELECT h.*, a.dst AS n1 FROM h0 h ${pick(1, "n0", None)}),
        h2 AS (SELECT h.*, a.dst AS n2 FROM h1 h ${pick(2, "n1", Some("n0"))}),
        h3 AS (SELECT h.*, a.dst AS n3 FROM h2 h ${pick(3, "n2", Some("n1"))})
      SELECT start, n1, n2, n3 FROM h3 ORDER BY start"""
    })

  /** Deterministic NEGATIVE SAMPLING for the skip-gram corpus: every
    * (center, context) pair from [[Queries34.pipeline_graph_embed]]
    * gets 2 negatives drawn by hash over the dense walk vocabulary
    * (distinct centers, positioned by the [[GlobalOrder]] prefix
    * sum — no single-reducer vocabulary sort). Collisions with the
    * true context are kept (standard practice: they are rare and
    * unbiased); determinism means the training corpus is a pure
    * function of the graph.
    */
  val samp_negatives = Q(
    (s, dir) => {
      // r17 (guide §5): pairs embeds the ENTIRE walk→skip-gram pipeline
      // (g_random_walk + explode + count agg) and is consumed 3x
      // (pair expansion, vocab build, vocab count); vocab itself 2x.
      // Unpersisted, each reference re-ran the walk pipeline — the
      // same re-inline the oracle SQL already guards against with
      // MATERIALIZED CTEs. CacheScope-registered; released by the
      // harness after the terminal action.
      val scope = graft.operators.CacheScope.global
      val pairs = scope.persist(Queries34.pipeline_graph_embed.fn(s, dir)
        .select(col("center"), col("context")))
      val vocab = scope.persist(GlobalOrder.withGlobalIndex(
        pairs.select(col("center")).distinct(), Seq(col("center").asc))
        .select(col("center").as("node"), col("pos")))
      val v = vocab.agg(count(lit(1)).as("__vn"))
      pairs
        .select(col("center"), col("context"),
          explode(array(lit(1), lit(2))).as("j"))
        .crossJoin(broadcast(v))
        .withColumn("__np",
          Sampling.detHash(col("center") * 1000003L + col("context") * 31L
            + col("j")) % col("__vn") + 1L)
        .join(vocab, col("__np") === vocab("pos"))
        .select(col("center"), col("context"), col("j"),
          col("node").as("negative"))
        .orderBy(col("center"), col("context"), col("j"))
    },
    Some {
      val pairsSql = Queries34.pipeline_graph_embed.oracle.get
      // MATERIALIZED: pairs embeds the entire graph-embed pipeline
      // SQL and is referenced 3x; DuckDB re-inlines CTEs per
      // reference and the re-planned walk pipeline spilled 40+ GB at
      // 10x (the g_modularity lesson, one batch later)
      s"""WITH pairs AS MATERIALIZED (SELECT center, context FROM ($pairsSql)),
        vocab AS MATERIALIZED (SELECT center AS node,
            row_number() OVER (ORDER BY center ASC) AS pos
          FROM (SELECT DISTINCT center FROM pairs)),
        v AS (SELECT count(*) AS vn FROM vocab),
        ex AS (SELECT center, context, j FROM pairs,
          (SELECT unnest([1, 2]) AS j) js),
        k AS (SELECT center, context, j,
            (center * 1000003 + context * 31 + j) % 94906249
              * 1103515245 % 2147483647 % vn + 1 AS np
          FROM ex, v)
      SELECT center, context, j, vocab.node AS negative
      FROM k JOIN vocab ON k.np = vocab.pos
      ORDER BY center, context, j"""
    })

  /** IVF-ANN RECALL AUDIT — the vector-side companion of
    * dd_lsh_recall: per query, how many of the exact cosine top-10
    * does the 4-probe IVF index return? Composes the two catalog
    * entries verbatim (same centroids, same probes), so the audit
    * measures exactly what ships. Pair-table-sized joins only.
    */
  val vec_ivf_recall = Q(
    (s, dir) => {
      val truth = Queries3.vec_topk_bruteforce.fn(s, dir)
        .select(col("qid"), col("id"))
      val cand = Queries3.vec_ivf_ann.fn(s, dir)
        .select(col("qid"), col("id"), lit(1).as("__found"))
      truth.join(cand, Seq("qid", "id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__found").isNotNull, 1L).otherwise(0L))
            .as("n_found"))
        .withColumn("recall_bp", expr("10000L * n_found div n_true"))
        .orderBy(col("qid"))
    },
    Some(s"""WITH truth AS (SELECT qid, id FROM
          (${Queries3.vec_topk_bruteforce.oracle.get})),
        cand AS (SELECT qid, id FROM (${Queries3.vec_ivf_ann.oracle.get}))
      SELECT t.qid, count(*) AS n_true,
        CAST(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_found,
        10000 * CAST(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) // count(*) AS recall_bp
      FROM truth t LEFT JOIN cand c ON t.qid = c.qid AND t.id = c.id
      GROUP BY 1 ORDER BY 1"""))

  /** Language-ID CONFUSION MATRIX: the n-gram heuristic's guesses
    * against the labeled language, with per-label share — the eval
    * view that turns txt_langid from a score into a decision aid
    * (which languages bleed into which). One scan, one count
    * aggregate, label-pair-sized output.
    */
  val txt_lang_confusion = Q(
    (s, dir) => {
      val g = Queries3.txt_langid.fn(s, dir)
      val counts = g.groupBy(col("lang_label"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("lang_label").as("__l"))
        .agg(sum(col("n")).as("__t"))
      counts.join(broadcast(totals), col("lang_label") === col("__l"))
        .withColumn("share_bp", expr("10000L * n div __t"))
        .select(col("lang_label"), col("lang_guess"), col("n"),
          col("share_bp"))
        .orderBy(col("lang_label"), col("lang_guess"))
    },
    Some(s"""WITH g AS (${Queries3.txt_langid.oracle.get}),
        c AS (SELECT lang_label, lang_guess, count(*) AS n
          FROM g GROUP BY 1, 2),
        t AS (SELECT lang_label, CAST(sum(n) AS BIGINT) AS tot
          FROM c GROUP BY 1)
      SELECT c.lang_label, c.lang_guess, c.n,
        10000 * c.n // t.tot AS share_bp
      FROM c JOIN t USING (lang_label)
      ORDER BY lang_label, lang_guess"""))

  val all: Map[String, Q] = Map(
    "g_walk_nobacktrack" -> g_walk_nobacktrack,
    "samp_negatives" -> samp_negatives,
    "vec_ivf_recall" -> vec_ivf_recall,
    "txt_lang_confusion" -> txt_lang_confusion,
  )
}
