package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.Packing
import graft.sources.Tables
import Queries.Q

/** Batch 51 (round 8): the single-mega-stratum form of pair packing.
  *
  * [[graft.operators.Packing.packPaired]] ranks within each stratum
  * via a `partitionBy(stratum)` window — correct, but a stratum that
  * dominates the corpus (one source being 90% of documents is the
  * NORMAL shape of a crawl) rides through one task. The round-7 skew
  * soak measured that window at 1.2–2.3× on a 10× hot stratum.
  * [[graft.operators.Packing.packPairedLarge]] is the escape hatch:
  * the per-stratum descending rank is derived from a
  * [[graft.operators.GlobalOrder]] distributed prefix-sum over the
  * total order (stratum, toks desc, id) minus a broadcast per-stratum
  * offset, so the hot stratum sorts at full parallelism. Bins are
  * IDENTICAL to packPaired's (bin_id widens to BIGINT — at the scale
  * that needs this form, ranks exceed int32); the oracle replays the
  * same rank-complement pairing in SQL, so this entry pins the
  * equivalence cross-engine while `PackingSpec` pins it cross-form.
  */
object Queries51 {

  private[graft] val sinkNonce = new java.util.concurrent.atomic.AtomicLong(0L)

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val toksSql =
    """CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
      ELSE len(string_split_regex(trim(text), '\s+')) END"""

  /** Pair packing into 200-token bins per source via the prefix-sum
    * rank — same semantics as `pack_bestfit` (which packs per `lang`
    * at 120 via the window form), different stratum/budget so the two
    * entries exercise different fill patterns.
    */
  val pack_bestfit_large = Q(
    (s, dir) => Packing.packPairedLarge(
        T_(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            T.wsTokenCount(col("text")).as("toks")),
        col("source"), col("toks"), col("doc_id"), ctxLen = 200L)
      .orderBy(col("stratum"), col("bin_id")),
    Some(s"""WITH d AS (SELECT source AS stratum, doc_id AS id,
            CAST($toksSql AS BIGINT) AS toks FROM documents),
        ranked AS (SELECT stratum, id, toks,
            CAST(row_number() OVER (PARTITION BY stratum
              ORDER BY toks DESC, id ASC) AS BIGINT) AS r,
            count(*) OVER (PARTITION BY stratum) AS n
          FROM d WHERE toks > 0 AND toks <= 200),
        ls AS (SELECT * FROM ranked WHERE r * 2 <= n + 1),
        ss AS (SELECT stratum, CAST(n + 1 - r AS BIGINT) AS cr,
            r AS r_short, id AS id_short, toks AS toks_short
          FROM ranked WHERE r * 2 > n + 1),
        j AS (SELECT ls.stratum, ls.r, ls.id, ls.toks,
            ss.r_short, ss.id_short, ss.toks_short,
            ss.id_short IS NOT NULL AND ls.toks + ss.toks_short <= 200
              AS paired
          FROM ls LEFT JOIN ss ON ls.stratum = ss.stratum AND ls.r = ss.cr),
        bins AS (
          SELECT stratum, r AS bin_id, id AS id_long,
            CASE WHEN paired THEN id_short END AS id_short,
            CASE WHEN paired THEN 2 ELSE 1 END AS n_docs,
            CASE WHEN paired THEN toks + toks_short ELSE toks END
              AS bin_tokens
          FROM j
          UNION ALL
          SELECT stratum, r_short AS bin_id, id_short AS id_long,
            NULL AS id_short, 1 AS n_docs, toks_short AS bin_tokens
          FROM j WHERE id_short IS NOT NULL AND NOT paired)
      SELECT stratum, bin_id, id_long, id_short, n_docs, bin_tokens,
        10000 * bin_tokens // 200 AS fill_bp
      FROM bins ORDER BY stratum, bin_id"""))

  /** The 4-label order/customer/nation/region fixture graph both
    * Cypher-sink entries write (also `g_export_roundtrip`'s shape). */
  private[graft] def sinkFixtureGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
                     org.apache.spark.sql.DataFrame) = {
    import graft.domain.GraphAssembly
    val verts =
        GraphAssembly.vertices(T_(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          "Order", Seq("o_orderkey"))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          "Customer", Seq("c_custkey")))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name")),
          "Nation", Seq("n_nationkey")))
        .unionByName(GraphAssembly.vertices(T_(s, dir, "region")
          .select(col("r_regionkey"), col("r_name")),
          "Region", Seq("r_regionkey")))
      val edges =
        GraphAssembly.edges(T_(s, dir, "orders"), "PLACED_BY",
          "Order", Seq("o_orderkey"), "Customer", Seq("o_custkey"))
        .unionByName(GraphAssembly.edges(T_(s, dir, "customer"), "IN_NATION",
          "Customer", Seq("c_custkey"), "Nation", Seq("c_nationkey")))
        .unionByName(GraphAssembly.edges(T_(s, dir, "nation"), "IN_REGION",
          "Nation", Seq("n_nationkey"), "Region", Seq("n_regionkey")))
    (verts, edges)
  }

  /** The Cypher MERGE sink driven end-to-end over the 4-label
    * fixture graph: constraints + batched UNWIND MERGE through
    * [[graft.sinks.CypherSink]] into the in-memory Bolt interpreter,
    * then the emitted rows are per-label node counts and per-rel edge
    * counts read from the STORE (not the input frames), plus a
    * constraints row — so the entry proves the full write path
    * delivered every row exactly once. The store is the local-mode
    * stand-in for a Bolt pool; the write path — gates, DDL-once,
    * executor-parallel batching — is the production one. The
    * `g_cypher_sink_tcp` twin (Queries52) swaps the factory for the
    * real-socket transport.
    */
  /** Per-label node counts, per-rel edge counts, and a constraints
    * row read from a sink STORE (not the input frames) — the shared
    * output shape of all three Cypher-sink entries, so their oracles
    * can never silently diverge. */
  private[graft] def storeCounts(s: org.apache.spark.sql.SparkSession,
      st: graft.sinks.InMemoryBolt.Store): org.apache.spark.sql.DataFrame = {
    val nodeRows = st.nodes.keysIterator.toSeq.groupBy(_._1)
      .toSeq.map { case (label, ks) => ("node", label, ks.size.toLong) }
    val edgeRows = st.edges.iterator.toSeq.groupBy(_._2)
      .toSeq.map { case (rel, es) => ("edge", rel, es.size.toLong) }
    val checkRows = Seq(("check", "constraints", st.constraints.size.toLong))
    import s.implicits._
    (nodeRows ++ edgeRows ++ checkRows)
      .toDF("kind", "name", "n").orderBy(col("kind"), col("name"))
  }

  val g_cypher_sink = Q(
    (s, dir) => {
      import graft.sinks.{CypherSink, InMemoryBolt}
      val (verts, edges) = sinkFixtureGraph(s, dir)
      // per-invocation nonce: two concurrent runs over the same
      // dataset in one JVM must not drop/interleave each other's store
      val token = s"g_cypher_sink_${graft.sources.Staging.dirKey(dir)}" +
        s"_${Queries51.sinkNonce.incrementAndGet()}"
      try {
        CypherSink.writeGraph(verts, edges,
          InMemoryBolt.Factory(token), batchSize = 1000)
        storeCounts(s, InMemoryBolt.store(token))
      } finally InMemoryBolt.drop(token) // incl. failed runs — nonce'd
                                         // tokens would otherwise leak
                                         // one store per failure
    },
    Some("""SELECT kind, name, n FROM (
        SELECT 'node' AS kind, 'Order' AS name, count(*) AS n FROM orders
        UNION ALL SELECT 'node', 'Customer', count(*) FROM customer
        UNION ALL SELECT 'node', 'Nation', count(*) FROM nation
        UNION ALL SELECT 'node', 'Region', count(*) FROM region
        UNION ALL SELECT 'edge', 'PLACED_BY', count(*) FROM orders
        UNION ALL SELECT 'edge', 'IN_NATION', count(*) FROM customer
        UNION ALL SELECT 'edge', 'IN_REGION', count(*) FROM nation
        UNION ALL SELECT 'check', 'constraints', 4)
      ORDER BY kind, name"""))

  /** Incremental IVF index refresh ([[Similarity.ivfDeltaAssign]]):
    * the 80% lowest-gate vectors are the standing corpus (seeded
    * 2-round Lloyd index, the `vec_ivf_ann` machinery), the other 20%
    * arrive as a delta and are assigned to the EXISTING centroids —
    * the cheap every-ingest-batch path; the standing corpus is never
    * rescanned. Output is the per-cell occupancy ledger a re-cluster
    * policy reads: base count, delta count, and drift in basis
    * points. The oracle replays the seed sample, both Lloyd rounds,
    * both assigns, and the roll-up.
    */
  val vec_ivf_delta = Q(
    (s, dir) => {
      import graft.operators.Similarity
      val emb = T_(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 10 < 8)
      val delta = emb.filter(col("vec_id") % 10 >= 8)
      val (indexed, centroids) =
        Similarity.ivfKMeans(base, "embedding", "vec_id", nCells = 16, iters = 2)
      Similarity.ivfDeltaAssign(indexed, centroids, delta, "embedding", "vec_id")
        .groupBy(col("cell"))
        .agg(sum(when(!col("is_delta"), 1L).otherwise(0L)).as("base_n"),
          sum(when(col("is_delta"), 1L).otherwise(0L)).as("delta_n"),
          count(lit(1)).as("total_n"))
        .withColumn("drift_bp", expr("10000L * delta_n div total_n"))
        .orderBy(col("cell"))
    },
    Some(s"""WITH c AS (SELECT vec_id AS id, embedding AS v FROM embeddings
          WHERE vec_id % 10 < 8),
      cent0 AS (
        SELECT id AS cell,
          [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
        FROM c
        QUALIFY row_number() OVER (ORDER BY
          (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
          id ASC) <= 16),
      ${Queries3.lloydRoundSql(1, "cent0")},
      ${Queries3.lloydRoundSql(2, "cent1")},
      base_assigned AS (
        SELECT id, cell FROM (
          SELECT c.id, cent2.cell,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST,
                cent2.cell ASC) AS rn
          FROM c, cent2) WHERE rn = 1),
      d AS (SELECT vec_id AS id, embedding AS v FROM embeddings
          WHERE vec_id % 10 >= 8),
      delta_assigned AS (
        SELECT id, cell FROM (
          SELECT d.id, cent2.cell,
            row_number() OVER (PARTITION BY d.id
              ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST,
                cent2.cell ASC) AS rn
          FROM d, cent2) WHERE rn = 1),
      u AS (SELECT id, cell, false AS is_delta FROM base_assigned
        UNION ALL SELECT id, cell, true AS is_delta FROM delta_assigned)
      SELECT cell,
        CAST(sum(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
        CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS delta_n,
        count(*) AS total_n,
        10000 * CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
          // count(*) AS drift_bp
      FROM u GROUP BY cell ORDER BY cell"""))

  val all: Map[String, Q] = Map(
    "pack_bestfit_large" -> pack_bestfit_large,
    "g_cypher_sink" -> g_cypher_sink,
    "vec_ivf_delta" -> vec_ivf_delta,
  )
}
