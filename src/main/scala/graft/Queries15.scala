package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, GraphOps, Similarity, Sketches, Upsert}
import Queries.Q

/** Batch 15: fixpoint-certificate CORRECTNESS entries for the
  * CONVERGED graph forms. The production paths (`pageRankConverged`,
  * `connectedComponentsConverged`, `kCoreConverged`) iterate a
  * data-dependent number of rounds, which static SQL cannot unroll —
  * so instead of replaying the trajectory, each entry recomputes one
  * application of the recurrence FROM THE OUTPUT (same decimal
  * quantization as the engine) and emits rows whose correct values the
  * oracle knows without iterating: the graph's vertex list and
  * all-true / all-zero violation columns. An under-converged run fails
  * on exactly the vertices still moving (spec-proven on cyclic toys in
  * GraphCertSpec). Reference capability: the converged forms back the
  * reference's full-graph analytics pass (graph_db: app/
  * main_graph_topraq.py:84-340 materializes the whole graph before
  * querying); certificates are our scale-safe replacement for its
  * "re-run and eyeball" validation.
  */
object Queries15 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  /** Same namespaced hierarchy graph as Queries3's g_* family:
    * order→customer→nation→region in one Long id space.
    */
  private def edgesDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = T_(s, dir, "orders")
      .select((col("o_orderkey") + 10000000L).as("src"),
        (col("o_custkey") + 10000L).as("dst"))
    val c = T_(s, dir, "customer")
      .select((col("c_custkey") + 10000L).as("src"),
        (col("c_nationkey").cast("long") + 100L).as("dst"))
    val n = T_(s, dir, "nation")
      .select((col("n_nationkey").cast("long") + 100L).as("src"),
        col("n_regionkey").cast("long").as("dst"))
    o.unionByName(c).unionByName(n)
  }

  private val edgesSql =
    """edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation)"""

  private val vertsSql =
    "verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)"

  /** Converged PageRank, certified: run the production
    * tolerance-driven loop, then check every vertex's rank against one
    * recomputed application of the recurrence. The oracle pins the
    * vertex list and all-true convergence — reproducible only from an
    * actual fixpoint.
    */
  val g_pagerank_cert = Q(
    (s, dir) => {
      val e = edgesDf(s, dir)
      GraphOps.pageRankCertificate(e,
        GraphOps.pageRankConverged(e, tol = 1e-7), tol = 1e-7)
    },
    Some(s"""WITH $edgesSql, $vertsSql
      SELECT id, CAST(TRUE AS BOOLEAN) AS converged FROM verts"""))

  /** Converged connected components, certified: label ≤ id, no
    * neighbor with a smaller label (edge-constancy — exactly what an
    * under-iterated run violates), and every label a self-labeled
    * root.
    */
  val g_cc_cert = Q(
    (s, dir) => {
      val e = edgesDf(s, dir)
      GraphOps.connectedComponentsCertificate(e,
        GraphOps.connectedComponentsConverged(e))
    },
    Some(s"""WITH $edgesSql, $vertsSql
      SELECT id, CAST(TRUE AS BOOLEAN) AS converged FROM verts"""))

  /** Converged k-core (part co-purchase graph, k = 4 as g_kcore),
    * certified: induced degrees recomputed from the original edge set
    * on the surviving vertices — min ≥ k (one more peel changes
    * nothing) and exactly the reported degrees. The vertex count of
    * the FULL graph is the oracle-computed pin.
    */
  val g_kcore_cert = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
      val pairs = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.pk") < col("l2.pk"))
        .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
      GraphOps.kCoreCertificate(pairs,
        GraphOps.kCoreConverged(pairs, k = 4), k = 4)
    },
    Some("""WITH li AS MATERIALIZED (SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS pk
          FROM lineitem WHERE l_quantity >= 25),
        e0 AS (SELECT DISTINCT least(l1.pk, l2.pk) AS a, greatest(l1.pk, l2.pk) AS b
          FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
          WHERE l1.pk < l2.pk),
        verts AS (SELECT DISTINCT id FROM
          (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0))
      SELECT (SELECT count(*) FROM verts) AS n_vertices,
        CAST(0 AS BIGINT) AS n_below_k,
        CAST(0 AS BIGINT) AS n_deg_mismatch"""))

  /** Blocked fuzzy join at a scale where the theta form matters: the
    * full part table (20k names at sf0.1) against a typo'd copy —
    * 4·10⁸ levenshtein evaluations as a nested loop, versus an
    * EQUI-join on (first char, length band) blocks with the distance
    * as a per-candidate residual ([[Dedup.fuzzyJoinBlocked]];
    * PlanSpec pins the no-nested-loop shape). The tiny-dim theta form
    * stays as `f_fuzzy_match` — broadcast nested loop is the RIGHT
    * plan for a 25-row dimension.
    */
  val f_fuzzy_match_blocked = Q(
    (s, dir) => {
      val clean = T_(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val dirty = clean.select(col("p_partkey").as("d_key"),
        concat(substring(col("p_name"), 1, 2), lit("X"),
          substring(col("p_name"), 4, 1000000)).as("d_name"))
      Dedup.fuzzyJoinBlocked(dirty, "d_name", clean, "p_name", maxDist = 2)
        .select(col("d_key"), col("d_name"), col("p_partkey"),
          col("p_name"), col("dist"))
    },
    Some("""WITH dirty AS (SELECT p_partkey AS d_key,
          substr(p_name, 1, 2) || 'X' || substr(p_name, 4) AS d_name FROM part),
        ck AS (SELECT p_partkey, p_name,
          substr(p_name, 1, 1) || substr(p_name, -1, 1) || '|' ||
            CAST(length(p_name) // 3 AS VARCHAR) AS bk
          FROM part),
        dk AS (SELECT d_key, d_name,
          substr(d_name, 1, 1) || substr(d_name, -1, 1) || '|' ||
            CAST(length(d_name) // 3 + off AS VARCHAR) AS bk
          FROM dirty CROSS JOIN (VALUES (-1), (0), (1)) t(off))
      SELECT d_key, d_name, p_partkey, p_name,
        CAST(levenshtein(d_name, p_name) AS INTEGER) AS dist
      FROM dk JOIN ck USING (bk) WHERE levenshtein(d_name, p_name) <= 2"""))

  /** Batch kNN JOIN: the FULL embeddings table as both corpus and
    * query side (|Q| = |corpus| — the cross-corpus semantic-dedup /
    * contamination shape), 5 nearest per vector through the same
    * seeded-k-means IVF index as `vec_ivf_ann`. The point vs that
    * query: NO broadcast of the probe side —
    * [[Similarity.ivfKnnJoin]] shuffles probes and indexed corpus on
    * the cell key (shuffle-hash hinted), with the probe-cell argtop
    * collapsing map-side, so the plan survives a query side 10⁶×
    * this size. Oracle replays k-means + probe + score + top-k
    * exactly.
    */
  val vec_ivf_knn_join = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val (indexed, centroids) =
        Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 16, iters = 2)
      Similarity.ivfKnnJoin(indexed, centroids, emb,
        "embedding", "vec_id", k = 5, nProbe = 2)
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
              ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST, cent2.cell ASC) AS rn
          FROM c, cent2) WHERE rn = 1),
      q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings),
      probes AS (
        SELECT qid, qv, cell FROM (
          SELECT q.qid, q.qv, cent2.cell,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${Queries3.cosineSql("qv", "cv")} DESC NULLS LAST, cent2.cell ASC) AS rn
          FROM q, cent2) WHERE rn <= 2),
      scored AS (
        SELECT p.qid, a.id, ${Queries3.cosineSql("v", "qv")} AS cos
        FROM assigned a JOIN probes p ON a.cell = p.cell)
      SELECT qid, id, cos, rank
      FROM (SELECT qid, id, cos, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY cos DESC NULLS LAST, id ASC) AS INTEGER) AS rank
            FROM scored)
      WHERE rank <= 5"""))

  /** Partition MERGE with a null-date delta: `s16`'s daily-ingest
    * shape, but every 10th user's incoming roll-up rows have a NULL
    * date — unmergeable at partition granularity. Instead of the
    * require-non-null contract, [[Upsert.overwritePartitionsQuarantine]]
    * routes them to an append-only quarantine and MERGEs the rest; the
    * read-back unions the lake table and the quarantine (tagged by
    * `src`). Survival semantics the oracle replays: untouched base
    * partitions stay; base keys whose incoming row was nulled-out
    * SURVIVE the merge with base values (their key never arrives);
    * everything else takes the incoming row; nulled rows appear only
    * in the quarantine.
    */
  val s16_null_quarantine = Q(
    (s, dir) => {
      val target = stagingDir(dir, "day_metrics_nullq")
      val quarantine = stagingDir(dir, "day_metrics_nullq_bad")
      val fs = new org.apache.hadoop.fs.Path(target)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(target), true)
      fs.delete(new org.apache.hadoop.fs.Path(quarantine), true)
      def rollup(f: org.apache.spark.sql.Column, types: Seq[String]) =
        T_(s, dir, "events")
          .filter(col("event_type").isin(types: _*) && f)
          .groupBy(col("user_id"), to_date(col("ts")).as("date"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
      val base = rollup(col("ts") < lit("2024-01-21").cast("timestamp"),
        Seq("click", "view"))
      val incoming = rollup(col("ts") >= lit("2024-01-15").cast("timestamp"),
        Seq("click", "view", "purchase"))
        .withColumn("date",
          when(col("user_id") % 10 === 0, lit(null)).otherwise(col("date")))
      val keys = Seq("user_id", "date")
      Upsert.overwritePartitionsQuarantine(base, keys, "date", target, quarantine)
      Upsert.overwritePartitionsQuarantine(incoming, keys, "date", target, quarantine)
      s.read.parquet(target)
        .select(col("user_id"), col("date"), col("n"), col("total"),
          lit("main").as("src"))
        .unionByName(s.read.parquet(quarantine)
          .select(col("user_id"), col("date").cast("date").as("date"),
            col("n"), col("total"), lit("quarantine").as("src")))
    },
    Some("""WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
        FROM events
        WHERE ts < TIMESTAMP '2024-01-21' AND event_type IN ('click','view')
        GROUP BY 1, 2),
      inc0 AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'
          AND event_type IN ('click','view','purchase')
        GROUP BY 1, 2),
      inc AS (SELECT user_id,
          CASE WHEN user_id % 10 = 0 THEN NULL ELSE date END AS date,
          n, total FROM inc0)
      SELECT user_id, date, n, total, 'main' AS src
      FROM base WHERE date < DATE '2024-01-15'
      UNION ALL
      SELECT user_id, date, n, total, 'main'
      FROM base WHERE date >= DATE '2024-01-15' AND user_id % 10 = 0
      UNION ALL
      SELECT user_id, date, n, total, 'main' FROM inc WHERE date IS NOT NULL
      UNION ALL
      SELECT user_id, NULL, n, total, 'quarantine' FROM inc WHERE date IS NULL"""),
    bench = false)

  /** End-to-end daily-ingest orchestration — the reference's §3.1 CLI
    * trace (main_graph_topraq.py:84-340: ordered stages, per-stage
    * [TIMER]s) at LAKE granularity, composing four operators this
    * engine ships as one gated [[Orchestrator]] run:
    *
    *   merge   — partition-level MERGE of the day's metric delta into
    *             the staged lake (s16 semantics; untouched partitions
    *             never read or written);
    *   dedup   — incremental MinHash LSH of today's documents against
    *             the persisted SIGNATURE store (dd_minhash_delta
    *             semantics; corpus text never re-read);
    *   rollup  — algebraic materialized-view refresh (s12: state ∪
    *             delta, re-aggregate — merge == recompute);
    *   profile — post-ingest stats over the merged lake (s17 shape).
    *
    * Stages hand off through staged parquet (the real ingest shape),
    * each stamped with its own [TIMER]. The output is the run's
    * stage × metric summary; the oracle recomputes every metric from
    * scratch in SQL — merge-vs-recompute equality across the whole
    * composed pipeline, not just per-operator.
    */
  val pipeline_daily_ingest = Q(
    (s, dir) => {
      import graft.Orchestrator.Stage
      val target = stagingDir(dir, "daily_ingest_lake")
      val sigStore = stagingDir(dir, "daily_ingest_sigs")
      val pairsPath = stagingDir(dir, "daily_ingest_pairs")
      val rollupPath = stagingDir(dir, "daily_ingest_rollup")
      val profilePath = stagingDir(dir, "daily_ingest_profile")
      val fs = new org.apache.hadoop.fs.Path(target)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(target, sigStore, pairsPath, rollupPath, profilePath)
        .foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      def dayRollup(ss: org.apache.spark.sql.SparkSession,
                    f: org.apache.spark.sql.Column, types: Seq[String]) =
        T_(ss, dir, "events")
          .filter(col("event_type").isin(types: _*) && f)
          .groupBy(col("user_id"), to_date(col("ts")).as("date"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
      val stages = Seq(
        Stage("merge", "partition MERGE of the day-metrics delta", (ss, _) => {
          val keys = Seq("user_id", "date")
          Upsert.overwritePartitions(
            dayRollup(ss, col("ts") < lit("2024-01-21").cast("timestamp"),
              Seq("click", "view")), keys, "date", target)
          Upsert.overwritePartitions(
            dayRollup(ss, col("ts") >= lit("2024-01-15").cast("timestamp"),
              Seq("click", "view", "purchase")), keys, "date", target)
        }),
        Stage("dedup", "incremental LSH vs the signature store", (ss, _) => {
          val docs = T_(ss, dir, "documents")
          Dedup.minhashSignatures(docs.filter(col("doc_id") < 250),
            "text", "doc_id", replayable = true)
            .write.mode("overwrite").parquet(sigStore)
          Dedup.minhashLshDelta(ss.read.parquet(sigStore),
            docs.filter(col("doc_id") >= 250), "text", "doc_id",
            replayable = true)
            .write.mode("overwrite").parquet(pairsPath)
        }),
        Stage("rollup", "algebraic roll-up refresh (state ∪ delta)", (ss, _) => {
          def r(f: org.apache.spark.sql.Column) = T_(ss, dir, "events")
            .filter(f)
            .groupBy(col("user_id"), to_date(col("ts")).as("obs_day"),
              col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(27,8)")).as("sum_dec"))
          val cut = lit("2024-01-21").cast("timestamp")
          val state = stagingDir(dir, "daily_ingest_day_state")
          r(col("ts") < cut).write.mode("overwrite").parquet(state)
          ss.read.parquet(state).unionByName(r(col("ts") >= cut))
            .groupBy(col("user_id"), col("obs_day"), col("event_type"))
            .agg(sum(col("n")).as("n"),
              sum(col("sum_dec")).cast("double").as("total"))
            .write.mode("overwrite").parquet(rollupPath)
        }),
        Stage("profile", "post-ingest lake profile", (ss, _) => {
          ss.read.parquet(target).agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("total").cast("decimal(27,8)")).cast("double").as("grand_total"))
            .write.mode("overwrite").parquet(profilePath)
        }))
      graft.Orchestrator.run(s, dir, stages)
      val lake = s.read.parquet(target)
      val pairs = s.read.parquet(pairsPath)
      def one(stage: String, metric: String,
              df: org.apache.spark.sql.DataFrame,
              v: org.apache.spark.sql.Column) =
        df.agg(v.cast("double").as("value"))
          .select(lit(stage).as("stage"), lit(metric).as("metric"), col("value"))
      one("merge", "rows", lake, count(lit(1)))
        .unionByName(one("merge", "partitions", lake, countDistinct(col("date"))))
        .unionByName(one("dedup", "pairs", pairs, count(lit(1))))
        .unionByName(one("dedup", "flagged_delta_docs",
          pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
            .filter(col("id") >= 250), countDistinct(col("id"))))
        .unionByName(one("rollup", "rows", s.read.parquet(rollupPath), count(lit(1))))
        .unionByName(s.read.parquet(profilePath)
          .select(expr("stack(3, 'rows', CAST(n_rows AS DOUBLE)," +
            " 'users', CAST(n_users AS DOUBLE)," +
            " 'grand_total', grand_total) AS (metric, value)"))
          .select(lit("profile").as("stage"), col("metric"), col("value")))
    },
    Some {
      val (mults, adds) = Dedup.minhashCoeffs(32, replayable = true)
      val ml = mults.mkString("[", ", ", "]")
      val al = adds.mkString("[", ", ", "]")
      s"""WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
        FROM events
        WHERE ts < TIMESTAMP '2024-01-21' AND event_type IN ('click','view')
        GROUP BY 1, 2),
      inc AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'
          AND event_type IN ('click','view','purchase')
        GROUP BY 1, 2),
      merged AS (
        SELECT user_id, date, n, total FROM base WHERE date < DATE '2024-01-15'
        UNION ALL SELECT user_id, date, n, total FROM inc),
      co AS (SELECT $ml::BIGINT[] AS M, $al::BIGINT[] AS A),
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
        WHERE x.id < y.id AND (x.id >= 250 OR y.id >= 250)
        GROUP BY 1, 2),
      flagged AS (SELECT DISTINCT id FROM
        (SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs)
        WHERE id >= 250),
      roll AS (SELECT user_id, CAST(ts AS DATE) AS obs_day, event_type
        FROM events GROUP BY 1, 2, 3)
      SELECT 'merge' AS stage, 'rows' AS metric,
        CAST(count(*) AS DOUBLE) AS value FROM merged
      UNION ALL SELECT 'merge', 'partitions',
        CAST(count(DISTINCT date) AS DOUBLE) FROM merged
      UNION ALL SELECT 'dedup', 'pairs', CAST(count(*) AS DOUBLE) FROM pairs
      UNION ALL SELECT 'dedup', 'flagged_delta_docs',
        CAST(count(*) AS DOUBLE) FROM flagged
      UNION ALL SELECT 'rollup', 'rows', CAST(count(*) AS DOUBLE) FROM roll
      UNION ALL SELECT 'profile', 'rows', CAST(count(*) AS DOUBLE) FROM merged
      UNION ALL SELECT 'profile', 'users',
        CAST(count(DISTINCT user_id) AS DOUBLE) FROM merged
      UNION ALL SELECT 'profile', 'grand_total',
        CAST(SUM(CAST(total AS DECIMAL(27,8))) AS DOUBLE) FROM merged"""
    },
    bench = false)

  /** Exactly-once across a mid-stream KILL + checkpoint resume: the
    * checkpointed streaming MERGE ([[graft.streaming.StreamingUpsert]])
    * is killed by an injected failure after two of four micro-batches
    * commit, resumed from the same checkpoint, and the recovered table
    * must equal the batch oracle — committed batches not replayed
    * (offsets in the checkpoint), the killed batch replayed (its
    * commit never landed), no row lost or duplicated. Keys are unique
    * event ids, so the oracle is the plain projection: any restart
    * defect surfaces as a row-count or hash mismatch.
    */
  val stream_restart = Q(
    (s, dir) => graft.streaming.StreamingUpsert.restartProofOnce(
      s, s"$dir/events.parquet", Seq("event_id"), Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value")),
    Some("SELECT event_id, user_id, value FROM events"),
    bench = false)

  /** Bounded-state quantiles — the 100 TB path for percentile queries
    * over high-cardinality measures, where the exact value-frequency
    * table ([[graft.operators.Percentiles]]) is itself huge: a
    * 1000-cell fixed-grid histogram over extended price (one
    * map-combining aggregate, `bins` rows of state, mergeable by
    * cell-wise addition like CMS) answering p25/p50/p75/p95 at
    * left-edge nearest-rank — error ≤ one 100-unit cell. The oracle
    * replays the identical grid arithmetic; the merge≡direct and
    * accuracy-vs-exact properties are spec-pinned.
    */
  val a_hist_quantiles = Q(
    (s, dir) => Sketches.histQuantiles(
      Sketches.histCounters(T_(s, dir, "lineitem"),
        col("l_extendedprice").cast("double"), lo = 0.0, hi = 100000.0,
        bins = 1000),
      lo = 0.0, hi = 100000.0, bins = 1000,
      qs = Seq(0.25, 0.5, 0.75, 0.95)),
    Some("""WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
          WHERE l_extendedprice IS NOT NULL
            AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        h AS (SELECT LEAST(GREATEST(CAST(floor((x - 0.0) / 100000.0 * 1000) AS BIGINT), 0), 999) AS b,
            count(*) AS c
          FROM v GROUP BY 1),
        cum AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM h),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
        r AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS rank, n
          FROM (SELECT unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]) AS q), tot)
      SELECT r.q, r.rank, r.n, min(cum.b) AS b,
        0.0 + (CAST(min(cum.b) AS DOUBLE) * 100000.0) / 1000 AS est
      FROM cum JOIN r ON cum.cum >= r.rank
      GROUP BY r.q, r.rank, r.n"""))

  /** [[a_hist_quantiles]], grouped: the distribution-per-slice shape a
    * curation pass actually asks for (price quantiles per return
    * flag here; token-length per language in a corpus). State is
    * groups×bins counters, merged cell-wise; the per-group quantile
    * pass runs over that tiny table only.
    */
  val a_hist_quantiles_by = Q(
    (s, dir) => Sketches.histQuantilesBy(
      Sketches.histCountersBy(T_(s, dir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice").cast("double"),
        lo = 0.0, hi = 100000.0, bins = 1000),
      lo = 0.0, hi = 100000.0, bins = 1000, qs = Seq(0.5, 0.9)),
    Some("""WITH v AS (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL
            AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        h AS (SELECT g,
            LEAST(GREATEST(CAST(floor((x - 0.0) / 100000.0 * 1000) AS BIGINT), 0), 999) AS b,
            count(*) AS c
          FROM v GROUP BY 1, 2),
        cum AS (SELECT g, b, SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum FROM h),
        tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY g),
        r AS (SELECT g, q, CAST(ceil(q * n) AS BIGINT) AS rank, n
          FROM tot, (SELECT unnest([0.5, 0.9]::DOUBLE[]) AS q))
      SELECT r.g, r.q, r.rank, r.n, min(cum.b) AS b,
        0.0 + (CAST(min(cum.b) AS DOUBLE) * 100000.0) / 1000 AS est
      FROM cum JOIN r ON cum.g = r.g AND cum.cum >= r.rank
      GROUP BY r.g, r.q, r.rank, r.n"""))

  val all: Map[String, Q] = Map(
    "g_pagerank_cert" -> g_pagerank_cert,
    "g_cc_cert" -> g_cc_cert,
    "g_kcore_cert" -> g_kcore_cert,
    "f_fuzzy_match_blocked" -> f_fuzzy_match_blocked,
    "vec_ivf_knn_join" -> vec_ivf_knn_join,
    "s16_null_quarantine" -> s16_null_quarantine,
    "pipeline_daily_ingest" -> pipeline_daily_ingest,
    "stream_restart" -> stream_restart,
    "a_hist_quantiles" -> a_hist_quantiles,
    "a_hist_quantiles_by" -> a_hist_quantiles_by,
  )
}
