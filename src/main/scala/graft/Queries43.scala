package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Sampling, Similarity}
import Queries.Q

/** Batch 43 (round 7): streaming windowed top-k, the partition
  * backfill planner, and an NN-expansion ANN refinement audit.
  */
object Queries43 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Streaming trending top-k (tumbling windows)
  // ===========================================================

  /** STREAMING TRENDING TOP-K: tumbling-day event-type counts
    * maintained incrementally (watermarked window state — bounded by
    * horizon × key count), top-3 per day ranked off the materialized
    * counts. Counts are order-independent, so the exhausted stream
    * equals the batch replay exactly — the 13th batch==stream parity
    * pair in the streaming family.
    */
  val stream_window_topk = Q(
    (s, dir) => graft.streaming.StreamingTopK.windowTopKOnce(
      s, s"$dir/events.parquet", k = 3),
    Some("""WITH d AS (SELECT CAST(ts AS DATE) AS date, event_type,
            count(*) AS n
          FROM events GROUP BY 1, 2)
      SELECT date, event_type, n,
        CAST(row_number() OVER (PARTITION BY date
          ORDER BY n DESC, event_type ASC) AS INTEGER) AS rank
      FROM d QUALIFY rank <= 3"""),
    bench = false)

  // ===========================================================
  // Partition backfill planner (gaps → contiguous jobs)
  // ===========================================================

  /** BACKFILL PLANNER: given the lake's present (event_type, day)
    * partitions, plan the re-ingest — days MISSING from the observed
    * range plus days whose partition a deterministic validity gate
    * marks invalid (hash(day_index) % 7 = 0 — the "corrupted by the
    * bad deploy" fixture) — grouped into CONTIGUOUS day-range jobs
    * per type via the gaps-and-islands rewrite (island key =
    * day_index − dense row index), because a backfill runner wants
    * one job per contiguous range, not one per day. Output: each
    * job's type, ordinal, range, and day count.
    *
    * Scale: everything after the first distinct collapse runs on
    * (types × days) rows — calendar-bounded, independent of fact
    * volume.
    */
  val lake_backfill_plan = Q(
    (s, dir) => {
      val present = T_(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      val bounds = present.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      val spine = present.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(mn, mx, interval 1 day)")).as("d"))
      val missing = spine.join(present, Seq("event_type", "d"), "left_anti")
      val invalid = present.filter(
        Sampling.detHash(datediff(col("d"), lit("2024-01-01").cast("date"))) % 7 === 0)
      val todo = missing.unionByName(invalid).distinct()
        .withColumn("di", datediff(col("d"), lit("2024-01-01").cast("date")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
      todo
        .withColumn("island", col("di") - row_number().over(w))
        .groupBy(col("event_type"), col("island"))
        .agg(min(col("d")).as("start_day"), max(col("d")).as("end_day"),
          count(lit(1)).as("n_days"))
        .withColumn("job_id", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("start_day"))))
        .select(col("event_type"), col("job_id"), col("start_day"),
          col("end_day"), col("n_days"))
        .orderBy(col("event_type"), col("job_id"))
    },
    Some("""WITH present AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d
          FROM events),
        bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM present),
        spine AS (SELECT event_type, unnest(generate_series(mn, mx,
            INTERVAL 1 DAY))::DATE AS d
          FROM (SELECT DISTINCT event_type FROM present), bounds),
        missing AS (SELECT s.event_type, s.d FROM spine s
          LEFT JOIN present p ON s.event_type = p.event_type AND s.d = p.d
          WHERE p.d IS NULL),
        invalid AS (SELECT event_type, d FROM present
          WHERE ((date_diff('day', DATE '2024-01-01', d) % 94906249)
            * 1103515245 % 2147483647) % 7 = 0),
        todo AS (SELECT DISTINCT event_type, d,
            date_diff('day', DATE '2024-01-01', d) AS di
          FROM (SELECT * FROM missing UNION ALL SELECT * FROM invalid)),
        isl AS (SELECT event_type, d, di,
            di - row_number() OVER (PARTITION BY event_type ORDER BY di)
              AS island
          FROM todo),
        jobs AS (SELECT event_type, island, min(d) AS start_day,
            max(d) AS end_day, count(*) AS n_days
          FROM isl GROUP BY 1, 2)
      SELECT event_type,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY start_day)
          AS INTEGER) AS job_id,
        start_day, end_day, n_days
      FROM jobs ORDER BY event_type, job_id"""))

  // ===========================================================
  // ANN refinement: one NN-descent expansion round, recall-audited
  // ===========================================================

  /** ANN REFINE AUDIT — the NN-descent core step as a recall dial:
    * start from a deliberately cheap IVF answer (nProbe = 1), expand
    * each query's candidate set through the corpus kNN lists
    * (`vec_ivf_knn_join`'s 5-NN graph: neighbors of my neighbors are
    * candidate neighbors), re-rank the expanded set by EXACT cosine,
    * and grade both answers against the brute-force truth. Refined
    * recall is provably >= base recall (the expanded set contains the
    * base set, and anything that displaces a truth member from the
    * top-10 is itself a truth member). The audit shows what one
    * join-shaped refinement round buys before reaching for more
    * probes — the scale lever for graph-ANN on Spark: each round is
    * ONE equi-join on the neighbor id, no iteration state.
    */
  val vec_ann_refine = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      // The IVF index is built ONCE and shared by the cheap base
      // answer and the corpus 5-NN graph: vec_ivf_knn_join's own fn
      // ran a second ivfKMeans with the IDENTICAL (corpus, nCells=16,
      // iters=2) parameters — a deterministic seeded k-means, so the
      // second build is bit-identical recompute (r16: 2 Lloyd rounds
      // = 4 shuffles + a corpus assign pass removed; oracle text
      // unchanged and still green). `indexed` is persisted because
      // three consumers scan it (base probe, knn join, exact re-rank).
      val scope = graft.operators.CacheScope.global
      val (indexed0, centroids) =
        Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 16, iters = 2)
      val indexed = scope.persist(indexed0)
      val base = Similarity.ivfTopK(indexed, centroids,
        emb.filter(col("vec_id") < 3), "embedding", "vec_id", k = 10, nProbe = 1)
        .select(col("qid"), col("id"))
      // same params as Queries15.vec_ivf_knn_join (k=5, nProbe=2) —
      // kept in lock-step with that entry's oracle
      val knn = Similarity.ivfKnnJoin(indexed, centroids, emb,
          "embedding", "vec_id", k = 5, nProbe = 2)
        .select(col("qid").as("nid"), col("id").as("cand"))
      val expanded = base.select(col("qid"), col("id").as("cand"))
        .unionByName(base.select(col("qid"), col("id").as("nid"))
          .join(knn, "nid").select(col("qid"), col("cand")))
        .distinct()
      val refined = expanded
        .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
        .join(emb.select(col("vec_id").as("cand"), col("embedding").as("cv")), "cand")
        .select(col("qid"), col("cand"),
          graft.functions.VectorFunctions.cosine(col("qv"), col("cv")).as("cos"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(desc_nulls_last("cos"), col("cand").asc)))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("cand").as("id"))
      val truth = Queries3.vec_topk_bruteforce.fn(s, dir)
        .select(col("qid"), col("id"))
      truth
        .join(base.withColumn("__b", lit(1)), Seq("qid", "id"), "left")
        .join(refined.withColumn("__r", lit(1)), Seq("qid", "id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__b").isNotNull, 1L).otherwise(0L)).as("base_found"),
          sum(when(col("__r").isNotNull, 1L).otherwise(0L)).as("refined_found"))
        .withColumn("base_bp", expr("10000L * base_found div n_true"))
        .withColumn("refined_bp", expr("10000L * refined_found div n_true"))
        .orderBy(col("qid"))
    },
    Some {
      val baseSql =
        s"""WITH c AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
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
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
        probes AS (
          SELECT qid, qv, cell FROM (
            SELECT q.qid, q.qv, cent2.cell,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${Queries3.cosineSql("qv", "cv")} DESC NULLS LAST,
                  cent2.cell ASC) AS rn
            FROM q, cent2) WHERE rn <= 1),
        scored AS (
          SELECT p.qid, a.id, ${Queries3.cosineSql("v", "qv")} AS cos
          FROM assigned a JOIN probes p ON a.cell = p.cell)
        SELECT qid, id
        FROM (SELECT qid, id, row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC NULLS LAST, id ASC) AS rank
              FROM scored)
        WHERE rank <= 10"""
      s"""WITH base AS ($baseSql),
        knn AS (SELECT qid AS nid, id AS cand
          FROM (${Queries15.vec_ivf_knn_join.oracle.get})),
        expanded AS (SELECT DISTINCT qid, cand FROM (
          SELECT qid, id AS cand FROM base
          UNION ALL
          SELECT b.qid, k.cand FROM base b JOIN knn k ON b.id = k.nid)),
        ev AS (SELECT vec_id, embedding FROM embeddings),
        rescored AS (SELECT e.qid, e.cand,
            ${Queries3.cosineSql("cv2", "qv2")} AS cos
          FROM (SELECT x.qid, x.cand, a.embedding AS qv2, b.embedding AS cv2
            FROM expanded x
            JOIN ev a ON x.qid = a.vec_id
            JOIN ev b ON x.cand = b.vec_id) e),
        refined AS (SELECT qid, cand AS id
          FROM (SELECT qid, cand, row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC NULLS LAST, cand ASC) AS rn FROM rescored)
          WHERE rn <= 10),
        truth AS (SELECT qid, id FROM (${Queries3.vec_topk_bruteforce.oracle.get}))
      SELECT t.qid, count(*) AS n_true,
        CAST(SUM(CASE WHEN b.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS base_found,
        CAST(SUM(CASE WHEN r.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS refined_found,
        10000 * CAST(SUM(CASE WHEN b.id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) // count(*) AS base_bp,
        10000 * CAST(SUM(CASE WHEN r.id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) // count(*) AS refined_bp
      FROM truth t
      LEFT JOIN base b ON t.qid = b.qid AND t.id = b.id
      LEFT JOIN refined r ON t.qid = r.qid AND t.id = r.id
      GROUP BY 1 ORDER BY 1"""
    })

  val all: Map[String, Q] = Map(
    "stream_window_topk" -> stream_window_topk,
    "lake_backfill_plan" -> lake_backfill_plan,
    "vec_ann_refine" -> vec_ann_refine,
  )
}
