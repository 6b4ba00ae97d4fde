package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{GraphOps, Multimodal, Similarity}
import graft.functions.{VectorFunctions => V}
import Queries.Q

/** Batch 44 (round 7): Luby maximal independent set, PQ
  * asymmetric-distance search (completing the vec_pq_codes story),
  * and video scene-cut detection.
  */
object Queries44 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Luby maximal independent set (deterministic priorities)
  // ===========================================================

  private val misRounds = 6

  private def detHash2Sql(k: String) =
    graft.operators.Sampling.detHash2Sql(k)

  private def misRoundSql(r: Int): String = {
    val p = r - 1
    s"""losers$r AS MATERIALIZED (SELECT DISTINCT a.v FROM adj$p e
          JOIN act$p a ON e.v = a.v
          JOIN act$p b ON e.n = b.v
          WHERE b.h < a.h OR (b.h = a.h AND b.v < a.v)),
        win$r AS MATERIALIZED (SELECT v FROM act$p EXCEPT SELECT v FROM losers$r),
        rm$r AS MATERIALIZED (SELECT v FROM win$r
          UNION SELECT e.v FROM adj$p e JOIN win$r w ON e.n = w.v),
        act$r AS MATERIALIZED (SELECT a.v, a.h FROM act$p a
          WHERE a.v NOT IN (SELECT v FROM rm$r)),
        adj$r AS MATERIALIZED (SELECT e.v, e.n FROM adj$p e
          JOIN act$r x ON e.v = x.v JOIN act$r y ON e.n = y.v)"""
  }

  /** MAXIMAL INDEPENDENT SET over the strong co-purchase graph
    * ([[GraphOps.maximalIndependentSet]]): Luby's algorithm with the
    * engine's deterministic hash as the priority coin — the parallel
    * scheduling primitive (non-conflicting work batches, conflict-
    * free colorings start here). 6 fixed rounds, per-round local-min
    * selection; leftovers (none on this graph) would surface as
    * sel_round = -1. Per-vertex output so the oracle pins the exact
    * set AND the round each vertex entered.
    */
  val g_mis = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
      val pairs = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.pk") < col("l2.pk"))
        .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
      GraphOps.maximalIndependentSet(pairs, rounds = misRounds)
        .orderBy(col("v"))
    },
    Some {
      val rounds = (1 to misRounds).map(misRoundSql).mkString(",\n        ")
      val wins = (1 to misRounds)
        .map(r => s"SELECT v, CAST($r AS INTEGER) AS sel_round FROM win$r")
        .mkString("\n          UNION ALL ")
      s"""WITH li AS (SELECT l_orderkey, l_partkey AS pk FROM lineitem
            WHERE l_quantity >= 25),
        canon AS MATERIALIZED (SELECT DISTINCT a.pk AS va, b.pk AS vb
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.pk < b.pk),
        adj0 AS MATERIALIZED (SELECT va AS v, vb AS n FROM canon
          UNION ALL SELECT vb, va FROM canon),
        act0 AS MATERIALIZED (SELECT v, ${detHash2Sql("v")} AS h
          FROM (SELECT DISTINCT v FROM adj0)),
        $rounds
      SELECT v, sel_round FROM (
          $wins
          UNION ALL SELECT v, CAST(-1 AS INTEGER) FROM act$misRounds)
      ORDER BY v"""
    })

  // ===========================================================
  // PQ asymmetric-distance search (ADC)
  // ===========================================================

  private val pqSubspaces = 4
  private val pqSubDim = 16
  private val pqCells = 4

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) FOR i IN range(1, len($a) + 1)]),
        (x, y) -> x + y)"""

  /** PQ ASYMMETRIC-DISTANCE top-k — the search half of the
    * `vec_pq_codes` story: per subspace, a 3-query × 4-centroid
    * inner-product DISTANCE TABLE (the classic ADC trick: the query
    * stays full-precision, the corpus is its 1-byte-per-subspace
    * codes), then every corpus vector's approximate score is the sum
    * of 4 table lookups — joined on the (subspace, cell) code, never
    * touching the corpus floats. Partial scores are decimal-cast so
    * the 4-term sum is exact and the ranking engine-identical.
    *
    * Scale: the distance tables are (queries × cells × subspaces)
    * rows — broadcast; the corpus-side work is a code-table join +
    * keyed sum, 1/16th the float traffic of exact scoring. The same
    * plan at 10⁹ vectors is codes-scan + broadcast lookup.
    */
  val vec_pq_adc_topk = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val parts = (0 until pqSubspaces).map { b =>
        val sub = emb.select(col("vec_id"),
          slice(col("embedding"), b * pqSubDim + 1, pqSubDim).as("sub"))
        val (indexed, cents) = Similarity.ivfKMeans(sub, "sub", "vec_id",
          nCells = pqCells, iters = 1)
        val q = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"),
            slice(col("embedding"), b * pqSubDim + 1, pqSubDim).as("qsub"))
        val dt = q.crossJoin(broadcast(cents))
          .select(col("qid"), col("cell"),
            V.dot(col("qsub"), col("cv")).cast("decimal(27,12)").as("pd"))
        indexed.select(col("id").as("vec_id"), col("cell"))
          .join(broadcast(dt), "cell")
          .select(col("qid"), col("vec_id"), col("pd"))
      }
      parts.reduce(_ unionByName _)
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("pd")).as("s_dec"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("s_dec").desc, col("vec_id").asc)))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("vec_id"),
          col("s_dec").cast("double").as("score"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    },
    Some {
      def subspaceSql(b: Int) = {
        val lo = b * pqSubDim + 1
        val hi = (b + 1) * pqSubDim
        s"""(WITH c AS (SELECT vec_id AS id, embedding[$lo:$hi] AS v
              FROM embeddings),
          cent0 AS (SELECT id AS cell,
              [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
            FROM c
            QUALIFY row_number() OVER (ORDER BY
              (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
              id ASC) <= $pqCells),
          ${Queries3.lloydRoundSql(1, "cent0")},
          assigned AS (SELECT id, cell FROM (
            SELECT c.id, cent1.cell,
              row_number() OVER (PARTITION BY c.id
                ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST,
                  cent1.cell ASC) AS rn
            FROM c, cent1) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding[$lo:$hi] AS qv FROM embeddings
            WHERE vec_id < 3),
          dt AS (SELECT qid, cent1.cell,
              CAST(${dotSql("cv", "qv")} AS DECIMAL(27,12)) AS pd
            FROM cent1, q)
          SELECT dt.qid, a.id AS vec_id, dt.pd
          FROM assigned a JOIN dt ON a.cell = dt.cell)"""
      }
      val union = (0 until pqSubspaces).map(subspaceSql)
        .mkString("\n          UNION ALL ")
      s"""SELECT qid, vec_id, score, rank FROM (
        SELECT qid, vec_id, CAST(s_dec AS DOUBLE) AS score,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY s_dec DESC, vec_id ASC) AS INTEGER) AS rank
        FROM (SELECT qid, vec_id, SUM(pd) AS s_dec FROM (
          $union
        ) GROUP BY 1, 2))
      WHERE rank <= 10 ORDER BY qid, rank"""
    })

  // ===========================================================
  // Video scene-cut detection
  // ===========================================================

  private val cutThreshold = 60.0

  /** SCENE-CUT DETECTION over the synthetic video corpus: decode
    * each video's frames (real per-partition byte codec on the Spark
    * side, pixel-formula replay in the oracle — the established mm
    * contract), lag the per-frame mean colors along the frame index,
    * and flag a cut wherever the L1 color delta exceeds the
    * threshold. Per video: frame count, cut count, and the first cut
    * frame — the shot-boundary table a video-curation pipeline keys
    * clip extraction on.
    */
  val mm_scene_cuts = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      val frames = Multimodal.decodeVideoFrames(
        Multimodal.encodeSyntheticVideos(ids))
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("dr", col("r_mean") - lag(col("r_mean"), 1).over(w))
        .withColumn("dg", col("g_mean") - lag(col("g_mean"), 1).over(w))
        .withColumn("db", col("b_mean") - lag(col("b_mean"), 1).over(w))
        .withColumn("cut",
          col("dr").isNotNull &&
            (abs(col("dr")) + abs(col("dg")) + abs(col("db")) > cutThreshold))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("cut"), col("frame_idx"))).as("first_cut"))
        .orderBy(col("media_id"))
    },
    Some(s"""WITH fr AS (
        SELECT doc_id AS media_id, CAST(f.f AS INTEGER) AS frame_idx,
          doc_id * 100 + f.f AS q
        FROM documents
        JOIN (SELECT unnest(range(0, 6)) AS f) f ON f.f < 2 + doc_id % 4),
      dims AS (
        SELECT media_id, frame_idx, q,
          CAST(4 + q % 13 AS INTEGER) AS width,
          CAST(4 + (q * 7) % 11 AS INTEGER) AS height
        FROM fr),
      px AS (
        SELECT d.media_id, d.frame_idx, d.width, d.height,
          (d.q * 31 + x.x * 7 + y.y * 13) % 256 AS r,
          (d.q * 17 + x.x * 11 + y.y * 5) % 256 AS g,
          (d.q * 23 + x.x * 3 + y.y * 19) % 256 AS b
        FROM dims d
        JOIN (SELECT unnest(range(0, 16)) AS x) x ON x.x < d.width
        JOIN (SELECT unnest(range(0, 14)) AS y) y ON y.y < d.height),
      means AS (
        SELECT media_id, frame_idx,
          CAST(SUM(r) AS DOUBLE) / (width * height) AS r_mean,
          CAST(SUM(g) AS DOUBLE) / (width * height) AS g_mean,
          CAST(SUM(b) AS DOUBLE) / (width * height) AS b_mean
        FROM px GROUP BY media_id, frame_idx, width, height),
      lagged AS (
        SELECT media_id, frame_idx,
          r_mean - lag(r_mean, 1) OVER w AS dr,
          g_mean - lag(g_mean, 1) OVER w AS dg,
          b_mean - lag(b_mean, 1) OVER w AS db
        FROM means WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
      flags AS (
        SELECT media_id, frame_idx,
          dr IS NOT NULL AND abs(dr) + abs(dg) + abs(db) > $cutThreshold AS cut
        FROM lagged)
      SELECT media_id, count(*) AS n_frames,
        CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        min(CASE WHEN cut THEN frame_idx END) AS first_cut
      FROM flags GROUP BY 1 ORDER BY 1"""))

  val all: Map[String, Q] = Map(
    "g_mis" -> g_mis,
    "vec_pq_adc_topk" -> vec_pq_adc_topk,
    "mm_scene_cuts" -> mm_scene_cuts,
  )
}
