package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Multimodal
import Queries.Q

/** Batch 23: perceptual image hashing (real codec), rolling active
  * users (DAU/WAU stickiness), and per-label embedding centroids —
  * the multimodal-dedup / growth-metric / semantic-drift trio.
  */
object Queries23 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Perceptual dHash over REAL decoded pixels: PNGs are encoded and
    * decoded with the actual JDK codec inside partition iterators
    * ([[Multimodal.imageDHash]]); the pixels are closed-form in
    * (id, x, y), so the oracle recomputes every hash bit
    * arithmetically — no codec on the DuckDB side, real codec work on
    * the Spark side. Hamming near-dup over these hashes rides the
    * existing simhash band machinery.
    */
  val mm_image_phash = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.imageDHash(Multimodal.encodeSyntheticPngs(ids))
    },
    Some("""WITH dims AS (
        SELECT doc_id AS media_id,
          CAST(4 + doc_id % 13 AS INTEGER) AS width,
          CAST(4 + (doc_id * 7) % 11 AS INTEGER) AS height
        FROM documents),
      bits AS (
        SELECT d.media_id, d.width, d.height,
          CASE WHEN (d.media_id * 31 + (x.x + 1) * 7 + y.y * 13) % 256
                  > (d.media_id * 31 + x.x * 7 + y.y * 13) % 256
            THEN CAST(1 AS BIGINT) << (y.y * 8 + x.x)
            ELSE CAST(0 AS BIGINT) END AS bit
        FROM dims d
        JOIN (SELECT unnest(range(0, 8)) AS x) x ON x.x < least(d.width, 9) - 1
        JOIN (SELECT unnest(range(0, 7)) AS y) y ON y.y < least(d.height, 7))
      SELECT media_id, width, height, CAST(sum(bit) AS BIGINT) AS dhash
      FROM bits GROUP BY 1, 2, 3"""))

  /** DAU / WAU / stickiness: daily distinct actives, trailing-7-day
    * distinct actives, and their milli ratio — the growth-accounting
    * dashboard triple. The (user, day) distinct is the only pass over
    * raw events; the trailing-window distinct joins that compact
    * activity table against the broadcast DAY SPINE (bounded by the
    * calendar, not the data), so the range join is a broadcast loop
    * over ~tens of rows, never a data-sized nested loop.
    */
  val w_dau_wau = Q(
    (s, dir) => {
      val ud = T_(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val days = ud.select(col("day")).distinct()
      val wau = broadcast(days.withColumnRenamed("day", "d")).as("d")
        .join(ud.as("a"),
          col("a.day") >= date_sub(col("d"), 6) && col("a.day") <= col("d"))
        .groupBy(col("d").as("day"))
        .agg(countDistinct(col("a.user_id")).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("1000L * dau div wau").as("stickiness_milli"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
        dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        days AS (SELECT DISTINCT day AS d FROM ud),
        wau AS (SELECT d AS day, count(DISTINCT user_id) AS wau
          FROM days JOIN ud ON ud.day >= d - 6 AND ud.day <= d
          GROUP BY 1)
      SELECT day, dau, wau, 1000 * dau // wau AS stickiness_milli
      FROM dau JOIN wau USING (day)"""))

  /** Per-label embedding centroid: component means over the FLOAT[64]
    * vectors in exact decimal (posexplode → map-side-combined decimal
    * sums per (label, dim) — no float summation order anywhere). The
    * semantic-drift / class-prototype building block; the IVF k-means
    * kernel uses the same shape internally, here surfaced as a
    * catalog query with an oracle.
    */
  val vec_label_centroid = Q(
    (s, dir) => T_(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast("double").cast("decimal(27,8)")).cast("double")
        / count(lit(1))).as("mean")),
    Some("""WITH x AS (SELECT label, CAST(i.i AS INTEGER) AS pos, embedding[i.i + 1] AS v
          FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
          WHERE i.i < len(embedding))
      SELECT label, pos,
        CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,8))) AS DOUBLE)
          / count(*) AS mean
      FROM x GROUP BY 1, 2"""))

  val all: Map[String, Q] = Map(
    "mm_image_phash" -> mm_image_phash,
    "w_dau_wau" -> w_dau_wau,
    "vec_label_centroid" -> vec_label_centroid,
  )
}
