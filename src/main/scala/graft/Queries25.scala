package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Multimodal}
import Queries.Q

/** Batch 25: perceptual near-duplicate detection over image hashes
  * (the multimodal-dedup loop closed end to end) and the Herfindahl
  * concentration index.
  */
object Queries25 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Perceptual near-dup pairs over REAL decoded images: dHash
    * fingerprints ([[Multimodal.imageDHash]], actual JDK codec) fed
    * straight into the simhash band join — the same pigeonhole
    * banding, bucket equi-join, and exact hamming filter that dedups
    * text fingerprints dedups images. No new join machinery: modality
    * only changes the fingerprint function.
    */
  val mm_phash_neardup = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      val hashes = Multimodal.imageDHash(Multimodal.encodeSyntheticPngs(ids))
      Dedup.simhashNearDup(hashes, "media_id", "dhash", maxHamming = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH dims AS (
        SELECT doc_id AS media_id,
          CAST(4 + doc_id % 13 AS INTEGER) AS width,
          CAST(4 + (doc_id * 7) % 11 AS INTEGER) AS height
        FROM documents),
      bits AS (
        SELECT d.media_id,
          CASE WHEN (d.media_id * 31 + (x.x + 1) * 7 + y.y * 13) % 256
                  > (d.media_id * 31 + x.x * 7 + y.y * 13) % 256
            THEN CAST(1 AS BIGINT) << (y.y * 8 + x.x)
            ELSE CAST(0 AS BIGINT) END AS bit
        FROM dims d
        JOIN (SELECT unnest(range(0, 8)) AS x) x ON x.x < least(d.width, 9) - 1
        JOIN (SELECT unnest(range(0, 7)) AS y) y ON y.y < least(d.height, 7)),
      fp AS (SELECT media_id AS id, CAST(sum(bit) AS BIGINT) AS f
        FROM bits GROUP BY 1),
      bd AS (SELECT unnest(range(0, 3)) AS b),
      -- 3 pigeonhole bands over 64 bits: widths 21, 21, 22 (the last
      -- band absorbs the remainder, matching simhashBandStructs)
      banded AS (SELECT fp.id, fp.f AS fv, bd.b AS band,
          (fp.f >> CAST(bd.b * 21 AS INTEGER))
            & (CASE WHEN bd.b = 2 THEN 4194303 ELSE 2097151 END) AS bits
        FROM fp, bd),
      cand AS (SELECT x.id AS id_a, y.id AS id_b, x.fv AS f_a, y.fv AS f_b
        FROM banded x JOIN banded y USING (band, bits)
        WHERE x.id < y.id GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b, CAST(bit_count(xor(f_a, f_b)) AS INTEGER) AS hamming
      FROM cand WHERE bit_count(xor(f_a, f_b)) <= 2
      ORDER BY id_a, id_b"""))

  /** Herfindahl–Hirschman concentration of order volume across a
    * nation's customers, as the exact rational HHI = Σc_i² / (Σc_i)²
    * — two keyed aggregates (orders→customer counts, counts→nation
    * moments), no window, no float. The market-concentration twin of
    * `a_gini` at group granularity.
    */
  val a_hhi = Q(
    (s, dir) => {
      val counts = T_(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
        .join(T_(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      counts.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c") * col("c")).as("hhi_num"),
          (sum(col("c")) * sum(col("c"))).as("hhi_den"))
    },
    Some("""WITH pc AS (SELECT o_custkey, count(*) AS c FROM orders GROUP BY 1),
        j AS (SELECT c_nationkey, c FROM pc
          JOIN customer ON o_custkey = c_custkey)
      SELECT c_nationkey, count(*) AS n_cust,
        CAST(sum(c * c) AS BIGINT) AS hhi_num,
        CAST(sum(c) * sum(c) AS BIGINT) AS hhi_den
      FROM j GROUP BY 1"""))

  val all: Map[String, Q] = Map(
    "mm_phash_neardup" -> mm_phash_neardup,
    "a_hhi" -> a_hhi,
  )
}
