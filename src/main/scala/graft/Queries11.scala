package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{GlobalOrder, GraphOps, Sampling, Sketches}
import Queries.Q

/** Batch 11: graph motifs at scale (oriented triangle counting),
  * deterministic train/val/test splitting, seeded epoch shuffles, ORC
  * interchange, and scan-local text retrieval (keyword search +
  * integer TF-IDF ranking). Every query replays bit-for-bit in the
  * DuckDB oracle.
  */
object Queries11 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  private val hashSql = "(doc_id % 94906249) * 1103515245 % 2147483647"

  /** Triangle count on the part co-purchase graph (parts appearing in
    * the same order, heavier lines only): the clustering motif the
    * hierarchy graph (`g_edges` — a tree, zero triangles) cannot
    * exercise. The co-purchase pair join is per-order k², bounded here
    * by the quantity filter (production guard for hot orders:
    * `Sampling.capPerGroup` on the order key); the count itself uses
    * degree-ordered orientation — O(|E|^{3/2}) wedges regardless of
    * hubs (see [[GraphOps.triangleCount]]).
    */
  val g_triangles = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
      val pairs = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.pk") < col("l2.pk"))
        .select(col("l1.pk").as("src"), col("l2.pk").as("dst"))
      GraphOps.triangleCount(pairs)
    },
    Some("""WITH li AS (SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS pk
        FROM lineitem WHERE l_quantity >= 25),
      e AS (SELECT DISTINCT least(l1.pk, l2.pk) AS a, greatest(l1.pk, l2.pk) AS b
        FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
        WHERE l1.pk < l2.pk),
      deg AS (SELECT id, count(*) AS d FROM
        (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY id),
      o AS (SELECT
          CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN a ELSE b END AS src,
          CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN b ELSE a END AS dst
        FROM e JOIN deg da ON e.a = da.id JOIN deg db ON e.b = db.id),
      dd AS (SELECT o.src, o.dst, dg.d AS dr FROM o JOIN deg dg ON o.dst = dg.id),
      w AS (SELECT e1.dst AS v, e2.dst AS w2 FROM dd e1 JOIN dd e2
        ON e1.src = e2.src
        AND ((e1.dr < e2.dr) OR (e1.dr = e2.dr AND e1.dst < e2.dst)))
      SELECT (SELECT count(*) FROM e) AS n_edges,
        (SELECT count(*) FROM w) AS n_wedges,
        count(*) AS n_triangles
      FROM w JOIN o ON w.v = o.src AND w.w2 = o.dst"""))

  /** Deterministic train/val/test split (98/1/1 by id hash): the same
    * document lands in the same split on every engine, every run, any
    * partitioning — the property `randomSplit` cannot give (its
    * assignment follows partition layout). Uses the double-mixed
    * [[Sampling.detHash2]] so all 100 buckets populate even on small
    * contiguous id ranges (one round leaves lattice gaps). One
    * codegen'd projection + hash aggregate for the manifest; the split
    * filter itself is shuffle-free.
    */
  val samp_train_split = Q(
    (s, dir) => {
      val bucket = Sampling.detHash2(col("doc_id")) % 100L
      T_(s, dir, "documents")
        .groupBy(when(bucket < 98, "train").when(bucket === 98, "val")
          .otherwise("test").as("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    },
    Some(s"""WITH h AS (SELECT *,
        (($hashSql % 94906249) * 1103515245 % 2147483647) % 100 AS b
      FROM documents)
      SELECT CASE WHEN b < 98 THEN 'train'
             WHEN b = 98 THEN 'val' ELSE 'test' END AS split,
        count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM h GROUP BY 1"""))

  private val epochSeed = 7L

  /** Seeded epoch shuffle: every epoch reorders the corpus by a
    * DIFFERENT deterministic permutation — `detHash(id + epoch·prime)`
    * — and assigns contiguous positions with the distributed prefix-sum
    * indexer (no single-reducer window; see [[GlobalOrder]]). Same
    * loader contract as `o5_global_index`, with the order seeded per
    * epoch instead of content-derived.
    */
  val samp_epoch_shuffle = Q(
    (s, dir) => {
      val h = Sampling.detHash(col("doc_id") + lit(epochSeed * 1000003L))
      GlobalOrder.withGlobalIndex(
          T_(s, dir, "documents").select(col("doc_id"), h.as("h")),
          Seq(col("h").asc, col("doc_id").asc))
        .select(col("doc_id"), col("pos"))
    },
    Some(s"""SELECT doc_id, row_number() OVER (ORDER BY
        ((doc_id + ${epochSeed * 1000003L}) % 94906249) * 1103515245 % 2147483647 ASC,
        doc_id ASC) AS pos
      FROM documents"""))

  /** ORC interchange: the second columnar wire format beside parquet —
    * same explicit-schema discipline as `s13_csv_roundtrip` /
    * `s14_jsonl_roundtrip`, proving the engine's source matrix is not
    * parquet-shaped. The oracle computes from the original parquet,
    * which is the losslessness claim.
    */
  val s15_orc_roundtrip = Q(
    (s, dir) => {
      val base = stagingDir(dir, "events_orc")
      T_(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .write.mode("overwrite").orc(base)
      s.read
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
          "ts_us BIGINT, value DOUBLE")
        .orc(base)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
    },
    Some("""SELECT event_type, count(*) AS n,
        min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events GROUP BY 1"""),
    bench = false)

  private val searchTerms = Seq("spark", "merge", "window")

  /** Tokens of the normalized text, as a Spark Column / DuckDB SQL
    * pair built from the SAME split contract (single space after
    * whitespace collapse). */
  private def tokensCol = split(T.normText(col("text")), " ")
  private val tokensSql =
    """string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""

  /** Conjunctive keyword search: documents containing ALL query terms,
    * ranked by total term frequency. Scoring is entirely scan-local —
    * per-term tf via array HOFs inside codegen, no explode, no
    * inverted-index shuffle — and the ranking is a TakeOrdered top-k.
    * At 100 TB this is the "grep the corpus" diagnostic; the indexed
    * path for repeated queries is the df-pruned inverted index of
    * `dd_ngram_jaccard`.
    */
  val txt_keyword_search = Q(
    (s, dir) => {
      val tfs = searchTerms.map(t =>
        size(filter(tokensCol, x => x === lit(t))).cast("long").as(s"tf_$t"))
      val tfCols = searchTerms.map(t => col(s"tf_$t"))
      T_(s, dir, "documents")
        .select(col("doc_id") +: tfs: _*)
        .filter(tfCols.map(_ > 0L).reduce(_ && _))
        .withColumn("tf_total", tfCols.reduce(_ + _))
        .orderBy(col("tf_total").desc, col("doc_id").asc)
        .limit(50)
    },
    Some {
      val tfSqls = searchTerms.map(t =>
        s"CAST(len(list_filter($tokensSql, x -> x = '$t')) AS BIGINT) AS tf_$t")
      val allMatch = searchTerms.map(t => s"tf_$t > 0").mkString(" AND ")
      val total = searchTerms.map(t => s"tf_$t").mkString(" + ")
      s"""SELECT doc_id, ${searchTerms.map(t => s"tf_$t").mkString(", ")},
        $total AS tf_total
      FROM (SELECT doc_id, ${tfSqls.mkString(",\n        ")} FROM documents)
      WHERE $allMatch
      ORDER BY tf_total DESC, doc_id ASC LIMIT 50"""
    })

  /** TF-IDF ranking with EXACT integer weights: idf_milli(t) =
    * (N * 1000) div df(t) — the float-free flavor of tf·idf, so the
    * scores replay bit-for-bit in any engine (float log-idf would hash-
    * diverge on libm differences). Two passes over the tf projection:
    * one tiny aggregate for (N, df_t) — broadcast back as a single row
    * — and the scored top-k. df is computed only for the query terms,
    * never a full-vocabulary index.
    */
  val txt_tfidf_topk = Q(
    (s, dir) => {
      val tfs = searchTerms.map(t =>
        size(filter(tokensCol, x => x === lit(t))).cast("long").as(s"tf_$t"))
      val tf = T_(s, dir, "documents").select(col("doc_id") +: tfs: _*)
      val stats = tf.agg(
        count(lit(1)).as("n_docs"),
        searchTerms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
      val score = searchTerms.map(t =>
        col(s"tf_$t") * expr(s"n_docs * 1000 div df_$t")).reduce(_ + _)
      tf.crossJoin(broadcast(stats))
        .withColumn("score", score)
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
      val score = searchTerms.map(t =>
        s"tf_$t * (n_docs * 1000 // df_$t)").mkString(" + ")
      s"""WITH tf AS (SELECT doc_id, ${tfSqls.mkString(",\n        ")}
        FROM documents),
      st AS (SELECT count(*) AS n_docs, ${dfSqls.mkString(",\n        ")} FROM tf)
      SELECT doc_id, $score AS score FROM tf CROSS JOIN st
      WHERE $score > 0
      ORDER BY score DESC, doc_id ASC LIMIT 50"""
    })

  private val kmvK = 32

  /** The direct per-type KMV sketch as DuckDB SQL — shared by the
    * merge and streaming entries, whose correctness claim is exactly
    * "equals the direct sketch". */
  private def kmvDirectSql(k: Int) =
    s"""WITH d AS (SELECT DISTINCT event_type AS g,
        (user_id % 94906249) * 1103515245 % 2147483647 AS h FROM events),
      kk AS (SELECT g, h FROM d QUALIFY
        row_number() OVER (PARTITION BY g ORDER BY h ASC) <= $k)
      SELECT g AS event_type, count(*) AS k_n, max(h) AS kth_hash,
        CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
             ELSE CAST(${Sketches.kmvNumerator(k)} AS DOUBLE)
                  / CAST(max(h) AS DOUBLE) END AS est
      FROM kk GROUP BY g"""

  /** Sketch mergeability, proven against the DIRECT oracle: sketch the
    * two halves of the event feed independently (a day-21 split — the
    * per-day telemetry shape), merge the two k-row retention sets, and
    * the result must equal the sketch of the whole feed bit-for-bit —
    * `retain_k` is a semilattice merge. This is the property that lets
    * a 100 TB pipeline keep per-day sketches and answer "distinct over
    * any date range" by merging k-row summaries instead of re-reading
    * data.
    */
  val a_kmv_merge = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val cut = lit("2024-01-21").cast("timestamp")
      val sA = Sketches.retention(ev.filter(col("ts") < cut),
        col("event_type"), col("user_id"), kmvK)
      val sB = Sketches.retention(ev.filter(col("ts") >= cut),
        col("event_type"), col("user_id"), kmvK)
      Sketches.estimate(Sketches.mergeSketches(Seq(sA, sB), kmvK), kmvK)
        .select(col("g").as("event_type"), col("k_n"), col("kth_hash"), col("est"))
    },
    Some(kmvDirectSql(kmvK)))

  /** Streaming KMV: the same sketch maintained incrementally with
    * BOUNDED state (k hashes per group) where streaming COUNT(DISTINCT)
    * state grows with the key universe. Retention is order-insensitive,
    * so the final state equals the batch sketch regardless of
    * micro-batching — checked against the direct oracle.
    */
  val stream_kmv = Q(
    (s, dir) => graft.streaming.StreamingSketch.kmvOnce(
        s, s"$dir/events.parquet", "event_type", "user_id", kmvK)
      .select(col("g").as("event_type"), col("k_n"), col("kth_hash"), col("est")),
    Some(kmvDirectSql(kmvK)),
    bench = false)

  val all: Map[String, Q] = Map(
    "g_triangles" -> g_triangles,
    "samp_train_split" -> samp_train_split,
    "samp_epoch_shuffle" -> samp_epoch_shuffle,
    "s15_orc_roundtrip" -> s15_orc_roundtrip,
    "txt_keyword_search" -> txt_keyword_search,
    "txt_tfidf_topk" -> txt_tfidf_topk,
    "a_kmv_merge" -> a_kmv_merge,
    "stream_kmv" -> stream_kmv,
  )
}
