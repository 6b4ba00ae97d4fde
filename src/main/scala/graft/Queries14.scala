package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Multimodal, Upsert}
import Queries.Q

/** Batch 14: lake-granularity MERGE (partition-level upsert — the op a
  * daily 100 TB ingest actually runs), a REAL image codec behind the
  * multimodal decode contract (javax.imageio, lossless PNG round-trip),
  * an exercised JDBC source path (embedded Derby — the reference's
  * Postgres pool, main_graph_topraq.py:94-95, behind Spark's JDBC
  * relation with predicate pushdown), and the §3.2 day-metric pipeline
  * as one watermarked stream. Every entry replays in the DuckDB oracle.
  */
object Queries14 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  // ===========================================================
  // S16 — partition-level upsert (MERGE at lake granularity)
  // ===========================================================

  /** The day-metric table maintained by partition-level MERGE: a base
    * build (click/view only, through Jan 20) is upserted with a
    * re-statement of Jan 15+ that adds purchases. Only the touched
    * (date ≥ Jan 15) partitions are rewritten — dynamic partition
    * pruning keeps untouched days unread, dynamic partition overwrite
    * keeps them unwritten (see [[Upsert.overwritePartitions]]). The
    * upsert runs TWICE: the oracle match proves the second run is a
    * fixpoint (MERGE idempotence at lake granularity), and the spec
    * proves untouched partition files are byte-identical.
    */
  val s16_overwrite_partitions = Q(
    (s, dir) => {
      val target = stagingDir(dir, "day_metrics_lake")
      val fs = new org.apache.hadoop.fs.Path(target)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(target), true)
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
      Upsert.overwritePartitions(base, Seq("user_id", "date"), "date", target)
      Upsert.overwritePartitions(incoming, Seq("user_id", "date"), "date", target)
      Upsert.overwritePartitions(incoming, Seq("user_id", "date"), "date", target)
      s.read.parquet(target)
        .select(col("user_id"), col("date"), col("n"), col("total"))
    },
    Some("""WITH base AS (
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
        GROUP BY 1, 2)
      SELECT user_id, date, n, total FROM base WHERE date < DATE '2024-01-15'
      UNION ALL SELECT user_id, date, n, total FROM inc"""),
    bench = false)

  // ===========================================================
  // DD — capped band join (the boilerplate guard), oracle-replayed
  // ===========================================================

  /** MinHash LSH with the band-bucket cap: buckets above `maxBucket=8`
    * star-collapse around their min id (Dedup.bandPairs) — the
    * production guard against percent-frequency boilerplate, where an
    * uncapped bucket emits quadratic pairs (17.4x measured on the skew
    * soak, BASELINE.md). The oracle replays the FULL capped semantics
    * in SQL: bucket sizes, clique pairs for small buckets, hub-star
    * pairs for over-cap ones, distinct-union, then the signature
    * re-join. At sf0.01 the corpus has buckets up to size 19, so both
    * paths execute.
    */
  val dd_minhash_capped = Q(
    (s, dir) => graft.operators.Dedup.minhashLsh(
      T_(s, dir, "documents"), "text", "doc_id",
      shingleLen = 5, bands = 8, rowsPerBand = 4, replayable = true,
      maxBucket = Some(8))
      .orderBy(col("id_a"), col("id_b")),
    Some {
      val (mults, adds) = graft.operators.Dedup.minhashCoeffs(32, replayable = true)
      val ml = mults.mkString("[", ", ", "]")
      val al = adds.mkString("[", ", ", "]")
      s"""WITH co AS (SELECT $ml::BIGINT[] AS M, $al::BIGINT[] AS A),
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
      sz AS (SELECT band, bucket, count(*) AS n, min(id) AS hub
        FROM banded GROUP BY 1, 2),
      pairs AS (
        SELECT x.id AS id_a, y.id AS id_b
        FROM banded x JOIN banded y USING (band, bucket)
             JOIN sz USING (band, bucket)
        WHERE sz.n <= 8 AND x.id < y.id
        UNION
        SELECT sz.hub AS id_a, b.id AS id_b
        FROM banded b JOIN sz USING (band, bucket)
        WHERE sz.n > 8 AND b.id <> sz.hub)
      SELECT p.id_a, p.id_b,
        CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32.0 AS est_jaccard
      FROM pairs p
      JOIN sigs sa ON sa.id = p.id_a
      JOIN sigs sb ON sb.id = p.id_b
      ORDER BY id_a, id_b"""
    })

  // ===========================================================
  // MM — real image codec behind the multimodal contract
  // ===========================================================

  /** Image decode with the JDK's REAL PNG codec: one deterministic
    * synthetic image per document, ImageIO-encoded to PNG bytes, then
    * decoded back and reduced to per-channel pixel statistics
    * ([[Multimodal.decodeImageFeatures]]). PNG is lossless and the
    * pixels are closed-form in (id, x, y), so the oracle recomputes
    * the expected statistics arithmetically — no codec on the DuckDB
    * side, real codec work on the Spark side.
    */
  val mm_decode_image = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.decodeImageFeatures(Multimodal.encodeSyntheticPngs(ids))
    },
    Some("""WITH dims AS (
        SELECT doc_id AS media_id,
          CAST(4 + doc_id % 13 AS INTEGER) AS width,
          CAST(4 + (doc_id * 7) % 11 AS INTEGER) AS height
        FROM documents),
      px AS (
        SELECT d.media_id, d.width, d.height,
          (d.media_id * 31 + x.x * 7 + y.y * 13) % 256 AS r,
          (d.media_id * 17 + x.x * 11 + y.y * 5) % 256 AS g,
          (d.media_id * 23 + x.x * 3 + y.y * 19) % 256 AS b
        FROM dims d
        JOIN (SELECT unnest(range(0, 16)) AS x) x ON x.x < d.width
        JOIN (SELECT unnest(range(0, 14)) AS y) y ON y.y < d.height)
      SELECT media_id, width, height,
        CAST(SUM(r) AS DOUBLE) / (width * height) AS r_mean,
        CAST(SUM(g) AS DOUBLE) / (width * height) AS g_mean,
        CAST(SUM(b) AS DOUBLE) / (width * height) AS b_mean
      FROM px GROUP BY 1, 2, 3"""))

  /** Incremental LSH dedup — the daily-ingest shape: documents with
    * doc_id < 250 are the standing corpus (only their SIGNATURE store
    * is read — built once here via [[graft.operators.Dedup
    * .minhashSignatures]], in production loaded from parquet), the
    * rest are today's delta. Emits exactly the full-corpus LSH pairs
    * that touch the delta (delta-delta + delta-base); the oracle
    * replays the full banded join and filters to the same set.
    * The delta side of the band join is delta rows only, so candidate
    * work is O(delta), not O(corpus).
    */
  val dd_minhash_delta = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
      val base = graft.operators.Dedup.minhashSignatures(
        docs.filter(col("doc_id") < 250), "text", "doc_id",
        replayable = true)
      graft.operators.Dedup.minhashLshDelta(
        base, docs.filter(col("doc_id") >= 250), "text", "doc_id",
        replayable = true)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val (mults, adds) = graft.operators.Dedup.minhashCoeffs(32, replayable = true)
      val ml = mults.mkString("[", ", ", "]")
      val al = adds.mkString("[", ", ", "]")
      s"""WITH co AS (SELECT $ml::BIGINT[] AS M, $al::BIGINT[] AS A),
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
        GROUP BY 1, 2)
      SELECT p.id_a, p.id_b,
        CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32.0 AS est_jaccard
      FROM pairs p
      JOIN sigs sa ON sa.id = p.id_a
      JOIN sigs sb ON sb.id = p.id_b
      ORDER BY id_a, id_b"""
    })

  /** Incremental SimHash near-dup — the fingerprint-store sibling of
    * [[dd_minhash_delta]]: the standing corpus (doc_id < 250)
    * contributes only its 8-byte fingerprints, the delta is hashed
    * fresh, and the pigeonhole band join's one side is delta rows
    * only. Emits exactly the full-corpus near-dup pairs touching the
    * delta; the oracle replays the full band join with the same
    * touching-delta filter.
    */
  val dd_simhash_delta = Q(
    (s, dir) => {
      def fps(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Dedup.simhashBulk(
          df.select(col("doc_id"),
            split(graft.functions.TextFunctions.normText(col("text")), " ").as("toks"))
            .select(col("doc_id"),
              graft.functions.TextFunctions.wordShinglesFrom(col("toks"), 2).as("sh")),
          "doc_id", "sh", replayable = true)
      val docs = T_(s, dir, "documents")
      graft.operators.Dedup.simhashNearDupDelta(
        fps(docs.filter(col("doc_id") < 250)),
        fps(docs.filter(col("doc_id") >= 250)),
        "doc_id", "simhash", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(Queries3.simhashFpSql + """,
      bd AS (SELECT unnest(range(0, 4)) AS b),
      banded AS (SELECT f.doc_id AS id, f.simhash AS fv, bd.b AS band,
          (f.simhash >> (bd.b * 16)) & 65535 AS bits
        FROM fp f, bd),
      cand AS (SELECT x.id AS id_a, y.id AS id_b, x.fv AS f_a, y.fv AS f_b
        FROM banded x JOIN banded y USING (band, bits)
        WHERE x.id < y.id AND (x.id >= 250 OR y.id >= 250)
        GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b, CAST(bit_count(xor(f_a, f_b)) AS INTEGER) AS hamming
      FROM cand WHERE bit_count(xor(f_a, f_b)) <= 3
      ORDER BY id_a, id_b"""))

  /** Audio decode with the JDK's REAL WAV codec: one deterministic
    * 16-bit PCM clip per document, javax.sound-encoded to WAV bytes,
    * then decoded back and reduced to sample statistics
    * ([[Multimodal.decodeAudioFeatures]]). PCM is lossless and every
    * sample is closed-form in (id, i), so the oracle recomputes the
    * statistics arithmetically — integer sums over exact sample
    * values, bit-identical divisions.
    */
  val mm_decode_audio = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.decodeAudioFeatures(Multimodal.encodeSyntheticWavs(ids))
    },
    Some("""WITH clips AS (
        SELECT doc_id AS media_id,
          CAST(400 + doc_id % 600 AS INTEGER) AS n_samples,
          CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate
        FROM documents),
      sm AS (
        SELECT c.media_id, c.sample_rate, c.n_samples,
          (c.media_id * 31 + i.i * 17) % 2001 - 1000 AS s
        FROM clips c
        JOIN (SELECT unnest(range(0, 1000)) AS i) i ON i.i < c.n_samples)
      SELECT media_id, sample_rate, CAST(1 AS INTEGER) AS n_channels,
        n_samples,
        CAST(SUM(s) AS DOUBLE) / n_samples AS mean_amp,
        CAST(SUM(s * s) AS DOUBLE) / n_samples AS mean_square
      FROM sm GROUP BY 1, 2, 3, 4"""))

  /** Video decode: length-prefixed frame container parsed for real,
    * every frame decoded with the JDK's real PNG codec, one media row
    * fanning out to per-frame feature rows
    * ([[Multimodal.decodeVideoFrames]]). Frame f of video v is the
    * synthetic PNG of id v*100+f, so every frame statistic is
    * closed-form and the oracle replays the whole fan-out
    * arithmetically.
    */
  val mm_decode_video = Q(
    (s, dir) => {
      val ids = T_(s, dir, "documents").select(col("doc_id").as("media_id"))
      Multimodal.decodeVideoFrames(Multimodal.encodeSyntheticVideos(ids))
    },
    Some("""WITH fr AS (
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
        JOIN (SELECT unnest(range(0, 14)) AS y) y ON y.y < d.height)
      SELECT media_id, frame_idx, width, height,
        CAST(SUM(r) AS DOUBLE) / (width * height) AS r_mean,
        CAST(SUM(g) AS DOUBLE) / (width * height) AS g_mean,
        CAST(SUM(b) AS DOUBLE) / (width * height) AS b_mean
      FROM px GROUP BY 1, 2, 3, 4"""))

  // ===========================================================
  // S1 — JDBC source path (embedded Derby), pushdown-verified
  // ===========================================================

  /** The reference's relational source (a pooled Postgres read,
    * main_graph_topraq.py:94-95; filtered fetchers at
    * graph_irrigation_event.py:55-65) exercised for real: the nation
    * dim is written INTO an embedded Derby database over JDBC, read
    * back through `spark.read.format("jdbc")`, and filtered — the
    * predicate reaches the database as SQL (PushedFilters on the
    * JDBCRelation scan; PlanSpec pins it). Derby ships with Spark, so
    * the path is the same DataFrameReader code a Postgres cluster
    * read uses, minus only the network. bench=false: it measures an
    * embedded database, not the engine.
    */
  val jdbc_pushdown_roundtrip = Q(
    (s, dir) => {
      System.setProperty("derby.system.home", "/tmp")
      val url = s"jdbc:derby:${stagingDir(dir, "derbydb")};create=true"
      T_(s, dir, "nation").write.mode("overwrite").format("jdbc")
        .option("url", url).option("dbtable", "NATION")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .save()
      s.read.format("jdbc")
        .option("url", url).option("dbtable", "NATION")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .filter(col("n_regionkey") >= 2)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    },
    Some("""SELECT n_nationkey, n_name, n_regionkey
      FROM nation WHERE n_regionkey >= 2"""),
    bench = false)

  // ===========================================================
  // Streaming — the §3.2 day-metric pipeline end to end
  // ===========================================================

  /** The composed day-metric pipeline as ONE watermarked stream
    * (hourly telemetry → tumbling daily window → pivot → streaming
    * MERGE), equal to the batch `pipeline_day_metrics` oracle on the
    * bounded harness stream. Late data beyond the 1-day watermark is
    * dropped where the batch recompute keeps it — StreamingSpec pins
    * that trade on a two-batch replay.
    */
  val stream_day_metrics = Q(
    (s, dir) => graft.streaming.StreamingDayMetrics
      .dayMetricsOnce(s, s"$dir/events.parquet"),
    Some("""SELECT user_id, CAST(ts AS DATE) AS date,
       count(*) FILTER (event_type = 'click') AS click_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'click') AS DOUBLE) AS click_total,
       count(*) FILTER (event_type = 'view') AS view_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'view') AS DOUBLE) AS view_total,
       count(*) FILTER (event_type = 'purchase') AS purchase_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase_total
      FROM events
      WHERE event_type IN ('click','view','purchase')
      GROUP BY user_id, CAST(ts AS DATE)"""),
    bench = false)

  private val pprIters = 6

  /** Personalized PageRank seeded at the first 100 order vertices of
    * the hierarchy graph (orders → customers → nations → regions):
    * mass restarts at the seed orders and flows down the hierarchy —
    * "importance relative to THESE nodes", the graph-retrieval /
    * recommendation primitive. 6 iterations (the hierarchy is 3 hops
    * deep; 6 is the convergence margin at 1e-9 quantization), oracle-
    * replayed exactly like g_pagerank's unrolled chain with the seed
    * indicator as r0 and the per-vertex reset weight.
    */
  val g_ppr = Q(
    (s, dir) => {
      val o = Tables.read(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"), (col("o_custkey") + 10000L).as("dst"))
      val c = Tables.read(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"), (col("c_nationkey").cast("long") + 100L).as("dst"))
      val n = Tables.read(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"), col("n_regionkey").cast("long").as("dst"))
      val edges = o.unionByName(c).unionByName(n)
      val seeds = Tables.read(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select((col("o_orderkey") + 10000000L).as("id"))
      graft.operators.GraphOps.personalizedPageRank(edges, seeds, pprIters)
    },
    Some {
      val iters = (1 to pprIters).map { t =>
        val prev = s"r${t - 1}"
        s"""r$t AS (SELECT v.id,
             v.reset_w + CAST(0.85 AS DOUBLE) * coalesce(s.inflow, CAST(0.0 AS DOUBLE)) AS rank
           FROM verts v LEFT JOIN (
             SELECT ew.dst AS id,
               CAST(CAST(round(SUM(CAST(r.rank * ew.w AS DECIMAL(27,15))) * 1000000000, 0) AS BIGINT) AS DOUBLE)
                 / CAST(1000000000.0 AS DOUBLE) AS inflow
             FROM ew JOIN $prev r ON r.id = ew.src GROUP BY ew.dst) s
           ON v.id = s.id)"""
      }.mkString(",\n      ")
      s"""WITH edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation),
      verts AS (SELECT id,
          CASE WHEN id >= 10000000 AND id < 10000100
               THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS reset_w
        FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges)),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      ew AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / outdeg AS w
             FROM edges e JOIN deg USING (src)),
      r0 AS (SELECT id,
          CASE WHEN reset_w > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank
        FROM verts),
      $iters
      SELECT id, rank FROM r$pprIters"""
    })

  /** CUBE + GROUPING SETS over event telemetry — the remaining two
    * members of the multi-level aggregation family (`a_rollup_totals`
    * covers ROLLUP). One expand-based aggregate each (Catalyst plans
    * grouping sets as a single Expand + HashAggregate: one scan, one
    * shuffle — NOT one pass per level), decimal-exact sums,
    * grouping_id disambiguates natural nulls from subtotal rows.
    */
  val a_cube_totals = Q(
    (s, dir) => T_(s, dir, "events")
      .cube(col("event_type"), to_date(col("ts")).as("date"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,8)")).cast("double").as("total")),
    Some("""SELECT event_type, CAST(ts AS DATE) AS date,
        CAST(GROUPING(event_type, CAST(ts AS DATE)) AS INTEGER) AS lvl,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events
      GROUP BY CUBE(event_type, CAST(ts AS DATE))"""))

  val a_grouping_sets = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("date"),
          col("user_id"), col("value"))
      ev.groupingSets(
          Seq(Seq(col("event_type"), col("date")), Seq(col("user_id")), Seq()),
          col("event_type"), col("date"), col("user_id"))
        .agg(grouping_id().cast("int").as("lvl"),
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
    },
    Some("""SELECT event_type, CAST(ts AS DATE) AS date, user_id,
        CAST(GROUPING(event_type, CAST(ts AS DATE), user_id) AS INTEGER) AS lvl,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events
      GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (user_id), ())"""))

  /** Pearson correlation per group from EXACT integer/decimal moments:
    * n, Σx, Σy, Σxy, Σx², Σy² are decimal-exact aggregates, and the
    * correlation is assembled from them with the SAME double
    * expression tree on both engines — so the result is
    * bit-reproducible where built-in `corr()`s (different running
    * formulas, different float orders) are not. x = event value,
    * y = seconds into the day (does engagement drift with time?).
    */
  val a_corr_moments = Q(
    (s, dir) => {
      val x = col("value").cast("decimal(27,8)")
      val y = (unix_seconds(col("ts")) % 86400L).cast("decimal(27,8)")
      // decimal sums are exact; the decimal->double hop goes through a
      // milli-quantized BIGINT (same discipline as GraphOps.pageRank)
      // because engines differ by an ulp on direct wide-decimal casts
      def q3(c: org.apache.spark.sql.Column) =
        round(c * 1000L).cast("long").cast("double") / 1000.0
      T_(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          q3(sum(x)).as("sx"),
          q3(sum(y)).as("sy"),
          q3(sum((x * y).cast("decimal(38,16)"))).as("sxy"),
          q3(sum((x * x).cast("decimal(38,16)"))).as("sxx"),
          q3(sum((y * y).cast("decimal(38,16)"))).as("syy"))
        .select(col("event_type"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_xt"))
    },
    Some("""WITH m AS (
        SELECT event_type, count(*) AS n,
          CAST(CAST(round(SUM(CAST(value AS DECIMAL(27,8))) * 1000, 0) AS BIGINT) AS DOUBLE) / 1000.0 AS sx,
          CAST(CAST(round(SUM(CAST((epoch_us(ts) // 1000000) % 86400 AS DECIMAL(27,8))) * 1000, 0) AS BIGINT) AS DOUBLE) / 1000.0 AS sy,
          CAST(CAST(round(SUM(CAST(CAST(value AS DECIMAL(27,8)) * CAST((epoch_us(ts) // 1000000) % 86400 AS DECIMAL(27,8)) AS DECIMAL(38,16))) * 1000, 0) AS BIGINT) AS DOUBLE) / 1000.0 AS sxy,
          CAST(CAST(round(SUM(CAST(CAST(value AS DECIMAL(27,8)) * CAST(value AS DECIMAL(27,8)) AS DECIMAL(38,16))) * 1000, 0) AS BIGINT) AS DOUBLE) / 1000.0 AS sxx,
          CAST(CAST(round(SUM(CAST(CAST((epoch_us(ts) // 1000000) % 86400 AS DECIMAL(27,8)) * CAST((epoch_us(ts) // 1000000) % 86400 AS DECIMAL(27,8)) AS DECIMAL(38,16))) * 1000, 0) AS BIGINT) AS DOUBLE) / 1000.0 AS syy
        FROM events GROUP BY 1)
      SELECT event_type, n,
        (n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xt
      FROM m"""))

  /** Median absolute deviation per group — the robust dispersion
    * statistic quality gates prefer over stddev (one outlier moves a
    * stddev; the MAD ignores it). Composed from the exact percentile
    * machinery (operators.Percentiles — frequency compression, never
    * a full-group sort): group median, then the median of absolute
    * deviations from it, exact integers end to end on this column.
    */
  val a_mad = Q(
    (s, dir) => {
      import graft.operators.Percentiles
      val li = T_(s, dir, "lineitem")
      val med = Percentiles.quantilesDisc(li, col("l_returnflag"),
          col("l_quantity"), Seq(5000))
        .select(col("g"), col("value").as("med"))
      val dev = li.join(broadcast(med), li("l_returnflag") === med("g"))
        .select(col("l_returnflag"),
          abs(col("l_quantity") - col("med")).as("d"))
      Percentiles.quantilesDisc(dev, col("l_returnflag"), col("d"), Seq(5000))
        .select(col("g").as("l_returnflag"), col("value").as("mad"))
        .join(broadcast(med.select(col("g").as("l_returnflag"), col("med"))),
          "l_returnflag")
        .select(col("l_returnflag"), col("med"), col("mad"))
    },
    Some("""WITH f AS (SELECT l_returnflag AS g, l_quantity AS v, count(*) AS c
        FROM lineitem GROUP BY 1, 2),
      cum AS (SELECT g, v,
          sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
          sum(c) OVER (PARTITION BY g) AS tot FROM f),
      med AS (SELECT g, min(v) AS med FROM cum
        WHERE cum >= (5000 * tot + 9999) // 10000 GROUP BY g),
      dev AS (SELECT l.l_returnflag AS g, abs(l.l_quantity - m.med) AS v
        FROM lineitem l JOIN med m ON l.l_returnflag = m.g),
      f2 AS (SELECT g, v, count(*) AS c FROM dev GROUP BY 1, 2),
      cum2 AS (SELECT g, v,
          sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
          sum(c) OVER (PARTITION BY g) AS tot FROM f2),
      mad AS (SELECT g, min(v) AS mad FROM cum2
        WHERE cum >= (5000 * tot + 9999) // 10000 GROUP BY g)
      SELECT m.g AS l_returnflag, m.med, d.mad
      FROM med m JOIN mad d USING (g)"""))

  /** Fuzzy matching by edit distance — the data-cleaning join shape
    * (typo'd names against the reference list). Deterministic typo'd
    * copies of the nation names join back against the clean dimension
    * on levenshtein <= 2; both engines share the unit-cost edit
    * distance, so the match set and distances are exact. Both sides
    * broadcast-size here; at scale the standard guard is a blocking
    * key (first char / soundex / length band) before the distance.
    */
  val f_fuzzy_match = Q(
    (s, dir) => {
      val clean = T_(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val dirty = clean.select(col("n_nationkey").as("d_key"),
        concat(substring(col("n_name"), 1, 2), lit("X"),
          substring(col("n_name"), 4, 1000)).as("d_name"))
      dirty.join(broadcast(clean),
          levenshtein(col("d_name"), col("n_name")) <= 2)
        .select(col("d_key"), col("d_name"), col("n_nationkey"),
          col("n_name"),
          levenshtein(col("d_name"), col("n_name")).cast("int").as("dist"))
    },
    Some("""WITH dirty AS (SELECT n_nationkey AS d_key,
          substr(n_name, 1, 2) || 'X' || substr(n_name, 4) AS d_name
        FROM nation)
      SELECT d.d_key, d.d_name, n.n_nationkey, n.n_name,
        CAST(levenshtein(d.d_name, n.n_name) AS INTEGER) AS dist
      FROM dirty d JOIN nation n ON levenshtein(d.d_name, n.n_name) <= 2"""))

  /** Trailing 7-day rolling aggregate per user — a RANGE window frame
    * keyed by event TIME, not row count (row frames mis-window
    * irregular telemetry): every event sees the sum/count of its
    * user's events in the preceding week, inclusive. One shuffle on
    * user_id; decimal-exact sums for cross-engine parity.
    *
    * The frame is ordered by unix_micros(ts) — NOT ts cast to whole
    * seconds — so both engines window on identical microsecond values:
    * a seconds-truncated ordering makes same-truncated-second events
    * frame peers (even a later one) and flips inclusion at the 7-day
    * boundary for sub-second differences, diverging from the oracle's
    * microsecond INTERVAL arithmetic on real data.
    */
  val w_rolling_7d = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-7L * 86400 * 1000000L, 0)
      T_(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("value").cast("decimal(27,8)")).over(w)
            .cast("double").as("sum_7d"))
    },
    Some("""SELECT event_id, user_id, ts,
        count(*) OVER w AS n_7d,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) OVER w AS DOUBLE) AS sum_7d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"""))

  /** Column-profile sweep over lineitem (operators.Profile): row /
    * non-null / exact-distinct counts and stringified value range per
    * column — one pruned scan per column, unioned. The stats feed
    * ingest quality gates and cost-based planning at the lake layer.
    */
  val s17_table_profile = Q(
    (s, dir) => graft.operators.Profile.profile(
      T_(s, dir, "lineitem"),
      Seq("l_returnflag", "l_quantity", "l_shipdate", "l_partkey"))
      .orderBy(col("column")),
    Some("""SELECT * FROM (
        SELECT 'l_returnflag' AS "column", count(*) AS n_rows,
          count(l_returnflag) AS n_nonnull,
          count(DISTINCT l_returnflag) AS n_distinct,
          CAST(min(l_returnflag) AS VARCHAR) AS min_s,
          CAST(max(l_returnflag) AS VARCHAR) AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*), count(l_quantity),
          count(DISTINCT l_quantity),
          CAST(CAST(min(l_quantity) AS DOUBLE) AS VARCHAR),
          CAST(CAST(max(l_quantity) AS DOUBLE) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(l_shipdate),
          count(DISTINCT l_shipdate),
          CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey', count(*), count(l_partkey),
          count(DISTINCT l_partkey),
          CAST(min(l_partkey) AS VARCHAR), CAST(max(l_partkey) AS VARCHAR)
        FROM lineitem)
      ORDER BY "column""""))

  /** Z-order lake rewrite (sources.Layout): lineitem re-clustered on
    * the Morton interleave of (l_orderkey, l_partkey) so selective
    * filters on EITHER key skip most parquet row groups — the
    * OPTIMIZE-ZORDER shape. The oracle proves the rewrite is LOSSLESS
    * (content equality after the round trip); LayoutSpec measures the
    * row-group-skipping payoff against an unclustered write.
    */
  val s18_zorder_roundtrip = Q(
    (s, dir) => {
      val target = stagingDir(dir, "lineitem_zorder")
      graft.sources.Layout.zorderWrite(
        T_(s, dir, "lineitem"), "l_orderkey", "l_partkey", bits = 21,
        path = target, numFiles = 8)
      s.read.parquet(target)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
    },
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        l_quantity, l_returnflag
      FROM lineitem"""),
    bench = false)

  /** Small-file compaction round trip (sources.Layout.compact): the
    * lineitem table is first shattered into 64 tiny files (the shape
    * a streaming sink or incremental MERGE accretes), then compacted
    * to size-targeted files. The oracle proves losslessness; the spec
    * asserts the file-count collapse.
    */
  val s19_compact_roundtrip = Q(
    (s, dir) => {
      val shattered = stagingDir(dir, "lineitem_shattered")
      val compacted = stagingDir(dir, "lineitem_compacted")
      T_(s, dir, "lineitem").repartition(64)
        .write.mode("overwrite").parquet(shattered)
      graft.sources.Layout.compact(s, shattered, compacted,
        targetBytes = 8L * 1024 * 1024)
      s.read.parquet(compacted)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
    },
    Some("""SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        l_returnflag
      FROM lineitem"""),
    bench = false)

  /** Streaming dedup against the HISTORICAL fingerprint store: the
    * standing corpus (doc_id < 250) contributes only its content
    * hashes as a static table; the stream drops arrivals whose hash
    * is already in history (stream-static anti-join) before the
    * stateful within-stream dedup. Survivor choice within a dup group
    * is racy across partitions, so — like `stream_dedup` — the
    * checked output is the surviving normalized-content SET.
    */
  val stream_dedup_store = Q(
    (s, dir) => {
      val store = T_(s, dir, "documents").filter(col("doc_id") < 250)
        .select(graft.streaming.StreamingDedup.contentKey(col("text")).as("fp"))
        .distinct()
      graft.streaming.StreamingDedup.dedupAgainstStoreOnce(
        s, s"$dir/documents.parquet", store, "text", "ts",
        queryName = "stream_dedup_store_q",
        prepare = _.withColumn("ts",
          timestamp_micros(col("doc_id") + lit(1000000L))))
        .select(regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
        .orderBy(col("norm"))
    },
    Some("""WITH n AS (SELECT doc_id,
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents)
      SELECT DISTINCT norm FROM n
      WHERE norm NOT IN (SELECT norm FROM n WHERE doc_id < 250)
      ORDER BY norm"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "s16_overwrite_partitions" -> s16_overwrite_partitions,
    "s17_table_profile" -> s17_table_profile,
    "s18_zorder_roundtrip" -> s18_zorder_roundtrip,
    "s19_compact_roundtrip" -> s19_compact_roundtrip,
    "a_cube_totals" -> a_cube_totals,
    "a_grouping_sets" -> a_grouping_sets,
    "w_rolling_7d" -> w_rolling_7d,
    "a_corr_moments" -> a_corr_moments,
    "a_mad" -> a_mad,
    "f_fuzzy_match" -> f_fuzzy_match,
    "dd_minhash_capped" -> dd_minhash_capped,
    "dd_minhash_delta" -> dd_minhash_delta,
    "dd_simhash_delta" -> dd_simhash_delta,
    "mm_decode_image" -> mm_decode_image,
    "mm_decode_audio" -> mm_decode_audio,
    "mm_decode_video" -> mm_decode_video,
    "jdbc_pushdown_roundtrip" -> jdbc_pushdown_roundtrip,
    "g_ppr" -> g_ppr,
    "stream_day_metrics" -> stream_day_metrics,
    "stream_dedup_store" -> stream_dedup_store,
  )
}
