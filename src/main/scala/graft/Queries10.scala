package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, GlobalOrder, Sampling, Sketches}
import Queries.Q

/** Batch 10: loader-facing corpus mechanics — JSONL interchange (the
  * corpus wire format), verifiable cardinality sketches, deterministic
  * hash-reservoir sampling, shard manifests, distributed global
  * indexing, quality-threshold sweeps, order-of-magnitude histograms,
  * and source-priority dedup. Every query replays bit-for-bit in the
  * DuckDB oracle.
  */
object Queries10 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  /** `Sampling.detHash` over doc_id, as DuckDB SQL. */
  private val hashSql = "(doc_id % 94906249) * 1103515245 % 2147483647"

  /** JSONL interchange: stage the document corpus as JSON lines — the
    * de-facto corpus exchange format — and read it back with an
    * EXPLICIT schema (never schema inference: an extra full pass, and
    * sampled inference drifts types between runs at scale). The
    * read-back aggregate proves the hop lossless for ids, counts, and
    * the text payload itself (JSON string escaping round-trips); the
    * oracle computes from the original parquet, which is exactly the
    * claim. Mirrors the reference's batched row export surface
    * (main_graph_topraq.py:84-119) re-expressed as a lake interchange.
    */
  val s14_jsonl_roundtrip = Q(
    (s, dir) => {
      val base = stagingDir(dir, "documents_jsonl")
      T_(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text"))
        .write.mode("overwrite").json(base)
      s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, " +
          "n_chars BIGINT, text STRING")
        .json(base)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("text_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    },
    Some("""SELECT source, count(*) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(length(text)) AS BIGINT) AS text_chars,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM documents GROUP BY 1"""),
    bench = false)

  private val kmvK = 32

  /** Verifiable distinct-count sketch: per-event-type KMV estimate of
    * the distinct-user cardinality next to the exact count of the
    * hashed domain. The estimate path (`k_n = k`) and the
    * exact-exhaustion path (`k_n < k`) are both exercised at sf>=0.01.
    * See [[graft.operators.Sketches]] for the scale argument.
    */
  val a_kmv_distinct = Q(
    (s, dir) => Sketches.kmvDistinct(T_(s, dir, "events"),
        col("event_type"), col("user_id"), kmvK)
      .select(col("g").as("event_type"), col("k_n"), col("kth_hash"),
        col("n_distinct_hashed"), col("est")),
    Some(s"""WITH d AS (SELECT DISTINCT event_type AS g,
        (user_id % 94906249) * 1103515245 % 2147483647 AS h FROM events),
      kk AS (SELECT g, h FROM d QUALIFY
        row_number() OVER (PARTITION BY g ORDER BY h ASC) <= $kmvK),
      sk AS (SELECT g, count(*) AS k_n, max(h) AS kth_hash FROM kk GROUP BY g),
      ex AS (SELECT g, count(*) AS n_distinct_hashed FROM d GROUP BY g)
      SELECT sk.g AS event_type, k_n, kth_hash, n_distinct_hashed,
        CASE WHEN k_n < $kmvK THEN CAST(k_n AS DOUBLE)
             ELSE CAST(${Sketches.kmvNumerator(kmvK)} AS DOUBLE)
                  / CAST(kth_hash AS DOUBLE) END AS est
      FROM sk JOIN ex USING (g)"""))

  /** Deterministic "reservoir" sample: the k documents with the
    * smallest id hash — a uniform without-replacement sample any
    * engine can recompute bit-for-bit (no RNG state, no scan order
    * dependence), unlike `df.sample()` whose seed follows partition
    * layout. Plans as TakeOrderedAndProject: per-partition top-k then
    * a k-row merge on the driver — no global sort at any scale
    * (asserted in PlanSpec).
    */
  val samp_hash_reservoir = Q(
    (s, dir) => T_(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        Sampling.detHash(col("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(200),
    Some(s"""SELECT doc_id, lang, source, $hashSql AS h
      FROM documents ORDER BY h ASC, doc_id ASC LIMIT 200"""))

  /** Shard manifest: assign every document to one of 64 hash shards
    * (the file-level layout a loader consumes) and emit the per-shard
    * manifest — doc count, char volume, id range. One hash aggregate;
    * the write path is `repartition(64, shard).write` with this exact
    * key, so manifest and layout cannot disagree. Hash sharding keeps
    * shard sizes balanced whatever the id distribution (asserted in
    * spec).
    */
  val pack_shards = Q(
    (s, dir) => T_(s, dir, "documents")
      .groupBy((Sampling.detHash(col("doc_id")) % 64L).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc")),
    Some(s"""SELECT $hashSql % 64 AS shard, count(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS chars,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM documents GROUP BY 1"""))

  /** Global epoch index: every document's 1-based position in the
    * total order (n_chars DESC, doc_id ASC) — `row_number()` over the
    * whole corpus, computed WITHOUT the single-reducer global window
    * (see [[graft.operators.GlobalOrder]]). The oracle IS the global
    * window, which is the equivalence claim.
    */
  val o5_global_index = Q(
    (s, dir) => GlobalOrder.withGlobalIndex(
        T_(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select(col("doc_id"), col("n_chars"), col("pos")),
    Some("""SELECT doc_id, n_chars,
        row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS pos
      FROM documents"""))

  private val sweepBp = Seq(3000, 4000, 5000, 6000, 7000)

  /** Quality-threshold sweep: keep-rate of the corpus at each
    * candidate quality cutoff — the calibration table you read before
    * committing a filter threshold (choose the cutoff, THEN run the
    * filter; never iterate full passes). One scan with one conditional
    * sum per threshold (no row explosion), stacked to rows; shares in
    * exact basis points.
    */
  val txt_quality_sweep = Q(
    (s, dir) => {
      val q = T_(s, dir, "documents")
        .select(T.qualityScore(col("text")).as("q"))
      val aggs = count(lit(1)).as("n_total") +:
        sweepBp.map(t => sum(when(col("q") >= lit(t / 10000.0), 1L)
          .otherwise(0L)).as(s"k$t"))
      val stackArgs = sweepBp.map(t => s"$t, k$t").mkString(", ")
      q.agg(aggs.head, aggs.tail: _*)
        .select(col("n_total"),
          expr(s"stack(${sweepBp.size}, $stackArgs) AS (t_bp, n_keep)"))
        .select(col("t_bp"), col("n_keep"), col("n_total"),
          expr("n_keep * 10000 div n_total").as("share_bp"))
    },
    Some {
      val ks = sweepBp.map(t =>
        s"""CAST(SUM(CASE WHEN q >= ${t / 10000.0} THEN 1 ELSE 0 END)
           AS BIGINT) AS k$t""").mkString(",\n        ")
      val rows = sweepBp.map(t =>
        s"SELECT $t AS t_bp, k$t AS n_keep, n_total FROM a").mkString(
        "\n      UNION ALL ")
      s"""WITH q AS (SELECT ${Queries3.qualitySqlExpr} AS q FROM documents),
      a AS (SELECT count(*) AS n_total,
        $ks FROM q)
      SELECT t_bp, n_keep, n_total, n_keep * 10000 // n_total AS share_bp
      FROM ($rows)"""
    })

  /** Order-of-magnitude length histogram: documents bucketed by the
    * decimal digit count of n_chars — the corpus shape profile
    * (boilerplate spike? truncation cliff?) at one glance. Integer
    * bucketing only, so it replays exactly where float log-bucketing
    * would not. One hash aggregate.
    */
  val a_digit_histogram = Q(
    (s, dir) => T_(s, dir, "documents")
      .groupBy(length(col("n_chars").cast("string")).as("digits"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars")),
    Some("""SELECT CAST(length(CAST(n_chars AS VARCHAR)) AS INTEGER) AS digits,
        count(*) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1"""))

  private val sourcePriority = Seq("src7", "src3")

  /** Source-priority exact dedup: when the same normalized text
    * appears under multiple sources, keep the copy from the most
    * trusted source (curated beats crawled), tie-broken by lowest id —
    * the cross-source arbitration step of corpus assembly (plain
    * [[Dedup.exact]] keeps lowest id regardless of provenance). Argmin
    * aggregate on the content fingerprint: duplicate groups collapse
    * map-side, one shuffle carries survivors only.
    */
  val dd_source_priority = Q(
    (s, dir) => {
      val prio = coalesce(
        element_at(typedLit(sourcePriority.zipWithIndex.toMap), col("source")),
        lit(99))
      val withKey = T_(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.fingerprintFrom(T.normText(col("text"))).as("fp"),
          prio.as("prio"))
      Dedup.exactByOrd(withKey, col("fp"),
        struct(col("prio"), col("doc_id")))
    },
    Some {
      val cases = sourcePriority.zipWithIndex
        .map { case (src, p) => s"WHEN '$src' THEN $p" }.mkString(" ")
      s"""WITH n AS (SELECT doc_id, source,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ''),
            c -> CAST(ord(c) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 2147483647) AS fp,
        CASE source $cases ELSE 99 END AS prio
      FROM documents)
      SELECT fp, doc_id, source, prio FROM n
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY prio, doc_id) = 1"""
    })

  val all: Map[String, Q] = Map(
    "s14_jsonl_roundtrip" -> s14_jsonl_roundtrip,
    "a_kmv_distinct" -> a_kmv_distinct,
    "samp_hash_reservoir" -> samp_hash_reservoir,
    "pack_shards" -> pack_shards,
    "o5_global_index" -> o5_global_index,
    "txt_quality_sweep" -> txt_quality_sweep,
    "a_digit_histogram" -> a_digit_histogram,
    "dd_source_priority" -> dd_source_priority,
  )
}
