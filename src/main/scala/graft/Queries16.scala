package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Boilerplate, GraphOps, Linkage, Scd, Sketches, TimeSeries, Upsert}
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 16: corpus-frequency boilerplate removal (the C4-style
  * curation pass), SCD Type-2 history, gaps-and-islands streaks, and
  * label-propagation communities. Each entry states its 100 TB plan
  * shape in the operator's Scaladoc; the queries here pin semantics
  * against the DuckDB oracle.
  */
object Queries16 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  /** C4-style boilerplate removal over `documents`: 2-word lines, a
    * line is boilerplate when it appears in >= 20 documents. Emits
    * per-doc keep/remove counts and the reassembled clean text, so
    * the oracle pins BOTH the frequency accounting and the
    * order-preserving reassembly.
    */
  val txt_boilerplate_removal = Q(
    (s, dir) => Boilerplate.removeFrequentLines(
      T_(s, dir, "documents"), col("doc_id"), col("text"),
      lineWords = 2, dfThreshold = 20)
      .withColumnRenamed("id", "doc_id"),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE length(text) > 0),
        seg AS (SELECT doc_id,
            unnest(range(CAST(ceil(len(ws) / 2.0) AS BIGINT))) AS pos, ws
          FROM d),
        seg2 AS (SELECT doc_id, pos,
            array_to_string(ws[(pos * 2 + 1):(pos * 2 + 2)], ' ') AS line
          FROM seg),
        dft AS (SELECT line, count(DISTINCT doc_id) AS df FROM seg2 GROUP BY 1),
        bp AS (SELECT line FROM dft WHERE df >= 20),
        kept AS (SELECT s.doc_id, s.pos, s.line FROM seg2 s
          WHERE NOT EXISTS (SELECT 1 FROM bp WHERE bp.line = s.line)),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM seg2 GROUP BY 1),
        ka AS (SELECT doc_id, count(*) AS n_kept,
            string_agg(line, ' ' ORDER BY pos) AS text_clean
          FROM kept GROUP BY 1)
      SELECT t.doc_id, t.n_lines,
        coalesce(ka.n_kept, 0) AS n_kept,
        t.n_lines - coalesce(ka.n_kept, 0) AS n_removed,
        coalesce(ka.text_clean, '') AS text_clean
      FROM tot t LEFT JOIN ka USING (doc_id)"""))

  /** SCD Type-2 over the event feed: each user's event_type stream
    * becomes versioned validity intervals. Ordering and interval
    * bounds use epoch MICROseconds on both engines — the parquet
    * timestamps carry nanoseconds, which Spark truncates to µs and
    * DuckDB keeps, so windowing on the raw timestamp would order ties
    * differently (the w_rolling_7d lesson from round 5).
    */
  val lake_scd2 = Q(
    (s, dir) => Scd.type2(
      T_(s, dir, "events").withColumn("us", unix_micros(col("ts"))),
      col("user_id"), col("event_type"), col("us"),
      Seq(col("us"), col("event_id")))
      .select(col("key").as("user_id"), col("value").as("event_type"),
        col("valid_from"), col("valid_to"), col("is_current")),
    Some("""WITH e AS (SELECT user_id, event_type, event_id,
            epoch_us(ts) AS us FROM events),
        c AS (SELECT user_id, event_type, us, event_id,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
          FROM e),
        k AS (SELECT user_id, event_type, us, event_id FROM c
          WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, us AS valid_from,
        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to,
        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL AS is_current
      FROM k"""))

  /** Gaps-and-islands: each user's active days collapse to maximal
    * consecutive-day runs (streaks). The day boundary is safe across
    * the ns/µs divide — truncation never moves a timestamp across
    * midnight.
    */
  val w_gaps_islands = Q(
    (s, dir) => TimeSeries.islands(
      T_(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct(),
      "user_id", "day"),
    Some("""WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        r AS (SELECT user_id, day,
            day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
          FROM d)
      SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        count(*) AS days
      FROM r GROUP BY user_id, anchor"""))

  /** Two rounds of synchronous label propagation over the
    * order→customer→nation→region hierarchy graph (same id space as
    * the g_* family). The oracle unrolls both rounds: vote counts,
    * max-count argmax with smallest-label ties, exactly the
    * aggregate the engine runs.
    */
  val g_label_prop = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"),
          (col("o_custkey") + 10000L).as("dst"))
      val c = T_(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"),
          (col("c_nationkey").cast("long") + 100L).as("dst"))
      val n = T_(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"),
          col("n_regionkey").cast("long").as("dst"))
      GraphOps.labelPropagation(o.unionByName(c).unionByName(n),
        iterations = 2)
    },
    Some("""WITH edges AS (
          SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
          UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
          UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation),
        und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
        verts AS (SELECT src AS id FROM und GROUP BY 1),
        l0 AS (SELECT id, id AS lbl FROM verts),
        n1 AS (SELECT u.dst AS id, l.lbl, count(*) AS c
          FROM und u JOIN l0 l ON u.src = l.id GROUP BY 1, 2),
        m1 AS (SELECT id, max(c) AS mc FROM n1 GROUP BY 1),
        l1 AS (SELECT n1.id, min(n1.lbl) AS lbl
          FROM n1 JOIN m1 USING (id) WHERE n1.c = m1.mc GROUP BY 1),
        n2 AS (SELECT u.dst AS id, l.lbl, count(*) AS c
          FROM und u JOIN l1 l ON u.src = l.id GROUP BY 1, 2),
        m2 AS (SELECT id, max(c) AS mc FROM n2 GROUP BY 1),
        l2 AS (SELECT n2.id, min(n2.lbl) AS lbl
          FROM n2 JOIN m2 USING (id) WHERE n2.c = m2.mc GROUP BY 1)
      SELECT id, lbl FROM l2"""))

  /** Per-language quality-percentile curation filter: the histogram
    * sketch ([[Sketches.histQuantilesBy]]) picks each language's
    * median quality, then ONE more pass keeps the docs at-or-above
    * their language's threshold — the keep-the-top-half-per-language
    * recipe, with the threshold chosen by a groups×bins-sized sketch
    * instead of a global sort. Per-lang thresholds broadcast to the
    * filter pass; at 100 TB this is two corpus scans total, no
    * shuffle of document text, no exact percentile over the corpus.
    */
  val txt_quality_pctl_filter = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
        .select(col("lang"), col("doc_id"), T.qualityScore(col("text")).as("q"))
      val thr = Sketches.histQuantilesBy(
        Sketches.histCountersBy(docs, col("lang"), col("q"), 0.0, 1.0, 1000),
        0.0, 1.0, 1000, Seq(0.5))
        .select(col("g").as("lang"), col("est").as("thr"))
      docs.join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("q") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
          min(col("thr")).as("thr"))
    },
    Some(s"""WITH q AS (SELECT lang, doc_id, ${Queries3.qualitySqlExpr} AS q
            FROM documents),
        h AS (SELECT lang,
            LEAST(GREATEST(CAST(floor((q - 0.0) / 1.0 * 1000) AS BIGINT), 0), 999) AS b,
            count(*) AS c
          FROM q GROUP BY 1, 2),
        cum AS (SELECT lang, b, SUM(c) OVER (PARTITION BY lang ORDER BY b) AS cum FROM h),
        tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
        r AS (SELECT lang, CAST(ceil(0.5 * n) AS BIGINT) AS rank FROM tot),
        th AS (SELECT cum.lang, 0.0 + (CAST(min(cum.b) AS DOUBLE) * 1.0) / 1000 AS thr
          FROM cum JOIN r ON cum.lang = r.lang AND cum.cum >= r.rank GROUP BY 1)
      SELECT q.lang, count(*) AS n_total,
        CAST(SUM(CASE WHEN q.q >= th.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        min(th.thr) AS thr
      FROM q JOIN th ON q.lang = th.lang
      GROUP BY 1"""))

  /** CDC apply: orders is the base snapshot; a change feed derived
    * from lineitem (latest change per key wins; returnflag R =
    * delete; every 19th part shifts the key out of the base's range
    * to exercise pure inserts) folds in via [[Upsert.applyCdc]] —
    * one max_by aggregate + one anti join, no window, no full
    * rewrite. The sequence number composes (linenumber, partkey,
    * suppkey) because linenumber alone is NOT unique per order in
    * this data — max_by needs a total order or the two engines may
    * break ties differently.
    */
  private[graft] def cdcBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    T_(s, dir, "orders").select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"), col("o_orderstatus").as("status"))

  private[graft] def cdcFeed(s: org.apache.spark.sql.SparkSession, dir: String) =
    T_(s, dir, "lineitem").select(
      when(col("l_partkey") % 19 === 0, col("l_orderkey") + 50000000L)
        .otherwise(col("l_orderkey")).as("k"),
      (col("l_linenumber").cast("long") * 1000000000000L +
        col("l_partkey") * 1000000L + col("l_suppkey")).as("seq"),
      when(col("l_returnflag") === "R", "D").otherwise("U").as("op"),
      col("l_extendedprice").as("price"), col("l_linestatus").as("status"))

  private val cdcOracleSql =
    """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price,
            o_orderstatus AS status FROM orders),
        feed AS (SELECT
            CASE WHEN l_partkey % 19 = 0 THEN l_orderkey + 50000000
                 ELSE l_orderkey END AS k,
            CAST(l_linenumber AS BIGINT) * 1000000000000 +
              l_partkey * 1000000 + l_suppkey AS seq,
            CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
            l_extendedprice AS price, l_linestatus AS status
          FROM lineitem),
        latest AS (SELECT k, op, price, status FROM (
            SELECT k, op, price, status,
              -- seq first, then the residual feed columns in schema
              -- order — the applyCdc tiebreak, so duplicated change
              -- records (the sf0.001 fixture has colliding composite
              -- sequences) resolve to ONE deterministic winner
              row_number() OVER (PARTITION BY k
                ORDER BY seq DESC, op DESC, price DESC, status DESC) AS rn
            FROM feed) WHERE rn = 1)
      SELECT b.k, b.price, b.status FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = b.k)
      UNION ALL
      SELECT k, price, status FROM latest WHERE op <> 'D'"""

  val lake_cdc_apply = Q(
    (s, dir) => Upsert.applyCdc(cdcBase(s, dir), cdcFeed(s, dir),
      Seq("k"), "op", Seq("seq")),
    Some(cdcOracleSql))

  /** The same CDC fold as a CHECKPOINTED STREAM
    * ([[graft.streaming.StreamingCdc]]): base snapshot seeds the
    * target table, the staged feed streams through foreachBatch +
    * applyCdc with crash-safe write-then-swap. One AvailableNow batch
    * here, so the final table equals the batch oracle exactly;
    * multi-batch log-order sequencing and delete-then-reinsert across
    * batches are spec-pinned (StreamingCdcSpec).
    */
  val stream_cdc = Q(
    (s, dir) => {
      val staged = stagingDir(dir, "cdc_feed")
      cdcFeed(s, dir).write.mode("overwrite").parquet(staged)
      graft.streaming.StreamingCdc.applyCdcParquetOnce(
        s, cdcBase(s, dir), staged, Seq("k"), "op", Seq("seq"))
    },
    Some(cdcOracleSql),
    bench = false)

  /** Vocabulary coverage / OOV-rate scoring (the tokenizer-prep
    * pass): corpus word frequencies pick a top-V vocabulary with a
    * TOTAL order (count desc, word asc — a bare top-k by count is
    * nondeterministic at the cut), then one more pass scores every
    * document's token and out-of-vocabulary counts against the
    * broadcast vocab. Counts only — no float rates — so the result
    * replays bit-exactly. The top-V select is TakeOrderedAndProject
    * (no global sort materialization even with 10M distinct words).
    */
  val txt_vocab_coverage = Q(
    (s, dir) => {
      val w = T_(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val vocab = w.groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word").asc).limit(20)
        .select(col("word"), lit(1).as("__v"))
      w.join(broadcast(vocab), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
    },
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        freq AS (SELECT word, count(*) AS c FROM w GROUP BY 1),
        vocab AS (SELECT word FROM freq ORDER BY c DESC, word ASC LIMIT 20)
      SELECT doc_id, count(*) AS n_tokens,
        CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM w LEFT JOIN vocab v ON w.word = v.word
      GROUP BY 1"""))

  /** Probabilistic record linkage ([[Linkage]]): customers vs a
    * deterministically-perturbed copy (name typo every 7th key,
    * nation shift every 13th, balance drift every 3rd, segment lost
    * every 11th), scored by integer agreement weights on
    * (name-edit-distance, balance proximity, segment equality).
    * Same-nation near-key customers DO produce lev-1 name
    * agreements — the scored false-positive band is part of the
    * semantics, not an accident; the oracle replays weights and
    * threshold exactly.
    *
    * Blocking (round 7): nation alone is 25 fixed blocks — per-block
    * quadratic with constant block count is N², the round-6 verdict's
    * scale-killer (28.9 s at sf0.1, ~90B lev pairs at 100×). The
    * threshold algebra shows every emitted pair MUST agree on name
    * (max score without the +30 name weight is 15 < 35), and name
    * agreement here means lev ≤ 1 on equal-length 18-char names
    * (the %7 "xx" append makes a 20-char name that can never be
    * within lev 1 of an 18-char one) — i.e. at most ONE substituted
    * digit of the 9-digit suffix. Pigeonhole: split the digits into
    * 3 parts; a single substitution hits one part, so the pair
    * agrees on the other two. Blocking on (nation, part_i, part_j)
    * for all three (i,j) pairs is therefore LOSSLESS for the output
    * — the oracle keeps the full nation-block replay, which proves
    * it. Each compound key carries digit entropy, so block size is
    * bounded by the key-space density, not the customer count.
    */
  val f_link_score = Q(
    (s, dir) => {
      def parts(name: org.apache.spark.sql.Column, pfx: String) = Seq(
        substring(name, 10, 3).as(s"${pfx}1"),
        substring(name, 13, 3).as(s"${pfx}2"),
        substring(name, 16, 3).as(s"${pfx}3"))
      val clean0 = T_(s, dir, "customer")
      val clean = clean0.select(
        clean0.columns.map(col) ++ parts(col("c_name"), "p"): _*)
      val dirty0 = clean0.select(
        col("c_custkey").as("d_custkey"),
        when(col("c_custkey") % 7 === 0, concat(col("c_name"), lit("xx")))
          .otherwise(col("c_name")).as("d_name"),
        when(col("c_custkey") % 13 === 0, (col("c_nationkey") + 1) % 25)
          .otherwise(col("c_nationkey")).as("d_nationkey"),
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("d_acctbal"),
        when(col("c_custkey") % 11 === 0, lit("UNKNOWN"))
          .otherwise(col("c_mktsegment")).as("d_mktsegment"))
      val dirty = dirty0.select(
        dirty0.columns.map(col) ++ parts(col("d_name"), "q"): _*)
      val nk = "c_nationkey" -> "d_nationkey"
      Linkage.linkScoredMulti(clean, dirty,
        "c_custkey" -> "d_custkey",
        Seq(Seq(nk, "p1" -> "q1", "p2" -> "q2"),
          Seq(nk, "p1" -> "q1", "p3" -> "q3"),
          Seq(nk, "p2" -> "q2", "p3" -> "q3")),
        Seq(
          Linkage.Field(levenshtein(col("c_name"), col("d_name")) <= 1, 30, -10),
          Linkage.Field(abs(col("c_acctbal") - col("d_acctbal")) <= 1.0, 15, -5),
          Linkage.Field(col("c_mktsegment") === col("d_mktsegment"), 10, -15)),
        threshold = 35)
        .select(col("c_custkey"), col("d_custkey"), col("link_score"))
    },
    Some("""WITH dirty AS (SELECT c_custkey AS d_custkey,
            CASE WHEN c_custkey % 7 = 0 THEN c_name || 'xx' ELSE c_name END AS d_name,
            CASE WHEN c_custkey % 13 = 0 THEN (c_nationkey + 1) % 25
                 ELSE c_nationkey END AS d_nationkey,
            CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                 ELSE c_acctbal END AS d_acctbal,
            CASE WHEN c_custkey % 11 = 0 THEN 'UNKNOWN'
                 ELSE c_mktsegment END AS d_mktsegment
          FROM customer),
        pairs AS (SELECT c.c_custkey, d.d_custkey,
            CAST((CASE WHEN levenshtein(c.c_name, d.d_name) <= 1 THEN 30 ELSE -10 END)
              + (CASE WHEN abs(c.c_acctbal - d.d_acctbal) <= 1.0 THEN 15 ELSE -5 END)
              + (CASE WHEN c.c_mktsegment = d.d_mktsegment THEN 10 ELSE -15 END)
            AS BIGINT) AS link_score
          FROM customer c JOIN dirty d ON c.c_nationkey = d.d_nationkey)
      SELECT c_custkey, d_custkey, link_score FROM pairs
      WHERE link_score >= 35"""))

  val all: Map[String, Q] = Map(
    "txt_quality_pctl_filter" -> txt_quality_pctl_filter,
    "lake_cdc_apply" -> lake_cdc_apply,
    "stream_cdc" -> stream_cdc,
    "txt_vocab_coverage" -> txt_vocab_coverage,
    "f_link_score" -> f_link_score,
    "txt_boilerplate_removal" -> txt_boilerplate_removal,
    "lake_scd2" -> lake_scd2,
    "w_gaps_islands" -> w_gaps_islands,
    "g_label_prop" -> g_label_prop,
  )
}
