package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Percentiles, TimeSeries}
import Queries.Q

/** Batch 36 (round 7): conversion-latency funnel metrics,
  * cross-source duplication overlap, and centroid-distance outlier
  * mining (mislabeled-example detection) — all integer/rational
  * exact.
  */
object Queries36 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** TIME-TO-CONVERT: sessionize (30-min gap), take each session's
    * first `view` and the first `purchase` AT OR AFTER it, and
    * summarize the conversion latency — count, min/max, exact
    * decimal sum, and the discrete median via the value-frequency
    * percentile sketch ([[Percentiles.quantilesDisc]] — the fact
    * table only ever meets hash aggregates, no global sort). One
    * sessionize pass + two keyed aggregates + the compressed
    * percentile walk.
    */
  val funnel_latency = Q(
    (s, dir) => {
      val ev = TimeSeries.sessionize(T_(s, dir, "events"),
          col("user_id"), col("ts"), gapSeconds = 1800,
          ord = Seq(col("ts").asc, col("event_id").asc))
        .withColumn("us", unix_micros(col("ts")))
      val tView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("us")).as("t_view"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(tView, Seq("user_id", "session_idx"))
        .filter(col("us") >= col("t_view"))
        .groupBy(col("user_id"), col("session_idx"), col("t_view"))
        .agg(min(col("us")).as("t_purchase"))
        .withColumn("delta_us", col("t_purchase") - col("t_view"))
      val med = Percentiles.quantilesDisc(conv, lit(1), col("delta_us"),
          Seq(5000))
        .select(col("value").as("p50_us"))
      val nv = tView.agg(count(lit(1)).as("n_viewed"))
      conv.agg(count(lit(1)).as("n_converted"),
          min(col("delta_us")).as("min_us"),
          max(col("delta_us")).as("max_us"),
          sum(col("delta_us").cast("decimal(38,0)")).cast("decimal(38,0)")
            .cast("string").as("sum_us"))
        .crossJoin(broadcast(nv))
        .crossJoin(broadcast(med))
        .select(col("n_viewed"), col("n_converted"), col("min_us"),
          col("max_us"), col("sum_us"), col("p50_us"))
    },
    Some("""WITH l AS (SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        b AS (SELECT user_id, event_id, ts, event_type,
            CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                 THEN 1 ELSE 0 END AS nb FROM l),
        g AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
            CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM b),
        tv AS (SELECT user_id, session_idx, min(us) AS t_view FROM g
          WHERE event_type = 'view' GROUP BY 1, 2),
        conv AS (SELECT g.user_id, g.session_idx, tv.t_view,
            min(g.us) - tv.t_view AS delta_us
          FROM g JOIN tv USING (user_id, session_idx)
          WHERE g.event_type = 'purchase' AND g.us >= tv.t_view
          GROUP BY 1, 2, 3),
        nv AS (SELECT count(*) AS n_viewed FROM tv),
        freq AS (SELECT delta_us AS v, count(*) AS c FROM conv GROUP BY 1),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v ASC) AS cum,
            sum(c) OVER () AS tot FROM freq),
        med AS (SELECT min(v) AS p50_us FROM cum
          WHERE cum >= (5000 * tot + 9999) // 10000)
      SELECT nv.n_viewed, agg.n_converted, agg.min_us, agg.max_us,
        agg.sum_us, med.p50_us
      FROM (SELECT count(*) AS n_converted, min(delta_us) AS min_us,
          max(delta_us) AS max_us,
          CAST(CAST(SUM(CAST(delta_us AS HUGEINT)) AS DECIMAL(38,0))
            AS VARCHAR) AS sum_us
        FROM conv) agg, nv, med"""))

  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  /** CROSS-SOURCE duplication overlap: for every unordered source
    * pair, how many exact-duplicate clusters span both — the
    * curation diagnostic that tells you which feeds are re-crawls of
    * each other. The corpus is augmented with a deterministic
    * 'mirror' feed (every 7th document re-sourced) so the overlap
    * matrix is non-trivially exercised — the partial-re-crawl
    * scenario this operator exists for. The per-key self-join is
    * bounded by the source count (≤ |sources| rows per key), never
    * corpus-quadratic; the output is source-pair-sized.
    */
  val dd_cross_source = Q(
    (s, dir) => {
      val base = T_(s, dir, "documents")
      val docs = base.select(col("text"), col("source"))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select(col("text"), lit("mirror").as("source")))
      val ks = docs
        .select(sha2(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
          256).as("k"), col("source"))
        .distinct()
      ks.as("a").join(ks.as("b"),
          col("a.k") === col("b.k") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_clusters"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH docs AS (
          SELECT text, source FROM documents
          UNION ALL SELECT text, 'mirror' FROM documents
            WHERE doc_id % 7 = 0),
        ks AS (SELECT DISTINCT $normSql AS k, source FROM docs)
      SELECT a.source AS source_a, b.source AS source_b,
        count(*) AS shared_clusters
      FROM ks a JOIN ks b ON a.k = b.k AND a.source < b.source
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val vqSql =
    "CAST(CAST(CAST(embedding[i.i + 1] AS DOUBLE) AS DECIMAL(27,6))" +
      " * 1000000 AS BIGINT)"

  /** CENTROID-DISTANCE OUTLIERS (mislabeled-example mining): each
    * vector's squared distance to its OWN label's centroid, exact —
    * ‖x − s/n‖² scales to the integer Σ_d (vq_d·n − s_d)², carried
    * in decimal(38,0) (vq·n wraps int64 already at ~500 vectors per
    * label), ranked top-3 per label with a total order. True
    * distance² = dist2q / (n²·10¹²); ranking needs no division.
    * Shape: one posexplode scan, one (label, dim) sum table joined
    * back, one per-label rank over label-sized groups.
    */
  val vec_label_outliers = Q(
    (s, dir) => {
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val x = T_(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("vq",
          col("v").cast("double").cast("decimal(27,6)").*(lit(1000000))
            .cast("long"))
      val sums = x.groupBy(col("label"), col("pos"))
        .agg(sum(d(col("vq"))).as("s"), count(lit(1)).as("n"))
      val dist = x.join(sums, Seq("label", "pos"))
        .withColumn("__t",
          (d(col("vq")) * col("n") - col("s")) *
            (d(col("vq")) * col("n") - col("s")))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("__t")).cast("decimal(38,0)").as("dist2q"),
          max(col("n")).as("n"))
      import org.apache.spark.sql.expressions.Window
      dist.withColumn("rank",
          row_number().over(Window.partitionBy(col("label"))
            .orderBy(col("dist2q").desc, col("vec_id").asc)))
        .filter(col("rank") <= 3)
        // rank on the exact decimal, ship it as a canonical string
        .select(col("label"), col("rank"), col("vec_id"),
          col("dist2q").cast("string").as("dist2q"), col("n"))
        .orderBy(col("label"), col("rank"))
    },
    Some(s"""WITH x AS (SELECT vec_id, label, CAST(i.i AS INTEGER) AS pos,
            $vqSql AS vq
          FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
          WHERE i.i < len(embedding)),
        sums AS (SELECT label, pos, SUM(CAST(vq AS HUGEINT)) AS s,
            count(*) AS n
          FROM x GROUP BY 1, 2),
        dist AS (SELECT x.vec_id, x.label,
            SUM((CAST(x.vq AS HUGEINT) * n - s)
              * (CAST(x.vq AS HUGEINT) * n - s)) AS dist2q,
            max(n) AS n
          FROM x JOIN sums ON x.label = sums.label AND x.pos = sums.pos
          GROUP BY 1, 2)
      SELECT label, rank, vec_id,
        CAST(CAST(dist2q AS DECIMAL(38,0)) AS VARCHAR) AS dist2q, n
      FROM (SELECT label, vec_id, dist2q, n,
          CAST(row_number() OVER (PARTITION BY label
            ORDER BY dist2q DESC, vec_id ASC) AS INTEGER) AS rank
        FROM dist)
      WHERE rank <= 3 ORDER BY label, rank"""))

  val all: Map[String, Q] = Map(
    "funnel_latency" -> funnel_latency,
    "dd_cross_source" -> dd_cross_source,
    "vec_label_outliers" -> vec_label_outliers,
  )
}
