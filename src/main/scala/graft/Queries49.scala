package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 49 (round 7): zone-map clustering-quality metrics and
  * RAKE-style keyphrase extraction.
  */
object Queries49 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Zone-map overlap: WHY clustering matters, quantified
  // ===========================================================

  private val zmBuckets = 32

  /** ZONE-MAP OVERLAP: the clustering-quality number behind every
    * "OPTIMIZE/Z-ORDER made queries faster" claim — bucket lineitem
    * 32 ways under two layouts (hash-scattered vs ship-date-sorted),
    * compute each bucket's [min, max] ship-day zone map, and count
    * how many OTHER buckets each bucket's range overlaps. A pruning
    * scan must read every overlapping bucket, so avg overlap IS the
    * expected read amplification of a date-range query: the hash
    * layout overlaps everything (~31), the sorted layout a couple of
    * neighbors. `s18_zorder_roundtrip` demonstrates the layout; this
    * measures it.
    *
    * Plan note: the "sorted" assignment is an ntile over the
    * DAY-compressed table (calendar-bounded), never a global sort of
    * facts; the 32×32 overlap join is constant-size.
    */
  val lake_zonemap_overlap = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          to_date(col("l_shipdate")).as("d"))
      val hashed = li.select(lit("hash").as("layout"),
        (graft.operators.Sampling.detHash2(
          col("l_orderkey") * 31 + col("l_partkey")) % zmBuckets)
          .cast("int").as("bucket"), col("d"))
      val dayMap = li.groupBy(col("d")).agg(count(lit(1)).as("n"))
        .withColumn("bucket", ntile(zmBuckets)
          .over(Window.orderBy(col("d"))) - 1)
        .select(col("d"), col("bucket"))
      val sorted = li.join(dayMap, "d")
        .select(lit("sorted").as("layout"), col("bucket"), col("d"))
      val zones = hashed.unionByName(sorted)
        .groupBy(col("layout"), col("bucket"))
        .agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      val a = zones.select(col("layout"), col("bucket").as("ba"),
        col("mn").as("mna"), col("mx").as("mxa"))
      val b = zones.select(col("layout").as("lb"), col("bucket").as("bb"),
        col("mn").as("mnb"), col("mx").as("mxb"))
      a.join(b,
          col("layout") === col("lb") && col("ba") =!= col("bb") &&
            col("mna") <= col("mxb") && col("mnb") <= col("mxa"),
          "left")
        .groupBy(col("layout"), col("ba"))
        .agg(count(col("bb")).as("ov"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_buckets"),
          expr("(sum(ov) * 100) div count(1)").as("avg_overlap_centi"),
          max(col("ov")).as("max_overlap"))
        .orderBy(col("layout"))
    },
    Some(s"""WITH li AS (SELECT l_orderkey, l_partkey,
            CAST(l_shipdate AS DATE) AS d
          FROM lineitem),
        hashed AS (SELECT 'hash' AS layout,
            CAST((((l_orderkey * 31 + l_partkey) % 94906249) * 1103515245
              % 2147483647 % 94906249 * 1103515245 % 2147483647)
              % $zmBuckets AS INTEGER) AS bucket, d
          FROM li),
        daymap AS (SELECT d,
            CAST(ntile($zmBuckets) OVER (ORDER BY d) - 1 AS INTEGER) AS bucket
          FROM (SELECT d, count(*) AS n FROM li GROUP BY 1)),
        sorted_l AS (SELECT 'sorted' AS layout, dm.bucket, li.d
          FROM li JOIN daymap dm ON li.d = dm.d),
        zones AS (SELECT layout, bucket, min(d) AS mn, max(d) AS mx
          FROM (SELECT * FROM hashed UNION ALL SELECT * FROM sorted_l)
          GROUP BY 1, 2),
        ov AS (SELECT a.layout, a.bucket AS ba, count(b.bucket) AS ov
          FROM zones a LEFT JOIN zones b
            ON a.layout = b.layout AND a.bucket != b.bucket
            AND a.mn <= b.mx AND b.mn <= a.mx
          GROUP BY 1, 2)
      SELECT layout, count(*) AS n_buckets,
        CAST(SUM(ov) AS BIGINT) * 100 // count(*) AS avg_overlap_centi,
        CAST(MAX(ov) AS BIGINT) AS max_overlap
      FROM ov GROUP BY 1 ORDER BY 1"""))

  // ===========================================================
  // RAKE-style keyphrase extraction (integer-exact)
  // ===========================================================

  private val rakeTop = 20

  /** KEYPHRASE EXTRACTION (RAKE): phrases are maximal runs of
    * alphabetic non-stopwords (stopwords and non-alpha tokens break
    * phrases — the gaps-and-islands rewrite on the token index);
    * each word scores degree/frequency over the whole corpus
    * (degree = summed length of phrases it appears in), each phrase
    * scores the sum of its words — all in integer milli, so ranking
    * replays exactly. Top-20 multi-word phrases (2-4 words) by
    * score, the float-free RAKE of Rose et al.
    *
    * Plan: one posexplode scan; islands via one per-doc window;
    * word stats and phrase scores are keyed aggregates + one join
    * on the word.
    */
  val txt_keyphrase = Q(
    (s, dir) => {
      val toks = T_(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(T.normText(col("text")), " ")).as(Seq("pos", "tok")))
      val members = toks
        .filter(col("tok").rlike("^[a-z]+$") &&
          !col("tok").isInCollection(T.defaultStopwords))
        .withColumn("island", col("pos") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      val phrases = members.groupBy(col("doc_id"), col("island"))
        .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), e -> e.tok), ' ')")
          .as("phrase"),
          count(lit(1)).as("len"))
      val wordStats = members
        .join(phrases.select(col("doc_id"), col("island"), col("len")),
          Seq("doc_id", "island"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
        .withColumn("w_milli", expr("(deg * 1000) div freq"))
      val phraseScores = members
        .join(wordStats.select(col("tok"), col("w_milli")), "tok")
        .groupBy(col("doc_id"), col("island"))
        .agg(sum(col("w_milli")).as("score_milli"))
        .join(phrases, Seq("doc_id", "island"))
        .filter(col("len").between(2, 4))
      phraseScores.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occ"), max(col("score_milli")).as("score_milli"))
        .orderBy(col("score_milli").desc, col("phrase").asc)
        .limit(rakeTop)
    },
    Some {
      val stops = T.defaultStopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH tk0 AS (SELECT doc_id,
            string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
              AS ws
          FROM documents),
        toks AS (SELECT doc_id, ws[i + 1] AS tok, i AS pos
          FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM tk0)),
        members AS (SELECT doc_id, tok, pos,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
              AS island
          FROM toks
          WHERE regexp_full_match(tok, '[a-z]+') AND tok NOT IN ($stops)),
        phrases AS (SELECT doc_id, island,
            string_agg(tok, ' ' ORDER BY pos) AS phrase,
            count(*) AS len
          FROM members GROUP BY 1, 2),
        ws AS (SELECT m.tok, count(*) AS freq,
            CAST(SUM(p.len) AS BIGINT) AS deg
          FROM members m JOIN phrases p USING (doc_id, island)
          GROUP BY 1),
        wsc AS (SELECT tok, (deg * 1000) // CAST(freq AS BIGINT) AS w_milli
          FROM ws),
        psc AS (SELECT m.doc_id, m.island,
            CAST(SUM(w.w_milli) AS BIGINT) AS score_milli
          FROM members m JOIN wsc w USING (tok)
          GROUP BY 1, 2),
        scored AS (SELECT p.phrase, psc.score_milli
          FROM psc JOIN phrases p USING (doc_id, island)
          WHERE p.len BETWEEN 2 AND 4)
      SELECT phrase, count(*) AS n_occ,
        CAST(MAX(score_milli) AS BIGINT) AS score_milli
      FROM scored GROUP BY 1
      ORDER BY score_milli DESC, phrase ASC LIMIT $rakeTop"""
    })

  val all: Map[String, Q] = Map(
    "lake_zonemap_overlap" -> lake_zonemap_overlap,
    "txt_keyphrase" -> txt_keyphrase,
  )
}
