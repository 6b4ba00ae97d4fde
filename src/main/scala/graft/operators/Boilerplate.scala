package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the C4 / RefinedWeb "line
  * dedup" curation pass): segment every document into short lines,
  * count each line's document frequency across the WHOLE corpus, drop
  * the lines that appear in too many documents (nav bars, cookie
  * banners, license footers), and reassemble the cleaned text in
  * original order.
  *
  * Reference capability: graph_db curates raw feeds row by row before
  * MERGE (app/graph_fields.py:14-30 normalizes each record in Python);
  * a corpus-frequency pass like this is inexpressible there because it
  * needs a global aggregate over all documents — exactly the shape a
  * Spark engine gets for free as groupBy + join.
  *
  * Scale design (100 TB corpus):
  *  - Segmentation is a stateless per-row explode — no shuffle.
  *  - The line-frequency table is ONE hash aggregate on the line text;
  *    the per-document `distinct` before it is map-side (partial
  *    aggregate on (doc, line)), so a line repeated 1000× inside one
  *    page contributes one network row.
  *  - The removal join is an equi-join on the line hash. The
  *    boilerplate side is only the lines ABOVE the frequency
  *    threshold — a tiny fraction of distinct lines — so AQE converts
  *    it to a broadcast at runtime; worst case it is a plain shuffled
  *    anti join, never a theta join.
  *  - Reassembly is one hash aggregate per document (collect + sort of
  *    a bounded per-doc line list); no global sort, no window over the
  *    corpus.
  */
object Boilerplate {

  /** Segment `textCol` into lines of `lineWords` whitespace-separated
    * words (the last line may be shorter). Returns
    * (id, pos, line) — `pos` is the 0-based line index.
    *
    * On prose with real newlines pass the text through
    * `regexp_replace(text, "\n", " ")` first or segment on the
    * newlines themselves; the fixed-word segmentation here is the
    * separator-free fallback and keeps the oracle deterministic.
    */
  def segmentLines(docs: DataFrame, id: Column, textCol: Column,
                   lineWords: Int): DataFrame = {
    require(lineWords >= 1, "lineWords must be >= 1")
    val ws = split(textCol, " ")
    val nLines = ceil(size(ws).cast("double") / lineWords).cast("int")
    val lines = when(size(ws) > 0 && length(textCol) > 0,
      transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(ws, i * lineWords + 1, lit(lineWords)), " ")))
      .otherwise(array().cast("array<string>"))
    docs.select(id.as("id"), posexplode(lines).as(Seq("pos", "line")))
  }

  /** Document frequency of every distinct line: (line, df). The
    * per-document distinct collapses map-side before the global
    * aggregate shuffles one row per (doc, line).
    */
  def lineDf(segments: DataFrame): DataFrame =
    segments.select("id", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))

  /** Remove lines whose corpus document frequency is >= `dfThreshold`
    * and reassemble. Returns one row per input document:
    * (id, n_lines, n_kept, n_removed, text_clean) where `text_clean`
    * is the kept lines re-joined with single spaces in original order
    * ("" when every line was boilerplate).
    */
  def removeFrequentLines(docs: DataFrame, id: Column, textCol: Column,
                          lineWords: Int, dfThreshold: Long): DataFrame = {
    // Widen ONLY under-partitioned scan-shaped inputs: a corpus
    // parquet can compress ~100:1, so a byte-sized scan plan
    // underestimates the CPU of segmentation (measured: the whole
    // corpus segmented twice in one task). A corpus that already has
    // scan parallelism — or upstream shuffles — pays nothing; see
    // [[Width.widenIfNarrowScan]].
    val wide = Width.widenIfNarrowScan(docs)
    val segs = segmentLines(wide, id, textCol, lineWords)
    val boiler = lineDf(segs).filter(col("df") >= dfThreshold).select("line")
    val kept = segs.join(boiler, Seq("line"), "left_anti")
    // n_lines is pure per-row arithmetic on the docs table — computing
    // it there instead of re-aggregating `segs` saves a third scan +
    // explode of the corpus (segs is already read twice: once for the
    // frequency table, once for the removal join)
    val perDoc = wide.select(id.as("id"),
      when(length(textCol) > 0,
        ceil(size(split(textCol, " ")).cast("double") / lineWords).cast("long"))
        .otherwise(0L).as("n_lines"))
      .filter(col("n_lines") > 0)
    val keptAgg = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), " ").as("text_clean"))
    perDoc.join(keptAgg, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
