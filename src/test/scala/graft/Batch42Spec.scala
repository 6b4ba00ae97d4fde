package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 42: BPE learning losslessness + greedy-argmax semantics,
  * retractable-rollup == recompute, Theil-Sen outlier resistance. */
class Batch42Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bpe: segmentations are lossless and merges monotonically shrink pieces") {
    val out = SparkEntry.queries("txt_bpe_learn")(spark, dir)
      .withColumn("rejoined", regexp_replace(col("seg"), " ", ""))
      .collect()
    assert(out.length > 0 && out.length <= 50)
    out.foreach { r =>
      assert(r.getAs[String]("rejoined") === r.getAs[String]("word"),
        s"merge lost characters: ${r.getAs[String]("word")} -> ${r.getAs[String]("seg")}")
      assert(r.getAs[Int]("n_pieces") <= r.getAs[String]("word").length)
    }
    // the three learned merges are concrete multi-char pieces
    val m = out.head
    Seq("m1", "m2", "m3").foreach(c =>
      assert(m.getAs[String](c).length >= 2, s"$c not a merge"))
  }

  test("bpe: the first merge is the corpus's most frequent adjacent pair") {
    val docs = Seq((1L, "hello hello hello help"), (2L, "hello help herd"))
      .toDF("doc_id", "text")
    // chars: 'h e l l o' x4, 'h e l p' x2, 'h e r d' x1 -> top pair
    // (count desc, then lexicographic): (h,e) 7 > (l,l) 4 etc.
    val vocab = docs
      .select(explode(split(graft.functions.TextFunctions.normText(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val seg0 = vocab.withColumn("seg", trim(regexp_replace(col("word"), "(.)", "$1 ")))
    val pairs = seg0.select(col("freq"), split(col("seg"), " ").as("tk"))
      .select(col("freq"), explode(expr(
        "transform(slice(tk, 1, size(tk) - 1), (x, i) -> struct(x AS w1, tk[i + 1] AS w2))")).as("bg"))
      .groupBy("bg.w1", "bg.w2").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
    val top = pairs.first()
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) === ("h", "e"))
  }

  test("retractable rollup == full recompute through applyCdc") {
    val maintained = SparkEntry.queries("lake_retract_rollup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // independent truth: build the final state row-wise and re-aggregate
    val base = graft.sources.Tables.read(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)").as("cents"))
    val kept = base.filter(col("k") % 97 =!= 0)
      .withColumn("cents", when(col("k") % 89 === 0, col("cents") + 1000L)
        .otherwise(col("cents")))
    val inserted = base.filter(col("k") % 83 === 0)
      .select((col("k") + 100000000L).as("k"), col("pri"), col("cents"))
    val truth = kept.unionByName(inserted)
      .groupBy("pri").agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained === truth)
  }

  test("theil-sen: a single corrupted day does not move the median slope") {
    def medianSlope(series: Seq[(Int, Long)]): Long = {
      val slopes = for {
        (d1, c1) <- series; (d2, c2) <- series if d1 < d2
      } yield ((c2 - c1) * 1000) / (d2 - d1)
      val sorted = slopes.sorted
      sorted((sorted.length + 1) / 2 - 1)
    }
    val clean = (0 until 30).map(d => (d, 100L + 7L * d))
    val dirty = clean.updated(15, (15, 1000000L))
    assert(medianSlope(clean) === 7000L)
    val ds = medianSlope(dirty)
    assert(math.abs(ds - 7000L) < 500L, s"outlier moved Theil-Sen to $ds")
  }
}
