package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch 47: DPO-pair orientation, retrieval-eval bounds, inflation
  * accounting identities. */
class Batch47Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("dpo pairs: chosen strictly outranks rejected; no self-pairs") {
    val quality = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text"))
          .cast("decimal(10,6)").*(lit(1000000)).cast("long").as("q"))
    val pairs = SparkEntry.queries("pipeline_dpo_pairs")(spark, dir)
    val joined = pairs
      .join(quality.select(col("doc_id").as("chosen_id"), col("q").as("qc")), "chosen_id")
      .join(quality.select(col("doc_id").as("rejected_id"), col("q").as("qr")), "rejected_id")
      .collect()
    assert(joined.nonEmpty, "the corpus's near-dup pairs should yield preference pairs")
    joined.foreach { r =>
      assert(r.getAs[Long]("chosen_id") !== r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("qc") > r.getAs[Long]("qr"),
        "chosen must strictly outrank rejected")
      assert(r.getAs[Long]("gap_micro") === r.getAs[Long]("qc") - r.getAs[Long]("qr"))
    }
  }

  test("retrieval eval: bounds hold (hits@1 <= queries, mrr within lcm bounds)") {
    val r = SparkEntry.queries("eval_retrieval_metrics")(spark, dir).head()
    val nq = r.getAs[Long]("n_queries_with_hit")
    val h1 = r.getAs[Long]("hits_at_1")
    val h10 = r.getAs[Long]("hits_at_10")
    val mrr = r.getAs[Long]("mrr_2520_sum")
    assert(nq >= 1)
    assert(h1 <= nq && h10 <= nq * 10 && h10 >= nq)
    // each query contributes between 2520/10 = 252 and 2520
    assert(mrr >= nq * 252 && mrr <= nq * 2520)
    assert(h1 * 2520 <= mrr, "rank-1 hits alone already contribute 2520 each")
  }

  test("dup inflation: dup_tokens <= tokens and permille consistent") {
    val rows = SparkEntry.queries("dd_dup_inflation")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("tokens")
      val d = r.getAs[Long]("dup_tokens")
      assert(d >= 0 && d <= t)
      assert(r.getAs[Long]("inflation_permille") === d * 1000 / t)
    }
  }
}
