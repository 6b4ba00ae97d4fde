package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DataQuality, Dedup, GraphOps, Packing, Scd}

/** Batch 31 operator semantics: rank-complement packing, the
  * point-in-time SCD2 join's boundary rules, chi-square drift's
  * zero/new-category behavior, modularity on a graph with a
  * hand-computed score, and soft-dedup weights.
  */
class Batch31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packPaired: pairing, rejected partner, odd middle, over-ctx drop") {
    // tokens: 100 (can never pair within 120 with 30), 90, 80, 25, 20, 10
    // plus a 130-token row that must be dropped (over ctx) and a 0-token row
    val df = Seq(
      ("en", 1L, 100L), ("en", 2L, 90L), ("en", 3L, 80L),
      ("en", 4L, 25L), ("en", 5L, 20L), ("en", 6L, 10L),
      ("en", 7L, 130L), ("en", 8L, 0L)
    ).toDF("lang", "id", "toks")
    val bins = Packing.packPaired(df, col("lang"), col("toks"), col("id"), 120L)
      .collect().map(r => (r.getAs[Long]("id_long"),
        Option(r.getAs[Any]("id_short")), r.getAs[Long]("bin_tokens")))
      .toSet
    // n=6 after drops; ranks desc: 1->100, 2->90, 3->80 | short: 4->25, 5->20, 6->10
    // complements: r1+r6 (100+10=110 fits), r2+r5 (90+20=110 fits),
    // r3+r4 (80+25=105 fits)
    assert(bins == Set(
      (1L, Some(6L), 110L), (2L, Some(5L), 110L), (3L, Some(4L), 105L)))

    // shrink ctx to 100: r1 pair 100+10 > 100 -> both bin alone
    val tight = Packing.packPaired(df, col("lang"), col("toks"), col("id"), 100L)
    val members = tight.select(explode(array(col("id_long"), col("id_short"))))
      .na.drop().as[Long].collect().sorted
    assert(members.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "every surviving doc lands in exactly one bin")
    val single1 = tight.filter(col("id_long") === 1L).collect()(0)
    assert(single1.getAs[Int]("n_docs") == 1 &&
      single1.getAs[Long]("bin_tokens") == 100L)
    val single6 = tight.filter(col("id_long") === 6L).collect()(0)
    assert(single6.getAs[Int]("n_docs") == 1 &&
      single6.getAs[Long]("bin_tokens") == 10L)
    // bin ids unique per stratum
    assert(tight.groupBy("stratum", "bin_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("pitJoin: half-open intervals, pre-history facts keep nulls") {
    val changes = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 3L),
      (2L, "X", 15L, 5L)).toDF("k", "v", "t", "uid")
    val dim = Scd.type2(changes, col("k"), col("v"), col("t"),
      Seq(col("t"), col("uid")))
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 19L),
      (103L, 1L, 20L), (104L, 1L, 99L), (105L, 3L, 50L))
      .toDF("fid", "k", "t")
    val got = Scd.pitJoin(facts, col("k"), col("t"), dim)
      .select(col("fid"), col("pit_value")).collect()
      .map(r => r.getAs[Long]("fid") -> Option(r.getAs[String]("pit_value")))
      .toMap
    assert(got(100L).isEmpty, "fact before first version -> null")
    assert(got(101L).contains("A"), "boundary fact t=valid_from matches")
    assert(got(102L).contains("A"))
    assert(got(103L).contains("B"), "t=valid_to rolls to the next version")
    assert(got(104L).contains("B"), "open current version matches")
    assert(got(105L).isEmpty, "unknown key keeps its row (left join)")
    assert(got.size == 6)
  }

  test("chi2Drift: identical mix -> zero terms; new category visible with den 0") {
    val df = (Seq.fill(30)(("a", false)) ++ Seq.fill(30)(("a", true)) ++
      Seq.fill(10)(("b", false)) ++ Seq.fill(10)(("b", true)) ++
      Seq.fill(7)(("new", true))).toDF("cat", "cur")
    val got = DataQuality.chi2Drift(df, col("cat"), col("cur"))
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[String]("chi2_num").toLong,
          r.getAs[String]("chi2_den").toLong))
      .toMap
    // totals: ref 40, cur 47. identical-mix would need n_cur*40 == n_ref*47
    val (_, _, numA, denA) = got("a")
    assert(numA == (30L * 40 - 30L * 47) * (30L * 40 - 30L * 47))
    assert(denA == 30L * 47 * 40)
    val (nr, nc, _, denNew) = got("new")
    assert(nr == 0 && nc == 7 && denNew == 0,
      "brand-new category surfaces as a row with den 0, not a silent drop")
  }

  test("modularity: two triangles + bridge = hand-computed 35/196 per side") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("id", "community")
    val got = GraphOps.modularity(edges, assign).collect()
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("intra_edges"), r.getAs[Long]("degree"),
          r.getAs[String]("q_num").toLong,
          r.getAs[String]("q_den").toLong))
      .toMap
    // m=7; each side: intra=3, degree=7 (2+2+3); q_num=4*7*3-49=35; den=196
    assert(got(0L) == (3L, 7L, 35L, 196L))
    assert(got(1L) == (3L, 7L, 35L, 196L))
    // Q = sum(num)/den = 70/196 ~ 0.357 — positive, as it must be for
    // a partition aligned with the dense halves
    assert(35L + 35L > 0)
  }

  test("modularity rejects an assignment that misses an endpoint") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val assign = Seq((1L, 0L)).toDF("id", "community")
    assertThrows[IllegalArgumentException] {
      GraphOps.modularity(edges, assign)
    }
  }

  test("softDedupWeights: cluster sizes on normalized text, exact gate") {
    val docs = Seq(
      (1L, "hello  world"), (2L, "hello world"), (3L, "Hello World "),
      (4L, "unique doc")).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "text", "doc_id")
      .select(col("doc_id"), col("cluster_n"), col("weight_bp")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_n"), r.getAs[Long]("weight_bp"))).toMap
    assert(got(1L) == (3L, 3333L) && got(2L) == (3L, 3333L) &&
      got(3L) == (3L, 3333L), "case/whitespace variants share a cluster")
    assert(got(4L) == (1L, 10000L), "singleton keeps full weight")
    assert(got.size == 4, "soft dedup drops nothing")
  }
}
