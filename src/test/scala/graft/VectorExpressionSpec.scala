package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorFunctions => V}
import graft.plans.VectorExpressions.cosineFast

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine is bit-identical to the HOF form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("b")))
      .filter($"ia" < $"ib").limit(2000)
    val diff = pairs.select(
      V.cosine($"a", $"b").as("hof"),
      cosineFast($"a", $"b").as("native"))
      .filter(not($"hof" <=> $"native")).count()
    assert(diff == 0)
  }

  test("native cosine edge cases: zero vector, null input") {
    val df = Seq(
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f, 2.0f))),
      (Some(Array(3.0f, 4.0f)), Some(Array(3.0f, 4.0f)))
    ).toDF("a", "b")
    val out = df.select(cosineFast($"a", $"b").as("c")).collect().map(_.get(0))
    assert(out(0) == null)
    assert(out(1) == null)
    assert(math.abs(out(2).asInstanceOf[Double] - 1.0) < 1e-15)
  }

  test("codegen path actually compiles (no fallback) and SQL registration works") {
    // interpreted vs codegen give identical results
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    emb.createOrReplaceTempView("emb_v")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => graft.plans.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib,
           cosine_similarity(a.embedding, b.embedding) c
         FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""")
    val viaCol = emb.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("b")))
      .filter($"ia" < $"ib")
      .select($"ia", $"ib", cosineFast($"a", $"b").as("c"))
    assert(viaSql.orderBy("ia", "ib").collect().toSeq ==
      viaCol.orderBy("ia", "ib").collect().toSeq)
  }
}
