package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Queries.Q

/** Batch 27: deterministic random projection — the
  * dimensionality-reduction half of the hyperplane-LSH kernel
  * surfaced as a catalog operator.
  */
object Queries27 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val rpPlanes = 8

  /** One projection component: Σ_i v[i] · w(q,i) with the replayable
    * polynomial weight stream
    * w(q,i) = (((q·1000003 + i) · 2654435761) mod (2³¹−1) mod 10⁶)/10⁶ − 0.5
    * — the exact stream `dd_embedding_neardup` signs; accumulation is
    * an ordered HOF fold, so the IEEE doubles are bit-identical in
    * both engines.
    */
  private def projCol(q: Int): Column =
    aggregate(
      sequence(lit(0), size(col("embedding")) - 1),
      lit(0.0),
      (acc, i) => acc +
        element_at(col("embedding"), i + 1).cast("double") *
        ((((lit(q.toLong) * 1000003L + i.cast("long")) * 2654435761L)
          % 2147483647L % 1000000L).cast("double") / 1000000.0 - 0.5))

  /** Johnson–Lindenstrauss-style random projection 64 → 8 dims with a
    * DETERMINISTIC pseudo-random matrix (no RNG state, no broadcast
    * weight array — the weight is a closed-form function of (plane,
    * index), so every engine and every executor materializes the same
    * matrix). Scan-local: one codegen'd HOF fold per output dim, no
    * shuffle, no UDF. The cheap-ANN / sketching front half of the
    * hyperplane kernel: signing these 8 values reproduces
    * `dd_embedding_neardup`'s buckets exactly.
    */
  val vec_random_projection = Q(
    (s, dir) => T_(s, dir, "embeddings")
      .filter(size(col("embedding")) > 0)
      .select(col("vec_id") +: col("label") +:
        (0 until rpPlanes).map(q => projCol(q).as(s"p_$q")): _*),
    Some {
      val projs = (0 until rpPlanes).map { q =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(embedding) + 1), i ->
               CAST(embedding[i] AS DOUBLE) *
               (CAST((($q * 1000003 + (i - 1)) * 2654435761) % 2147483647 % 1000000 AS DOUBLE) / 1000000.0 - 0.5))),
             (a, b) -> a + b) AS p_$q"""
      }.mkString(",\n        ")
      s"""SELECT vec_id, label,
        $projs
      FROM embeddings WHERE len(embedding) > 0"""
    })

  val all: Map[String, Q] = Map(
    "vec_random_projection" -> vec_random_projection,
  )
}
