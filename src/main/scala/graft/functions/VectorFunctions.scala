package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float/double>` columns, built on the
  * higher-order functions `zip_with` / `aggregate` so everything stays
  * inside codegen (no UDF, no driver-side loop). Used by the
  * similarity-search and embedding-dedup operators.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na > 0.0 && nb > 0.0, d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }), lit(0.0), (acc, v) => acc + v))

  /** Per-vector int8 scalar quantization (the SQ8 storage format of
    * large embedding stores): each dimension maps to
    * `floor((x - mn) / (mx - mn) * 255 + 0.5) - 128` with the
    * per-vector (mn, mx) kept alongside for dequantization — 4x
    * smaller at rest, and the rounding is an explicit floor(+0.5)
    * (deterministic HALF_UP) rather than `round`, whose tie behavior
    * differs between engines. A constant vector (mx == mn) quantizes
    * to all -128 and dequantizes exactly to mn. Returns
    * struct(mn, mx, q: array<int>).
    *
    * PERF: as a single composed Column, mn/mx sit INSIDE the
    * per-element lambda and interpreted HOFs re-evaluate them per
    * element — O(d^2) per vector. Fine for ad-hoc SQL on short
    * vectors; bulk paths should use
    * [[graft.operators.Similarity.sq8Store]], which materializes
    * mn/mx as columns first (same arithmetic, linear).
    */
  def quantizeInt8(vec: Column): Column = {
    val v = transform(vec, _.cast("double"))
    val mn = array_min(v)
    val mx = array_max(v)
    val q = transform(v, x =>
      when(mx > mn,
        floor((x - mn) / (mx - mn) * 255.0 + 0.5).cast("int") - 128)
        .otherwise(lit(-128)))
    struct(mn.as("mn"), mx.as("mx"), q.as("q"))
  }

  /** Inverse of [[quantizeInt8]]: x' = mn + (q + 128) / 255 * (mx - mn).
    * Reconstruction error is bounded by half a quantization step,
    * (mx - mn) / 510 — asserted per vector in the `vec_quantize_int8`
    * query and the spec.
    */
  def dequantizeInt8(mn: Column, mx: Column, q: Column): Column =
    transform(q, qi =>
      mn + (qi.cast("double") + 128.0) / 255.0 * (mx - mn))

  /** Random-hyperplane signature for LSH / SimHash over embeddings:
    * one sign bit per pseudo-random hyperplane, packed into a long.
    * The hyperplane weights are a deterministic hash of
    * (planeIdx, dimIdx) — reproducible across Spark and tests without
    * shipping a weight matrix.
    */
  def hyperplaneSig(vec: Column, planes: Int, seed: Int = 42): Column = {
    val bits = (0 until planes).map { p =>
      // deterministic pseudo-weight in [-0.5, 0.5): hash of (seed, p, i)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => {
          val h = pmod(hash(lit(seed), lit(p), i), lit(1000000))
          v.cast("double") * (h.cast("double") / 1000000.0 - 0.5)
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
