package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replayable Bloom-filter build/probe over integer keys — the
  * shuffle-pruning primitive behind runtime bloom joins, surfaced as
  * an auditable operator pair (build a bitmap table, probe it, and
  * COUNT what it pruned vs. what it let through falsely).
  *
  * Shape at scale: the build side is one shuffle of 2·|keys| (word,
  * mask) pairs collapsing to at most [[Words]] rows (8 KiB of
  * bitmap), which then re-enters the plan as a BROADCAST — the probe
  * side scans once and never shuffles. That is exactly what Spark's
  * own `spark.sql.optimizer.runtime.bloomFilter` injects; having it
  * as an explicit operator makes the false-positive rate measurable
  * against ground truth (see `j12_bloom_prune`), which the built-in
  * never exposes.
  *
  * Determinism: positions come from the engine's multiplicative hash
  * pair ([[Sampling.detHash]] / [[Sampling.detHash2]]), the word is
  * `pos div 63` and the mask `shiftleft(1, pos mod 63)` — 63 usable
  * bits per signed long word keeps every mask positive in both
  * engines, and `bit_or` is order-independent, so the bitmap (and
  * every probe verdict) is bit-identical across partitionings and
  * engines.
  */
object Bloom {

  /** Bitmap geometry: 1024 words x 63 bits = 64512 bits. */
  val Words = 1024
  val BitsPerWord = 63
  val Bits: Long = Words.toLong * BitsPerWord

  // pmod, not %: Spark's % is sign-preserving, so a negative key
  // would produce a negative position → negative shiftleft counts →
  // garbage masks. pmod pins positions into [0, Bits) for ANY long
  // (identical to % for the non-negative keys all current call sites
  // feed; [[posSql]] mirrors the same wrap) — cheaper than a per-row
  // guard pass on the probe side.
  private def posCols(k: Column): Seq[Column] =
    Seq(pmod(Sampling.detHash(k), lit(Bits)),
      pmod(Sampling.detHash2(k), lit(Bits)))

  /** Build the bitmap table `(word INT, bm BIGINT)` over the DISTINCT
    * values of `key` (any integral column — positions are pmod-pinned
    * into range, so negative keys are well-defined). At most
    * [[Words]] rows.
    */
  def build(df: DataFrame, key: Column): DataFrame =
    df.select(key.cast("long").as("k")).distinct()
      .select(explode(array(posCols(col("k")): _*)).as("pos"))
      .select(expr("CAST(pos div 63 AS INT)").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bm"))

  /** Probe: adds a `bloom_pass` boolean to `df` for `key`, testing
    * both hash positions against `bits` (broadcast twice — it is at
    * most [[Words]] rows). A false `bloom_pass` is a GUARANTEED
    * non-member; a true one is a candidate that still needs the real
    * join.
    */
  def probe(bits: DataFrame, df: DataFrame, key: Column): DataFrame = {
    // the scratch columns live briefly on the CALLER's frame — a
    // caller column with one of these names would be silently
    // clobbered (and dropped!) by the probe, so refuse loudly
    val scratch = Seq("_p1", "_p2", "_w1", "_m1", "_w2", "_m2",
      "_bm1", "_bm2")
    val clashes = df.columns.filter(scratch.contains)
    require(clashes.isEmpty,
      s"Bloom.probe reserves scratch columns ${scratch.mkString(", ")}; " +
        s"input already has ${clashes.mkString(", ")} — rename before probing")
    require(!df.columns.contains("bloom_pass"),
      "Bloom.probe emits `bloom_pass`; input already has that column")
    val withPos = df.withColumn("_p1", posCols(key.cast("long"))(0))
      .withColumn("_p2", posCols(key.cast("long"))(1))
      .withColumn("_w1", expr("CAST(_p1 div 63 AS INT)"))
      .withColumn("_m1", expr("shiftleft(CAST(1 AS BIGINT), CAST(_p1 % 63 AS INT))"))
      .withColumn("_w2", expr("CAST(_p2 div 63 AS INT)"))
      .withColumn("_m2", expr("shiftleft(CAST(1 AS BIGINT), CAST(_p2 % 63 AS INT))"))
    val b1 = broadcast(bits.select(col("word").as("_w1"), col("bm").as("_bm1")))
    val b2 = broadcast(bits.select(col("word").as("_w2"), col("bm").as("_bm2")))
    withPos
      .join(b1, Seq("_w1"), "left")
      .join(b2, Seq("_w2"), "left")
      .withColumn("bloom_pass",
        expr("(coalesce(_bm1, 0) & _m1) != 0 AND (coalesce(_bm2, 0) & _m2) != 0"))
      .drop(scratch: _*)
  }

  /** The two hash/position expressions as DuckDB SQL over column
    * expression `k`, for oracle replay. */
  def posSql(k: String): Seq[String] = {
    val h1 = Sampling.detHashSql(k)
    val h2 = Sampling.detHashSql(h1)
    // ((h % B) + B) % B = Spark's pmod (DuckDB % is sign-preserving)
    Seq(s"(((($h1) % $Bits) + $Bits) % $Bits)",
      s"(((($h2) % $Bits) + $Bits) % $Bits)")
  }
}
