package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge

/** Shared row-level kernels for the native text expressions. A
  * top-level object gets Java static forwarders, so generated code
  * can call `graft.plans.TextExprOps.polyFingerprint(s)` directly.
  */
object TextExprOps {
  /** One-pass token-membership counts: tokenize with the exact split
    * call Spark's `split(str, "\\s+")` performs (Java regex, limit -1
    * — trailing empties kept, [""] on empty input), then count hits
    * per set. Returns (n_toks, hits_0, ..., hits_{k-1}) as a struct
    * row.
    */
  def wordSetCounts(s: UTF8String,
                    sets: Array[java.util.HashSet[String]]): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.split("\\s+", -1)
    val out = new Array[Any](sets.length + 1)
    out(0) = toks.length.toLong
    var i = 0
    while (i < sets.length) {
      var c = 0L
      var j = 0
      while (j < toks.length) {
        if (sets(i).contains(toks(j))) c += 1
        j += 1
      }
      out(i + 1) = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Polynomial rolling hash over Unicode code points: base 31,
    * mod 2^31-1 (keeps the accumulator < 2^36 — never overflows a
    * signed 64-bit int, so Spark, the oracle, and this kernel agree
    * bit-for-bit). Code-point iteration matches both the HOF form
    * (`ascii` is code-point-based) and DuckDB's `ord`.
    */
  def polyFingerprint(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Exact distinct character-n-gram count. Slicing is CODE-POINT
    * based (like `Column.substr` / DuckDB `substr`), so results match
    * the `array_distinct(transform(...substr...))` form on any input,
    * surrogates included.
    */
  def distinctShingleCount(s: UTF8String, n: Int): Int = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) 0
    else {
      val set = new java.util.HashSet[String]()
      var i = 0
      val last = cps.length - n
      while (i <= last) {
        set.add(new String(cps, i, n))
        i += 1
      }
      set.size
    }
  }

  /** Poly31 hash of `n` consecutive code points starting at `from` in
    * `cps`: the same base-31 mod 2^31-1 fold as [[polyFingerprint]],
    * restricted to one window. Shared by the replayable minhash /
    * simhash kernels below.
    */
  private def polyWindow(cps: Array[Int], from: Int, n: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < n) {
      acc = (acc * 31L + cps(from + j)) % 2147483647L
      j += 1
    }
    acc
  }

  /** DuckDB-replayable MinHash signature: window hashes are poly31
    * folds over code points (instead of XXH64 over bytes) and the k
    * affine mixes stay inside the mod-2^31-1 field — `(m*h + a) % p`
    * with m, a < p never exceeds 2^62, so the oracle's checked BIGINT
    * arithmetic replays it exactly (the production family's Long wrap
    * would overflow-error in DuckDB). Same windowing, same null
    * contract as [[minhashSig]].
    */
  def minhashSigPoly(s: UTF8String, n: Int,
                     mults: Array[Long], adds: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val nc = cps.length
    if (nc < n) return null
    val k = mults.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val lastW = nc - n
    var w = 0
    while (w <= lastW) {
      val h = polyWindow(cps, w, n)
      var j = 0
      while (j < k) {
        val v = (mults(j) * h + adds(j)) % 2147483647L
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Full MinHash signature in one zero-copy pass: for every
    * code-point window of length `n`, hash the underlying UTF-8 bytes
    * in place with Spark's own XXH64 (seed 42 — bit-identical to
    * `xxhash64(substr(s, i, n))`), then fold k affine mixes
    * `mults(j) * h + adds(j)` (Long wrap) into running signed mins.
    * Returns null when the string has no window (parity with the
    * explode form, where such documents produce no rows).
    *
    * Cost per document: O(bytes + windows × k) long ops, no
    * allocation beyond the offsets array and the k-long result —
    * the explode + aggregate form materializes one row per window
    * (O(len) rows × payload), pays an O(position) substring scan per
    * window, and shuffles the per-window rows into a 32-accumulator
    * hash aggregate.
    */
  def minhashSig(s: UTF8String, n: Int,
                 mults: Array[Long], adds: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nc = s.numChars()
    if (nc < n) return null
    val offsets = new Array[Int](nc + 1)
    var i = 0
    var b = 0
    while (i < nc) {
      offsets(i) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      i += 1
    }
    offsets(nc) = b
    val k = mults.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val baseObj = s.getBaseObject
    val baseOff = s.getBaseOffset
    val lastW = nc - n
    var w = 0
    while (w <= lastW) {
      val start = offsets(w)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(baseObj, baseOff + start, offsets(w + n) - start, 42L)
      var j = 0
      while (j < k) {
        val v = mults(j) * h + adds(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Distinct word n-grams of a token array in one pass: each window
    * of `n` tokens joined with a single space (bit-identical to
    * `concat_ws(" ", slice(toks, i+1, n))`), deduplicated with a hash
    * set, insertion order preserved (order is irrelevant downstream —
    * the consumer explodes into an inverted index). Returns an empty
    * array when there are fewer than `n` tokens.
    */
  def distinctWordGrams(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                        n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = arr.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    val last = m - n
    while (i <= last) {
      var j = 0
      while (j < n) {
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — same as concat_ws(" ", ...)
      seen.add(UTF8String.concatWs(UTF8String.fromString(" "), window: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** DuckDB-replayable SimHash: per shingle the poly31 code-point hash
    * (31 bits of entropy, so bit position b votes on hash bit b % 31 —
    * weaker spread than the murmur family, which is why this is the
    * oracle-replay family and not the production default). Vote
    * accumulation and packing are identical to [[simhash64]].
    */
  def simhash64Poly(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = polyFingerprint(s)
        var b = 0
        while (b < 64) {
          if (((h >> (b % 31)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** 64-bit SimHash of a shingle array in one pass: per element,
    * Spark's Murmur3 (seed 42, sign-extended to long — bit-identical
    * to `hash(s).cast("long")`), ±1 vote per bit position `i` on bit
    * `i % 32`, bit set when votes > 0. Null elements vote 0 (parity
    * with the explode_outer form); empty array → 0L.
    */
  def simhash64(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h: Long = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong
        var b = 0
        while (b < 64) {
          if (((h >> (b % 32)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** Native codegen'd form of the document fingerprint
  * (graft.functions.TextFunctions.fingerprintFrom): one fused loop
  * over the string, no per-character allocation. The HOF form
  * (`aggregate(transform(split(norm, "")), ...)`) materializes a
  * single-character string array and evaluates an interpreted lambda
  * per element — on a 2 KB document that is ~2000 allocations and
  * lambda dispatches per row vs. one static call here.
  * TextExpressionSpec proves bit-parity between the two forms.
  */
/** Native form of the token-membership scores behind language-ID and
  * stopword ratio: ONE tokenization of the (lowered, trimmed) text and
  * one membership probe per (token, set) against hash sets, instead of
  * K separate `split` + interpreted `filter(isInCollection)` passes
  * (language-ID ran 5 of them per row). Tokenization is the SAME
  * library call Spark's `split(str, "\\s+")` lowers to (Java regex
  * split, limit -1), so token boundaries — including the empty token a
  * leading tab produces and the [""]-on-empty-string case — are
  * bit-identical to the HOF form. TextExpressionSpec proves parity.
  */
case class WordSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(
    StructField("n_toks", LongType, nullable = false) +:
      sets.indices.map(i => StructField(s"c$i", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_set_counts expects string, got ${dt.simpleString}")
  }

  @transient private lazy val hashSets: Array[java.util.HashSet[String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[String]()
      ws.foreach(h.add)
      h
    }.toArray

  protected override def nullSafeEval(input: Any): Any =
    TextExprOps.wordSetCounts(input.asInstanceOf[UTF8String], hashSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refs = ctx.addReferenceObj("wordSets", hashSets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.TextExprOps.wordSetCounts($c, $refs);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint expects string, got ${dt.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextExprOps.polyFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprOps.polyFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native form of `size(charShinglesFrom(norm, n))` — counts distinct
  * character n-grams in one pass with a hash set instead of
  * materializing the shingle array through `transform` +
  * `array_distinct` (which allocates one UTF8String per position and
  * then deduplicates them a second time).
  */
case class DistinctShingleCount(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingle_count needs n >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingle_count expects string, got ${dt.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextExprOps.distinctShingleCount(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprOps.distinctShingleCount($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass MinHash signature (see TextExprOps.minhashSig).
  * Returns `array<long>` of `mults.length` min-hashes, or null when
  * the input is shorter than one window. `poly` selects the
  * DuckDB-replayable poly31 family (TextExprOps.minhashSigPoly);
  * default is the XXH64 production family.
  */
case class MinhashSignature(child: Expression, n: Int,
                            mults: Seq[Long], adds: Seq[Long],
                            poly: Boolean = false)
    extends UnaryExpression {

  // Seq fields keep case-class equality value-based (Expression
  // canonicalization compares constructor args); the kernel wants
  // primitive arrays, materialized once per task
  @transient private lazy val multsArr = mults.toArray
  @transient private lazy val addsArr = adds.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 && mults.length == adds.length && mults.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs n >= 1 and matching non-empty coefficient arrays")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${dt.simpleString}")
  }

  private def kernel: String = if (poly) "minhashSigPoly" else "minhashSig"

  protected override def nullSafeEval(input: Any): Any =
    if (poly) TextExprOps.minhashSigPoly(input.asInstanceOf[UTF8String], n, multsArr, addsArr)
    else TextExprOps.minhashSig(input.asInstanceOf[UTF8String], n, multsArr, addsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mults", multsArr, "long[]")
    val a = ctx.addReferenceObj("adds", addsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.TextExprOps.$kernel($c, $n, $m, $a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native distinct word n-grams over a token-array column (see
  * TextExprOps.distinctWordGrams).
  */
case class DistinctWordGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"distinct_word_grams needs n >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"distinct_word_grams expects array<string>, got ${dt.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextExprOps.distinctWordGrams(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprOps.distinctWordGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass SimHash over a shingle-array column (see
  * TextExprOps.simhash64). `poly` selects the DuckDB-replayable
  * poly31 family (TextExprOps.simhash64Poly).
  */
case class Simhash64(child: Expression, poly: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${dt.simpleString}")
  }

  private def kernel: String = if (poly) "simhash64Poly" else "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    if (poly) TextExprOps.simhash64Poly(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    else TextExprOps.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextExprOps.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column-API entry point for the native fingerprint. */
  def fingerprintFast(norm: Column): Column =
    ColumnBridge.toColumn(PolyFingerprint(ColumnBridge.toExpressionLazy(norm)))

  /** Column-API entry point for the native distinct-shingle count. */
  def distinctShingleCountFast(norm: Column, n: Int): Column =
    ColumnBridge.toColumn(DistinctShingleCount(ColumnBridge.toExpressionLazy(norm), n))

  /** Column-API entry point for the native one-pass MinHash signature. */
  def minhashSigFast(norm: Column, n: Int,
                     mults: Seq[Long], adds: Seq[Long],
                     poly: Boolean = false): Column =
    ColumnBridge.toColumn(MinhashSignature(ColumnBridge.toExpressionLazy(norm), n, mults, adds, poly))

  /** Column-API entry point for the native one-pass SimHash. */
  def simhash64Fast(shingles: Column, poly: Boolean = false): Column =
    ColumnBridge.toColumn(Simhash64(ColumnBridge.toExpressionLazy(shingles), poly))

  /** Column-API entry point for the native distinct word n-grams. */
  def distinctWordGramsFast(tokens: Column, n: Int): Column =
    ColumnBridge.toColumn(DistinctWordGrams(ColumnBridge.toExpressionLazy(tokens), n))

  /** Column-API entry point for the native token-membership counts.
    * `lowered` must already be the lowered/trimmed text (the caller
    * composes `lower(trim(text))` so those built-ins stay Catalyst's).
    */
  def wordSetCountsFast(lowered: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.toColumn(WordSetCounts(ColumnBridge.toExpressionLazy(lowered), sets))
}
