package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Native Catalyst expression for cosine similarity over two dense
  * vectors (`array<float>` / `array<double>`), with whole-stage
  * codegen (SURVEY §4.2.1: the preference order is built-ins →
  * native `Expression` → UDF; this is the one hot-path scalar where
  * the built-in composition pays a real tax).
  *
  * The higher-order-function form (`aggregate(zip_with(...))`,
  * graft.functions.VectorFunctions.cosine) materializes an
  * intermediate product array per row and walks the vectors three
  * times; this expression is one fused loop, no allocation — the
  * difference is ~3× on the ANN brute-force scan and it keeps the
  * scan inside one WholeStageCodegen span.
  *
  * Semantics are bit-identical to the HOF form on null-free input:
  * sequential left-to-right double accumulation, `dot / (sqrt(na) *
  * sqrt(nb))`, null when either norm is 0 (and on any null element,
  * matching the null-propagation of the HOF pipeline).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double>, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna > 0.0 && snb > 0.0) dot / (sna * snb) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        boolean ${ev.isNull}_loop = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull}_loop = true; break; }
          double $xi = (double) $x.$xGet($i);
          double $yi = (double) $y.$yGet($i);
          $dot += $xi * $yi;
          $na += $xi * $xi;
          $nb += $yi * $yi;
        }
        double ${ev.value}_na = Math.sqrt($na);
        double ${ev.value}_nb = Math.sqrt($nb);
        if (${ev.isNull}_loop || ${ev.value}_na <= 0.0 || ${ev.value}_nb <= 0.0) {
          ${ev.isNull} = true;
          ${ev.value} = 0.0;
        } else {
          ${ev.value} = $dot / (${ev.value}_na * ${ev.value}_nb);
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Row-level kernel for [[HyperplaneSig]]; top-level object gives the
  * generated code a static call target.
  */
object VectorExprOps {
  /** Hyperplane LSH bucket + L2 norm in ONE pass over the vector.
    * Pseudo-weights replicate `pmod(hash(seed, p, i), 1e6)/1e6 - 0.5`
    * exactly (murmur3 int chain, initial seed 42), and both the
    * per-plane projection sums and the squared-norm accumulate in
    * element order — bit-identical to the posexplode + aggregate form,
    * which kept each vector's elements in array order within one
    * partition. Null elements contribute nothing (sum skips nulls);
    * an empty vector returns null (the explode form dropped it).
    */
  def hyperplaneSig(arr: ArrayData, isFloat: Boolean, planes: Int,
                    seed: Int): InternalRow = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    val n = arr.numElements()
    if (n == 0) return null
    val h0 = hashInt(seed, 42)
    val planeSeeds = new Array[Int](planes)
    var p = 0
    while (p < planes) { planeSeeds(p) = hashInt(p, h0); p += 1 }
    val projs = new Array[Double](planes)
    var nsq = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        var q = 0
        while (q < planes) {
          val h = hashInt(i, planeSeeds(q))
          val w = (((h % 1000000) + 1000000) % 1000000).toDouble / 1000000.0 - 0.5
          projs(q) += x * w
          q += 1
        }
        nsq += x * x
      }
      i += 1
    }
    var bucket = 0L
    p = 0
    while (p < planes) {
      if (projs(p) >= 0.0) bucket |= (1L << p)
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket, math.sqrt(nsq)))
  }

  /** DuckDB-replayable variant: the pseudo-weight for (plane q,
    * element i) is derived from the integer stream
    * `h = ((q*1000003 + i) * 2654435761) % (2^31-1)`,
    * `w = (h % 1e6)/1e6 - 0.5` — every intermediate stays below 2^61,
    * so the oracle replays it with checked BIGINT arithmetic (the
    * production murmur3 chain is not expressible in SQL). Accumulation
    * order, null handling, empty-vector null, bucket packing and norm
    * are identical to [[hyperplaneSig]]. `seed` is intentionally not
    * part of the formula — one canonical replay family.
    */
  def hyperplaneSigPoly(arr: ArrayData, isFloat: Boolean,
                        planes: Int): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val projs = new Array[Double](planes)
    var nsq = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        var q = 0
        while (q < planes) {
          val h = ((q.toLong * 1000003L + i.toLong) * 2654435761L) % 2147483647L
          val w = (h % 1000000L).toDouble / 1000000.0 - 0.5
          projs(q) += x * w
          q += 1
        }
        nsq += x * x
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (projs(p) >= 0.0) bucket |= (1L << p)
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket, math.sqrt(nsq)))
  }
}

/** Native one-pass hyperplane LSH signature + norm (see
  * VectorExprOps.hyperplaneSig). Output: struct(bucket: long,
  * nrm: double); null for empty vectors.
  */
case class HyperplaneSig(child: Expression, planes: Int, seed: Int,
                         poly: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("nrm", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if planes >= 1 && planes <= 63 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig needs planes in [1, 63], got $planes")
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig expects array<float|double>, got ${dt.simpleString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    if (poly) VectorExprOps.hyperplaneSigPoly(input.asInstanceOf[ArrayData], elemIsFloat, planes)
    else VectorExprOps.hyperplaneSig(input.asInstanceOf[ArrayData], elemIsFloat, planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = elemIsFloat
    nullSafeCodeGen(ctx, ev, c => {
      val call =
        if (poly) s"graft.plans.VectorExprOps.hyperplaneSigPoly($c, $f, $planes)"
        else s"graft.plans.VectorExprOps.hyperplaneSig($c, $f, $planes, $seed)"
      s"""
      ${ev.value} = $call;
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-API entry point for the native expression. */
  def cosineFast(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CosineSimilarity(
      ColumnBridge.toExpressionLazy(a), ColumnBridge.toExpressionLazy(b)))

  /** Column-API entry point for the native hyperplane signature
    * (seeded xorshift pseudo-weights — the production family).
    */
  def hyperplaneSigFast(v: Column, planes: Int, seed: Int): Column =
    ColumnBridge.toColumn(HyperplaneSig(ColumnBridge.toExpressionLazy(v), planes, seed,
      poly = false))

  /** DuckDB-replayable polynomial-weight variant. A separate entry
    * point (not a flag) because the poly family has NO seed — a caller
    * passing one would silently get identical signatures for every
    * seed value.
    */
  def hyperplaneSigReplayable(v: Column, planes: Int): Column =
    ColumnBridge.toColumn(HyperplaneSig(ColumnBridge.toExpressionLazy(v), planes, seed = 0,
      poly = true))
}
