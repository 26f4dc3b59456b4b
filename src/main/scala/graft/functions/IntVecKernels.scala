package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, LongType}

/** Fused single-pass kernels for the exact integer distance discipline
  * (see [[graft.functions.q24Vec]] / [[intCosRankKey]] for the math and
  * the DECIMAL(38,0) budget analysis — these expressions compute the
  * IDENTICAL integers, pinned by property specs against the
  * compositional forms).
  *
  * Why they exist: the compositional Column forms evaluate interpreted
  * higher-order lambdas (`aggregate(zip_with(...))`) with per-element
  * boxing, and the three-limb DECIMAL(38,0) long division duplicates its
  * subtrees, so on a per-candidate-pair hot path (ANN scoring: every
  * query x candidate) the 64-element dot/norm lambdas re-evaluate
  * 10-20x per pair. Each kernel here is ONE primitive loop per pair
  * inside whole-stage codegen — quantize, dot and norms together — with
  * only the final (metadata-sized) 128-bit reduction in `BigInteger`.
  * Same [[CosineSim]] pattern that already fixed the double-cosine path.
  *
  * Input contract (all three): `array<float|double>` inputs are
  * q24-quantized inline (`floor(x * 2^24 + 0.5)` per element — exactly
  * [[q24Vec]], one IEEE multiply+add+floor, fold-free);
  * `array<bigint>` inputs are taken as ALREADY-quantized components.
  * The two sides may mix kinds. Budget is the caller's, unchanged:
  * |q| <= 2^25 per component, dim <= 64 keeps every long accumulator
  * under 2^57.
  *
  * Null semantics mirror the compositional forms exactly (property-
  * spec'd): null array, length mismatch, or null element -> null.
  */
object IntVecKernels {
  final val E12: BigInteger = BigInteger.valueOf(1000000000000L)

  /** sign(dot) * floor(dot^2 * 10^12 / (na*nb)) — the identical integer
    * the three-limb base-10^4 DECIMAL(38,0) long division of
    * [[graft.functions.intCosRankKey]] produces (non-negative operands,
    * so floor == the decimal `div`'s truncation; Cauchy–Schwarz bounds
    * the magnitude at 10^12). Caller guarantees na > 0 and nb > 0. */
  def rankKey(dot: Long, na: Long, nb: Long): Long = {
    val n0 = BigInteger.valueOf(dot).multiply(BigInteger.valueOf(dot))
    val d = BigInteger.valueOf(na).multiply(BigInteger.valueOf(nb))
    val mag = n0.multiply(E12).divide(d).longValueExact()
    if (dot < 0) -mag else mag
  }

  /** Exact `cosine >= tn/td` over quantized components — the identical
    * cross-multiplied DECIMAL(38,0) test of
    * [[graft.functions.intCosineGte]] (squaring valid once dot >= 0;
    * zero vectors -> false). tn, td <= 500 per the caller's budget. */
  def cosGte(dot: Long, na: Long, nb: Long, tn: Long, td: Long): Boolean =
    dot >= 0 && na > 0 && nb > 0 && {
      BigInteger.valueOf(dot).multiply(BigInteger.valueOf(dot))
        .multiply(BigInteger.valueOf(td * td))
        .compareTo(BigInteger.valueOf(tn * tn)
          .multiply(BigInteger.valueOf(na)).multiply(BigInteger.valueOf(nb))) >= 0
    }
}

/** Element-kind plumbing shared by the three kernels: each input is an
  * array of float, double, or (already-quantized) long; the per-element
  * load-and-quantize is resolved ONCE at bind/codegen time, so the hot
  * loop has no per-element branches. */
trait QuantizedVecKernel { self: BinaryExpression =>

  protected def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|bigint> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  /** 0 = float (quantize), 1 = double (quantize), 2 = long (as-is). */
  protected def kindOf(e: Expression): Int =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case DoubleType => 1
      case LongType => 2
    }

  @transient protected lazy val leftKind: Int = kindOf(left)
  @transient protected lazy val rightKind: Int = kindOf(right)

  /** Interpreted-path element load: quantized long component i. */
  protected final def qElem(a: ArrayData, kind: Int, i: Int): Long = kind match {
    case 0 => math.floor(a.getFloat(i).toDouble * 16777216.0 + 0.5).toLong
    case 1 => math.floor(a.getDouble(i) * 16777216.0 + 0.5).toLong
    case _ => a.getLong(i)
  }

  /** Codegen element load — the same arithmetic, emitted as straight-line
    * Java with the getter picked at codegen time. */
  protected final def qElemCode(arr: String, kind: Int, i: String): String = kind match {
    case 0 => s"(long) java.lang.Math.floor((double) $arr.getFloat($i) * 1.6777216E7D + 0.5D)"
    case 1 => s"(long) java.lang.Math.floor($arr.getDouble($i) * 1.6777216E7D + 0.5D)"
    case _ => s"$arr.getLong($i)"
  }
}

/** Fused [[graft.functions.intCosRankKey]] over raw or pre-quantized
  * vectors: one loop computes dot, |a|^2, |b|^2 on q24 components, then
  * one 128-bit reduction yields sign(dot) * floor(cos^2 * 10^12) —
  * BIGINT, monotone in cosine at 1e-12 cos^2 resolution, bit-identical
  * to the three-limb decimal form (property-spec'd). */
case class IntCosRankKey(left: Expression, right: Expression)
    extends BinaryExpression with QuantizedVecKernel {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_cos_rank_key"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = qElem(a, leftKind, i); val y = qElem(b, rightKind, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else java.lang.Long.valueOf(IntVecKernels.rankKey(dot, na, nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx); val rg = right.genCode(ctx)
    val a = ctx.freshName("aArr"); val b = ctx.freshName("bArr")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val bad = ctx.freshName("nullElem")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${lg.isNull} && !${rg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            long $dot = 0L; long $na = 0L; long $nb = 0L;
            boolean $bad = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              long $x = ${qElemCode(a, leftKind, i)};
              long $y = ${qElemCode(b, rightKind, i)};
              $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
            }
            if (!$bad && $na != 0L && $nb != 0L) {
              ${ev.isNull} = false;
              ${ev.value} = graft.functions.IntVecKernels.rankKey($dot, $na, $nb);
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused [[graft.functions.intCosineGte]]: the exact integer
  * `cosine(a,b) >= tn/td` threshold test as one loop + one 128-bit
  * comparison. Zero-norm vectors -> false (cosine undefined -> no
  * match); null array / length mismatch / null element -> null —
  * identical to the compositional conjunction (property-spec'd). */
case class IntCosGte(left: Expression, right: Expression, tn: Int, td: Int)
    extends BinaryExpression with QuantizedVecKernel {
  require(tn > 0 && td > 0 && tn <= 500 && td <= 500,
    s"rational threshold $tn/$td outside the exact-decimal budget")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "int_cos_gte"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = qElem(a, leftKind, i); val y = qElem(b, rightKind, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Boolean.valueOf(
      IntVecKernels.cosGte(dot, na, nb, tn.toLong, td.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx); val rg = right.genCode(ctx)
    val a = ctx.freshName("aArr"); val b = ctx.freshName("bArr")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val bad = ctx.freshName("nullElem")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${lg.isNull} && !${rg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            long $dot = 0L; long $na = 0L; long $nb = 0L;
            boolean $bad = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              long $x = ${qElemCode(a, leftKind, i)};
              long $y = ${qElemCode(b, rightKind, i)};
              $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
            }
            if (!$bad) {
              ${ev.isNull} = false;
              ${ev.value} = graft.functions.IntVecKernels.cosGte(
                $dot, $na, $nb, ${tn.toLong}L, ${td.toLong}L);
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused [[graft.functions.intSqDist]]: exact integer squared-L2 over
  * quantized components as one primitive loop — pure long arithmetic,
  * no 128-bit tail (the caller's budget keeps the sum under 2^57). */
case class IntSqDist(left: Expression, right: Expression)
    extends BinaryExpression with QuantizedVecKernel {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_sq_dist"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = qElem(a, leftKind, i) - qElem(b, rightKind, i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx); val rg = right.genCode(ctx)
    val a = ctx.freshName("aArr"); val b = ctx.freshName("bArr")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val acc = ctx.freshName("acc"); val bad = ctx.freshName("nullElem")
    val d = ctx.freshName("d")
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${lg.isNull} && !${rg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            long $acc = 0L;
            boolean $bad = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              long $d = ${qElemCode(a, leftKind, i)} - ${qElemCode(b, rightKind, i)};
              $acc += $d * $d;
            }
            if (!$bad) {
              ${ev.isNull} = false;
              ${ev.value} = $acc;
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
