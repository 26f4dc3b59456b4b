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
  * spec'd): for [[IntCosRankKey]]/[[IntSqDist]], null array, length
  * mismatch, or null element -> null; [[IntCosGte]] replicates the full
  * three-valued And of its conjunction (a zero-norm side -> FALSE even
  * alongside a null/mismatched other side).
  */
object IntVecKernels {
  final val E12: BigInteger = BigInteger.valueOf(1000000000000L)

  /** Quantized component load shared by the kernels' static helpers:
    * kind 0 = float (q24-quantize), 1 = double (quantize), 2 = long
    * (already quantized). */
  def qLoad(a: ArrayData, kind: Int, i: Int): Long = kind match {
    case 0 => math.floor(a.getFloat(i).toDouble * 16777216.0 + 0.5).toLong
    case 1 => math.floor(a.getDouble(i) * 16777216.0 + 0.5).toLong
    case _ => a.getLong(i)
  }

  /** Squared norm of one side, or Long.MinValue when a null element
    * makes it SQL-null (a norm is a sum of squares, never negative, so
    * the sentinel cannot collide with a real value). */
  def normOrNull(a: ArrayData, kind: Int): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return Long.MinValue
      val x = qLoad(a, kind, i)
      s += x * x
      i += 1
    }
    s
  }

  /** Dot product when the caller has already established equal lengths
    * and no null elements (via [[normOrNull]] on both sides). */
  def dotStrict(a: ArrayData, ka: Int, b: ArrayData, kb: Int): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += qLoad(a, ka, i) * qLoad(b, kb, i)
      i += 1
    }
    s
  }

  /** The full three-valued `dot >= 0 AND na > 0 AND nb > 0 AND cmp`
    * over possibly-null sides — EXACTLY Spark's And over the
    * compositional conjunction, including the corners where one
    * conjunct is FALSE while another is NULL (e.g. a zero-norm side
    * with a length mismatch -> FALSE, not NULL): 0 = false, 1 = true,
    * 2 = null. `l`/`r` may be SQL-null. */
  def cosGteTri(l: ArrayData, lKind: Int, r: ArrayData, rKind: Int,
      tn: Long, td: Long): Byte = {
    val na = if (l == null) Long.MinValue else normOrNull(l, lKind)
    val nb = if (r == null) Long.MinValue else normOrNull(r, rKind)
    val dotNull = na == Long.MinValue || nb == Long.MinValue ||
      l.numElements() != r.numElements()
    val dot = if (dotNull) 0L else dotStrict(l, lKind, r, rKind)
    if ((na != Long.MinValue && na == 0L) ||
        (nb != Long.MinValue && nb == 0L) ||
        (!dotNull && dot < 0L)) 0
    else if (na == Long.MinValue || nb == Long.MinValue || dotNull) 2
    else if (cosGte(dot, na, nb, tn, td)) 1 else 0
  }

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
  * to the three-limb decimal form (property-spec'd).
  *
  * This kernel and [[IntSqDist]] keep their accumulation loops INLINE
  * (in eval and in the generated Java) rather than routing through the
  * static helpers [[IntCosGte]] uses: their strict null semantics
  * (anything null -> null) admit a single fused pass, and they sit on
  * the hottest per-pair paths (every ANN top-k candidate) where one
  * loop vs. three helper passes is the measured difference. */
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
  * `cosine(a,b) >= tn/td` threshold test in one pass per pair.
  *
  * Null semantics are the full THREE-VALUED And of the compositional
  * conjunction `dot >= 0 && na > 0 && nb > 0 && cmp` — including the
  * corners where one conjunct is FALSE while another is NULL: a
  * zero-norm side forces FALSE even when the other side is a null
  * array, has a null element, or mismatches in length (Spark's
  * `null && false` is false). Property-spec'd against the Column form
  * over every combined edge. The loops live in the static
  * [[IntVecKernels]] helpers shared between eval and codegen. */
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
    val tri = IntVecKernels.cosGteTri(
      if (l == null) null else l.asInstanceOf[ArrayData], leftKind,
      if (r == null) null else r.asInstanceOf[ArrayData], rightKind,
      tn.toLong, td.toLong)
    if (tri == 2) null else java.lang.Boolean.valueOf(tri == 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx); val rg = right.genCode(ctx)
    val tri = ctx.freshName("tri")
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        byte $tri = graft.functions.IntVecKernels.cosGteTri(
          ${lg.isNull} ? null : ${lg.value}, $leftKind,
          ${rg.isNull} ? null : ${rg.value}, $rightKind,
          ${tn.toLong}L, ${td.toLong}L);
        boolean ${ev.isNull} = ($tri == (byte) 2);
        boolean ${ev.value} = ($tri == (byte) 1);
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
