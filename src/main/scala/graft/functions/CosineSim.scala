package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two numeric array columns.
  *
  * The compositional form (`aggregate(zip_with(...))` for dot product and
  * both norms) evaluates three higher-order-function chains per row —
  * interpreted lambdas with per-element boxing, outside whole-stage
  * codegen. This expression generates one primitive `for` loop per row
  * over `ArrayData` (no boxing, no virtual `eval` dispatch), computing
  * dot, |a|^2 and |b|^2 together INSIDE whole-stage codegen — the
  * surrounding operator's generated Java calls straight into the loop.
  * On 64-dim float embeddings this is the difference between the ANN
  * operators being compute-bound and lambda-dispatch-bound.
  *
  * Null/empty/zero-norm/length-mismatch -> null; a null ELEMENT also
  * yields null (never silently read as 0.0 from the unsafe buffer).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) null
    else CosineSim.compute(l.asInstanceOf[ArrayData], leftIsFloat,
      r.asInstanceOf[ArrayData], rightIsFloat)
  }

  /** The fused loop, emitted as straight-line Java: the only difference
    * from [[CosineSim.compute]] is that the element getters are resolved
    * at CODEGEN time (`getFloat`/`getDouble` picked per input type), so
    * the hot loop has no per-element branches and no boxing. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val a = ctx.freshName("aArr"); val b = ctx.freshName("bArr")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val bad = ctx.freshName("nullElem")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    def getter(arr: String, isFloat: Boolean, idx: String) =
      if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lg.isNull} && !${rg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
          int $n = $a.numElements();
          if ($n == $b.numElements() && $n > 0) {
            double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
            boolean $bad = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              double $x = ${getter(a, leftIsFloat, i)};
              double $y = ${getter(b, rightIsFloat, i)};
              $dot += $x * $y;
              $na += $x * $x;
              $nb += $y * $y;
            }
            if (!$bad) {
              double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
              if ($denom > 0.0) {
                ${ev.isNull} = false;
                ${ev.value} = $dot / $denom;
              }
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** One fused pass: dot, |a|^2, |b|^2. Returns null (boxed) on length
    * mismatch or zero norm. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) java.lang.Double.valueOf(dot / denom) else null
  }
}
