package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused signed random projection: `outDim` output coordinates
  * p_j = sum_i sign(j,i) * q24(v_i) over a `dim`-element float/double
  * vector, with the deterministic +-1 matrix supplied by the caller
  * (splitmix64-derived at PLAN time — [[graft.ops.Similarity.projSign]]).
  *
  * Replaces the unrolled form (outDim x dim `element_at` add/subtract
  * column terms): the unroll is semantically identical but generates
  * O(outDim*dim) Java source per operator — ~4 s of janino compile at
  * 16x64 and past the 64KB method limit at real embedding widths
  * (16x768). This expression is TWO nested primitive loops over a
  * reference-object sign matrix: constant-size generated code at any
  * dimensionality, same integers (property-spec'd).
  *
  * Null semantics mirror the unrolled `element_at` form: null input
  * array, any null element, or fewer than `dim` elements -> null output
  * (in the unrolled form each p_j sums every element, so one null/missing
  * element nulled every output); extra elements beyond `dim` are ignored.
  */
case class SignedProjection(child: Expression, dim: Int, outDim: Int,
    signs: IndexedSeq[Long]) extends UnaryExpression {
  require(dim >= 1 && outDim >= 1 && signs.length == outDim * dim,
    s"sign matrix must be outDim*dim = ${outDim * dim} entries")

  // IndexedSeq, not Array: case-class equality over an Array field is
  // reference equality, which breaks semanticEquals-based machinery
  // (subexpression elimination, plan matching) for identical projections.
  // Codegen and eval index a flat primitive array built once per operator.
  @transient private lazy val signArr: Array[Long] = signs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "signed_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"signed_projection requires array<float|double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < dim) return null
    val acc = new Array[Long](outDim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val q = math.floor(x * 16777216.0 + 0.5).toLong
      var j = 0
      while (j < outDim) { acc(j) += signArr(j * dim + i) * q; j += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signArr, "long[]")
    val a = ctx.freshName("arr"); val acc = ctx.freshName("acc")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val q = ctx.freshName("q"); val bad = ctx.freshName("bad")
    val getter =
      if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    ev.copy(code =
      code"""
        ${cg.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${cg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${cg.value};
          if ($a.numElements() >= $dim) {
            long[] $acc = new long[$outDim];
            boolean $bad = false;
            for (int $i = 0; $i < $dim; $i++) {
              if ($a.isNullAt($i)) { $bad = true; break; }
              long $q = (long) java.lang.Math.floor($getter * 1.6777216E7D + 0.5D);
              for (int $j = 0; $j < $outDim; $j++) {
                $acc[$j] += $signsRef[$j * $dim + $i] * $q;
              }
            }
            if (!$bad) {
              ${ev.isNull} = false;
              ${ev.value} =
                new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
            }
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
