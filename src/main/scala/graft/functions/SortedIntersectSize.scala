package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection size of two SORTED, duplicate-free integer arrays by a
  * single merge pass.
  *
  * `size(array_intersect(a, b))` is semantically right but builds a
  * hash set and an output array PER ROW (measured ~5 us/pair on 43-int
  * arrays — 2.4 s over the 444k candidate pairs of the sf0.1 similarity
  * join, the whole verification budget). When both inputs are already
  * sorted and distinct — which a set-similarity join guarantees by
  * construction (`sort_array(collect_list(...))` over distinct
  * shingle ranks) — the overlap count is one allocation-free two-pointer
  * sweep of ~|a|+|b| comparisons, emitted here as straight-line Java
  * inside whole-stage codegen.
  *
  * SORTEDNESS IS THE CALLER'S CONTRACT: on unsorted input the count is
  * simply wrong (this is the classic sorted-merge of any textbook, not
  * a general intersect). Null array -> null; null elements are not
  * permitted (checked: null element -> null result, never a silent 0).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  private def elemOk(t: DataType) = t match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires array<int|bigint> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  @transient private lazy val leftIsInt =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType
  @transient private lazy val rightIsInt =
    right.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) null
    else SortedIntersectSize.compute(l.asInstanceOf[ArrayData], leftIsInt,
      r.asInstanceOf[ArrayData], rightIsInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val a = ctx.freshName("aArr"); val b = ctx.freshName("bArr")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val cnt = ctx.freshName("cnt"); val bad = ctx.freshName("nullElem")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    def getter(arr: String, isInt: Boolean, idx: String) =
      if (isInt) s"(long) $arr.getInt($idx)" else s"$arr.getLong($idx)"
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${lg.isNull} && !${rg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
          int $na = $a.numElements();
          int $nb = $b.numElements();
          long $cnt = 0L;
          boolean $bad = false;
          int $i = 0; int $j = 0;
          while ($i < $na && $j < $nb) {
            if ($a.isNullAt($i) || $b.isNullAt($j)) { $bad = true; break; }
            long $x = ${getter(a, leftIsInt, i)};
            long $y = ${getter(b, rightIsInt, j)};
            if ($x == $y) { $cnt++; $i++; $j++; }
            else if ($x < $y) { $i++; } else { $j++; }
          }
          if (!$bad) {
            ${ev.isNull} = false;
            ${ev.value} = $cnt;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Interpreted twin of the generated loop. */
  def compute(a: ArrayData, aInt: Boolean, b: ArrayData, bInt: Boolean): java.lang.Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var cnt = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = if (aInt) a.getInt(i).toLong else a.getLong(i)
      val y = if (bInt) b.getInt(j).toLong else b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(cnt)
  }
}
