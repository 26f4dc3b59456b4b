package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing difflib's `SequenceMatcher.ratio`
  * (reference F1 operator, `running_validation.py:306-316`) — no Scala-UDF
  * boxing/serialization on the hot path; emits a static call inside
  * whole-stage codegen.
  *
  * Null semantics are the *reference's*, not SQL's: both-null -> 1.0
  * (match), one-null -> -1.0 (fails any threshold in [0,1]). Hence
  * `nullable = false` with manual null handling instead of `nullSafeEval`.
  */
case class SequenceMatcherRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "seq_ratio requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "seq_ratio"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    SequenceMatcherRatio.compute(
      if (l == null) null else l.asInstanceOf[UTF8String].toString,
      if (r == null) null else r.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val cls = "graft.functions.SequenceMatcherRatio"
    ev.copy(
      code = code"""
        ${leftGen.code}
        ${rightGen.code}
        double ${ev.value} = $cls.compute(
          ${leftGen.isNull} ? null : ${leftGen.value}.toString(),
          ${rightGen.isNull} ? null : ${rightGen.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SequenceMatcherRatio {
  /** Static entry point used by both interpreted eval and generated code. */
  def compute(a: String, b: String): Double = DifflibRatio.ratioNullSafe(a, b)
}
