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

/** `seq_ratio(a, b) >= threshold` with difflib's cheap upper bounds tried
  * first ([[DifflibRatio.ratioGteNullSafe]]): the O(1) length bound and the
  * O(n) multiset bound reject most non-matching pairs before the O(n^2)
  * matcher runs — the guard difflib itself relies on, so adversarially long
  * value pairs can't stall a task. Exactly equivalent to the unguarded
  * comparison (the bounds are proven >= ratio; property-tested in
  * `DifflibRatioSpec`).
  *
  * This is the production form of the fuzzy threshold predicate
  * (`Validator.differs` Fuzzy(t<1)); `SimilarityThresholdRewrite` also
  * rewrites literal-threshold comparisons over [[SequenceMatcherRatio]]
  * into it, so SQL users of `seq_ratio(a,b) >= 0.9` get the guard too.
  */
case class SequenceMatcherGte(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "seq_ratio_gte requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "seq_ratio_gte"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    DifflibRatio.ratioGteNullSafe(
      if (l == null) null else l.asInstanceOf[UTF8String].toString,
      if (r == null) null else r.asInstanceOf[UTF8String].toString,
      threshold)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val cls = "graft.functions.DifflibRatio"
    ev.copy(
      code = code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.value} = $cls.ratioGteNullSafe(
          ${leftGen.isNull} ? null : ${leftGen.value}.toString(),
          ${rightGen.isNull} ? null : ${rightGen.value}.toString(),
          $threshold);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
