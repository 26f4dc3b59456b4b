package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, Expression, ExpressionInfo, GreaterThanOrEqual, LessThan, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{SequenceMatcherGte, SequenceMatcherRatio}

/** Rewrites literal-threshold fuzzy comparisons into their cheapest exact
  * form (SURVEY §4 custom-work item 2):
  *
  *  - `seq_ratio(a,b) >= 1.0` is true iff the strings are equal (or both
  *    null — ratio 1.0 by reference semantics), so the quadratic ratio
  *    computation becomes `a <=> b`. The shipped reference config uses
  *    exactly `threshold: 1` (`config.yaml:11`), making this the common
  *    case.
  *  - `seq_ratio(a,b) >= t` / `< t` for t < 1 becomes the guarded
  *    [[SequenceMatcherGte]]: difflib's O(1)/O(n) upper bounds reject
  *    non-matches before the O(n^2) matcher runs. Sound because the
  *    bounds dominate the ratio and a ratio comparison is a total order
  *    (never NaN), so `< t` ≡ `!(>= t)`.
  */
object SimilarityThresholdRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(SequenceMatcherRatio(a, b), Literal(d: Double, DoubleType)) =>
      if (d == 1.0) EqualNullSafe(a, b) else SequenceMatcherGte(a, b, d)
    case LessThan(SequenceMatcherRatio(a, b), Literal(d: Double, DoubleType)) =>
      if (d == 1.0) Not(EqualNullSafe(a, b)) else Not(SequenceMatcherGte(a, b, d))
  }
}

/** Session extensions: `seq_ratio` available from SQL + the threshold-1
  * optimizer rule. Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("seq_ratio"),
      new ExpressionInfo(classOf[SequenceMatcherRatio].getName, "seq_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"seq_ratio expects 2 arguments, got ${args.length}")
        SequenceMatcherRatio(args(0), args(1))
      }))
    e.injectOptimizerRule(_ => SimilarityThresholdRewrite)
  }
}
