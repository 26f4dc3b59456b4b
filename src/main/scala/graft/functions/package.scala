package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Column-level building blocks of the engine.
  *
  * Everything here is either a plain Catalyst expression tree (codegen'd,
  * pushdown-friendly) or — only where Spark has no built-in equivalent —
  * a Scala UDF. At 100 TB the expression forms matter: they stay inside
  * whole-stage codegen and let Catalyst prune/push to the scan.
  */
package object functions {

  /** Composite key: each key column null-replaced with "0", cast to string,
    * joined with '_' — reference semantics (`running_validation.py:471-476`
    * builds `CAST(COALESCE(CAST(col AS VARCHAR),'0') AS VARCHAR)` chains
    * joined by `|| '_' ||` per SQL dialect). One dialect-free expression.
    */
  def compositeKey(keyCols: Seq[String]): Column =
    concat_ws("_", keyCols.map(k => coalesce(col(k).cast(StringType), lit("0"))): _*)

  def compositeKeyCols(keyCols: Seq[Column]): Column =
    concat_ws("_", keyCols.map(k => coalesce(k.cast(StringType), lit("0"))): _*)

  /** difflib `SequenceMatcher.ratio()` as a UDF (reference F1 operator,
    * `running_validation.py:306-316`). Null semantics handled by callers or
    * via [[fuzzyRatioNullSafe]]. UDF (not codegen) is acceptable: it is only
    * evaluated post-join on the (small) candidate-diff set when
    * threshold < 1; the threshold >= 1 fast path never calls it.
    */
  val fuzzyRatio = udf((a: String, b: String) => DifflibRatio.ratio(a, b))

  /** ratio with reference null semantics: both-null -> 1.0 (match),
    * one-null -> -1.0 (fails every threshold). */
  val fuzzyRatioNullSafe = udf((a: String, b: String) => DifflibRatio.ratioNullSafe(a, b))

  /** Bridge: Catalyst Expression <-> Column (Spark 4 classic API). */
  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  def columnExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** difflib ratio as a native codegen expression (preferred over the UDF
    * on hot paths); reference null semantics baked in. */
  def seqRatio(a: Column, b: Column): Column =
    exprColumn(SequenceMatcherRatio(columnExpr(a), columnExpr(b)))

  /** `seqRatio(a, b) >= threshold`, guarded by difflib's cheap upper
    * bounds (length, then character multiset) so the O(n^2) matcher only
    * runs on pairs that could still clear the threshold — the production
    * form of the fuzzy threshold predicate. */
  def seqRatioGte(a: Column, b: Column, threshold: Double): Column =
    exprColumn(SequenceMatcherGte(columnExpr(a), columnExpr(b), threshold))

  /** Dot product of two equal-length numeric arrays, as a pure expression
    * (zip_with + aggregate -> codegen, no UDF). Arrays cast to double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two numeric array columns; null/zero-norm ->
    * null. Fused single-pass native expression (see [[CosineSim]]) —
    * markedly faster than the compositional zip_with/aggregate form. */
  def cosineSimilarity(a: Column, b: Column): Column =
    exprColumn(CosineSim(columnExpr(a), columnExpr(b)))
}
