package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

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

  /** Per-component 2^24 quantization of a float/double array:
    * `floor(x*2^24 + 0.5)` per element, as `array<long>`. Each element is
    * ONE IEEE multiply + add + floor on a value with a 24-bit mantissa —
    * no fold, no accumulation order — so the result is bit-identical in
    * every engine and engine version. This is the entry point of the
    * integer distance discipline: quantize components FIRST, then do all
    * distance/assignment arithmetic in exact BIGINT (a double fold like
    * `list_dot_product` is NOT a cross-version invariant; a q24 grid is). */
  def q24Vec(v: Column): Column =
    transform(v, x =>
      floor(x.cast(DoubleType) * lit(16777216.0) + lit(0.5)).cast(LongType))

  /** Exact integer squared-L2 distance between two equal-length
    * `array<long>` columns (q24-quantized vectors): `sum((a_i-b_i)^2)` in
    * pure long arithmetic. Budget: |q| <= 2^25 per component and dim <=
    * 64 keeps the sum under 2^57 — no overflow, and the same literal
    * arithmetic in any engine. Associative integer sums are
    * order-independent, so partial aggregation can never perturb it. */
  def intSqDist(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Exact integer dot product of two `array<long>` columns. Same budget
    * discipline as [[intSqDist]] (<= 2^54 for q24 unit vectors). */
  def intDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Engine-exact `cosine(a,b) >= tn/td` over q24-quantized vectors, with
    * NO floating point anywhere: for tn,td > 0,
    * `dot/sqrt(na*nb) >= tn/td  <=>  dot >= 0 AND dot^2*td^2 >= tn^2*na*nb`
    * (squaring is valid once `dot >= 0`; na,nb > 0 for any nonzero
    * vector). The cross-multiplied comparison runs in DECIMAL(38,0):
    * with q24 unit-norm vectors dot^2 <= 2^108 ~ 3.2e32 and
    * tn^2*na*nb <= tn^2 * 2^108, so tn <= ~500 stays inside 38 digits —
    * callers quantize thresholds to 1/100 (tn <= 100). DuckDB mirrors
    * the identical test in HUGEINT. Zero vectors (na or nb = 0) -> false,
    * matching cosine-undefined -> no-match semantics. */
  /** Engine-exact cosine ORDER-BY key over q24-quantized vectors, with no
    * sqrt and no double fold anywhere: a single BIGINT monotone (to
    * documented resolution) in cosine(a,b). Construction: with
    * `dot = intDot(qa,qb)`, `D = intDot(qa,qa)*intDot(qb,qb)`,
    * `cos^2 = dot^2/D`; THREE base-10^4 long-division limbs of the exact
    * rational give `sign(dot) * floor(cos^2 * 10^12)`: sign-aware
    * squared cosine at 1e-12 resolution, every step exact integral
    * arithmetic in DECIMAL(38,0) (mirror in HUGEINT). Candidates closer
    * than 1e-12 in cos^2 compare equal — break ties by id for
    * determinism, exactly as the double-cosine rankings already do.
    *
    * Budget — why limbs of 10^4, not 10^6: with |x| <= 1 and dim <= 64,
    * dot^2 and D (and every long-division remainder, which is < D) are
    * <= 2^108 ~ 3.2e32; multiplying by a 10^4 limb base keeps every
    * intermediate <= 3.2e36 < 10^38-1, whereas a 10^6 base overflows
    * DECIMAL(38,0) at the top of the budget (3.2e38) and Spark's
    * non-ANSI decimal arithmetic would return silent nulls. This is the
    * standby for any Class 2b ranking whose measured margin comes back
    * thin (ORACLES.md); zero vectors yield null (cosine undefined). */
  def intCosRankKey(qa: Column, qb: Column): Column = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def idiv(a: Column, b: Column): Column =
      exprColumn(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        columnExpr(a), columnExpr(b)))
    val dot = intDot(qa, qb)
    val d = intDot(qa, qa).cast(dec) * intDot(qb, qb).cast(dec)
    val b = lit(10000L).cast(dec)
    val n0 = dot.cast(dec) * dot.cast(dec)
    val k1 = idiv(n0 * b, d)
    val r1 = n0 * b - k1.cast(dec) * d
    val k2 = idiv(r1 * b, d)
    val r2 = r1 * b - k2.cast(dec) * d
    val k3 = idiv(r2 * b, d)
    val mag = (k1 * lit(10000L) + k2) * lit(10000L) + k3
    when(d === 0, lit(null))
      .otherwise(when(dot < 0, -mag).otherwise(mag))
  }

  def intCosineGte(qa: Column, qb: Column, tn: Int, td: Int): Column = {
    require(tn > 0 && td > 0 && tn <= 500 && td <= 500,
      s"rational threshold $tn/$td outside the exact-decimal budget")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val dot = intDot(qa, qb)
    val na = intDot(qa, qa)
    val nb = intDot(qb, qb)
    dot >= 0 && na > 0 && nb > 0 &&
      dot.cast(dec) * dot.cast(dec) * lit(td.toLong * td).cast(dec) >=
        lit(tn.toLong * tn).cast(dec) * na.cast(dec) * nb.cast(dec)
  }

  /** Fused [[intCosRankKey]] — identical integers (property-spec'd in
    * Round10OpsSpec), ONE primitive loop per pair instead of the
    * interpreted `aggregate(zip_with(...))` lambdas re-evaluated 10-20x
    * by the three-limb decimal form's duplicated subtrees. Accepts raw
    * `array<float|double>` (q24-quantizes inline) or pre-quantized
    * `array<bigint>`; sides may mix. */
  def intCosRankKeyFused(a: Column, b: Column): Column =
    exprColumn(IntCosRankKey(columnExpr(a), columnExpr(b)))

  /** Fused [[intCosineGte]] — same exact threshold test, one loop. */
  def intCosineGteFused(a: Column, b: Column, tn: Int, td: Int): Column =
    exprColumn(IntCosGte(columnExpr(a), columnExpr(b), tn, td))

  /** Fused [[intSqDist]] — same exact integer, one loop; quantizes raw
    * float/double inputs inline so per-pair call sites skip the
    * interpreted `transform` of [[q24Vec]] entirely. */
  def intSqDistFused(a: Column, b: Column): Column =
    exprColumn(IntSqDist(columnExpr(a), columnExpr(b)))

  /** Cosine similarity of two numeric array columns; null/zero-norm ->
    * null. Fused single-pass native expression (see [[CosineSim]]) —
    * markedly faster than the compositional zip_with/aggregate form. */
  def cosineSimilarity(a: Column, b: Column): Column =
    exprColumn(CosineSim(columnExpr(a), columnExpr(b)))

  /** Overlap count of two SORTED duplicate-free integer arrays — one
    * allocation-free merge sweep in whole-stage codegen (see
    * [[SortedIntersectSize]] for the contract and the measured gap vs
    * `size(array_intersect(...))`). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    exprColumn(SortedIntersectSize(columnExpr(a), columnExpr(b)))
}
