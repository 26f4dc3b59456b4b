package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 surface: the fused integer vector kernels
  * ([[graft.functions.IntCosRankKey]] / [[graft.functions.IntCosGte]] /
  * [[graft.functions.IntSqDist]]) pinned bit-identical — including null
  * semantics — to the compositional decimal/lambda forms they replace on
  * the ANN hot paths. */
class Round10OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Random float vectors plus every edge shape the compositional forms
    * have defined semantics for: negative components (negative dots),
    * zero vectors, a null array, a null element, a length mismatch,
    * near-parallel pairs (rank-key ties at the 1e-12 resolution), and
    * exact duplicates (cos = 1 boundary). */
  private def pairFrame() = {
    val rnd = new scala.util.Random(42)
    def vec(dim: Int): Seq[java.lang.Float] =
      Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextDouble() * 2 - 1).toFloat))
    val base = (1 to 200).map { i =>
      (i.toLong, vec(16), vec(16))
    }
    val dup = vec(16)
    val nearDup = dup.updated(0, java.lang.Float.valueOf(dup.head * 1.0000001f))
    val zero = Seq.fill(16)(java.lang.Float.valueOf(0f))
    val edge = Seq(
      (1001L, dup, dup),                       // cosine exactly 1
      (1002L, dup, nearDup),                   // near-tie
      (1003L, dup, dup.map(x => java.lang.Float.valueOf(-x))), // cosine -1
      (1004L, zero, dup),                      // zero left norm
      (1005L, dup, zero),                      // zero right norm
      (1006L, zero, zero),                     // both zero
      (1007L, null, dup),                      // null array
      (1008L, dup, vec(8)),                    // length mismatch
      (1009L, dup.updated(3, null.asInstanceOf[java.lang.Float]), dup)) // null element
    (base ++ edge).toDF("id", "a", "b")
  }

  test("fused IntCosRankKey is null-safe-equal to the three-limb decimal " +
      "form on random vectors and every edge shape") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val df = pairFrame()
      .withColumn("ref", intCosRankKey(q24Vec(col("a")), q24Vec(col("b"))))
      .withColumn("fused", intCosRankKeyFused(col("a"), col("b")))
    val bad = df.filter(!(col("ref") <=> col("fused")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
    // the decimal form's IntegralDivide yields LongType — the fused key
    // must keep the exact same ordering type, not a decimal
    assert(df.schema("fused").dataType ==
      org.apache.spark.sql.types.LongType)
    // sanity on the magnitudes the bit-equality rides on: an exact
    // duplicate pair keys at +10^12, an antiparallel pair at -10^12
    val byId = df.select("id", "fused").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1001L).contains(1000000000000L))
    // q24(-x) is not exactly -q24(x) (floor(v+0.5) rounds half toward
    // +inf), so the antiparallel key sits within one resolution step of
    // -10^12 rather than exactly on it — in BOTH forms, bit-identically
    assert(byId(1003L).exists(k => k.asInstanceOf[Long] <= -999999999990L))
    assert(byId(1006L).isEmpty && byId(1007L).isEmpty && byId(1008L).isEmpty)
  }

  test("fused IntCosRankKey accepts pre-quantized bigint arrays and mixed " +
      "kinds, matching the decimal form over the same quantized inputs") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val df = pairFrame()
      .withColumn("qa", q24Vec(col("a"))).withColumn("qb", q24Vec(col("b")))
    val both = df
      .withColumn("ref", intCosRankKey(col("qa"), col("qb")))
      .withColumn("fused_ll", intCosRankKeyFused(col("qa"), col("qb")))
      .withColumn("fused_mix", intCosRankKeyFused(col("a"), col("qb")))
    val bad = both.filter(!(col("ref") <=> col("fused_ll")) ||
      !(col("ref") <=> col("fused_mix")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  test("fused IntCosGte is null-safe-equal to the compositional " +
      "conjunction across thresholds, on raw and quantized inputs") {
    import graft.functions.{intCosineGte, intCosineGteFused, q24Vec}
    for ((tn, td) <- Seq((95, 100), (1, 100), (100, 100), (1, 2))) {
      val df = pairFrame()
        .withColumn("ref", intCosineGte(q24Vec(col("a")), q24Vec(col("b")), tn, td))
        .withColumn("fused", intCosineGteFused(col("a"), col("b"), tn, td))
        .withColumn("fused_q",
          intCosineGteFused(q24Vec(col("a")), q24Vec(col("b")), tn, td))
      val bad = df.filter(!(col("ref") <=> col("fused")) ||
        !(col("ref") <=> col("fused_q")))
      assert(bad.isEmpty, s"tn=$tn td=$td: " +
        bad.collect().take(5).mkString("\n"))
    }
    intercept[IllegalArgumentException] {
      graft.functions.intCosineGteFused(col("a"), col("b"), 501, 100)
    }
  }

  test("fused IntSqDist is null-safe-equal to the zip_with/aggregate form " +
      "on raw and quantized inputs") {
    import graft.functions.{intSqDist, intSqDistFused, q24Vec}
    val df = pairFrame()
      .withColumn("ref", intSqDist(q24Vec(col("a")), q24Vec(col("b"))))
      .withColumn("fused", intSqDistFused(col("a"), col("b")))
      .withColumn("fused_q", intSqDistFused(q24Vec(col("a")), q24Vec(col("b"))))
    val bad = df.filter(!(col("ref") <=> col("fused")) ||
      !(col("ref") <=> col("fused_q")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  test("fused kernels survive the interpreted (non-codegen) path with " +
      "identical results") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = pairFrame()
        .withColumn("ref", intCosRankKey(q24Vec(col("a")), q24Vec(col("b"))))
        .withColumn("fused", intCosRankKeyFused(col("a"), col("b")))
      val bad = df.filter(!(col("ref") <=> col("fused")))
      assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
