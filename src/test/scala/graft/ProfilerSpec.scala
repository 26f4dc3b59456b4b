package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Profiler
import graft.functions.cosineSimilarity
import graft.functions.MinHashAgg.minhashAgg

/** Profiler exact-vs-approx paths + the null-element / type-check hardening
  * from the round-1 advice list. */
class ProfilerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private val profCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  test("exact profile matches direct exact counts and has no Expand") {
    val got = Profiler.profile(orders, profCols, exact = true)
      .orderBy("column_name").collect()
    assert(got.length == profCols.size)
    val n = orders.count()
    for (r <- got) {
      val c = r.getAs[String]("column_name")
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") ==
        orders.filter(col(c).isNull).count())
      assert(r.getAs[Long]("n_distinct") ==
        orders.filter(col(c).isNotNull).select(c).distinct().count(), s"n_distinct($c)")
      assert(r.getAs[String]("min_val") ==
        orders.agg(min(col(c)).cast("string")).head.getString(0))
      assert(r.getAs[String]("max_val") ==
        orders.agg(max(col(c)).cast("string")).head.getString(0))
    }
    // the scale property: no multi-countDistinct Expand in the exact plan
    val plan = Profiler.profile(orders, profCols, exact = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "exact profile must not use Expand")
  }

  test("approx profile (default) has no Expand and sane estimates") {
    val df = Profiler.profile(orders, profCols)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    val got = df.collect().map(r =>
      r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    val exactK = orders.select("o_orderkey").distinct().count()
    // HLL++ default rsd = 5%
    assert(math.abs(got("o_orderkey") - exactK).toDouble / exactK < 0.1)
    assert(got("o_orderstatus") == 3) // tiny cardinality is exact under HLL
  }

  test("exact distinct treats -0.0 and 0.0 as one value and binary by bytes") {
    // -0.0 vs 0.0: COUNT(DISTINCT) semantics (SQL engines, including the
    // DuckDB oracle) treat them as equal; the string images differ, so the
    // exact pass must normalize before casting
    val d = Seq(-0.0, 0.0, 1.5, Double.NaN).toDF("x")
    val gotD = Profiler.profile(d, Seq("x"), exact = true).collect().head
    assert(gotD.getAs[Long]("n_distinct") == 3L, "-0.0 and 0.0 must collapse; NaN counts once")
    // binary: a UTF-8 string cast collapses distinct invalid byte
    // sequences; hex() must keep them apart
    val b = Seq(Array[Byte](-1, -2), Array[Byte](-3, -4), Array[Byte](-1, -2))
      .toDF("bin")
    val gotB = Profiler.profile(b, Seq("bin"), exact = true).collect().head
    assert(gotB.getAs[Long]("n_distinct") == 2L, "distinct byte strings must stay distinct")
  }

  test("profiling the same column twice does not fan out the exact join") {
    val got = Profiler.profile(orders, Seq("o_orderkey", "o_orderkey"), exact = true)
      .collect()
    assert(got.length == 2, s"one output row per requested column, got ${got.length}")
    val exactK = orders.select("o_orderkey").distinct().count()
    assert(got.forall(_.getAs[Long]("n_distinct") == exactK))
  }

  test("cosine_sim returns null on null array element instead of reading 0.0") {
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0)),
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(cosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0), "null element must yield null, not a 0.0-padded result")
  }

  test("minhash_agg rejects a non-bigint child at analysis time") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("g", "s")
    val e = intercept[Exception] {
      df.groupBy("g").agg(minhashAgg(col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("minhash_agg") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }
}
