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
