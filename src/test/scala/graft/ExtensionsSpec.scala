package graft


import org.scalatest.funsuite.AnyFunSuite

import graft.functions.seqRatio
import org.apache.spark.sql.functions._

/** seq_ratio as a native expression + GraftExtensions (SQL registration
  * and the threshold-1 rewrite rule). */
class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("seq_ratio column expression computes difflib ratio under codegen") {
    import spark.implicits._
    val df = Seq(("CTS-VS", "CTS-V"), ("abc", "abc"), (null, "x"),
      (null: String, null: String)).toDF("a", "b")
    val got = df.select(seqRatio($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(got(0) - 0.9090909090909091) < 1e-12)
    assert(got(1) == 1.0)
    assert(got(2) == -1.0) // one-null -> mismatch sentinel
    assert(got(3) == 1.0)  // both-null -> match
  }

  test("seq_ratio callable from SQL via extensions") {
    val r = spark.sql("SELECT seq_ratio('Ssierraa', 'Sierra') AS r")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 0.8571428571428571) < 1e-12)
  }

  test("threshold-1 comparisons are rewritten to null-safe equality") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "b"), (null, "b")).toDF("a", "b")
    val q = df.filter(seqRatio($"a", $"b") >= lit(1.0))
    val optimized = q.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("seq_ratio"), s"rewrite did not fire:\n$optimized")
    assert(q.count() == 1)
    val q2 = df.filter(seqRatio($"a", $"b") < lit(1.0))
    assert(q2.count() == 2)
    assert(!q2.queryExecution.optimizedPlan.toString().contains("seq_ratio"))
  }
}
