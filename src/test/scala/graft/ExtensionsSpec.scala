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

  test("sub-1 threshold comparisons are rewritten to the guarded predicate") {
    import spark.implicits._
    // RDD-backed frame: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation and there'd be no predicate left to inspect
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      ("CTS-VS", "CTS-V"), ("Ssierraa", "Sierra"), (null, "b"),
      (null: String, null: String)), 2)).toDF("a", "b")
    // >= 0.9: the guarded form replaces ratio-then-compare...
    val q = df.filter(seqRatio($"a", $"b") >= lit(0.9))
    val opt = q.queryExecution.optimizedPlan.toString()
    assert(opt.contains("seq_ratio_gte"), s"guard rewrite did not fire:\n$opt")
    assert(!opt.contains("seq_ratio("), s"unguarded ratio survived:\n$opt")
    // ...with identical semantics (CTS pair .909 passes; both-null passes)
    assert(q.count() == 2)
    // < 0.9 is the negated guard — same truth table as ratio < t
    val q2 = df.filter(seqRatio($"a", $"b") < lit(0.9))
    assert(q2.queryExecution.optimizedPlan.toString().contains("seq_ratio_gte"))
    assert(q2.count() == 2) // Ssierraa (.857) + one-null (-1.0)
  }
}
