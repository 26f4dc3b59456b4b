package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape tests: every declared query runs on sf0.001 and the
  * entry point returns rows. The value-level oracle check runs via
  * Verify + DuckDB (driver harness / scripts/check_oracle.py). */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry also works under ANSI mode (driver smoke may use defaults)") {
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try assert(SparkEntry.entry(spark).count() > 0)
    finally spark.conf.set(key, prev)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs and has stable schema") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      // results the driver hashes must be non-degenerate for most queries
      val expectedNonEmpty = !Set("q_except", "t_minhash_pairs",
        "t_simhash_pairs", "t_ngram_jaccard", "t_embed_neardup").contains(name)
      if (expectedNonEmpty) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty && df.columns.distinct.length == df.columns.length)
    }
  }
}
