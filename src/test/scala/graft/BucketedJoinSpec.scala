package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: two tables bucketed by the join key join
  * WITHOUT a shuffle — the physical plan must contain no Exchange. This is
  * the pre-partitioning strategy for repeated large-large joins at scale
  * (pay the shuffle once at write time, never at read time). */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join without exchange") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() == l.count()) // referential integrity: every line joins
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
