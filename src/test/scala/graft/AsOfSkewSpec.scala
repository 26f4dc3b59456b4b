package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsOf, Skew}

class AsOfSkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of backward join picks latest right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:00")), // exactly equal to a quote ts
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote
      (4L, "B", ts("2024-01-01 10:00:10"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:03"), 101.0),
      ("B", ts("2024-01-01 10:00:01"), 50.0)
    ).toDF("sym", "t", "px")
    val got = AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t",
        Seq("px" -> "quote_px", "t" -> "quote_t"))
      .orderBy("trade_id").collect()
    assert(got.map(r => Option(r.getAs[Any]("quote_px"))).toSeq ==
      Seq(Some(101.0), Some(100.0), None, Some(50.0)))
    assert(got(0).getAs[Timestamp]("quote_t") == ts("2024-01-01 10:00:03"))
  }

  test("as-of join keeps payload fields atomic when right values are null") {
    // the as-of row carries a NULL payload value: output must show that
    // null, not a resurrected value from an older right row
    val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t")
    val r = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(5.0)),
      ("A", ts("2024-01-01 10:00:05"), None) // latest prior row, null px
    ).toDF("sym", "t", "px")
    val got = AsOf.joinBackward(l, r, Seq("sym"), "t", "t",
        Seq("t" -> "r_t", "px" -> "r_px")).collect()(0)
    assert(got.getAs[Timestamp]("r_t") == ts("2024-01-01 10:00:05"))
    assert(got.isNullAt(got.fieldIndex("r_px")),
      s"stale px resurrected: ${got.getAs[Any]("r_px")}")
  }

  test("as-of join matches a naive range-join computation on real events") {
    val e = graft.streaming.StreamingOps.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val v = e.filter($"event_type" === "view").select($"user_id".as("vu"), $"ts".as("vts"), $"value")
    val got = AsOf.joinBackward(p, v.select($"vu".as("user_id"), $"vts".as("ts"), $"value"),
        Seq("user_id"), "ts", "ts", Seq("ts" -> "view_ts", "value" -> "view_value"))
      .select("event_id", "view_ts", "view_value")
    // naive oracle: max prior view ts per purchase, then its value
    val naive = p.join(v, p("user_id") === v("vu") && v("vts") <= p("ts"), "left_outer")
      .groupBy("event_id").agg(max("vts").as("view_ts"))
    val naiveVal = naive.join(v.select($"vts".as("view_ts"), $"value".as("view_value"), $"vu"),
        Seq("view_ts"), "left_outer")
      .join(p.select($"event_id", $"user_id"), Seq("event_id"))
      .filter($"vu".isNull || $"vu" === $"user_id")
      .select("event_id", "view_ts", "view_value")
    assert(got.count() == p.count())
    val diff = got.except(naiveVal).count()
    assert(diff == 0, s"as-of join disagrees with naive oracle on $diff rows")
  }

  test("salted join equals plain join on skewed data") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "v", "name")
    val salted = Skew.saltedJoin(big, small, "key", factor = 8)
      .select("key", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("salted count/sum equals plain aggregation") {
    val df = (1 to 10000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 50}", i.toDouble))
      .toDF("key", "x")
    val plain = df.groupBy("key").agg(count(lit(1)).as("n"), sum("x").as("sum_x"))
    val salted = Skew.saltedCountSum(df, "key", "x", factor = 8)
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}
