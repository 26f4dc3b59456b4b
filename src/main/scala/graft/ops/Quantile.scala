package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic HDR-histogram-style quantile sketch (cf. HdrHistogram /
  * DDSketch — public designs) over non-negative integral values, built
  * ENTIRELY from codegen'd integer expressions:
  *
  *  - bucket index = exact bit math (`length(bin(v))` is floor(log2 v)+1
  *    — a string length, no libm anywhere, so an external engine replays
  *    every bucket bit-for-bit);
  *  - values below 2^m get exact singleton buckets; above, buckets keep
  *    m mantissa bits -> relative error of the reported quantile bound
  *    <= 2^-m;
  *  - the sketch itself is a plain `groupBy(keys, bucket).count()`:
  *    map-side partial aggregation makes it distributive by construction,
  *    and the shuffle carries only (keys, bucket, count) — ~64*2^m rows
  *    per key max, regardless of input size. Quantile extraction then
  *    runs on sketch-sized data.
  *
  * This is the always-mergeable shape that survives 100 TB: no sorted
  * collection, no per-value state, no approx RNG (fully deterministic,
  * unlike sampling sketches).
  */
object Quantile {

  /** Exact floor(log2(v)) + 1 for v >= 1 — via binary-string length. */
  private def bitLen(vCol: String) = s"length(bin($vCol))"

  /** HDR bucket index; v <= 0 clamps to bucket 0 (callers with signed
    * domains should shift first). Monotone in v; exact below 2^m. */
  def bucketIdx(vCol: String, m: Int): Column = {
    val p = 1L << m
    expr(s"""CASE WHEN $vCol <= 0 THEN 0
      WHEN ${bitLen(vCol)} - 1 < $m THEN $vCol
      ELSE (${bitLen(vCol)} - 1 - $m + 1) * $p
           + (shiftright($vCol, CAST(${bitLen(vCol)} - 1 - $m AS INT)) - $p)
      END""").cast("long")
  }

  /** Inclusive lower bound of a bucket — the reported quantile value. */
  def bucketLb(idxCol: String, m: Int): Column = {
    val p = 1L << m
    expr(s"""CASE WHEN $idxCol < $p THEN $idxCol
      ELSE shiftleft(($idxCol % $p) + $p, CAST(($idxCol div $p) - 1 AS INT))
      END""").cast("long")
  }

  /** Build the sketch: one row per (keys, bucket) with its count. */
  def sketch(df: DataFrame, keys: Seq[String], vCol: String, m: Int): DataFrame =
    df.groupBy(keys.map(col) :+ bucketIdx(vCol, m).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Corpus-relative threshold filter — the "drop the bottom quartile"
    * curation step: keep rows whose non-negative integral `vCol` is at or
    * above the sketch quantile `qPpm` of the WHOLE input. The threshold
    * comes from the HDR sketch (deterministic integer bucket math, so an
    * external engine replays the exact cut), is one row, and broadcasts
    * onto a scan-side filter.
    *
    * Scale: stats pass = the distributive sketch (shuffle carries only
    * (bucket, count)); filter pass = one scan with a broadcast 1-row
    * join. Two scans of `df` are inherent to corpus-relative thresholds —
    * at 100 TB persist the input column or reuse a precomputed sketch
    * table between the passes. */
  def filterAtQuantile(df: DataFrame, vCol: String, qPpm: Long,
      m: Int = 7): DataFrame = {
    val thr = quantiles(sketch(df, Nil, vCol, m), Nil, Seq(("q", qPpm)), m)
      .select(col("q_value").as("__thr"))
    df.crossJoin(broadcast(thr)).filter(col(vCol) >= col("__thr")).drop("__thr")
  }

  /** Quantiles from a sketch. `qs` are (label, ppm) pairs, e.g.
    * ("p50", 500000); rank = ceil(q * N) in pure integer arithmetic, the
    * reported value the lower bound of the first bucket whose cumulative
    * count reaches the rank. */
  def quantiles(sk: DataFrame, keys: Seq[String],
      qs: Seq[(String, Long)], m: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cum = sk
      .withColumn("cum", sum("cnt").over(byKey.orderBy("bucket")))
      .withColumn("total", sum("cnt").over(byKey))
    val qdf = qs.toDF("q_label", "q_ppm")
    cum.crossJoin(broadcast(qdf))
      .withColumn("rank", expr("(q_ppm * total + 999999) div 1000000"))
      .where(col("cum") >= col("rank"))
      .groupBy(keys.map(col) :+ col("q_label"): _*)
      .agg(min("bucket").as("bucket"), min("rank").as("rank"))
      .withColumn("q_value", bucketLb("bucket", m))
  }
}
