package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins and aggregations.
  *
  * Decision rule (pinned by `PlanGuardSpec`'s "AQE skew-join" test):
  *
  *   1. Dim broadcastable → broadcast join; skew can't exist by
  *      construction. Always prefer this.
  *   2. Non-broadcastable dim, join output consumed WITHOUT reusing the
  *      key distribution (write, rebalance, different-key downstream) →
  *      AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`) splits the
  *      hot reduce partition at runtime, zero code. Note AQE splits at
  *      mapper-block granularity — it needs many mappers to bite.
  *   3. Join feeding an agg/window ON THE JOIN KEY → AQE declines (the
  *      split would break the hash distribution the downstream operator
  *      reuses; `forceOptimizeSkewedJoin` overrides but pays an extra
  *      shuffle of the post-fanout join OUTPUT — the largest
  *      intermediate). [[saltedJoin]] wins here: the salt splits the hot
  *      key in the FIRST shuffle and only reduced partials re-shuffle.
  *   4. Skewed aggregation with no join at all → AQE has nothing to
  *      split; [[saltedCountSum]]'s two-phase salt is the fix.
  */
object Skew {

  /** Deterministic salt in [0, factor) derived from the whole row — no
    * RNG, so retried tasks produce identical output. */
  private def salt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(factor))

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt; the small side is replicated `factor` times with every salt
    * value; the join key becomes (key, salt), splitting each hot key's
    * rows across `factor` reducers. Inner-join semantics are preserved
    * exactly (each big row joins its one salt replica of the small side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", salt(big, factor))
    val s = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    b.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * count/sum per (key, salt) then final combine per key. Spark's hash
    * aggregate already does map-side partials; this additionally splits a
    * single hot key across reducers in the FIRST shuffle, bounding any one
    * task's input. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      factor: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$valueCol"))
  }
}
