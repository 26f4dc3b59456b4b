package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (validity) join: attach to each fact row the dimension
  * interval `[start, end)` containing its position, per key — the
  * "which tier/rate/version was in effect for this row" enrichment.
  *
  * Implementation is bucket expansion, NOT a theta join. Each interval
  * row explodes to one row per `bucketSize` bucket it covers; each fact
  * computes its single bucket; the join is then a plain equi-join on
  * (keys, bucket) with a residual containment filter.
  *
  * Scale: Spark executes `l.key = r.key AND pos BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin (dim must fit in memory, O(|facts|*|dim|)
  * compare cost) or falls to a cartesian strategy once the dim outgrows
  * the broadcast threshold — both die at 100 TB. The expanded equi-join
  * shuffles on (keys, bucket) like any other join, cost linear in
  * |facts| + |dim| * expansionFactor, where expansionFactor =
  * intervalLength / bucketSize (pick bucketSize near the typical
  * interval length to keep it small). Plan shape pinned in
  * PlanGuardSpec: no BroadcastNestedLoopJoin, no CartesianProduct.
  */
object Temporal {

  /** @param facts      fact table; `posCol` must be an integral position
    *                    (e.g. epoch days / epoch seconds)
    * @param intervals  dimension with `startCol` (inclusive) / `endCol`
    *                    (exclusive) integral bounds on the same scale
    * @param keys       equi-join key columns present on both sides
    * @param payload    (sourceCol -> outputCol) interval columns to carry;
    *                    output names must not collide with fact columns
    * @param bucketSize bucket width in `posCol` units; positions may be
    *                    negative (floor division, not truncation) */
  def intervalJoin(facts: DataFrame, intervals: DataFrame, keys: Seq[String],
      posCol: String, startCol: String, endCol: String, bucketSize: Long,
      payload: Seq[(String, String)]): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    val dim = intervals.select(
      keys.map(col) ++
        Seq(col(startCol).cast("long").as("__start"),
          col(endCol).cast("long").as("__end")) ++
        payload.map { case (s, o) => col(s).as(o) }: _*)
      .where(col("__end") > col("__start")) // empty intervals match nothing
      .withColumn("__bucket", explode(sequence(
        floor(col("__start") / bucketSize).cast("long"),
        floor((col("__end") - 1) / bucketSize).cast("long"))))
    val f = facts.withColumn("__bucket",
      floor(col(posCol).cast("long") / bucketSize).cast("long"))
    f.join(dim, keys :+ "__bucket")
      .where(col(posCol) >= col("__start") && col(posCol) < col("__end"))
      .drop("__bucket", "__start", "__end")
  }
}
