package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The 2-D skyline (Pareto frontier) operator — Börzsönyi, Kossmann &
  * Stocker 2001, "The skyline operator": the rows not DOMINATED by any
  * other, where a dominates b iff a is >= b in both dimensions and
  * strictly greater in at least one (maximize-both form; negate a
  * column to minimize it). The multi-criteria "best offers" primitive:
  * cheapest-vs-freshest, quality-vs-length, score-vs-recency.
  *
  * Distributed shape — the lossless-candidates pattern again (prefix
  * filter, Misra–Gries): dominance is transitive, so any point
  * dominated WITHIN its partition is dominated globally — each
  * partition's local skyline (one sorted sweep) is therefore a
  * SUPERSET-preserving filter, and the global skyline of the candidate
  * union equals the global skyline of the input. Cost: one local sort +
  * sweep per partition (no exchange), then one final sweep over the
  * candidates. Candidate volume is the sum of local skyline sizes —
  * O(partitions x typical-skyline-size); skylines of independent or
  * correlated dimensions are tiny (~log n to ~sqrt n). The documented
  * degenerate case is fully ANTI-correlated data, where the skyline
  * itself (the correct answer) is O(n) and no algorithm's final stage
  * beats the output size.
  *
  * Engine-exactness: integer comparisons only; the output is the
  * dominance-defined SET, independent of partitioning (losslessness
  * above) — so a plain declarative replay is a valid oracle. */
object Skyline {

  /** One (x desc, y desc, id) sorted sweep emitting the non-dominated
    * rows: bestY carries the max y over STRICTLY-greater x; within an
    * x-group only rows tying the group max y survive, and exact (x, y)
    * duplicates all survive (neither dominates — no strict inequality). */
  private def sweep(it: Iterator[(Long, Long, Long)])
      : Iterator[(Long, Long, Long)] = {
    var bestY = Long.MinValue
    var curX = Long.MinValue
    var groupMax = Long.MinValue
    var started = false
    it.flatMap { case r @ (_, x, y) =>
      if (!started || x != curX) {
        if (started) bestY = math.max(bestY, groupMax)
        started = true; curX = x; groupMax = y
      }
      if (y == groupMax && y > bestY) Some(r) else None
    }
  }

  /** Skyline of `df` maximizing the two INTEGER columns (xCol, yCol);
    * `idCol` rides along. Output: (id, x, y), the exact frontier. */
  def skyline2D(df: DataFrame, idCol: String, xCol: String, yCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, Long, Long)] = df.select(
        col(idCol).cast("long"), col(xCol).cast("long"),
        col(yCol).cast("long"))
      .toDF("_1", "_2", "_3")
      .as[(Long, Long, Long)]
    val local = rows
      .sortWithinPartitions(col("_2").desc, col("_3").desc, col("_1"))
      .mapPartitions(sweep)
    val global = local
      .repartition(1)
      .sortWithinPartitions(col("_2").desc, col("_3").desc, col("_1"))
      .mapPartitions(sweep)
    global.toDF(idCol, xCol, yCol)
  }
}
