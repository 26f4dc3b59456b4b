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

  /** `a` dominates `b`: >= in every dimension, > in at least one. */
  private def dominates(a: Seq[Long], b: Seq[Long]): Boolean = {
    var gt = false
    var i = 0
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) gt = true
      i += 1
    }
    gt
  }

  /** Sort-filter-skyline sweep (the presorted BNL of Chomicki et al.
    * 2003, "Skyline with presorting") over rows already in (dims desc
    * lexicographic, id) order: a dominator always sorts BEFORE what it
    * dominates (its first differing dimension is strictly greater), so
    * each row need only be tested against the kept frontier — and a row
    * dropped because some kept row dominates it can, by transitivity,
    * never be needed as a dominator itself. Kept-buffer size = the
    * partition's local skyline (the documented anti-correlated worst
    * case is the output itself). */
  private def sfsSweep(it: Iterator[(Long, Seq[Long])])
      : Iterator[(Long, Seq[Long])] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    it.flatMap { case r @ (_, v) =>
      if (kept.exists(k => dominates(k, v))) None
      else { kept += v; Some(r) }
    }
  }

  /** d-dimensional skyline maximizing every column of `dimCols` (negate
    * a column to minimize it); `idCol` rides along. Same lossless
    * two-phase shape as [[skyline2D]]: per-partition SFS sweeps (no
    * exchange — dominance transitivity makes local pruning sound), then
    * one candidate-sized final sweep. The per-partition sort key is the
    * dims-desc lexicographic order (arrays compare lexicographically),
    * which every dominator precedes its dominated rows in.
    * Output: (id, dims...), the exact frontier. */
  def skylineND(df: DataFrame, idCol: String, dimCols: Seq[String])
      : DataFrame = {
    require(dimCols.nonEmpty, "need at least one dimension")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.select(col(idCol).cast("long").as("_1"),
        array(dimCols.map(c => col(c).cast("long")): _*).as("_2"))
      .as[(Long, Seq[Long])]
    val local = packed
      .sortWithinPartitions(col("_2").desc, col("_1"))
      .mapPartitions(sfsSweep)
    // the final sweep runs over the CANDIDATE set (sum of local skyline
    // sizes — O(partitions x skyline)), not the input; same bound
    // argument as skyline2D's repartition(1)
    val global = local
      .repartition(1)
      .sortWithinPartitions(col("_2").desc, col("_1"))
      .mapPartitions(sfsSweep)
    global.select(col("_1").as(idCol) +:
      dimCols.zipWithIndex.map { case (c, i) =>
        col("_2").getItem(i).as(c) }: _*)
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
