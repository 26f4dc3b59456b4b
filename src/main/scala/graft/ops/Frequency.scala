package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications") — bounded-memory approximate counting over key domains
  * too large to groupBy-count exactly. At 100 TB a corpus has ~10^11
  * distinct n-grams; exact counts need a shuffle proportional to the
  * DISTINCT key count, while the sketch is a fixed depth x width counter
  * matrix regardless of cardinality, with the classic guarantee
  * est >= true and est <= true + eps*N at probability 1 - delta
  * (eps = e/width, delta = e^-depth).
  *
  * Determinism contract (what makes the sketch oracle-checkable): cell
  * counters are SUMS, so the sketch is identical under any row order or
  * partitioning; row r's cell for key s is fnv1a("r:" + s) mod width,
  * and a power-of-two width makes the signed (JVM) and unsigned
  * (HUGEINT) replays agree bit for bit.
  */
object Frequency {

  /** Build the depth x width count-min sketch of `keyCol` occurrence
    * counts: one row per non-empty cell — (r, cell, cnt). NULL keys are
    * ignored (no cell).
    *
    * Scale shape: the per-row cell array derives narrowly (no
    * pre-shuffle); the groupBy(r, cell) aggregate map-side combines and
    * its OUTPUT is bounded by depth*width cells no matter how many rows
    * or distinct keys flow in — the whole reduce side is sketch-sized. */
  def countMinSketch(items: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val cells = cellUdf(depth, width)
    items.select(posexplode(cells(col(keyCol))).as(Seq("r", "cell")))
      .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the counts of `queries`' `keyCol` values against a
    * sketch from [[countMinSketch]]: est = min over rows r of the cell
    * counter (missing cell = 0). Output: (keyCol, cm_est).
    *
    * Scale shape: the sketch is at most depth*width rows, so it
    * BROADCASTS; the query side is scanned once, never shuffled on
    * content — estimation cost is O(|queries| * depth) map-side plus a
    * |queries|-keyed aggregate. */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = cellUdf(depth, width)
    queries.select(col(keyCol), posexplode(cells(col(keyCol))).as(Seq("r", "cell")))
      .join(broadcast(sketch), Seq("r", "cell"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Per-key cell indexes, one per sketch row: floorMod(fnv1a("r:" + key),
    * width) — with width a power of two this equals the unsigned residue,
    * so an unsigned 128-bit replay is bit-exact. NULL -> empty (no cells). */
  private def cellUdf(depth: Int, width: Int) = {
    require(depth >= 1 && width >= 2, "need a positive sketch geometry")
    require((width & (width - 1)) == 0,
      "width must be a power of two for signed/unsigned replay parity")
    udf { (s: String) =>
      if (s == null) Array.empty[Long]
      else Array.tabulate(depth) { r =>
        java.lang.Math.floorMod(Dedup.fnv1a(r.toString + ":" + s), width.toLong)
      }
    }
  }
}
