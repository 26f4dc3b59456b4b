package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring — PageRank (Page et al. 1999, "The PageRank
  * citation ranking") in pure integer arithmetic, complementing the
  * label-propagation connected components in [[Dedup]]: components give
  * the graph's equivalence structure, PageRank gives per-node importance
  * (link-graph quality signals for web-corpus curation, entity salience
  * over co-occurrence graphs).
  *
  * Determinism contract: every quantity is a non-negative BIGINT and
  * every division is a floor division of non-negative operands (where
  * truncate-toward-zero and floor agree), so ranks are bit-identical
  * under any row order, partitioning, or replaying engine — the same
  * engine-independence discipline as the Lloyd q24 quantizer
  * (`ORACLES.md`). Rank mass: each node starts at floor(scale/n); a
  * node with out-degree d contributes floor(rank/d) along each edge;
  * the update is base + floor(dampNum * inSum / dampDen) with
  * base = floor(floor(scale * (dampDen - dampNum) / dampDen) / n).
  * Dangling nodes (no out-edges) leak their damped mass rather than
  * redistributing it — the sink-free formulation; symmetrize the edge
  * list (both directions) when conservation matters.
  */
object Graph {

  /** PageRank over a directed edge list. `edges` rows are (srcCol,
    * dstCol) pairs — NOT deduplicated here; parallel edges contribute
    * multiply (pre-`distinct()` them for the simple-graph semantics).
    * Output: (node, rank) for every node appearing as an endpoint.
    *
    * Scale shape: out-degrees aggregate map-side; each iteration is one
    * keyed equi-join (ranks to edges on the source) plus one keyed
    * aggregate (contributions by destination) — the Pregel shuffle
    * pattern, never all-pairs. The edges-with-degree frame is cached and
    * reused across iterations so the edge scan and degree join pay once;
    * the one driver-side scalar is the node COUNT (metadata-sized). The
    * iteration count is a fixed small constant (rank convergence is
    * geometric), so total cost is iterations x one shuffle round. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    val e = edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .persist()
    val n = nodes.count() // metadata-sized driver scalar
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val eDeg = e.join(deg, "__src").persist()
    val base = scale * (dampDen - dampNum) / dampDen / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    var prev: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      // `div` is true integral division — Spark's `/` on longs is DOUBLE
      // division, which silently loses exactness past 2^53
      val inSum = eDeg.join(ranks, eDeg("__src") === ranks("node"))
        .select(col("__dst").as("node"),
          expr("rank div __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      val next = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
            .cast("long").as("rank"))
        .persist()
      if (i < iterations) {
        next.count() // materialize so the previous round's cache can go
        prev.foreach(_.unpersist())
        prev = Some(next)
      }
      // the FINAL iteration is materialized once, by the checkpoint below
      // (an extra count() here would pay a whole redundant job); its
      // predecessor stays cached until then so nothing recomputes
      ranks = next
    }
    // cache-free, lineage-truncated result (same discipline as the
    // connected-components rounds in Dedup)
    val out = ranks.localCheckpoint(true)
    prev.foreach(_.unpersist())
    ranks.unpersist()
    eDeg.unpersist()
    nodes.unpersist()
    out
  }
}
