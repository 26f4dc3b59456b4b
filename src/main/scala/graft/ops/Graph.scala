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
    // node ids keep their NATIVE type — integer keys shuffle ~2x leaner
    // than stringified ones (the kCore change measured 3.7x at the 50x
    // rehearsal leg); callers wanting string ids pass string columns
    require(edges.schema(srcCol).dataType == edges.schema(dstCol).dataType,
      "endpoint columns must share a type (node ids keep their native " +
        "type — integer keys shuffle ~2x leaner than stringified ones)")
    // materialize the caller's edge subtree ONCE, hash-partitioned on
    // the source key: an arbitrary edge-construction plan (joins,
    // distincts) would otherwise re-execute for each of its three
    // consumers here (nodes, degrees, eDeg), and the cached edge mass
    // would re-shuffle in EVERY iteration's rank join — partitioned on
    // __src, the degree aggregate, the degree join and each iteration's
    // rank join all cluster on the cached layout with no further
    // exchange of anything edge-sized (the per-iteration shuffles that
    // remain are the rank-sized contribution aggregate, unavoidable)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .repartition(col("__src")).persist()
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
    e.unpersist()
    out
  }

  /** The k-core of an UNDIRECTED simple graph by iterated peeling
    * (Seidman 1983, "Network structure and minimum degree"; the
    * distributed analysis is Montresor et al. 2013): repeatedly drop
    * every node of degree < k, re-count, repeat. The surviving subgraph
    * (every node has >= k neighbors INSIDE it) is the standard dense-
    * community filter — e.g. pruning spam/link farms to a web graph's
    * stable core before PageRank-style scoring.
    *
    * `rounds` is a FIXED peel count, not a convergence loop: both this
    * engine and any replaying oracle run exactly `rounds` peels, so the
    * output is a pure function of (edges, k, rounds) even when the peel
    * has not reached its fixpoint (callers size `rounds` generously;
    * peeling converges in a handful of rounds on power-law graphs —
    * assert `kCoreConverged` where the true core is required).
    *
    * Scale shape: each round is one map-side-combined degree aggregate
    * plus two semi-joins filtering the cached edge frame — the Pregel
    * budget of [[pageRank]]; caches rotate round-over-round and lineage
    * is cut once at the end. Everything is integer counting —
    * engine-exact. Output: (node, deg) of the surviving subgraph. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    require(edges.schema(aCol).dataType == edges.schema(bCol).dataType,
      "endpoint columns must share a type (node ids keep their native " +
        "type — integer keys shuffle ~2x leaner than stringified ones)")
    val und = edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
    // each round references the edge frame FOUR times (twice in the
    // degree union, twice through the semi-joins), so carrying lineage
    // across rounds grows the logical plan ~4^rounds — a driver OOM long
    // before any data moves. localCheckpoint each round replaces the
    // lineage with a materialized-RDD leaf: plan size stays constant.
    var cur = und.select(
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    // peeling only ever REMOVES edges, so an unchanged edge count is the
    // fixpoint: every node kept its degree, the next peel keeps them all,
    // and each remaining round is the identity. Exiting early therefore
    // changes nothing in the output (the fixed `rounds` contract holds
    // bit-exactly) while skipping the dead rounds' jobs — on power-law
    // graphs the peel converges in a handful of rounds and callers size
    // `rounds` generously. The count reads the just-checkpointed blocks.
    var nEdges = cur.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val deg = cur.select(col("u").as("node"))
        .union(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      cur = cur
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint(true)
      val m = cur.count()
      converged = m == nEdges
      nEdges = m
      r += 1
    }
    cur.select(col("u").as("node"))
      .union(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
  }

  /** True iff one more peel of [[kCore]]'s output graph would change
    * nothing — i.e. `rounds` reached the fixpoint (driver-side boolean
    * over a metadata-sized aggregate). */
  def kCoreConverged(coreNodes: DataFrame, k: Int): Boolean =
    coreNodes.filter(col("deg") < k).isEmpty

  /** Per-node triangle counts over an UNDIRECTED simple graph, by
    * degree-ordered orientation (the compact-forward / node-iterator++
    * scheme of Schank & Wagner 2005, "Finding, counting and listing all
    * triangles in large graphs"; the MapReduce analysis is Suri &
    * Vassilvitskii 2011, "Counting triangles and the curse of the last
    * reducer"). `edges` rows are undirected (a, b) pairs in EITHER or
    * both directions; self-loops and duplicates are dropped here.
    *
    * Orientation: every edge points from its (degree, id)-smaller
    * endpoint to the larger — a total order, so each triangle {a,b,c}
    * becomes exactly one directed path a->b, a->c with closing edge
    * b->c and is counted once. Why this survives 100 TB: the out-degree
    * of EVERY node under degree orientation is O(sqrt(m)), so the wedge
    * join (oriented edges self-joined on the source) fans out at most
    * sum(outdeg^2) <= m^1.5 — the curse-of-the-last-reducer hub that
    * makes the naive orientation quadratic in the max degree cannot
    * occur. Two keyed equi-joins, no iteration.
    *
    * Everything is integer counting — engine-exact. Output: (node,
    * triangles) for every node in at least one triangle. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    require(edges.schema(aCol).dataType == edges.schema(bCol).dataType,
      "endpoint columns must share a type (node ids keep their native " +
        "type — integer keys shuffle ~2x leaner than stringified ones)")
    val und = edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
    // canonical undirected edge set: (min, max), deduplicated
    val canon = und.select(
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().persist()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, node) total order: src = smaller endpoint
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val oriented = withDeg.select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .persist()
    // wedges rooted at the orientation-least vertex, closed by a third
    // oriented edge: one self-join on src + one equi-join on (b, c)
    val e1 = oriented.select(col("src").as("p"), col("dst").as("q1"))
    val e2 = oriented.select(col("src").as("p"), col("dst").as("q2"))
    val wedges = e1.join(e2, "p").filter(col("q1") < col("q2"))
    // the closing edge joins by its ID-canonical form (the `canon` frame
    // is already (min-id, max-id)), keeping this a two-key EQUI-join —
    // an orientation-order condition would need an OR of equality pairs,
    // which Catalyst can only plan as a nested-loop join
    val tris = wedges.join(canon,
        least(col("q1"), col("q2")) === col("u") &&
          greatest(col("q1"), col("q2")) === col("v"))
      .select(col("p"), col("q1"), col("q2"))
    val perNode = tris.select(explode(array(col("p"), col("q1"), col("q2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val out = perNode.localCheckpoint(true)
    oriented.unpersist()
    canon.unpersist()
    out
  }
}
