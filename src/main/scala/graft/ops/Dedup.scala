package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis.normalized

/** Deduplication operators for corpus curation at scale.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the group key, with
  * map-side partial aggregation). Near-dup variants (MinHash+LSH, SimHash)
  * follow the standard shingle -> signature -> band -> bucket-join shape:
  * the only shuffle is the groupBy on (band, bandHash), and candidate-pair
  * generation happens within buckets — never a global cross join. Bucket
  * sizes are capped so the within-bucket pair expansion stays bounded under
  * skew (10^6 identical boilerplate docs would otherwise make one bucket
  * quadratic); capped buckets emit a linear "star" against the min id,
  * which still links the whole group into one connected component for
  * downstream grouping.
  */
object Dedup {

  /** Exact duplicate groups by a set of columns: one representative
    * (min id) + multiplicity per distinct value combination. */
  def exactGroups(df: DataFrame, idCol: String, byCols: Seq[String]): DataFrame =
    df.groupBy(byCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the min-id row per distinct key (deterministic,
    * unlike dropDuplicates which keeps an arbitrary row). */
  def exact(df: DataFrame, idCol: String, byCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(byCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // --- MinHash --------------------------------------------------------------

  /** Deterministic 64-bit string hash (FNV-1a). */
  private[graft] def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Word n-gram shingle hashes of a normalized text. */
  private[graft] def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = text.split(" ")
    if (toks.length < n) {
      if (text.isEmpty) Array.empty[Long] else Array(fnv1a(text))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder
        var j = i
        while (j < i + n) { sb.append(toks(j)); sb.append(' '); j += 1 }
        out(i) = fnv1a(sb.toString)
        i += 1
      }
      out
    }
  }

  private val mersennePrime = (1L << 61) - 1

  /** Deterministic per-hash-function (a, b) parameters via splitmix64 of
    * the function index — no RNG, reproducible across runs and partitions. */
  private[graft] def mixParams(i: Int): (Long, Long) = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val a = (splitmix(i.toLong * 2 + 1) & (mersennePrime - 2)) + 1
    val b = splitmix(i.toLong * 2 + 2) & (mersennePrime - 1)
    (a, b)
  }

  /** Per-hash-function permutation: a splitmix64-style bijective 64-bit
    * mixer keyed by (a, b). Bijectivity on the full 64-bit space gives the
    * min-wise property directly — unlike (a*x+b) mod p arithmetic, which
    * silently overflows 64-bit multiplication. */
  private[graft] def permute(x0: Long, a: Long, b: Long): Long = {
    var x = (x0 ^ a) + b
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    (x ^ (x >>> 31)) & Long.MaxValue
  }

  /** MinHash signature: min over shingles of permute(x) per hash fn. */
  private[graft] def minhashSignature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var h = 0
    while (h < numHashes) {
      val (a, b) = mixParams(h)
      var mn = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val v = permute(shingles(i), a, b)
        if (v < mn) mn = v
        i += 1
      }
      sig(h) = mn
      h += 1
    }
    sig
  }

  private def minhashUdf(n: Int, numHashes: Int) = udf { (text: String) =>
    if (text == null) Array.fill(numHashes)(Long.MaxValue)
    else minhashSignature(shingleHashes(text, n), numHashes)
  }

  /** docs -> (id, sig): `numHashes`-long minhash signature over word
    * `shingleLen`-grams of normalized text. One narrow pass, no shuffle.
    * NOTE: `idCol` must be integral (bigint) — the candidate-pair stages
    * type ids as Long; hash non-integral ids to 64 bits first
    * (e.g. `xxhash64`). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 64): DataFrame =
    docs.select(col(idCol).as("id"),
      minhashUdf(shingleLen, numHashes)(normalized(col(textCol))).as("sig"))

  /** LSH candidate pairs from signatures: band the signature into `bands`
    * contiguous chunks of `numHashes/bands`; docs agreeing on any full
    * band share a bucket; emit pairs within buckets only (capped).
    *
    * Output CONTRACT (the set the oracle replays): the distinct union of
    *  - all pairs sharing at least one small bucket (1 < size <= cap), and
    *  - star pairs (bucket min id, member) from every over-cap bucket.
    *
    * Pair generation is FIRST-SMALL-MATCH: a pair is emitted only at the
    * lowest-index band where it agrees in a small bucket. This produces
    * exactly the contract set (for any pair in it, that band exists and
    * is unique) while emitting each pair ONCE instead of once per
    * agreeing band. The distinction matters at scale: a corpus whose
    * duplicate clusters agree on all `bands` bands (exact dups always do)
    * otherwise emits `bands`x the true pair mass into the dedup shuffle —
    * a 16x shuffle/alloc amplification measured as the dominant cost of
    * the 50x rehearsal leg. Each member carries its 16 band hashes plus a
    * bitmask of which of ITS buckets are small (one extra keyed exchange
    * to gather counts per doc); when two members agree at band b they
    * share that bucket, so either member's mask bit decides smallness. */
  def minhashCandidates(sigs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(bands <= 62, "small-bucket bitmask packs into one long")
    val rows = numHashes / bands
    // one small UDF per row beats 16 hash-of-slice expression trees: the
    // generated code for those dominated cold-start JIT in benchmarks
    val bandHashUdf = udf { (sig: Seq[Long]) =>
      Array.tabulate(bands) { b =>
        var h = 0xcbf29ce484222325L ^ b
        var i = b * rows
        while (i < (b + 1) * rows) {
          var x = sig(i)
          var k = 0
          while (k < 8) { h ^= (x & 0xFF); h *= 0x100000001b3L; x >>>= 8; k += 1 }
          i += 1
        }
        h
      }
    }
    // pass 1 (thin rows): ONE banded explode + ONE (band, hash) exchange
    // carrying bucket occupancy and bucket min id; the star branch and
    // the per-doc mask aggregation are both consumers of this same
    // window output, so the (possibly expensive, uncached) signature
    // input is exploded exactly once and the exchange is reused
    val banded = sigs.select(col("id"), posexplode(bandHashUdf(col("sig"))))
      .select(col("id"), col("pos").as("band"), col("col").as("band_hash"))
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")
    val counted = banded
      .withColumn("__cnt", count(lit(1)).over(w1))
      .withColumn("__min_id", min("id").over(w1))
    // per-doc small-bucket bitmask (bit b set <=> the doc's band-b bucket
    // <= cap) + the band-hash array reassembled from the same rows — the
    // mask bit of the CURRENT band is the small-bucket filter for pass 2,
    // so no second occupancy window is ever needed
    val perDoc = counted
      .groupBy("id")
      .agg(
        expr(s"sum(CASE WHEN __cnt <= $maxBucket " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(band AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END)").as("small_mask"),
        expr("transform(array_sort(collect_list(struct(band, band_hash))), " +
          "x -> x.band_hash)").as("bhs")) // 16 rows per id: bounded
    val firstMatchPairsUdf = udf { (ms: Seq[org.apache.spark.sql.Row], band: Int) =>
      val n = ms.length
      val ids = new Array[Long](n)
      val mask = new Array[Long](n)
      val bh = new Array[Array[Long]](n)
      var i = 0
      while (i < n) {
        val r = ms(i)
        ids(i) = r.getLong(0); mask(i) = r.getLong(1)
        bh(i) = r.getSeq[Long](2).toArray
        i += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          // skip iff an earlier band already emitted (or star-links) them
          var dup = false
          var b = 0
          while (b < band && !dup) {
            if (bh(i)(b) == bh(j)(b) && ((mask(i) >>> b) & 1L) == 1L) dup = true
            b += 1
          }
          if (!dup) out += ((ids(i), ids(j)))
          j += 1
        }
        i += 1
      }
      out.toSeq
    }
    // pass 2: re-explode only the small-bucket memberships (the mask bit
    // decides locally), bucket once more, expand pairs first-match
    val smallPairs = perDoc
      .select(col("id"), col("small_mask"), col("bhs"), posexplode(col("bhs")))
      .select(col("id"), col("small_mask"), col("bhs"),
        col("pos").as("band"), col("col").as("band_hash"))
      .filter(expr("((small_mask >> band) & 1) = 1"))
      .groupBy("band", "band_hash")
      .agg(sort_array(collect_list(struct(col("id"), col("small_mask"), col("bhs"))))
        .as("ms")) // bounded by cap
      .select(explode(firstMatchPairsUdf(col("ms"), col("band"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
    val starPairs = counted
      .filter(col("__cnt") > maxBucket && col("id") =!= col("__min_id"))
      .select(col("__min_id").as("id_a"), col("id").as("id_b"))
    smallPairs.union(starPairs).distinct()
  }

  /** Within-bucket pair generation with the skew guard shared by every
    * bucket-join operator ([[minhashCandidates]], [[simhashCandidates]],
    * `Similarity.embeddingNearDups`): buckets up to `cap` emit all C(n,2)
    * pairs; larger (boilerplate-skewed) buckets emit a linear star against
    * the min id, which still links the whole bucket into one connected
    * component downstream — pair output is O(n) per bucket either way
    * instead of O(n^2).
    *
    * BOTH regimes keep per-task AGGREGATION state bounded, not just pair
    * output: bucket occupancy and min id come from window functions (the
    * window buffers one bucket at a time and spills — linear streamed
    * work, never an in-memory aggregation array); only buckets already
    * known to be <= `cap` are collected for pair expansion (array bounded
    * by `cap`); over-cap buckets never materialize an id list anywhere —
    * their star pairs are a pure projection. Both branches sit on the SAME
    * Exchange+Sort over `members` (identical pruning), so any expensive
    * upstream signature compute runs once and the second branch reads the
    * reused exchange.
    *
    * `members` must be (bucketKeys..., id) with ids unique per bucket. */
  private[ops] def boundedBucketPairs(members: DataFrame,
      bucketKeys: Seq[String], cap: Int): DataFrame = {
    val keys = bucketKeys.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    val m = members
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__min_id", min("id").over(w))
    val smallPairs = m.filter(col("__cnt") > 1 && col("__cnt") <= cap)
      .groupBy(keys: _*)
      .agg(sort_array(collect_list("id")).as("ids")) // bounded by cap
      .select(explode(allPairsUdf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
    val starPairs = m.filter(col("__cnt") > cap && col("id") =!= col("__min_id"))
      .select(col("__min_id").as("id_a"), col("id").as("id_b"))
    smallPairs.union(starPairs)
  }

  /** All C(n,2) ordered pairs of a (cap-bounded) sorted id list. */
  private[ops] val allPairsUdf = udf { (ids: Seq[Long]) =>
    val arr = ids.toArray
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      arr.length * (arr.length - 1) / 2)
    var i = 0
    while (i < arr.length) {
      var j = i + 1
      while (j < arr.length) { out += ((arr(i), arr(j))); j += 1 }
      i += 1
    }
    out.toSeq
  }

  // --- incremental MinHash signature store ----------------------------------

  /** The per-bucket signature partial both incremental surfaces store:
    * one FACT row per (doc, hash index) — (id, h, sigv), the minhash
    * signature exploded component-wise. Scalar rows keep the generic
    * store machinery applicable verbatim (compaction's sum over the
    * exactly-one-row (id, h) groups is the identity, parquet physical
    * types stay scalar); `h` is a 0..numHashes-1 run so it columnar-
    * compresses to near nothing. Every output row derives only from its
    * own document's row, so the [[IncrementalAgg]] bucket-union
    * contract is trivially exact. */
  private def signaturePartial(idCol: String, textCol: String,
      shingleLen: Int, numHashes: Int)(slice: DataFrame): DataFrame =
    slice
      .select(col("__bucket"), col(idCol).as("id"),
        posexplode(minhashUdf(shingleLen, numHashes)(normalized(col(textCol)))))
      .select(col("__bucket"), col("id"), col("pos").as("h"),
        col("col").as("sigv"))

  /** CHURN-PRICED maintenance of a stored MinHash signature table — the
    * [[IncrementalAgg]] discipline applied to near-dup dedup's dominant
    * cost. The shingle -> permute -> min signature pass is the
    * tokenize-priced stage of LSH dedup (everything after it works on
    * 64 longs per doc); re-running it over a 100 TB corpus because 0.1%
    * of documents changed is the same wholesale rebuild the stored text
    * index ([[Indexing.indexIncremental]]) and PQ code store
    * ([[Similarity.pqIndexIncremental]]) already price at churn. This
    * surface completes the trio: signatures live as per-document-bucket
    * (id, h, sigv) facts, one column-pruned digest scan of (id, text)
    * decides dirtiness, only dirty buckets re-shingle, and candidate
    * generation ([[minhashCandidates]] over [[signaturesFromStore]])
    * runs store-sized — never corpus-sized.
    *
    * `idCol` must be integral (the [[minhashSignatures]] contract — the
    * pair stages type ids as Long). `aggKey` encodes shingle length and
    * hash count, so a parameter change rebuilds instead of mixing
    * incomparable signatures. Lease, witness-before-mutation and crash
    * discipline are [[IncrementalAgg.run]]'s verbatim.
    *
    * Returns (current signature facts (id, h, sigv), prune record). */
  def minhashIncremental(docs: DataFrame, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleLen: Int = 3, numHashes: Int = 64,
      nBuckets: Int = 256, dirtyFractionLimit: Double = 0.5,
      bucketCol: Option[String] = None)
      : (DataFrame, IncrementalAgg.IncrementalReport) =
    IncrementalAgg.run(docs, idCol, Seq(textCol),
      signaturePartial(idCol, textCol, shingleLen, numHashes),
      aggKey = s"minhash:id=$idCol,text=$textCol," +
        s"shingle=$shingleLen,hashes=$numHashes",
      stateDir, nBuckets, dirtyFractionLimit, bucketCol)

  /** ARRIVAL-priced signature maintenance: append one micro-batch of
    * NEW documents' minhash signatures to an
    * [[IncrementalAgg.appendFold]] store — the streaming twin of
    * [[minhashIncremental]], for append-only document streams where
    * nothing stored can change and addition is the whole maintenance
    * (idempotent replays, compaction replay fence, fence ownership,
    * lease — the generic store contract, verbatim). Same append-only
    * contract as the other maintainers: an id arrives AT MOST ONCE;
    * churn belongs to the batch surface. Searched by
    * [[signaturesFromStore]] — the same entry point the churn-priced
    * store serves. */
  def minhashAppend(batch: DataFrame, batchId: Long, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleLen: Int = 3, numHashes: Int = 64,
      nBuckets: Int = 256): Unit =
    IncrementalAgg.appendFold(batch, batchId, stateDir,
      signaturePartial(idCol, textCol, shingleLen, numHashes), idCol,
      nBuckets)

  /** The current (id, sig) signature table from a store maintained by
    * [[minhashIncremental]] and/or [[minhashAppend]] — identical to
    * [[minhashSignatures]] over the same corpus (spec-pinned identity
    * under churn and across batch splits), ready for
    * [[minhashCandidates]] / [[sigJaccard]]. One store-sized keyed
    * exchange reassembles the component facts into signature arrays
    * (the store holds ~numHashes thin long rows per doc — at 100 TB of
    * TEXT that is gigabytes, not terabytes); work never touches the
    * corpus. Shape-oblivious across both store layouts: un-compacted
    * append batches simply contribute their own (id, h) facts. */
  def signaturesFromStore(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    IncrementalAgg.readStore(spark, stateDir)
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(h, sigv))), " +
        "x -> x.sigv)").as("sig"))

  /** Estimated Jaccard from two minhash signatures (fraction of agreeing
    * components). */
  val sigJaccard = udf { (a: Seq[Long], b: Seq[Long]) =>
    if (a == null || b == null || a.isEmpty || a.length != b.length) 0.0
    else {
      var eq = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / a.length
    }
  }

  /** Exact word n-gram Jaccard of two texts (verification stage after LSH). */
  def ngramJaccard(a: String, b: String, n: Int = 3): Double = {
    val sa = shingleHashes(a, n).toSet
    val sb = shingleHashes(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }
  }
  val ngramJaccardUdf = udf { (a: String, b: String, n: Int) => ngramJaccard(a, b, n) }

  /** Connected components over candidate pairs (id_a, id_b) via label
    * propagation: each node's label starts as itself and iteratively takes
    * the min label among itself and its neighbors until fixpoint (or
    * `maxIter`). Returns (id, component) where component = min id of the
    * node's component — the canonical "keep one representative per
    * near-dup group" finisher after LSH + verification.
    *
    * Scale: each iteration is one join + one aggregate on the edge list
    * (both keyed shuffles); iterations needed = graph diameter, which for
    * near-dup clusters (dense, star-linked by the capped-bucket strategy)
    * is small. The fixpoint check costs one extra aggregate per round. */
  /** @param checkConvergence when false, runs exactly `maxIter` rounds
    *        without the per-round changed-label join — half the jobs when
    *        the component diameter is known small (e.g. star-linked LSH
    *        buckets). Correct as long as maxIter >= diameter. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      checkConvergence: Boolean = true): DataFrame = {
    // persist the edge list up front: every iteration joins against it, and
    // without the cache each round would re-execute the ENTIRE upstream
    // pipeline that produced the pairs (for LSH dedup that is the full
    // shingle -> signature -> banding candidate generation — by far the
    // dominant cost at any scale)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      // neighbor labels: for each edge (src,dst), dst's current label
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("component"))
      val next = labels.union(neighborLabels)
        .groupBy("id").agg(min("component").as("component"))
      val prev = labels
      labels = next.persist()
      // ONE job per round: the aggregate below materializes `next` into the
      // cache AND counts changed labels in the same pass (joining against
      // the previous round's cached labels is a cheap cache-side probe) —
      // previously the changed-check was a second full job per round
      val changed =
        if (checkConvergence)
          labels.as("n")
            .join(prev.as("o").withColumnRenamed("component", "__old"), Seq("id"))
            .agg(coalesce(sum(when(!(col("component") <=> col("__old")), 1L)
              .otherwise(0L)), lit(0L))) // empty graph: sum yields null
            .head().getLong(0)
        else { labels.count(); 1L } // materialize only; run all rounds
      prev.unpersist() // free the previous round's cache
      converged = checkConvergence && changed == 0L
      i += 1
    }
    // hand the caller a lineage-truncated, cache-free result: localCheckpoint
    // materializes the final labels into managed blocks (freed automatically
    // when the DataFrame is garbage-collected), so the loop's cache entry can
    // be released here instead of leaking until someone calls unpersist().
    // On a real cluster with executor churn, prefer reliable checkpointing
    // (spark.sparkContext.setCheckpointDir + .checkpoint()) for this step.
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond" — public). Each round rewrites the EDGE set toward stars
    * rooted at component minima; converges in O(log^2 n) rounds on any
    * graph vs label propagation's O(diameter) — the variant to prefer
    * when candidate chains can get long (bucket-linked LSH graphs whose
    * diameter grows with band count).
    *
    * Per round: large-star (groupBy + co-partitioned join on the node)
    * then small-star (same shape on the big->small orientation); change
    * detection rides the materializing aggregate (count + xor of edge
    * hashes — no extra job). Returns (id, component) with component =
    * min id, identical to [[connectedComponents]]. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.join(mins, Seq("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = dir.groupBy("src").agg(min("dst").as("m"))
      dir.join(mins, Seq("src"))
        .where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    // localCheckpoint (eager) each round: the star rewrite references the
    // edge set three times per round, so without truncation the logical
    // plan DOUBLES every iteration — lineage must be cut, not just cached
    var edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    // (count, xor-of-hashes) signature: order-independent change probe
    // over the just-materialized blocks (cache-side scan, no recompute)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = signature(next)
      edges.unpersist()
      edges = next
      converged = nextSig == sig
      sig = nextSig
      i += 1
    }
    // at fixpoint every edge is (member, root): labels fall out directly
    val out = edges.select(col("src").as("id"), col("dst").as("component"))
      .union(edges.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
      .localCheckpoint(true)
    edges.unpersist()
    out
  }

  /** Dedup pipeline finisher: given the corpus and the (id, component)
    * labels from [[connectedComponents]]/[[connectedComponentsStar]],
    * keep ONE representative per duplicate group — the highest `scoreCol`
    * (quality, length, ...), ties to the smallest id — while docs in no
    * pair survive as their own singleton group (component = own id).
    *
    * Scale: one keyed join on the id (labels carry only docs that appear
    * in some pair — usually a small fraction of the corpus) plus one
    * window partitioned by component; both shuffles are keyed and
    * balanced (near-dup groups are bounded by the candidate generators'
    * bucket caps upstream). */
  def keepBest(docs: DataFrame, labels: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val lab = labels.select(col("id").as(idCol), col("component"))
    val joined = docs.join(lab, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col(scoreCol).desc, col(idCol))
    joined.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1).drop("__r")
  }

  // --- SimHash --------------------------------------------------------------

  /** 64-bit SimHash over word unigrams of normalized text: per-bit vote
    * weighted by term frequency; near-dups differ in few bits. */
  private[graft] def simhash64(text: String): Long = {
    val weights = new Array[Int](64)
    val toks = text.split(" ")
    var t = 0
    while (t < toks.length) {
      val h = fnv1a(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (weights(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf { (text: String) => if (text == null) 0L else simhash64(text) }

  /** docs -> (id, simhash). */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhashUdf(normalized(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs at Hamming distance <= `maxHamming` via the
    * standard block trick: split the 64-bit hash into 4 16-bit blocks; any
    * pair within distance 3 agrees exactly on at least one block -> bucket
    * by (blockIdx, blockValue), pair within buckets, verify true distance.
    *
    * Same bounded two-regime shape as [[boundedBucketPairs]] (members here
    * carry [id, simhash] 2-arrays so the verify stage has both hashes):
    * small buckets collect at most `maxBucket` members for all-pairs
    * expansion; over-cap (boilerplate-skewed) buckets emit a linear star
    * against the min-id member as a pure projection — no per-bucket array
    * is ever materialized for them. The skew case is near-identical
    * boilerplate, so hamming-to-center still links the whole group. */
  def simhashCandidates(sims: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 256): DataFrame = {
    val blockArr = array((0 until 4).map(b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val blocks = sims.select(col("id"), col("simhash"), posexplode(blockArr))
      .select(array(col("id"), col("simhash")).as("member"),
        col("pos").as("block"), col("col").as("block_val"))
    // arrays order lexicographically and id leads => min(member) = min-id;
    // window (not groupBy+join) so both regimes share one Exchange over
    // the blocks — see boundedBucketPairs
    val w = org.apache.spark.sql.expressions.Window.partitionBy("block", "block_val")
    val m = blocks
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__min_member", min("member").over(w))
    val pairUdf = udf { (members: Seq[Seq[Long]], maxH: Int) =>
      val arr = members.toArray
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          val d = java.lang.Long.bitCount(arr(i)(1) ^ arr(j)(1))
          if (d <= maxH) out += ((arr(i)(0), arr(j)(0), d)) // sorted: i<j => id asc
          j += 1
        }
        i += 1
      }
      out.toSeq
    }
    val smallPairs = m.filter(col("__cnt") > 1 && col("__cnt") <= maxBucket)
      .groupBy("block", "block_val")
      .agg(sort_array(collect_list("member")).as("members")) // bounded by cap
      .select(explode(pairUdf(col("members"), lit(maxHamming))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("p._3").as("hamming"))
    val starPairs = m
      .filter(col("__cnt") > maxBucket &&
        col("member")(0) =!= col("__min_member")(0))
      .select(col("__min_member")(0).as("id_a"), col("member")(0).as("id_b"),
        expr("CAST(bit_count(member[1] ^ __min_member[1]) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    smallPairs.union(starPairs)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }
}
