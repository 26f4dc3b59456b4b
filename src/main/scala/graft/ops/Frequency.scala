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

  /** HyperLogLog register sketch (Flajolet, Fusy, Gandouet & Meunier
    * 2007, "HyperLogLog: the analysis of a near-optimal cardinality
    * estimation algorithm") — bounded-memory distinct counting, the
    * cardinality complement of [[countMinSketch]]'s frequencies. The
    * sketch is 2^p registers each holding the max leading-zero rank seen;
    * it MERGES by register-wise max (distributive, order-independent),
    * so partial sketches from any partitioning combine exactly — count
    * distinct over 10^11 keys costs a 2^p-row reduce instead of a
    * distinct-key-sized shuffle.
    *
    * Determinism contract: key hash is fnv1a FINALIZED by the splitmix64
    * mixer ([[Dedup.permute]] with the golden-ratio key, b = 0 — a
    * 63-bit value). The finalizer is not optional hygiene: HLL's
    * analysis assumes avalanche in the bits that feed rho, and raw
    * fnv1a's high bits are measurably non-uniform on short keys
    * (sequential decimal strings estimated 2-3.4x high in a direct
    * measurement; finalized, the same sets land within ~2%). The
    * register is the LOW p bits of the finalized hash and the rank is
    * counted on the remaining 63-p bits via integer bit-length (rho =
    * (63-p) - bitlen(h >>> p) + 1) — every quantity a BIGINT, identical
    * under any row order, partitioning or replaying engine. NULL keys
    * are ignored. Output: (register, max_rho), at most 2^p rows. */
  private val GOLDEN = 0x9e3779b97f4a7c15L

  /** The ONE definition of (register, rho) for a key — shared by the
    * global and grouped sketch UDFs so the hash chain (fnv1a + splitmix
    * finalizer, low-p-bit register, 63-p rank width) can never
    * desynchronize between them or drift from the `hllRegCtes` oracle
    * mirror. */
  private def regRhoUdf(p: Int) = {
    val m = 1 << p
    val g = GOLDEN
    udf { (s: String) =>
      if (s == null) null
      else {
        val h = Dedup.permute(Dedup.fnv1a(s), g, 0L) // 63-bit, >= 0
        val register = h % m
        val w = h >>> p
        val bitlen = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
        (register, ((63 - p) - bitlen + 1).toLong)
      }
    }
  }

  def hllSketch(items: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p outside the practical register range")
    val rr = regRhoUdf(p)
    items.select(rr(col(keyCol)).as("__r")).filter(col("__r").isNotNull)
      .select(col("__r._1").as("register"), col("__r._2").as("rho"))
      .groupBy("register").agg(max("rho").as("max_rho"))
  }

  /** Cardinality estimate from a [[hllSketch]]: the raw HLL estimator
    * E = alpha_m * m^2 / sum_j 2^(-M_j), evaluated EXACTLY — alpha_m is
    * kept as the rational 7213*m*1000 / (10000*(1000m+1079)), the
    * harmonic denominator is scaled by 2^K with K = 63-p+1 — the max
    * possible rho for the sketch's OWN p, so every 2^(K-rho) term is a
    * non-negative shift at any p in 4..16 (a fixed K=57 would turn
    * p<8 registers into negative shifts, which BigInt silently floors
    * to 0, corrupting the estimate) — and the one division is a floor of
    * non-negative big integers. Arbitrary-precision arithmetic runs on
    * the DRIVER over the collected sketch (<= 2^p rows — model metadata,
    * same posture as the k-means centroid collect), so the estimate is
    * bit-for-bit replayable by any engine with 128-bit integers. The
    * small-range linear-counting correction needs a logarithm and is
    * deliberately omitted (document the >= 2.5*m working range instead)
    * — the whole-bit discipline over float transcendentals again.
    * Output: one row (m, n_used, n_est). */
  def hllEstimate(sketch: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p outside the practical register range")
    val m = 1 << p
    val K = 63 - p + 1 // max rho for this p: rho ranges in 1..(63-p)+1
    val regs = sketch.collect()
      .map(r => r.getAs[Long]("register") -> r.getAs[Long]("max_rho"))
    val used = regs.length
    val dsum = regs.map { case (_, rho) => BigInt(1) << (K - rho.toInt) }.sum +
      BigInt(m - used) * (BigInt(1) << K)
    val alphaNum = BigInt(7213) * m * 1000
    val alphaDen = BigInt(10000) * (1000L * m + 1079)
    val est = (alphaNum * m * m * (BigInt(1) << K)) / (alphaDen * dsum)
    val spark = sketch.sparkSession
    import spark.implicits._
    Seq((m.toLong, used.toLong, est.toLong)).toDF("m", "n_used", "n_est")
  }

  /** Per-GROUP HyperLogLog register sketches: one 2^p-register sketch per
    * distinct `groupCol` value, in a single keyed aggregate. The approx
    * count-distinct-per-group primitive (distinct users per domain,
    * distinct n-grams per language ...) whose exact form would shuffle
    * every (group, key) pair; this shuffles at most groups x 2^p register
    * rows. Output: (groupCol, register, max_rho). */
  def hllSketchGrouped(items: DataFrame, keyCol: String, groupCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p outside the practical register range")
    val rr = regRhoUdf(p)
    items.select(col(groupCol), rr(col(keyCol)).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col(groupCol), col("__r._1").as("register"), col("__r._2").as("rho"))
      .groupBy(groupCol, "register").agg(max("rho").as("max_rho"))
  }

  /** Raw HLL estimate per group, computed DISTRIBUTED (no driver collect
    * — groups may be corpus-cardinality): the same exact-rational
    * estimator as [[hllEstimate]], evaluated per group in DECIMAL(38,0)
    * arithmetic. Budget: each harmonic term 2^(K-rho) <= 2^(64-p) fits a
    * BIGINT; the group sum (<= 2^p terms of <= 2^(64-p), plus
    * (m-used)*2^K) and the alpha_m cross-multiplication stay under
    * ~10^31 < 10^38 for p <= 8 (enforced) — exact in any engine with
    * 128-bit integers (DuckDB HUGEINT mirrors it). One keyed aggregate
    * over the sketch rows. Output: (groupCol, n_used, n_est). */
  def hllEstimateGrouped(sketch: DataFrame, groupCol: String, p: Int = 8)
      : DataFrame = {
    require(p >= 4 && p <= 8, "decimal budget certified for p <= 8")
    val m = 1 << p
    val K = 63 - p + 1
    val alphaNum = BigInt(7213) * m * 1000
    val alphaDen = BigInt(10000) * (1000L * m + 1079)
    val num = alphaNum * m * m * (BigInt(1) << K) // ~1.7e31 at p=8
    sketch
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"CAST(shiftleft(1L, $K - CAST(max_rho AS INT)) AS DECIMAL(38,0))"))
          .as("__dsum_used"))
      .withColumn("__dsum",
        col("__dsum_used") + (lit(m.toLong) - col("n_used"))
          .cast("decimal(38,0)") *
          lit(new java.math.BigDecimal((BigInt(1) << K).bigInteger)).cast("decimal(38,0)"))
      .withColumn("__den",
        lit(new java.math.BigDecimal(alphaDen.bigInteger)).cast("decimal(38,0)") *
          col("__dsum"))
      .withColumn("n_est",
        // IntegralDivide (`div`) is EXACT on decimals (truncation; ==
        // floor here, all operands positive) — a `/` + cast would round
        // the scale-limited quotient, which is not an engine invariant
        expr(s"CAST(CAST(${num.toString} AS DECIMAL(38,0)) div __den AS BIGINT)"))
      .select(col(groupCol), col("n_used"), col("n_est"))
  }

  /** Per-key cell indexes, one per sketch row: floorMod(fnv1a("r:" + key),
    * width) — with width a power of two this equals the unsigned residue,
    * so an unsigned 128-bit replay is bit-exact. NULL -> empty (no cells). */
  /** EXACT heavy hitters — every key occurring in at least 1/`divisor`
    * of the rows — found WITHOUT a distinct-key-sized shuffle: a
    * per-partition Misra–Gries pass (Misra & Gries 1982, "Finding
    * repeated elements"; the merge analysis is Agarwal et al. 2013,
    * "Mergeable summaries") nominates a bounded candidate set, and only
    * candidates are counted exactly.
    *
    * Losslessness (the prefix-filter argument, made quantitative): a
    * global heavy hitter has count >= n/divisor, so by pigeonhole some
    * partition holds >= n/(divisor*p) of its occurrences. A Misra–Gries
    * summary with cap = divisor*p + 1 counters retains any key that
    * frequent in the partition even under TOTAL partition skew (a key
    * can only be evicted by cap decrement sweeps each consuming cap
    * units, so a key with local count > n_i/(cap+1) >= survives), and
    * its estimate undercounts by at most the sweep count — so nominating
    * every key with (est + sweeps)*divisor*p >= n is a SUPERSET of the
    * true heavies. Exact verification then decides membership, making
    * the output independent of partitioning even though the candidate
    * set is not. Candidate memory is O(divisor*p) per task — bounded
    * regardless of corpus or vocabulary size.
    *
    * Two data scans total — the floor for this output contract: the MG
    * pass ALSO tallies per-partition row counts (a sentinel row per
    * partition), so the total `n` that the nomination threshold needs is
    * read off the cached summary frame instead of a dedicated upfront
    * count() scan, and nomination happens post-hoc over the summary.
    * (The MG lower bound est <= c certifies membership for candidates
    * with est*divisor*p >= n without any further scan, but the exact
    * `cnt` column the output promises still requires the one
    * verification scan — certification can save that scan only under a
    * weaker estimates-only contract.) The executed partition count
    * cannot drift from the `p` in the bound: the pass runs over the
    * frame's materialized RDD, whose partitioning is fixed at that point
    * — an AQE re-plan of the DataFrame can no longer change it.
    *
    * Output: (key, cnt) with cnt*divisor >= n, exact counts. */
  def heavyHitters(items: DataFrame, keyCol: String, divisor: Long)
      : DataFrame = {
    require(divisor >= 1)
    val spark = items.sparkSession
    import spark.implicits._
    val keys = items.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
    // the RDD pins the executed partitioning — `p` and the partition
    // count the map-side pass actually runs with are the same object
    val rdd = keys.as[String].rdd
    val p = math.max(rdd.getNumPartitions, 1)
    // a wrapped Int cap would make the summary permanently empty and the
    // output SILENTLY wrong (empty), not an error — refuse instead
    require(divisor * p + 1 <= Int.MaxValue,
      s"divisor * partitions ($divisor * $p) exceeds the candidate-map " +
        "capacity budget; coalesce the input or lower the divisor")
    val cap = (divisor * p + 1).toInt
    // summary rows: (key, est + sweeps) per surviving counter, plus one
    // (null, n_i) sentinel per partition carrying the partition's row
    // count. The map never holds more than `cap` entries, so emitting
    // every counter (nomination moves post-hoc, once n is known) has the
    // same worst-case volume as the old pre-filtered emission.
    val summary = spark.createDataset(rdd.mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String, Long]
      var sweeps = 0L
      var nPart = 0L
      it.foreach { s =>
        nPart += 1
        if (m.contains(s)) m(s) += 1
        else if (m.size < cap) m(s) = 1L
        else { // decrement sweep: every counter down one, drop the zeros
          sweeps += 1
          val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
          m.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(m.remove)
        }
      }
      m.iterator.map { case (k, c) => (k, c + sweeps) } ++
        Iterator((null: String, nPart))
    }).toDF("k", "ub").persist()
    val n = summary.filter(col("k").isNull)
      .agg(coalesce(sum("ub"), lit(0L))).head().getLong(0)
    if (n == 0) {
      summary.unpersist()
      return keys.groupBy("k").agg(count(lit(1)).as("cnt"))
        .select(col("k").as("key"), col("cnt"))
    }
    // nomination/acceptance thresholds as driver-side ceiling divisions:
    // `ub*divisor*p >= n` and `cnt*divisor >= n` are equivalent to
    // `ub >= ceil(n/(divisor*p))` / `cnt >= ceil(n/divisor)` for
    // integers, and the rearranged form cannot overflow — the Column
    // products run in non-ANSI Long arithmetic, where divisor*p near the
    // Int.MaxValue cap times a partition-sized ub would silently wrap
    // and DROP true heavy hitters (the require above only guards the
    // map capacity, not this product)
    val nomThresh = (n + divisor * p - 1) / (divisor * p)
    val cntThresh = (n + divisor - 1) / divisor
    // materialize the (candidate-sized) nomination before dropping the
    // cached summary — a lazy unpersist would silently re-run the MG scan
    val cands = summary
      .filter(col("k").isNotNull && col("ub") >= nomThresh)
      .select("k").distinct().localCheckpoint(true)
    summary.unpersist()
    keys.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= cntThresh)
      .select(col("k").as("key"), col("cnt"))
  }

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
