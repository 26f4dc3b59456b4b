package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join by segment filtering (the
  * partition scheme of Li, Deng & Feng 2011, "PASS-JOIN: a
  * partition-based method for similarity joins" — pigeonhole on d+1
  * segments). The data-cleaning primitive behind typo-tolerant entity
  * matching: all pairs with Levenshtein distance <= d, without the
  * all-pairs blow-up.
  *
  * The filter: split every string into k = d+1 contiguous segments
  * (deterministic scheme below). If ed(x, y) <= d, at most d segments of
  * x can be touched by an edit, so at least one segment of x appears in
  * y EXACTLY — and its start position in y is shifted by at most d (the
  * net insert/delete imbalance before it is bounded by the edit count).
  * Candidate generation therefore only needs an EQUI-join between x's
  * segments and the length-compatible substrings of y at positions
  * within +-d — a lossless filter: any candidate-generation superset
  * yields the same output because verification (exact integer
  * Levenshtein DP, identical by definition in any engine) decides
  * membership.
  *
  * Why this survives 100 TB: per string the index side emits d+1 rows
  * and the probe side at most (2d+1)^2 * (d+1) substrings — constants,
  * not corpus factors; the candidate join keys on (source length,
  * segment index, segment text), whose selectivity is the segment text
  * itself; verification touches candidates only. Strings shorter than
  * d+1 characters cannot host d+1 non-empty segments and fall back to a
  * length-bucketed all-pairs check — a bounded set (at most
  * |alphabet|^d distinct strings that short).
  */
object EditJoin {

  /** Deterministic segment scheme: string of length l, k segments; the
    * first k - (l mod k) segments have length l div k, the rest one
    * more. Returns (start, len) pairs, 0-based. */
  private def segments(l: Int, k: Int): Seq[(Int, Int)] = {
    val base = l / k
    val extra = l % k
    (0 until k).map { i =>
      val plain = k - extra
      if (i < plain) (i * base, base)
      else (plain * base + (i - plain) * (base + 1), base + 1)
    }
  }

  /** All unordered pairs of `df` rows whose `strCol` values are within
    * Levenshtein distance `d`, as (id_a, id_b, dist) with id_a < id_b
    * (ids compared as longs). Exact — candidate generation is the
    * lossless PASS-JOIN segment filter, membership is decided by the
    * engine's integer Levenshtein. */
  def editJoin(df: DataFrame, idCol: String, strCol: String, d: Int)
      : DataFrame = {
    require(d >= 1, "threshold must be at least 1")
    val k = d + 1
    val rows = df.select(col(idCol).cast("long").as("id"),
      coalesce(col(strCol), lit("")).as("s"))
    val long = rows.filter(length(col("s")) >= k).persist()
    val short = rows.filter(length(col("s")) < k)

    // index side: the d+1 segments of each string, keyed by (len, i, seg)
    val segUdf = udf { (s: String) =>
      segments(s.length, k).zipWithIndex.map { case ((st, ln), i) =>
        (i, s.substring(st, st + ln))
      }
    }
    val idx = long.select(col("id"), col("s"),
        length(col("s")).as("l"), explode(segUdf(col("s"))).as("seg"))
      .select(col("id"), col("s"), col("l"),
        col("seg._1").as("i"), col("seg._2").as("sub"))

    // probe side: for every source length l within +-d of |y| and every
    // segment index, the substrings of y with that segment's length at
    // start positions within +-d of the segment's home position
    val probeUdf = udf { (y: String) =>
      val ly = y.length
      (for {
        l <- math.max(k, ly - d) to (ly + d)
        ((st, ln), i) <- segments(l, k).zipWithIndex
        p <- math.max(0, st - d) to math.min(ly - ln, st + d)
      } yield (l, i, y.substring(p, p + ln))).distinct
    }
    val probe = long.select(col("id"), col("s"), explode(probeUdf(col("s"))).as("c"))
      .select(col("id"), col("s"), col("c._1").as("l"),
        col("c._2").as("i"), col("c._3").as("sub"))

    // candidates (both directions collapse to id-ordered pairs), then
    // exact verification; names ride along so no join-back is needed
    // (profiled: a payload-free join with id join-back verification is
    // SLOWER — the two extra id joins cost more than 16-char payloads in
    // the probe shuffle).
    //
    // shuffle_hash, not the default sort-merge: the probe side is
    // ~(2d+1)^2*(d+1) rows per string and SMJ must SORT it — profiled 2x
    // slower than hashing the (d+1)-rows-per-string index side and
    // STREAMING the probe through it. Memory contract: the per-partition
    // hash build is the segment index over corpus/shuffle-partitions
    // strings — the same sizing rule as any hash aggregate; scale
    // shuffle partitions with the corpus (AQE splits skewed segment
    // keys) and the build stays bounded while the big side never sorts.
    // The strategy hint also pre-empts an auto-broadcast of a tiny index
    // side — a deliberate trade: generate/UDF subtrees carry inflated
    // size estimates that rarely qualify for broadcast anyway, and at
    // the smallest measured corpus (6 k docs, the sf0.1 bench) the
    // hinted plan is ALREADY the faster one (2.47 s -> 1.75 s); corpora
    // small enough for the broadcast to matter finish in milliseconds
    // either way.
    val candLong = idx.as("x").hint("shuffle_hash").join(probe.as("y"),
        Seq("l", "i", "sub"))
      .filter(col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"),
        when(col("x.id") < col("y.id"), col("x.s")).otherwise(col("y.s")).as("sa"),
        when(col("x.id") < col("y.id"), col("y.s")).otherwise(col("x.s")).as("sb"))
      .distinct()

    // short strings: |s| < k means the segment scheme cannot apply, but
    // a partner differs in length by at most d — expand the (few, and
    // alphabet-bounded regardless of corpus) short strings over their
    // length window and EQUI-join on the partner's length: no
    // nested-loop/range join anywhere
    val sShort = short
      .select(col("id"), col("s"),
        explode(expr(s"sequence(greatest(0, length(s) - $d), length(s) + $d)"))
          .as("lw"))
    val candShort = sShort.as("x").join(
        rows.select(col("id"), col("s"), length(col("s")).as("lw")).as("y"),
        Seq("lw"))
      .filter(col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"),
        when(col("x.id") < col("y.id"), col("x.s")).otherwise(col("y.s")).as("sa"),
        when(col("x.id") < col("y.id"), col("y.s")).otherwise(col("x.s")).as("sb"))
      .distinct()

    val out = candLong.unionByName(candShort).distinct()
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist"))
      .localCheckpoint(true)
    long.unpersist()
    out
  }
}
