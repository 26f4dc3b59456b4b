package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Morton (Z-order) clustering and the
  * zone-map statistics that justify it.
  *
  * At 100 TB the dominant cost of a selective query is the scan, and the
  * dominant scan optimization is FILE SKIPPING off per-file min/max
  * statistics (parquet row-group stats / lakehouse zone maps). Min/max
  * stats only help when each file covers a NARROW range of the filtered
  * column — which a single-column sort gives one column at the expense of
  * every other. Interleaving the bits of two (or more) key columns into
  * one Morton code and range-bucketing on it keeps EVERY interleaved
  * dimension's per-bucket span near n^(1/d) of its domain, so predicates
  * on any of them skip most buckets (the layout behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * Everything here is pure integer bit arithmetic (shifts, masks, adds) —
  * engine-exact by construction, codegen-friendly, zero UDFs.
  */
object Layout {

  /** Morton code of two non-negative integer columns, `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. The expression
    * is the unrolled sum of 2*bits single-bit shift/mask terms — wide but
    * branch-free, whole-stage-codegen'd, and bit-identical in any engine.
    * Inputs must fit in `bits` bits (caller's contract; the TPC-H keys
    * here are bounded by schema). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in 1..31 keeps z in 62 bits")
    val xs = (0 until bits).map { i =>
      shiftleft(shiftright(x.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i)
    }
    val ys = (0 until bits).map { i =>
      shiftleft(shiftright(y.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
    val z = (xs ++ ys).reduce(_ + _)
    // an input past 2^bits-1 would silently ALIAS Morton buckets (the
    // high bits vanish from the interleave) — a wrong layout, not an
    // error, and invisible until scan pruning quietly degrades. Enforce
    // the documented contract per row instead: one branch-free codegen
    // comparison, and an out-of-domain key fails the query loudly.
    val lim = lit(1L << bits)
    val xl = x.cast(LongType)
    val yl = y.cast(LongType)
    when(xl >= 0 && xl < lim && yl >= 0 && yl < lim, z)
      .otherwise(raise_error(concat(
        lit(s"zValue: input exceeds $bits bits: x="), xl.cast("string"),
        lit(" y="), yl.cast("string"))))
  }

  /** The same Morton code as ANSI SQL text (for oracle replay): the
    * identical unrolled shift/mask sum, so both engines compute the same
    * BIGINT from the same inputs. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    val terms =
      (0 until bits).map(i => s"(((($x) >> $i) & 1) << ${2 * i})") ++
        (0 until bits).map(i => s"(((($y) >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " + ", ")")
  }

  /** Bucket rows by the TOP `log2Buckets` bits of their z-value — a pure
    * integer shift, so bucketing is a map-side projection (the heavy
    * global z-SORT a production `OPTIMIZE ZORDER` would do is exactly one
    * range-partitioned exchange; the bucket id here is its file id).
    * Adds `zval` and `zbucket` columns. */
  def zBucket(df: DataFrame, x: Column, y: Column, bits: Int,
      log2Buckets: Int): DataFrame = {
    require(log2Buckets >= 0 && 2 * bits >= log2Buckets)
    df.withColumn("zval", zValue(x, y, bits))
      .withColumn("zbucket", shiftright(col("zval"), 2 * bits - log2Buckets))
  }

  /** [[zBucket]] with the interleave width derived from the DATA: one
    * driver-side (max x, max y) aggregate sizes `bits` as the bit length
    * of the larger key (clamped so `2*bits >= log2Buckets`), removing
    * the scale trap of a hard-coded width — a fixed bits=15 raise_errors
    * the moment the key domain outgrows it (a scale-dependent crash
    * embedded in the caller), while a fixed-huge width parks every small
    * key in bucket 0. The max scan is column-pruned and map-combined —
    * at 100 TB it is one cheap pass, the same driver-scalar discipline
    * as the centroid counts.
    *
    * Exactly replayable: bit length = `length(bin(maxKey))` on any
    * engine, and since a WIDER interleave only prepends zero terms
    * (z_31 == z_bits numerically for keys inside the domain), an oracle
    * can compute z with a static 31-bit unroll and shift by the same
    * data-derived amount. */
  def zBucketAdaptive(df: DataFrame, x: Column, y: Column,
      log2Buckets: Int): DataFrame = {
    require(log2Buckets >= 0)
    val minBits = math.max(1, (log2Buckets + 1) / 2)
    val mx = df.agg(greatest(
      coalesce(max(x).cast(LongType), lit(0L)),
      coalesce(max(y).cast(LongType), lit(0L))).as("m")).head().getLong(0)
    require(mx < (1L << 31),
      s"zBucketAdaptive: key domain max $mx exceeds the 31-bit interleave budget")
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(mx, 1L))
    zBucket(df, x, y, math.max(bitlen, minBits), log2Buckets)
  }

  /** Per-bucket zone maps (count + min/max of both interleaved columns)
    * for a given bucket assignment — the statistics a scan planner would
    * consult to skip files. One keyed aggregate; output is bucket-count
    * sized. */
  def zoneMaps(df: DataFrame, bucketCol: String, x: Column, y: Column)
      : DataFrame =
    df.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(x).cast(LongType).as("min_x"), max(x).cast(LongType).as("max_x"),
        min(y).cast(LongType).as("min_y"), max(y).cast(LongType).as("max_y"))
}
