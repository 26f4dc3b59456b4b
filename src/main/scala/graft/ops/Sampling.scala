package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment step of
  * a training-data pipeline.
  *
  * Assignment is a pure expression over the row's id (`pmod(xxhash64(id),
  * 10000)` against cumulative basis-point thresholds): no RNG state, no
  * sampling pass, stable under reruns/retries/repartitioning, and any
  * engine can recompute membership from the id alone. One scan, no
  * shuffle — the property that matters at 100 TB is exactly this
  * statelessness: adding data later never reassigns existing rows.
  */
object Sampling {

  private def checkSplits(splits: Seq[(String, Int)]): Unit = {
    require(splits.nonEmpty && splits.map(_._2).sum == 10000,
      s"split weights must sum to 10000 bp, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "every split needs positive weight")
  }

  /** name CASE over an already-computed `split_bucket` column. */
  private def splitCase(splits: Seq[(String, Int)]): Column = {
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    splits.zip(cums).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), rest) =>
        when(col("split_bucket") < cum, name).otherwise(rest)
    }
  }

  /** Assign each row to a named split by hashed-id bucket. `splits` are
    * (name, weight-in-basis-points) and must sum to 10000. Appends
    * `split_bucket` (0..9999) and `split`. */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    checkSplits(splits)
    df.withColumn("split_bucket", pmod(xxhash64(col(idCol)), lit(10000L)))
      .withColumn("split", splitCase(splits))
  }

  /** LEAKAGE-SAFE split: every member of a duplicate/near-dup GROUP
    * lands in the SAME split. Hashing row ids ([[assignSplit]]) puts a
    * training document's near-duplicates into the eval split with
    * probability (1 - train share) each — the classic train/test
    * contamination channel; hashing the GROUP key closes it. `labels`
    * is an (id, component) frame — [[graft.ops.Dedup.connectedComponentsStar]]
    * over LSH/SimHash candidate pairs, or any grouping; rows absent from
    * `labels` are singleton groups keyed by their own id, so their
    * assignment is IDENTICAL to [[assignSplit]]'s (the two rules agree
    * everywhere except inside duplicate groups, which is the point).
    * Appends `split_group`, `split_bucket`, `split`.
    *
    * Scale: `labels` is candidate-pair-sized (docs that hit some LSH
    * bucket together), not corpus-sized — one left equi-join (broadcast
    * when small, shuffled otherwise) plus the same stateless hash
    * expression as assignSplit; membership stays recomputable from
    * (id, labels) alone and stable under corpus growth as long as the
    * grouping is. */
  def assignSplitByGroup(df: DataFrame, idCol: String, labels: DataFrame,
      splits: Seq[(String, Int)]): DataFrame = {
    checkSplits(splits)
    // components are functional in id, so dedup is free when labels is
    // already one-row-per-id — and a guard when a caller passes raw
    // candidate PAIRS, which would otherwise silently duplicate corpus
    // rows through the left join and double-count documents downstream
    val lab = labels.select(col("id").as("__gid"), col("component").as("__comp"))
      .dropDuplicates("__gid")
    df.join(lab, col(idCol) === col("__gid"), "left_outer")
      .withColumn("split_group", coalesce(col("__comp"), col(idCol)))
      .drop("__gid", "__comp")
      .withColumn("split_bucket", pmod(xxhash64(col("split_group")), lit(10000L)))
      .withColumn("split", splitCase(splits))
  }

  /** Deterministic stratified sampling — rebalance a corpus by keeping a
    * per-stratum fraction (basis points of 10000) of rows, e.g. to
    * downsample a dominant language. Same stateless hashed-id rule as
    * [[assignSplit]]: a row is kept iff `pmod(xxhash64(id), 10000) <
    * rateBp(stratum)` — no RNG, no count pass, membership recomputable
    * from (id, stratum) alone, and adding data never flips existing
    * rows. Strata not listed use `defaultBp`. Appends `sample_bucket`.
    *
    * Scale: a pure filter expression in the scan — one pass, zero
    * shuffle, and the per-stratum rate lookup is a small CASE expression
    * (codegen'd), not a join. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      ratesBp: Seq[(String, Int)], defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.map(_._2)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesBp.foldRight(lit(defaultBp): Column) {
      case ((name, bp), rest) => when(col(strataCol) === name, bp).otherwise(rest)
    }
    df.withColumn("sample_bucket", pmod(xxhash64(col(idCol)), lit(10000L)))
      .filter(col("sample_bucket") < rate)
  }

  /** Largest-remainder (Hamilton) apportionment of an integer `budget`
    * across the groups of `groupCol`, proportionally to each group's row
    * count — the exact-integer allocator behind quota sampling ("draw
    * 100k examples across domains proportionally"): every group gets
    * floor(budget * w / W), and the leftover seats go one each to the
    * largest remainders (ties by group name, so the result is a pure
    * function of the counts). Output: (groupCol, cnt, alloc) with
    * sum(alloc) == budget exactly.
    *
    * Everything is integer arithmetic on counts — no rates, no doubles,
    * engine-exact. The budget*count products run in DECIMAL(38,0)
    * (the [[systematicSample]] discipline: a 10^9 budget times a 10^10-row
    * group is 10^19, past BIGINT — non-ANSI Spark would wrap silently).
    * The aggregate is groups-sized; the remainder rank runs
    * on the groups frame (domain-cardinality — thousands, not rows), so
    * the single-partition window is over METADATA, same posture as the
    * mixture-weights op (`Curation.mixtureWeights`). */
  /** Systematic sampling proportional to an INTEGER weight column (the
    * classic PPS grid scheme): lay the rows end-to-end on a [0, W) line
    * in `idCol` order, each covering an interval of its weight; drop a
    * regular grid of k points at multiples of W/k; a row is drawn once
    * per grid point inside its interval. Rows heavier than W/k can be
    * drawn multiple times — `picks` carries the multiplicity, and
    * sum(picks) == k EXACTLY (the grid points are counted by
    * telescoping ceilings). The weighted analogue of "draw exactly
    * 100k examples", e.g. proportional to token counts.
    *
    * Engine-exactness: with the grid test done as integer ceiling
    * division — picks = ceil(k*cum_hi / W) - ceil(k*cum_lo / W), with
    * ceil(a/b) = (a + b - 1) div b, all operands positive — the draw is
    * a pure function of the (id-ordered) integer weights. Evaluated in
    * DECIMAL(38,0): k * W must stay under 10^38, which holds through
    * k = 10^12 draws from W = 10^15 total tokens; BIGINT would overflow
    * at real scale. No RNG, no doubles.
    *
    * Scale: the cumulative sum is [[Indexing.globalRunningSum]] (one
    * range exchange + a metadata-sized offset collect — no
    * single-partition window); the grid test is then a pure projection.
    * Zero- and negative-weight rows are excluded up front (they cover
    * no interval). Output: the drawn rows + (cum_lo, cum_hi, picks). */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      k: Long): DataFrame = {
    require(k > 0, "sample size must be positive")
    val pos = df.filter(col(weightCol) > 0)
    val cum = Indexing.globalRunningSum(pos, Seq(col(idCol)), weightCol,
      outCol = "cum_hi")
    val total = cum.agg(max("cum_hi").as("__w"))
    val dec = "decimal(38,0)"
    cum.crossJoin(broadcast(total))
      .withColumn("cum_lo", col("cum_hi") - col(weightCol))
      .withColumn("picks",
        expr(s"CAST((CAST($k AS $dec) * cum_hi + __w - 1) div __w" +
          s" - (CAST($k AS $dec) * cum_lo + __w - 1) div __w AS BIGINT)"))
      .filter(col("picks") > 0)
      .drop("__w")
  }

  /** Deterministic GLOBAL SHUFFLE + shard assignment — the export step
    * that turns a curated corpus into the N randomized shards a training
    * run streams. Appends (`shard` 0..nShards-1, `pos` 0..|shard|-1):
    * shard = `pmod(xxhash64(id), n)`, position = rank of the row's full
    * hash WITHIN its shard (tie-broken by id). Reading the shards in
    * (shard, pos) order is therefore a pseudorandom permutation of the
    * corpus that is REPRODUCIBLE from the ids alone — no RNG state, no
    * sampling pass, identical across reruns and engines (the oracle
    * replays it in DuckDB HUGEINT arithmetic).
    *
    * Scale: ONE hash-partitioned exchange on `shard` plus a per-shard
    * sort (spill-aware, never global): the alternative global
    * orderBy(hash) + modulo-rownum costs a range exchange AND a global
    * sort for the same permutation. Shard sizes concentrate tightly
    * around |corpus|/n (hashing is law-of-large-numbers balanced; no
    * planned skew because ids don't repeat at export time). `idCol`
    * should be unique per row — duplicate ids receive a deterministic
    * position MULTISET, but which duplicate takes which position is
    * plan-dependent. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
  }

  /** The export frame [[shardWrite]] materializes: repartitioned to
    * `nShards` tasks BEFORE the position window, so the window's
    * ClusteredDistribution(shard) is satisfied by the repartition and
    * the whole export plan carries exactly ONE exchange (spec-pinned —
    * windowing first and repartitioning after would shuffle the corpus
    * twice whenever nShards != spark.sql.shuffle.partitions, i.e.
    * always). */
  private[graft] def shardFrame(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .sortWithinPartitions(col("shard"), col("pos"))
  }

  /** Materialize the shard assignment as an export directory: one
    * `shard=K/` partition per shard, each holding ONE file (or a rolled
    * sequence, below) whose row order is the shard's `pos` order — a
    * training loader can stream `shard=K` sequentially and see the
    * permuted corpus. One exchange total (see [[shardFrame]]);
    * row-identical to [[shuffleShards]].
    *
    * SCALE: write parallelism equals `nShards` — one task and one sort
    * per shard, by design (sequential loaders read a shard as one
    * ordered stream). Size `nShards` to the corpus: at 100 TB the demo
    * constant 8 means 12.5 TB per task; hundreds-to-thousands is the
    * production range. `maxRecordsPerFile` > 0 additionally ROLLS each
    * shard's output into multiple files without breaking order — Spark
    * splits a task's output sequentially, so `part-...c000, c001, ...`
    * within `shard=K/` concatenate in `pos` order (loaders that accept
    * rolled files stream them lexicographically; spec-pinned). */
  def shardWrite(df: DataFrame, idCol: String, nShards: Int,
      dir: String, maxRecordsPerFile: Long = 0L): Unit = {
    require(maxRecordsPerFile >= 0, "maxRecordsPerFile must be >= 0")
    shardFrame(df, idCol, nShards)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard").parquet(dir)
  }

  def largestRemainderAllocate(df: DataFrame, groupCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val quota = counts.crossJoin(broadcast(total))
      .withColumn("floor_alloc", expr(
        s"CAST((CAST($budget AS DECIMAL(38,0)) * cnt) div total AS BIGINT)"))
      .withColumn("rem", expr(s"(CAST($budget AS DECIMAL(38,0)) * cnt) % total"))
    // leftover = budget - sum(floor_alloc): one more groups-sized agg,
    // broadcast back as a scalar
    val leftover = quota.agg((lit(budget) - sum("floor_alloc")).as("leftover"))
    quota.crossJoin(broadcast(leftover))
      .withColumn("rrank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col(groupCol))))
      .withColumn("alloc",
        col("floor_alloc") + when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
      .select(col(groupCol), col("cnt"), col("alloc"))
  }
}
