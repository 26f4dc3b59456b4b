package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the file-size governance a 100 TB table needs.
  *
  * Streaming micro-batches, over-parallel writers and incremental loads
  * leave tables as millions of KB-sized files; at scale the SCAN cost of
  * such a table is dominated by per-file open/footer overhead and the
  * driver's listing, not by bytes (the classic lakehouse "small files
  * problem" that Delta/Iceberg `OPTIMIZE` exists to fix). Compaction
  * rewrites the data as ~`targetBytes` files.
  *
  * Two surfaces:
  *
  *  - [[compactionPlan]] — the INSPECTION surface: list the directory
  *    (driver-side METADATA, file-count-sized — the same listing Spark's
  *    own `InMemoryFileIndex` does) and bin-pack sizes best-fit-decreasing
  *    into `targetBytes` bins. Returns one row per file with its assigned
  *    bin, so an operator can see what a rewrite would do before paying
  *    for it. The packer itself ([[packBins]]) is a pure function,
  *    O(n log n) via a capacity-keyed tree — fine at 10^7 files.
  *
  *  - [[compact]] — the EXECUTION surface, and deliberately NOT
  *    `repartition(n)`: a repartition is a full shuffle of every byte
  *    (write amplification ×2 across the cluster). Instead the rewrite
  *    rides Spark's own scan packing — `spark.sql.files.maxPartitionBytes`
  *    / `openCostInBytes` make the parquet scan itself coalesce many
  *    small files into ~targetBytes `FilePartition`s (size-desc first-fit,
  *    the same shape as [[packBins]]) — and the write emits one file per
  *    scan partition. One narrow, shuffle-free, whole-stage-codegen pass:
  *    read bytes once, write bytes once, nothing crosses the network on
  *    a co-located cluster. Column pruning/pushdown don't apply (every
  *    column survives a rewrite by definition).
  *
  * Limits (documented, standard for OPTIMIZE-style tools): output sizes
  * track INPUT bytes per bin, so recompression differences show up in
  * the output sizes, not the binning; hive-partitioned layouts should be
  * compacted per partition directory (the bin packer would happily mix
  * partitions, which `partitionBy` on rewrite would then re-split). */
object Compaction {

  /** Best-fit-decreasing bin packing of (name, bytes) into bins of
    * `targetBytes`: files in size-DESC order (name-ASC ties — fully
    * deterministic) each land in the fullest bin that still fits them,
    * else open a new bin. Oversized files get a bin of their own —
    * already the right rewrite unit, and the same choice the
    * scan-packing execution makes. Returns (name, bytes, bin) with bins
    * numbered by opening order.
    *
    * O(n log n): the open bins live in a TreeMap keyed by remaining
    * capacity, so best-fit is one `ceilingEntry` probe. */
  def packBins(files: Seq[(String, Long)], targetBytes: Long)
      : Seq[(String, Long, Int)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    // best-fit = the bin with the SMALLEST remaining capacity that still
    // fits: TreeMap[remaining -> bin ids at that remaining]
    val byRemaining = new java.util.TreeMap[Long, List[Int]]()
    val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
    def open(): Int = { remaining += targetBytes; remaining.length - 1 }
    def take(rem: Long): Int = {
      val ids = byRemaining.get(rem)
      ids match {
        case id :: rest =>
          if (rest.isEmpty) byRemaining.remove(rem)
          else byRemaining.put(rem, rest)
          id
        case Nil =>
          // unreachable (put never stores empty lists and keys come from
          // ceilingKey) — fail at the violation site rather than letting
          // a sentinel index corrupt `remaining` and the output rows
          sys.error(s"packBins invariant broken: empty bin list at remaining=$rem")
      }
    }
    def put(id: Int): Unit = {
      val rem = remaining(id)
      if (rem > 0)
        byRemaining.put(rem, id :: Option(byRemaining.get(rem)).getOrElse(Nil))
    }
    files.sortBy { case (name, bytes) => (-bytes, name) }.map {
      case (name, bytes) =>
        val fitKey = Option(byRemaining.ceilingKey(bytes))
        val id = fitKey match {
          case Some(rem) => take(rem)
          case None => open()
        }
        remaining(id) = math.max(0L, remaining(id) - bytes)
        put(id)
        (name, bytes, id)
    }
  }

  /** Recursive data-file listing with Spark's own visibility rule: a
    * file is data only if NO path segment below `dir` starts with `_` or
    * `.` — `fs.listFiles(recursive)` descends into `_temporary`/hidden
    * directories (a killed write's leftovers), and filtering just the
    * leaf name would count those phantom files while the scan ignores
    * them. One lister shared by [[compactionPlan]] and [[compact]]'s
    * stats so the two surfaces can never disagree on what counts. */
  private def listDataFiles(spark: SparkSession, dir: String)
      : Seq[(String, Long)] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseUri = fs.makeQualified(base).toUri
    val it = fs.listFiles(base, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val rel = baseUri.relativize(f.getPath.toUri).getPath
      val visible = rel.split('/').forall(seg =>
        !seg.startsWith("_") && !seg.startsWith("."))
      if (f.isFile && visible) files += ((f.getPath.toString, f.getLen))
    }
    files.toSeq
  }

  /** One row per data file under `dir` with its best-fit-decreasing
    * compaction bin: (file, bytes, bin). Driver-side listing only —
    * metadata-sized, no data read. Hidden/committer entries (`_`- and
    * `.`-prefixed path segments) are skipped, as Spark's own file index
    * does. */
  def compactionPlan(spark: SparkSession, dir: String, targetBytes: Long)
      : DataFrame = {
    import spark.implicits._
    packBins(listDataFiles(spark, dir), targetBytes)
      .toDF("file", "bytes", "bin")
  }

  /** Rewrite the parquet table at `srcDir` into `dstDir` as ~`targetBytes`
    * files with ZERO shuffle: the scan's FilePartition packing is the bin
    * assignment (maxPartitionBytes = targetBytes, openCostInBytes scaled
    * to 1/256 of it so padding never dominates real bytes), and each scan
    * partition writes exactly one output file. Runs eagerly on an
    * ISOLATED child session carrying the packing confs — the caller's
    * session is never mutated. Returns (files_in, bytes_in, files_out,
    * bytes_out) as a 1-row DataFrame. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    def stats(dir: String): (Long, Long) = {
      val fs = listDataFiles(spark, dir)
      (fs.size.toLong, fs.map(_._2).sum)
    }
    // an ISOLATED session (shared context and catalog, own SQLConf)
    // carries the three scan-packing settings: mutating the caller's
    // session conf for the duration of the rewrite would silently
    // re-shape every concurrently planned scan on that session
    val rewriteSession = spark.newSession()
    rewriteSession.conf.set("spark.sql.files.maxPartitionBytes",
      targetBytes.toString)
    rewriteSession.conf.set("spark.sql.files.openCostInBytes",
      math.max(targetBytes / 256, 1L).toString)
    // without this Spark SHRINKS partitions below maxPartitionBytes to
    // fill every core (bytesPerCore in FilePartition.maxSplitBytes) —
    // right for a query, wrong for a rewrite whose whole point is the
    // output file size
    rewriteSession.conf.set("spark.sql.files.minPartitionNum", "1")
    rewriteSession.read.parquet(srcDir)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    val (fi, bi) = stats(srcDir)
    val (fo, bo) = stats(dstDir)
    Seq((fi, bi, fo, bo))
      .toDF("files_in", "bytes_in", "files_out", "bytes_out")
  }

  /** CLUSTERED compaction — the `OPTIMIZE ... ORDER BY` shape: rewrite
    * into ~targetBytes files that are additionally RANGE-CLUSTERED on
    * `clusterCol`, so every output file covers a narrow, pairwise-
    * disjoint slice of the cluster key's domain and min/max file stats
    * (parquet footers / lakehouse zone maps) prune scans on that key.
    * This variant deliberately PAYS one range-partitioned shuffle — the
    * price of clustering; [[compact]] is the shuffle-free rewrite when
    * only file sizes need fixing, and `Layout.zBucket` the
    * multi-dimensional layout when two keys must both prune.
    *
    * Bin count = ceil(input bytes / targetBytes) (output sizes track
    * input bytes per range; compression differences show up in sizes,
    * not the clustering). Range boundaries come from Spark's reservoir
    * sampling — skewed keys get proportionally more files, which is the
    * behavior a clustered rewrite wants. Same stats frame as [[compact]]
    * plus `n_bins`. */
  def compactClustered(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long, clusterCol: String): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    val in = listDataFiles(spark, srcDir)
    val bytesIn = in.map(_._2).sum
    val nBins = math.max(1, math.ceil(bytesIn.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartitionByRange(nBins, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    val out = listDataFiles(spark, dstDir)
    Seq((in.size.toLong, bytesIn, out.size.toLong, out.map(_._2).sum,
        nBins.toLong))
      .toDF("files_in", "bytes_in", "files_out", "bytes_out", "n_bins")
  }
}
