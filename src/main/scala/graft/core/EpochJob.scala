package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.EpochConfig
import graft.ops.{Chunking, CuratedFeed, SequenceFeed}

/** Executes a declarative `epoch:` config ([[graft.config.EpochConfig]]):
  * export one training epoch from a PUBLISHED SNAPSHOT of a sequence
  * feed — [[graft.ops.SequenceFeed.readSnapshot]] →
  * [[graft.ops.Chunking.shuffleSequences]] (seed = the epoch number) →
  * optional [[graft.ops.Chunking.epochResume]] → a parquet write under
  * `{output}/epoch=<seed>` partitioned by `out_shard`, each shard's
  * file(s) in permuted `pos` order (rows leave the shuffle sorted, so
  * the partitioned write streams them in consumption order).
  *
  * Epochs are refused over the LIVE store by design: positions come
  * from `row_number` over the row set, so arrivals between two reads
  * (or between a loader's death and its resume) would silently shift
  * every cursor. A snapshot's row set is frozen; its epoch order is a
  * pure function of (snapshot, seed) forever. Publish one with
  * [[graft.ops.SequenceFeed.publishSnapshot]] (or let the feed's
  * operator do it at a batch boundary) and name it here — `snapshot:
  * latest` picks the newest published id.
  *
  * `state_directory` accepts either a raw [[graft.ops.SequenceFeed]]
  * state or a [[graft.ops.CuratedFeed]] state (the feed store is probed
  * under `{state}/feed` first).
  *
  * Scale: one store-sized scan + ONE exchange (the permutation must
  * move data; training reads the full epoch anyway); the cursor filter
  * prunes `out_shard` partitions at the scan on resume.
  */
object EpochJob {

  /** Run the export. Returns a one-row summary
    * (snapshot, seed, sequences, n_out). */
  def run(spark: SparkSession, cfg: EpochConfig): DataFrame = {
    import spark.implicits._
    // a CuratedFeed state nests the sequence feed under feed/
    val curated = CuratedFeed.feedDir(cfg.stateDirectory)
    val fs = new org.apache.hadoop.fs.Path(cfg.stateDirectory)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val feedState =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$curated/seqstore")))
        curated
      else cfg.stateDirectory
    val published = SequenceFeed.listSnapshots(spark, feedState)
    val snapId = cfg.snapshot.getOrElse {
      require(published.nonEmpty,
        s"no published snapshot at $feedState — epochs are refused over " +
          "the live store (arrivals shift positions and break resume " +
          "cursors); publish one with SequenceFeed.publishSnapshot first")
      published.last
    }
    val rows = SequenceFeed.readSnapshot(spark, feedState, snapId)
    val ordered = Chunking.shuffleSequences(rows, "shard", "seq_id",
      cfg.nOut, seed = cfg.seed)
    val resumed = cfg.cursor match {
      case Some((fromShard, fromPos)) =>
        Chunking.epochResume(ordered, fromShard, fromPos)
      case None => ordered
    }
    // an empty partitioned write leaves an unreadable directory — and
    // an empty epoch always means a mis-aimed config (a fresh snapshot
    // with no complete rows, or a cursor past the end)
    require(!resumed.isEmpty,
      s"epoch ${cfg.seed} of snapshot $snapId at $feedState is empty — " +
        "nothing to export (no complete sequences at the snapshot, or " +
        "the cursor points past the epoch's end)")
    val out = s"${cfg.output}/epoch=${cfg.seed}"
    resumed.write.mode("overwrite").partitionBy("out_shard").parquet(out)
    val n = spark.read.parquet(out).count()
    Seq((snapId, cfg.seed, n, cfg.nOut))
      .toDF("snapshot", "seed", "sequences", "n_out")
  }
}
