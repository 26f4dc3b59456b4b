package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.FeedConfig
import graft.ops.{CuratedFeed, SequenceFeed, Tokenize}
import graft.streaming.StreamingOps

/** Executes a declarative `feed:` config ([[graft.config.FeedConfig]]) —
  * the CONTINUOUS twin of [[PipelineJob]]: one catch-up pass of the
  * curated loader feed ([[graft.ops.CuratedFeed]]) over whatever files
  * have landed under the source directory since the last pass. The
  * co-located streaming checkpoint tracks consumed files and keeps
  * batch ids monotone across invocations, so `graft.Main feed.yaml` on
  * a schedule IS continuous ingestion: each run curates, dedups,
  * encodes and cuts only the new arrivals, and the two stores under
  * `state_directory` (the deduped corpus and the training-ready
  * sequences) stay queryable throughout — the operators' own lease /
  * replay / ownership disciplines make a crashed pass re-runnable.
  *
  * Scale shape is [[graft.ops.CuratedFeed.curatedAppend]]'s: every
  * pass pays for its arrivals (plus the seen-store partitions they
  * hash into), never the corpus.
  */
object FeedJob {

  /** Run one catch-up pass. Returns a one-row summary frame
    * (batches_total, corpus_docs, sequences) describing the state
    * AFTER the pass — cumulative store totals, not this pass's
    * increment (the stores are the product; re-running with no new
    * files is a no-op that reports the same totals). */
  def run(spark: SparkSession, cfg: FeedConfig): DataFrame = {
    import spark.implicits._
    val merges = Tokenize.loadMerges(spark.read.parquet(cfg.mergesPath))
    val stream = StreamingOps.readEvents(spark, cfg.source.path.get)
    // the benchmark is a STATIC side input to the stream (content
    // pinned by the feed's recipe marker across passes)
    val bench = cfg.decontaminate.map(d =>
      graft.sources.SourceReader.read(spark, d.source))
    val q = StreamingOps.maintainCuratedFeed(stream, cfg.stateDirectory,
      merges, cfg.sequenceLength, cfg.shards, cfg.idColumn,
      cfg.textColumn,
      cfg.minWords.min(Int.MaxValue.toLong).toInt,
      cfg.maxWords.min(Int.MaxValue.toLong).toInt,
      cfg.specials, Some(cfg.boundary), cfg.buckets, cfg.maxBatchParts,
      bench, cfg.decontaminate.map(_.ngram).getOrElse(8), cfg.ledger)
    try q.processAllAvailable() finally q.stop()
    val batches = SequenceFeed.lastBatch(spark,
      CuratedFeed.feedDir(cfg.stateDirectory)) + 1
    val nDocs = CuratedFeed.corpus(spark, cfg.stateDirectory).count()
    val nSeqs = CuratedFeed.sequences(spark, cfg.stateDirectory).count()
    Seq((batches, nDocs, nSeqs))
      .toDF("batches_total", "corpus_docs", "sequences")
  }
}
