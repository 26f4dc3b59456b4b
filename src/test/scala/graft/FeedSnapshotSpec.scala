package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, CuratedFeed, Curation, SequenceFeed, Tokenize}

/** Published training snapshots over the live sequence feed (frozen
  * identity-keyed row sets), the feed's seqLen pin, the curated feed's
  * recipe pin, and the curated decontamination stage. */
class FeedSnapshotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshStateDir(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString

  private def viaParquet(df: DataFrame): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("graft_snapin").toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def feedCorpus(n: Int): Seq[(Long, Long, Long, Array[Int])] = {
    val rnd = new scala.util.Random(20260817)
    (0L until n.toLong).map { i =>
      (i % 3, i * 10, i, Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(300)))
    }
  }

  private def appendBatch(rows: Seq[(Long, Long, Long, Array[Int])],
      b: Long, stateDir: String, seqLen: Int = 16): Unit =
    SequenceFeed.sequencesAppend(
      rows.filter(_._3 % 3 == b).toDF("shard", "ord", "doc", "ids"),
      b, stateDir, "shard", "ord", "doc", "ids", seqLen)

  private def key(df: DataFrame): Seq[(Long, Long, Seq[Int])] =
    df.select("shard", "seq_id", "token_ids")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Int]](2).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq

  test("publishSnapshot freezes the row set: appends and compaction " +
      "after the publish are invisible; ids and listing behave; a " +
      "missing id names the published ones") {
    val stateDir = freshStateDir()
    val rows = feedCorpus(60)
    appendBatch(rows, 0L, stateDir)
    appendBatch(rows, 1L, stateDir)
    val snap1 = SequenceFeed.publishSnapshot(spark, stateDir)
    assert(snap1 == 1L, "the snapshot id is the batch id it covers")
    val frozen = key(SequenceFeed.readSnapshot(spark, stateDir, snap1))
    assert(frozen == key(SequenceFeed.sequencesFromStore(spark, stateDir)),
      "at publish time the snapshot IS the store")
    // republication is a no-op
    assert(SequenceFeed.publishSnapshot(spark, stateDir) == 1L)
    // batch 2 lands and the store compacts — the snapshot is unmoved
    appendBatch(rows, 2L, stateDir)
    SequenceFeed.compactFeedStore(spark, stateDir)
    assert(key(SequenceFeed.readSnapshot(spark, stateDir, snap1)) == frozen,
      "appends + compaction must not move a published snapshot")
    val live = key(SequenceFeed.sequencesFromStore(spark, stateDir))
    assert(live.size > frozen.size, "the live store kept growing")
    // a second snapshot covers everything through batch 2
    val snap2 = SequenceFeed.publishSnapshot(spark, stateDir)
    assert(snap2 == 2L)
    assert(key(SequenceFeed.readSnapshot(spark, stateDir, snap2)) == live)
    assert(SequenceFeed.listSnapshots(spark, stateDir) == Seq(1L, 2L))
    val ex = intercept[IllegalArgumentException] {
      SequenceFeed.readSnapshot(spark, stateDir, 7L)
    }
    assert(ex.getMessage.contains("published") &&
      ex.getMessage.contains("1, 2"))
  }

  test("epoch permutations over a snapshot are stable across appends — " +
      "the property resume cursors need (over the live store they are " +
      "not)") {
    val stateDir = freshStateDir()
    val rows = feedCorpus(90)
    appendBatch(rows, 0L, stateDir)
    appendBatch(rows, 1L, stateDir)
    val snap = SequenceFeed.publishSnapshot(spark, stateDir)
    def epoch(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      Chunking.shuffleSequences(df, "shard", "seq_id", 4, seed = 3L)
        .select("shard", "seq_id", "out_shard", "pos")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val before = epoch(SequenceFeed.readSnapshot(spark, stateDir, snap))
    appendBatch(rows, 2L, stateDir)
    val after = epoch(SequenceFeed.readSnapshot(spark, stateDir, snap))
    assert(before == after,
      "the snapshot's epoch order must not shift under new arrivals")
    val liveEpoch = epoch(SequenceFeed.sequencesFromStore(spark, stateDir))
    assert(liveEpoch.size > before.size)
  }

  test("the feed pins seqLen on first append: a changed length throws " +
      "instead of mixing row lengths in one store") {
    val stateDir = freshStateDir()
    val rows = feedCorpus(30)
    appendBatch(rows, 0L, stateDir, seqLen = 16)
    val ex = intercept[IllegalArgumentException] {
      appendBatch(rows, 1L, stateDir, seqLen = 32)
    }
    assert(ex.getMessage.contains("seqLen 16") &&
      ex.getMessage.contains("32"))
    // the declared length still appends fine
    appendBatch(rows, 1L, stateDir, seqLen = 16)
  }

  // ---- curated feed: recipe pin + decontamination ----------------------

  private lazy val merges = Tokenize.loadMerges(spark.read
    .parquet("src/test/resources/bpe_bytes_merges.parquet"))

  private def docCorpus(): Seq[(Long, String)] = {
    val words = Seq("scan", "merge", "window", "join", "filter", "sort",
      "group", "limit", "union", "range")
    // the trailing id word keeps every text unique (the cyclic word
    // pattern alone repeats with period 10)
    (0L until 30L).map { i =>
      val n = 4 + (i % 5).toInt
      (i, (0 until n).map(k => words(((i + k) % 10).toInt))
        .mkString(" ") + s" doc$i")
    }
  }

  test("the curated feed pins its recipe: changed word bounds or a " +
      "changed merge table throw; the identical recipe keeps appending") {
    val stateDir = freshStateDir()
    val all = viaParquet(docCorpus().toDF("doc_id", "text"))
    def deliver(b: Long, minW: Int = 3,
        m: Seq[(String, String)] = merges): Unit =
      CuratedFeed.curatedAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === b), b, stateDir,
        m, seqLen = 16, nShards = 4, minWords = minW, maxWords = 10)
    deliver(0L)
    val e1 = intercept[IllegalArgumentException] { deliver(1L, minW = 4) }
    assert(e1.getMessage.contains("recipe"))
    val e2 = intercept[IllegalArgumentException] {
      deliver(1L, m = merges.take(3))
    }
    assert(e2.getMessage.contains("recipe"))
    deliver(1L) // the original recipe proceeds
    assert(SequenceFeed.lastBatch(spark,
      CuratedFeed.feedDir(stateDir)) == 1L)
  }

  test("curated decontamination: benchmark-overlapping documents never " +
      "persist (corpus and sequences match the direct composition); a " +
      "changed benchmark is a recipe change") {
    val withBench = freshStateDir()
    val reference = freshStateDir()
    // benchmark shares a full 3-gram with every doc whose id % 7 == 0
    // (those docs' first three words); plus one novel line
    val docs = docCorpus()
    val benchRows = docs.filter(_._1 % 7 == 0)
      .map { case (id, t) => (1000L + id, t.split(" ").take(3).mkString(" ")) } ++
      Seq((2000L, "completely novel benchmark line"))
    val bench = viaParquet(benchRows.toDF("doc_id", "text"))
    val all = viaParquet(docs.toDF("doc_id", "text"))
    for (b <- 0L to 2L)
      CuratedFeed.curatedAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === b), b, withBench,
        merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10,
        benchmark = Some(bench), decontaminateNgram = 3)
    // direct composition: drop contaminated ids up front, no benchmark
    val hits = Curation.contamination(all, bench, "doc_id", "text", 3)
      .filter(col("contaminated") === 1L).select(col("id").as("doc_id"))
    val cleared = all.join(hits, Seq("doc_id"), "left_anti")
    for (b <- 0L to 2L)
      CuratedFeed.curatedAppend(
        cleared.filter(pmod(col("doc_id"), lit(3L)) === b), b, reference,
        merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10)
    assert(key(CuratedFeed.sequences(spark, withBench)) ==
      key(CuratedFeed.sequences(spark, reference)))
    def corpusRows(d: String): Seq[(Long, String)] =
      CuratedFeed.corpus(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(corpusRows(withBench) == corpusRows(reference),
      "the persisted corpus must match the direct composition")
    val ids = CuratedFeed.corpus(spark, withBench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docs.map(_._1).filter(_ % 7 == 0).forall(!ids.contains(_)),
      "contaminated documents must not persist")
    assert(ids.nonEmpty)
    // a content-changed benchmark on the next batch is a recipe drift
    val otherBench = viaParquet(
      Seq((1L, "some other benchmark")).toDF("doc_id", "text"))
    val ex = intercept[IllegalArgumentException] {
      CuratedFeed.curatedAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === 0L), 0L, withBench,
        merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10,
        benchmark = Some(otherBench), decontaminateNgram = 3)
    }
    assert(ex.getMessage.contains("recipe"))
  }

  test("the ingestion ledger accounts the curation funnel per batch; " +
      "replays never double-book; writeLedger = false opts out") {
    val stateDir = freshStateDir()
    val silent = freshStateDir()
    // 12 docs, batch = id % 3: id 9 fails quality (1 word), id 10
    // duplicates id 1, id 11 duplicates id 2 — everything else unique
    val base = docCorpus().take(9).toMap
    val rows = (0L until 9L).map(i => (i, base(i))) ++ Seq(
      (9L, "scan"), (10L, base(1L)), (11L, base(2L)))
    val all = viaParquet(rows.toDF("doc_id", "text"))
    def deliver(d: String, withLedger: Boolean): Unit =
      for (b <- 0L to 2L)
        CuratedFeed.curatedAppend(
          all.filter(pmod(col("doc_id"), lit(3L)) === b), b, d,
          merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10,
          writeLedger = withLedger)
    deliver(stateDir, withLedger = true)
    deliver(silent, withLedger = false)
    val got = CuratedFeed.ledger(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // (batch, rows_in, quality_kept, decontaminated_kept, novel, cut)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == Seq(
      (0L, 4L, 3L, 3L, 3L),   // id 9 quality-dropped
      (1L, 4L, 4L, 4L, 3L),   // id 10 dups id 1 within the batch
      (2L, 4L, 4L, 4L, 3L))) // id 11 dups id 2 within the batch
    assert(got.map(_._6).sum ==
      CuratedFeed.sequences(spark, stateDir).count(),
      "per-batch cut counts sum to the store")
    assert(got.forall(_._6 >= 0L))
    // a replay of the last batch must not re-book it
    CuratedFeed.curatedAppend(
      all.filter(pmod(col("doc_id"), lit(3L)) === 2L), 2L, stateDir,
      merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10)
    assert(CuratedFeed.ledger(spark, stateDir).count() == 3L)
    assert(CuratedFeed.ledger(spark, silent).count() == 0L,
      "writeLedger = false leaves no ledger")
  }

  test("describe summarizes feed state metadata-priced: batches, pinned " +
      "seqLen, fence, carry totals, snapshots, recipe, seen batches") {
    val stateDir = freshStateDir()
    val all = viaParquet(docCorpus().toDF("doc_id", "text"))
    for (b <- 0L to 2L)
      CuratedFeed.curatedAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === b), b, stateDir,
        merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10)
    CuratedFeed.publishSnapshot(spark, stateDir)
    val d = CuratedFeed.describe(spark, stateDir).collect().head
    assert(d.getAs[Long]("last_batch") == 2L)
    assert(d.getAs[Int]("seq_len") == 16)
    assert(d.getAs[String]("owner") == null,
      "direct batch callers have no streaming owner")
    assert(d.getAs[Long]("compact_fence") == -1L)
    assert(d.getAs[Long]("shards_touched") > 0L)
    assert(d.getAs[Long]("total_sequences") ==
      CuratedFeed.sequences(spark, stateDir).count(),
      "carry marks count exactly the complete rows")
    assert(d.getAs[Long]("n_snapshots") == 1L &&
      d.getAs[Long]("latest_snapshot") == 2L)
    assert(d.getAs[String]("recipe") != null &&
      d.getAs[String]("recipe").contains("seqLen=16"))
    assert(d.getAs[Long]("seen_batches") == 2L)
  }

  test("curated snapshot passthroughs publish and read over the feed " +
      "store") {
    val stateDir = freshStateDir()
    val all = viaParquet(docCorpus().toDF("doc_id", "text"))
    for (b <- 0L to 1L)
      CuratedFeed.curatedAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === b), b, stateDir,
        merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10)
    val snap = CuratedFeed.publishSnapshot(spark, stateDir)
    assert(snap == 1L)
    val frozen = key(CuratedFeed.readSnapshot(spark, stateDir, snap))
    assert(frozen == key(CuratedFeed.sequences(spark, stateDir)))
    CuratedFeed.curatedAppend(
      all.filter(pmod(col("doc_id"), lit(3L)) === 2L), 2L, stateDir,
      merges, seqLen = 16, nShards = 4, minWords = 3, maxWords = 10)
    assert(key(CuratedFeed.readSnapshot(spark, stateDir, snap)) == frozen)
    assert(CuratedFeed.listSnapshots(spark, stateDir) == Seq(1L))
  }
}
