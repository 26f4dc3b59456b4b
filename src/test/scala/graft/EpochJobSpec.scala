package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader
import graft.core.EpochJob
import graft.ops.{Chunking, CuratedFeed, SequenceFeed, Tokenize}

/** The declarative `epoch:` surface (config/ConfigLoader +
  * core/EpochJob): epoch exports from published snapshots equal the
  * direct composition, live stores are refused, cursors resume, and
  * graft.Main dispatches. */
class EpochJobSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def feedCorpus(n: Int): Seq[(Long, Long, Long, Array[Int])] = {
    val rnd = new scala.util.Random(20260818)
    (0L until n.toLong).map { i =>
      (i % 3, i * 10, i, Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(300)))
    }
  }

  /** A two-batch feed with a published snapshot; returns its stateDir. */
  private def publishedFeed(): String = {
    val stateDir = freshDir("graft_ej")
    val rows = feedCorpus(80)
    for (b <- 0L to 1L)
      SequenceFeed.sequencesAppend(
        rows.filter(_._3 % 3 == b).toDF("shard", "ord", "doc", "ids"),
        b, stateDir, "shard", "ord", "doc", "ids", seqLen = 16)
    SequenceFeed.publishSnapshot(spark, stateDir)
    stateDir
  }

  private def epochYaml(stateDir: String, out: String, seed: Long = 2L,
      snapshot: String = "latest", cursor: String = ""): String =
    s"""epoch:
       |  state_directory: $stateDir
       |  output: $out
       |  n_out: 4
       |  seed: $seed
       |  snapshot: $snapshot
       |$cursor""".stripMargin

  private def key(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    // partition-column discovery re-infers out_shard as INT on read-back
    df.select(col("shard"), col("seq_id"),
        col("out_shard").cast("long").as("out_shard"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._3, t._4)).toSeq

  test("epoch export == the direct snapshot → shuffle composition; the " +
      "written shards hold the permuted order") {
    val stateDir = publishedFeed()
    val out = freshDir("graft_ejout")
    val cfg = ConfigLoader.epochFromYamlString(epochYaml(stateDir, out))
    val summary = EpochJob.run(spark, cfg).collect().head
    assert(summary.getLong(0) == 1L, "latest snapshot is batch 1")
    assert(summary.getLong(1) == 2L)
    val direct = Chunking.shuffleSequences(
      SequenceFeed.readSnapshot(spark, stateDir, 1L),
      "shard", "seq_id", 4, seed = 2L)
    val written = spark.read.parquet(s"$out/epoch=2")
    assert(key(written) == key(direct))
    assert(summary.getLong(2) == key(direct).size.toLong)
    // (out_shard, pos) is dense per shard — the loader contract
    val byShard = key(written).groupBy(_._3)
    for ((s, rows) <- byShard)
      assert(rows.map(_._4) == (0L until rows.size.toLong),
        s"positions of out_shard $s must be dense from 0")
  }

  test("an explicit snapshot id and a resume cursor drive readSnapshot " +
      "and epochResume") {
    val stateDir = publishedFeed()
    val out = freshDir("graft_ejout2")
    val cfg = ConfigLoader.epochFromYamlString(epochYaml(stateDir, out,
      snapshot = "1",
      cursor = "  cursor:\n    shard: 2\n    pos: 3\n"))
    assert(cfg.snapshot.contains(1L) && cfg.cursor.contains((2L, 3L)))
    EpochJob.run(spark, cfg)
    val direct = Chunking.epochResume(
      Chunking.shuffleSequences(
        SequenceFeed.readSnapshot(spark, stateDir, 1L),
        "shard", "seq_id", 4, seed = 2L), 2L, 3L)
    assert(key(spark.read.parquet(s"$out/epoch=2")) == key(direct))
  }

  test("epochs over a live (never-published) store are refused; a " +
      "curated stateDir probes its nested feed store") {
    val live = freshDir("graft_ejlive")
    val rows = feedCorpus(30)
    SequenceFeed.sequencesAppend(
      rows.toDF("shard", "ord", "doc", "ids"), 0L, live,
      "shard", "ord", "doc", "ids", seqLen = 16)
    val ex = intercept[IllegalArgumentException] {
      EpochJob.run(spark, ConfigLoader.epochFromYamlString(
        epochYaml(live, freshDir("graft_ejx"))))
    }
    assert(ex.getMessage.contains("publish"))
    // curated probing: the same surface over a CuratedFeed stateDir
    val curated = freshDir("graft_ejcur")
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_merges.parquet"))
    val words = Seq("scan", "merge", "window", "join", "filter", "sort",
      "group", "limit", "union", "range")
    val docs = (0L until 30L).map { i =>
      (i, (0 until (4 + (i % 5)).toInt)
        .map(k => words(((i + k) % 10).toInt)).mkString(" "))
    }
    val src = freshDir("graft_ejdocs")
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(src)
    CuratedFeed.curatedAppend(spark.read.parquet(src), 0L, curated,
      merges, seqLen = 8, nShards = 4, minWords = 3, maxWords = 10)
    CuratedFeed.publishSnapshot(spark, curated)
    val out = freshDir("graft_ejcurout")
    val summary = EpochJob.run(spark, ConfigLoader.epochFromYamlString(
      epochYaml(curated, out, seed = 0L))).collect().head
    assert(summary.getLong(0) == 0L)
    val direct = Chunking.shuffleSequences(
      CuratedFeed.readSnapshot(spark, curated, 0L),
      "shard", "seq_id", 4, seed = 0L)
    assert(key(spark.read.parquet(s"$out/epoch=0")) == key(direct))
  }

  test("graft.Main dispatches an epoch: yaml to EpochJob; the loader " +
      "refuses what the job cannot honor") {
    val stateDir = publishedFeed()
    val out = freshDir("graft_ejmain")
    val f = Files.createTempFile("epochcfg", ".yaml")
    Files.writeString(f, epochYaml(stateDir, out))
    assert(ConfigLoader.isEpoch(f.toString))
    assert(!ConfigLoader.isFeed(f.toString) &&
      !ConfigLoader.isPipeline(f.toString))
    val row = Main.run(spark, f.toString)
    assert(row.getLong(2) > 0L)
    assert(new java.io.File(s"$out/epoch=2").exists())
    // refusals
    def load(y: String) = ConfigLoader.epochFromYamlString(y)
    val ok = epochYaml(stateDir, out)
    assert(intercept[IllegalArgumentException](
      load(ok.replace("  n_out: 4\n", ""))).getMessage.contains("n_out"))
    assert(intercept[IllegalArgumentException](
      load(ok.replace("n_out: 4", "n_out: 0")))
      .getMessage.contains("n_out"))
    assert(intercept[IllegalArgumentException](
      load(ok.replace("seed: 2", "seed: -1"))).getMessage.contains("seed"))
    assert(intercept[IllegalArgumentException](
      load(ok.replace(s"  output: $out\n", "")))
      .getMessage.contains("output"))
  }
}
