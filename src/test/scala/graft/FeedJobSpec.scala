package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader
import graft.core.FeedJob
import graft.ops.{CuratedFeed, Tokenize}

/** The declarative `feed:` surface (config/ConfigLoader + core/FeedJob):
  * catch-up passes over a landing directory equal the direct
  * curatedAppend composition, batch ids continue across invocations,
  * and the loader refuses the configs the operators cannot honor. */
class FeedJobSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val mergesPath = "src/test/resources/bpe_bytes_merges.parquet"
  private lazy val merges =
    Tokenize.loadMerges(spark.read.parquet(mergesPath))

  private def feedYaml(srcDir: String, stateDir: String): String =
    s"""feed:
       |  source:
       |    format: parquet
       |    path: $srcDir
       |  state_directory: $stateDir
       |  quality_filter:
       |    min_words: 20
       |    max_words: 80
       |  tokenize:
       |    merges_path: $mergesPath
       |    specials: ['<|endoftext|>']
       |    boundary: '<|endoftext|>'
       |  sequence_length: 512
       |  shards: 4
       |""".stripMargin

  private def snap(stateDir: String): Seq[(Long, Long, Long)] =
    CuratedFeed.sequences(spark, stateDir)
      .select("shard", "seq_id", "ids_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("two catch-up passes over a landing directory == two direct " +
      "curatedAppend batches; batch ids continue across invocations") {
    val src = Files.createTempDirectory("feedsrc").toString
    val declared = Files.createTempDirectory("feedst").toString
    val direct = Files.createTempDirectory("feedst2").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val cfg = ConfigLoader.feedFromYamlString(feedYaml(src, declared))
    // pass 1: only file A has landed
    a.write.mode("overwrite").parquet(src)
    val s1 = FeedJob.run(spark, cfg).collect().head
    assert(s1.getLong(0) == 1L, "one batch after the first pass")
    // pass 2: file B lands; the checkpoint skips A's files
    b.write.mode("append").parquet(src)
    val s2 = FeedJob.run(spark, cfg).collect().head
    assert(s2.getLong(0) == 2L, "batch ids continue across invocations")
    for (batch <- Seq(a, b).zipWithIndex)
      CuratedFeed.curatedAppend(batch._1, batch._2.toLong, direct, merges,
        seqLen = 512, nShards = 4, minWords = 20, maxWords = 80)
    assert(snap(declared) == snap(direct))
    assert(snap(declared).nonEmpty)
    assert(s2.getLong(1) ==
      CuratedFeed.corpus(spark, direct).count())
    // a third pass with NOTHING new is a no-op reporting the same totals
    val s3 = FeedJob.run(spark, cfg).collect().head
    assert(s3 == s2)
    // the ledger is on by default: one funnel row per delivered batch
    val led = CuratedFeed.ledger(spark, declared).collect()
    assert(led.length == 2 &&
      led.map(_.getAs[Long]("batch")).toSeq == Seq(0L, 1L))
    // and declinable: `ledger: false` parses and suppresses it
    val offCfg = ConfigLoader.feedFromYamlString(
      feedYaml(src, Files.createTempDirectory("feedoff").toString) +
        "  ledger: false\n")
    assert(!offCfg.ledger)
    FeedJob.run(spark, offCfg)
    assert(CuratedFeed.ledger(spark, offCfg.stateDirectory).count() == 0L)
  }

  test("graft.Main dispatches a feed: yaml to FeedJob") {
    val src = Files.createTempDirectory("feedmsrc").toString
    val stateDir = Files.createTempDirectory("feedmst").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
      .write.mode("overwrite").parquet(src)
    val f = Files.createTempFile("feedcfg", ".yaml")
    Files.writeString(f, feedYaml(src, stateDir))
    assert(ConfigLoader.isFeed(f.toString))
    assert(!ConfigLoader.isPipeline(f.toString))
    val row = Main.run(spark, f.toString)
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) > 0L)
  }

  test("a declared decontaminate: stage parses and drives the curated " +
      "benchmark filter (declared pass == direct composition)") {
    val src = Files.createTempDirectory("feeddsrc").toString
    val benchDir = Files.createTempDirectory("feedbench").toString
    val declared = Files.createTempDirectory("feeddst").toString
    val direct = Files.createTempDirectory("feeddst2").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.write.mode("overwrite").parquet(src)
    // benchmark = a slice of the corpus itself: guaranteed overlap
    val bench = docs.filter(col("doc_id") % 11 === 0)
    bench.write.mode("overwrite").parquet(benchDir)
    val yaml = feedYaml(src, declared) +
      s"""  decontaminate:
         |    source:
         |      format: parquet
         |      path: $benchDir
         |    ngram: 5
         |""".stripMargin
    val cfg = ConfigLoader.feedFromYamlString(yaml)
    assert(cfg.decontaminate.exists(_.ngram == 5))
    FeedJob.run(spark, cfg)
    CuratedFeed.curatedAppend(docs, 0L, direct, merges,
      seqLen = 512, nShards = 4, minWords = 20, maxWords = 80,
      benchmark = Some(spark.read.parquet(benchDir)),
      decontaminateNgram = 5)
    assert(snap(declared) == snap(direct))
    // the benchmark slice really was dropped on both sides
    val ids = CuratedFeed.corpus(spark, declared)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val benchIds = bench.collect().map(_.getLong(0))
      .filter(ids.contains).toSeq
    assert(benchIds.isEmpty,
      s"benchmark docs persisted: ${benchIds.take(5)}")
  }

  test("the loader refuses configs the operators cannot honor") {
    def load(y: String) = ConfigLoader.feedFromYamlString(y)
    val ok = feedYaml("/tmp/x", "/tmp/y")
    load(ok) // sanity: the base parses
    // no merges_path — a stream cannot train its own merge table
    val noMerges = ok.replace(s"    merges_path: $mergesPath\n", "")
    assert(intercept[IllegalArgumentException](load(noMerges))
      .getMessage.contains("merges_path"))
    // boundary not among the specials
    val badBoundary = ok.replace("boundary: '<|endoftext|>'",
      "boundary: '<|pad|>'")
    assert(intercept[IllegalArgumentException](load(badBoundary))
      .getMessage.contains("boundary"))
    // a query source has no arrival semantics
    val querySrc = ok.replace(s"    path: /tmp/x\n",
      "    path: /tmp/x\n    query: 'SELECT 1'\n")
    assert(intercept[IllegalArgumentException](load(querySrc))
      .getMessage.contains("arrival"))
    // sequence_length must be positive
    val zeroSeq = ok.replace("sequence_length: 512", "sequence_length: 0")
    assert(intercept[IllegalArgumentException](load(zeroSeq))
      .getMessage.contains("sequence_length"))
    // inverted quality bounds
    val badQ = ok.replace("min_words: 20", "min_words: 200")
    assert(intercept[IllegalArgumentException](load(badQ))
      .getMessage.contains("word bounds"))
  }
}
