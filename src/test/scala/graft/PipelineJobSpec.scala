package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader
import graft.core.PipelineJob

/** Declarative `pipeline:` surface ([[graft.config.PipelineConfig]] /
  * [[PipelineJob]] / the [[graft.Main]] dispatch): YAML-driven
  * quality-filter → dedup → decontaminate → tokenize → shard/pack, each
  * stage row-identical to the direct library composition it wraps — the
  * end-to-end pin is byte-parity of the packed export with
  * `t_export_packed`'s frame. */
class PipelineJobSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val mergesPath = new java.io.File(
    "src/test/resources/bpe_bytes_merges.parquet").getAbsolutePath

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("yaml pipeline (tokenize bytes + export) reproduces " +
      "t_export_packed's frame exactly") {
    val outDir = Files.createTempDirectory("plout").toString
    val yaml =
      s"""pipeline:
         |  source:
         |    format: parquet
         |    path: $sfDir/documents.parquet
         |  id_column: doc_id
         |  text_column: text
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |  export:
         |    shards: 8
         |    pack_capacity: 2048
         |    output_directory: $outDir
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    val (summary, packed) = PipelineJob.run(spark, cfg)
    val stages = summary.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stages.map(_._1).toSeq ==
      Seq("source", "tokenize_bytes", "export_packed"))
    assert(stages.forall { case (_, i, o) => i > 0 && o > 0 })
    // the END-TO-END identity: the declarative surface must emit the
    // exact frame the oracle-gated t_export_packed query emits
    val want = rows(SparkEntry.queries("t_export_packed")(spark, sfDir)
      .select("doc_id", "shard", "n_tokens", "bin_id", "bin_offset_tokens"))
    assert(rows(packed) == want, "packed export == t_export_packed frame")
    // and the written artifact is that same frame
    assert(rows(spark.read.parquet(s"$outDir/packed")) == want)
  }

  test("quality/dedup/decontaminate stages match their direct library " +
      "compositions; summary counts are the real row counts") {
    val d = Files.createTempDirectory("plsyn")
    // 30 docs: ids 0-9 long clean text (pass gopher), 10-14 exact dups
    // of doc 10's text, 15-19 too short (fail gopher), 20-24 contain the
    // benchmark phrase (contaminated), 25-29 clean
    val phrase = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away to the deep green forest where it lives in peace")
    // must PASS all gopher rules: >= 50 words, stopword hits ("the",
    // "and", "with"), mean word length in 3..10, alpha words, no bullets
    val longText = (1 to 40)
      .map(i => s"the steady word$i flows and turns with ease").mkString(" ")
    val rows0 = (0 to 9).map(i => (i.toLong, s"$longText variant$i")) ++
      (10 to 14).map(i => (i.toLong, s"$longText duplicated body")) ++
      (15 to 19).map(i => (i.toLong, "too short")) ++
      (20 to 24).map(i => (i.toLong, s"$longText $phrase tail$i")) ++
      (25 to 29).map(i => (i.toLong, s"$longText clean$i tail"))
    rows0.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$d/docs")
    Seq((1L, phrase)).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$d/bench")
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  quality_filter: {rule_set: gopher, min_words: 50}
         |  dedup: {method: exact}
         |  decontaminate:
         |    source: {format: parquet, path: $d/bench}
         |    ngram: 8
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    val (summary, out) = PipelineJob.run(spark, cfg)
    val byStage = summary.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStage("source") == ((30L, 30L)))
    // gopher: ids 15-19 fail the word-count floor
    assert(byStage("quality_gopher") == ((30L, 25L)))
    // exact dedup: 11-14 are byte-dups of 10 (min id survives)
    assert(byStage("dedup_exact") == ((25L, 21L)))
    // decontamination: 20-24 share the benchmark's 8-gram shingles
    assert(byStage("decontaminate") == ((21L, 16L)))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == ((0L to 10L) ++ (25L to 29L)).toSet)
  }

  test("minhash dedup method: duplicate groups collapse to their root") {
    val d = Files.createTempDirectory("plmh")
    val body = (1 to 40).map(i => s"token$i body flows").mkString(" ")
    val rows0 = (0L to 5L).map(i => (i, s"$body shared near duplicate")) ++
      (6L to 9L).map(i => (i, s"totally different text $i " +
        (1 to 30).map(j => s"w$i$j").mkString(" ")))
    rows0.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$d/docs")
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  dedup: {method: minhash}
         |""".stripMargin
    val (summary, out) = PipelineJob.run(spark,
      ConfigLoader.pipelineFromYamlString(yaml))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 6L, 7L, 8L, 9L),
      s"group 0-5 must collapse to its root 0; got $kept")
    assert(summary.filter($"stage" === "dedup_minhash")
      .head().getLong(2) == 5L)
  }

  test("tokenize trains its own merges when merges_path is absent; a " +
      "word-scheme export persists the trained merge table") {
    val d = Files.createTempDirectory("pltr")
    (0L to 19L).map(i => (i, "alpha beta gamma delta " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/docs")
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  tokenize: {scheme: word, num_merges: 8}
         |""".stripMargin
    val (_, out) = PipelineJob.run(spark,
      ConfigLoader.pipelineFromYamlString(yaml))
    assert(out.columns.contains("n_tokens"))
    assert(out.count() == 20)
    // 8 merges over a 4-word vocabulary: every word fully merges
    assert(out.agg(org.apache.spark.sql.functions.max("n_tokens"))
      .head().getLong(0) <= 20L * 4L)
    // with an export, the TRAINED merge table must survive the job —
    // it exists nowhere else and the corpus is undecodable without it
    val outDir = Files.createTempDirectory("pltrx").toString
    PipelineJob.run(spark, ConfigLoader.pipelineFromYamlString(
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  tokenize: {scheme: word, num_merges: 8}
         |  export: {shards: 2, pack_capacity: 64, output_directory: $outDir}
         |""".stripMargin))
    val persisted = spark.read.parquet(s"$outDir/merges")
    assert(persisted.count() > 0 &&
      persisted.columns.toSet.contains("rank"))
  }

  test("write_tokens: the export also materializes the token-id corpus " +
      "in the same shard assignment, files in pos order") {
    val outDir = Files.createTempDirectory("pltok").toString
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $sfDir/documents.parquet}
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |    specials: ['<|endoftext|>']
         |    boundary: '<|endoftext|>'
         |  export:
         |    shards: 4
         |    pack_capacity: 2048
         |    output_directory: $outDir
         |    write_tokens: true
         |    sequence_length: 512
         |""".stripMargin
    val (_, packed) = PipelineJob.run(spark,
      ConfigLoader.pipelineFromYamlString(yaml))
    val tokens = spark.read.parquet(s"$outDir/tokens")
    assert(tokens.columns.contains("token_ids") &&
      tokens.columns.contains("doc_id"))
    assert(tokens.count() == packed.count())
    // same hash assignment as the packed frame
    val packShard = packed.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val tokShard = tokens.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(tokShard == packShard, "token shards == packed shards")
    // loader-final sequences: exact 512-token rows, total token mass
    // conserved (sum over sequences == sum over docs)
    val seqs = spark.read.parquet(s"$outDir/sequences")
    import org.apache.spark.sql.functions.{col => c, sum => su}
    assert(seqs.filter(c("complete")).filter(c("n_tokens") =!= 512)
      .count() == 0, "complete rows must be exactly 512 tokens")
    val seqTokens = seqs.agg(su("n_tokens")).head().getLong(0)
    val docTokens = tokens.agg(su("n_tokens")).head().getLong(0)
    assert(seqTokens == docTokens, "token mass conserved")
    // the export carries the tokenizer artifacts, and they are
    // SUFFICIENT: decoding the written corpus with ONLY the written
    // merge table + vocab round-trips the source text
    val wMerges = graft.ops.Tokenize.loadMerges(
      spark.read.parquet(s"$outDir/merges"))
    val vocab = spark.read.parquet(s"$outDir/vocab")
    val specials = vocab.filter(c("is_special")).orderBy("id")
      .collect().map(_.getString(1)).toSeq
    assert(specials == Seq("<|endoftext|>"))
    assert(vocab.count() == 256 + wMerges.length + 1)
    val decoded = graft.ops.Tokenize.bpeDecodeIdsDf(tokens, "doc_id",
        "token_ids", wMerges, specials)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val source = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("")).toMap
    assert(decoded.keySet == source.keySet)
    for ((id, text) <- source)
      assert(decoded(id) == text, s"artifact-only round trip of doc $id")
  }

  test("tokenize specials/boundary parse from YAML and flow to the " +
      "encoder; sequence_length without a boundary is refused by the " +
      "loader AND the job") {
    val outDir = Files.createTempDirectory("plsq").toString
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $sfDir/documents.parquet}
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |    specials: ['<|endoftext|>']
         |    boundary: '<|endoftext|>'
         |  export:
         |    shards: 8
         |    pack_capacity: 2048
         |    output_directory: $outDir
         |    sequence_length: 2048
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    assert(cfg.tokenize.get.specials == Seq("<|endoftext|>"))
    assert(cfg.tokenize.get.boundary.contains("<|endoftext|>"))
    assert(cfg.export.get.sequenceLength == 2048)
    // boundary-less sequence export: the loader refuses it outright
    val bad = yaml.replace("    specials: ['<|endoftext|>']\n", "")
      .replace("    boundary: '<|endoftext|>'\n", "")
    val exL = intercept[IllegalArgumentException] {
      ConfigLoader.pipelineFromYamlString(bad)
    }
    assert(exL.getMessage.contains("boundary"))
    // ... and so does the job, for programmatically built configs
    val exJ = intercept[IllegalArgumentException] {
      PipelineJob.run(spark, cfg.copy(
        tokenize = cfg.tokenize.map(_.copy(boundary = None, specials = Nil))))
    }
    assert(exJ.getMessage.contains("boundary"))
  }

  test("pipeline sequences output equals the direct t_sequences " +
      "composition (same merges, boundary, shards, cut) — the gated " +
      "contract") {
    val got = rows(SparkEntry.queries("t_pipeline_sequences")(spark, sfDir))
    val want = rows(SparkEntry.queries("t_sequences")(spark, sfDir))
    assert(got == want, "pipeline sequences == direct composition")
    assert(got.nonEmpty)
  }

  test("pad_token_id parses and pads the trailing partials to exactly " +
      "sequence_length") {
    val outDir = Files.createTempDirectory("plpad").toString
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $sfDir/documents.parquet}
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |    specials: ['<|endoftext|>']
         |    boundary: '<|endoftext|>'
         |  export:
         |    shards: 8
         |    pack_capacity: 2048
         |    output_directory: $outDir
         |    sequence_length: 2048
         |    pad_token_id: 280
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    assert(cfg.export.get.padTokenId.contains(280))
    PipelineJob.run(spark, cfg)
    val seqs = spark.read.parquet(s"$outDir/sequences")
    import org.apache.spark.sql.functions.{col => c}
    assert(seqs.filter(c("n_tokens") =!= 2048).count() == 0,
      "every emitted row is exactly sequence_length tokens")
    assert(seqs.filter(!c("complete")).count() ==
      seqs.filter(c("n_pad") > 0).count(),
      "pads appear exactly on the incomplete trailing rows")
    assert(seqs.filter(c("n_pad") > 0).count() > 0,
      "the sf0.001 corpus has at least one padded trailing row")
  }

  test("shuffle_sequences: parses, requires sequence_length, and the " +
      "written artifact is the deterministic permutation (pos-dense per " +
      "output shard, token mass conserved)") {
    import org.apache.spark.sql.functions.{col => c, sum => su}
    val outDir = Files.createTempDirectory("plshuf").toString
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $sfDir/documents.parquet}
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |    specials: ['<|endoftext|>']
         |    boundary: '<|endoftext|>'
         |  export:
         |    shards: 8
         |    pack_capacity: 2048
         |    output_directory: $outDir
         |    sequence_length: 512
         |    shuffle_sequences: true
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    assert(cfg.export.get.shuffleSequences)
    // shuffle without the cut is refused
    intercept[IllegalArgumentException] {
      ConfigLoader.pipelineFromYamlString(
        yaml.replace("    sequence_length: 512\n", ""))
    }
    PipelineJob.run(spark, cfg)
    val seqs = spark.read.parquet(s"$outDir/sequences")
    assert(seqs.columns.contains("out_shard") &&
      seqs.columns.contains("pos"), "artifact partitioned by out_shard")
    // pos dense per output shard; identity columns survive
    val perShard = seqs.groupBy("out_shard")
      .agg(org.apache.spark.sql.functions.count(c("pos")).as("n"),
        org.apache.spark.sql.functions.max(c("pos")).as("mx"))
      .collect()
    assert(perShard.nonEmpty)
    for (r <- perShard)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1,
        s"pos must be dense in out_shard ${r.get(0)}")
    // same rows as the unshuffled cut — mass conserved
    val plainDir = Files.createTempDirectory("plshuf0").toString
    PipelineJob.run(spark, cfg.copy(export = cfg.export.map(_.copy(
      outputDirectory = plainDir, shuffleSequences = false))))
    val plain = spark.read.parquet(s"$plainDir/sequences")
    assert(seqs.count() == plain.count())
    assert(seqs.agg(su("n_tokens")).head().getLong(0) ==
      plain.agg(su("n_tokens")).head().getLong(0))
  }

  test("new curation stages run in the fixed order and each equals its " +
      "direct library composition") {
    import org.apache.spark.sql.functions.{col => c}
    val d = Files.createTempDirectory("plstg")
    val en = "the cat and the dog walk to the park and it is good " * 3
    val de = "der hund und die katze gehen nicht zu dem park und das ist " * 3
    val boiler = "subscribe to our newsletter now"
    val rows0 = (0 until 24).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      val body = if (i % 3 == 0) de else en
      val mail = if (i % 4 == 0) s" contact admin$i@example.com now" else ""
      val lines = s"$body$mail variant$i\n$boiler"
      (i.toLong, s"src${i % 2}", lang, lines)
    }
    rows0.toDF("doc_id", "source", "lang", "text").write
      .mode("overwrite").parquet(s"$d/docs")
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  lang_filter: {keep: [en]}
         |  redact: {}
         |  line_dedup: {min_count: 2}
         |  source_cap: {domain_column: source, cap: 5}
         |""".stripMargin
    val cfg = ConfigLoader.pipelineFromYamlString(yaml)
    val (summary, out) = PipelineJob.run(spark, cfg)
    val stages = summary.collect().map(_.getString(0)).toSeq
    assert(stages == Seq("source", "lang_filter", "redact", "line_dedup",
      "source_cap"), s"fixed stage order, got $stages")
    // direct composition of the same four stages
    var want = spark.read.parquet(s"$d/docs")
    want = want.filter(graft.ops.TextAnalysis.langId(c("text")) === "en")
    want = graft.ops.Curation.redactPii(want, "text")
      .withColumn("text", c("redacted"))
      .drop("redacted", "n_emails", "n_ips")
    want = want.drop("text").join(
      graft.ops.Curation.lineDedup(want, "doc_id", "text", 2L)
        .select(c("doc_id"), c("clean_text").as("text")), Seq("doc_id"))
    want = graft.ops.Curation.perDomainCap(want, "source", "doc_id", 5)
      .drop("domain_rank")
    val gotRows = rows(out.select("doc_id", "source", "lang", "text"))
    val wantRows = rows(want.select("doc_id", "source", "lang", "text"))
    assert(gotRows == wantRows, "pipeline == direct composition")
    // each stage did real work on this corpus
    val byStage = summary.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStage("lang_filter")._2 == 16L, "de docs dropped")
    assert(byStage("source_cap")._2 == 10L, "capped at 5 per source")
    assert(out.filter(c("text").contains("@example.com")).count() == 0,
      "emails masked")
    assert(out.filter(c("text").contains(boiler)).count() == 0,
      "boilerplate lines removed")
  }

  test("span_dedup and mixture stages equal their direct compositions") {
    import org.apache.spark.sql.functions.{col => c}
    val d = Files.createTempDirectory("plmx")
    val span = "copied verbatim span of many tokens repeated"
    val rows0 = (0 until 30).map { i =>
      val dom = if (i % 5 == 0) "web" else "books"
      val uniq = (1 to 10).map(j => s"u$i$j").mkString(" ")
      (i.toLong, dom, s"$uniq $span tail$i")
    }
    rows0.toDF("doc_id", "domain", "text").write
      .mode("overwrite").parquet(s"$d/docs")
    val yaml =
      s"""pipeline:
         |  source: {format: parquet, path: $d/docs}
         |  span_dedup: {k: 5, min_count: 2}
         |  mixture:
         |    domain_column: domain
         |    shares: {books: 0.5, web: 0.5}
         |""".stripMargin
    val (summary, out) = PipelineJob.run(spark,
      ConfigLoader.pipelineFromYamlString(yaml))
    assert(summary.collect().map(_.getString(0)).toSeq ==
      Seq("source", "span_dedup", "mixture"))
    // direct composition
    var want = spark.read.parquet(s"$d/docs")
    want = want.drop("text").join(
      graft.ops.Curation.spanDedup(want, "doc_id", "text", 5, 2L)
        .select(c("doc_id"), c("clean_text").as("text")), Seq("doc_id"))
    val weights = graft.ops.Curation.mixtureWeights(
      want.select(c("domain"),
        graft.ops.TextAnalysis.tokenEstimate(c("text")).as("__toks")),
      "domain", "__toks", Seq("books" -> 0.5, "web" -> 0.5))
    want = graft.ops.Curation.applyMixture(want, "domain", "doc_id",
      weights).drop("rate_q20")
    assert(rows(out.select("doc_id", "domain", "text")) ==
      rows(want.select("doc_id", "domain", "text")))
    // the repeated span is gone from every surviving doc
    assert(out.filter(c("text").contains(span)).count() == 0)
    // mixture downsampled the majority domain (web is the scarce one
    // relative to a 50/50 target, so books must shed rows)
    val kept = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("books", 0L) < 24L, s"books downsampled: $kept")
  }

  test("graft.Main dispatches a pipeline: yaml to PipelineJob") {
    val outDir = Files.createTempDirectory("plmain").toString
    val f = Files.createTempFile("plcfg", ".yaml")
    java.nio.file.Files.writeString(f,
      s"""pipeline:
         |  source:
         |    format: parquet
         |    path: $sfDir/documents.parquet
         |  tokenize:
         |    scheme: bytes
         |    merges_path: $mergesPath
         |  export:
         |    shards: 4
         |    pack_capacity: 1024
         |    output_directory: $outDir
         |""".stripMargin)
    assert(ConfigLoader.isPipeline(f.toString))
    val first = Main.run(spark, f.toString)
    assert(first.getString(0) == "source")
    assert(spark.read.parquet(s"$outDir/packed").count() > 0)
  }
}
