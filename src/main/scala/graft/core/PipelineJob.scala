package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.ops.{Chunking, Curation, Dedup, TextAnalysis, Tokenize}
import graft.sources.SourceReader

/** Executes a declarative `pipeline:` config ([[graft.config.PipelineConfig]])
  * — the [[ValidationJob]] twin for the curation/tokenize/export side: a
  * user writes YAML, `graft.Main pipeline.yaml` runs the full
  * quality-filter → dedup → decontaminate → tokenize → shard/pack
  * lifecycle with the SAME library operators a Scala caller composes
  * (`TextAnalysis.gopherRules`, `Dedup.exact`/LSH+CC,
  * `Curation.contamination`, `Tokenize.bpeEncodeIds`,
  * `Chunking.packBins` over the `shuffleShards` assignment — each
  * individually oracle-gated), so the declarative surface adds zero new
  * semantics to verify.
  *
  * Scale shape is the operators': every stage is one of the library's
  * audited plans (one-scan expression filters, capped-bucket LSH,
  * broadcast benchmark shingles, shuffle-free encode, one shard-keyed
  * exchange for the export). The driver only sequences them.
  */
object PipelineJob {

  /** One executed stage's record: rows in → rows kept. */
  final case class StageReport(stage: String, rowsIn: Long, rowsOut: Long)

  /** Run the configured pipeline. Returns (summary frame of
    * [[StageReport]]s in execution order, final frame of the last
    * stage — the packed export assignment when `export:` is present,
    * else the tokenized/filtered corpus). When `export:` is present the
    * packed assignment (doc_id, shard, n_tokens, bin_id,
    * bin_offset_tokens) is also written to
    * `{output_directory}/packed`. */
  def run(spark: SparkSession, cfg: PipelineConfig): (DataFrame, DataFrame) = {
    import spark.implicits._
    val id = cfg.idColumn
    val text = cfg.textColumn
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageReport]

    var docs = SourceReader.read(spark, cfg.source)
    var nDocs = docs.count()
    stages += StageReport("source", nDocs, nDocs)

    cfg.quality.foreach { q =>
      val before = nDocs
      docs = q.ruleSet match {
        case "gopher" =>
          // gopherRules emits (id, stats, per-rule flags, pass) — keep
          // passing ids with a semi join, so the doc payload columns
          // survive untouched
          docs.join(
            TextAnalysis.gopherRules(docs, id, text, q.minWords, q.maxWords)
              .filter(col("pass")).select(col(id)),
            Seq(id), "left_semi")
        case "score" =>
          docs.filter(TextAnalysis.qualityScore(col(text)) >= q.minScore)
        case other => throw new IllegalArgumentException(
          s"unknown quality rule_set `$other` (gopher | score)")
      }
      docs = docs.localCheckpoint()
      nDocs = docs.count()
      stages += StageReport(s"quality_${q.ruleSet}", before, nDocs)
    }

    cfg.dedup.foreach { d =>
      val before = nDocs
      docs = d.method match {
        case "exact" =>
          // min-id survivor per exact normalized-text fingerprint
          Dedup.exact(
            docs.withColumn("__fp", TextAnalysis.fingerprint(col(text))),
            id, Seq("__fp")).drop("__fp")
        case "minhash" =>
          // LSH candidates -> connected components; each duplicate
          // group's ROOT (its min id) survives, non-candidates pass
          val labels = Dedup.connectedComponentsStar(
            Dedup.minhashCandidates(
              Dedup.minhashSignatures(docs, id, text)))
          docs.join(
            labels.filter(col("id") =!= col("component"))
              .select(col("id").as(id)),
            Seq(id), "left_anti")
        case other => throw new IllegalArgumentException(
          s"unknown dedup method `$other` (exact | minhash)")
      }
      docs = docs.localCheckpoint()
      nDocs = docs.count()
      stages += StageReport(s"dedup_${d.method}", before, nDocs)
    }

    cfg.decontaminate.foreach { dc =>
      val before = nDocs
      val bench = SourceReader.read(spark, dc.source)
      val contaminated = Curation.contamination(docs, bench, id, text,
          dc.ngram)
        .filter(col("contaminated") === 1L)
        .select(col("id").as(id))
      docs = docs.join(contaminated, Seq(id), "left_anti").localCheckpoint()
      nDocs = docs.count()
      stages += StageReport("decontaminate", before, nDocs)
    }

    var out = docs
    cfg.tokenize.foreach { tk =>
      val mergesDf = tk.mergesPath match {
        case Some(p) => spark.read.parquet(p)
        case None => tk.scheme match {
          case "bytes" =>
            Tokenize.bpeTrainBytes(docs, text, tk.numMerges, tk.minFreq)
          case "word" =>
            Tokenize.bpeTrain(docs, text, tk.numMerges, tk.minFreq)
          case other => throw new IllegalArgumentException(
            s"unknown tokenize scheme `$other` (bytes | word)")
        }
      }
      val merges = Tokenize.loadMerges(mergesDf)
      out = tk.scheme match {
        case "bytes" => Tokenize.bpeEncodeIds(docs, id, text, merges)
        case "word" => Tokenize.bpeEncode(docs, id, text, merges)
        case other => throw new IllegalArgumentException(
          s"unknown tokenize scheme `$other` (bytes | word)")
      }
      stages += StageReport(s"tokenize_${tk.scheme}", nDocs, nDocs)
    }

    cfg.export.foreach { ex =>
      // the YAML loader enforces this too — repeated here for
      // programmatically built configs
      require(cfg.tokenize.nonEmpty,
        "`export` packs token counts — it requires `tokenize`")
      // t_export_packed's exact composition: deterministic hash shuffle
      // into shards, greedy contiguous packing within each shard in
      // hash order — one narrow encode pass upstream + one shard-keyed
      // exchange here
      val enc = out.select(col("id").as(id), col("n_tokens"))
      val sharded = enc
        .withColumn("h", xxhash64(col(id)))
        .withColumn("shard", pmod(col("h"), lit(ex.shards.toLong)))
      val packed = Chunking.packBins(sharded, "shard", "h", "n_tokens",
          ex.packCapacity)
        .join(sharded.select("h", id), Seq("h"))
        .select(col(id), col("shard"), col("n_tokens"),
          col("bin_id"), col("bin_offset_tokens"))
      packed.write.mode("overwrite")
        .option("maxRecordsPerFile", ex.maxRecordsPerFile)
        .parquet(s"${ex.outputDirectory}/packed")
      if (ex.writeTokens)
        // the loader-consumable corpus itself: token ids in the SAME
        // hash-shard assignment as the packed frame, one `shard=K/`
        // directory streamed in pos order (rolled files allowed)
        graft.ops.Sampling.shardWrite(out.withColumnRenamed("id", id),
          id, ex.shards, s"${ex.outputDirectory}/tokens",
          ex.maxRecordsPerFile)
      if (ex.sequenceLength > 0) {
        // loader-final form: each shard's id stream cut into exact
        // fixed-length rows (docs split across boundaries) — requires
        // the byte scheme (token_ids), where boundary tokens mark the
        // document ends the cut rows rely on
        require(out.columns.contains("token_ids"),
          "sequence_length needs `tokenize: {scheme: bytes}` (token_ids)")
        Chunking.fixedSequences(sharded
            .join(out.select(col("id").as(id), col("token_ids")), Seq(id)),
            "shard", "h", id, "token_ids", ex.sequenceLength)
          .write.mode("overwrite")
          .option("maxRecordsPerFile", ex.maxRecordsPerFile)
          .partitionBy("shard")
          .parquet(s"${ex.outputDirectory}/sequences")
      }
      out = spark.read.parquet(s"${ex.outputDirectory}/packed")
      stages += StageReport("export_packed", nDocs, out.count())
    }

    (stages.toSeq.toDF("stage", "rows_in", "rows_out"), out)
  }
}
