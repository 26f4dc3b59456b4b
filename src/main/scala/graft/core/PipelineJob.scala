package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.ops.{Chunking, Curation, Dedup, TextAnalysis, Tokenize}
import graft.sources.SourceReader

/** Executes a declarative `pipeline:` config ([[graft.config.PipelineConfig]])
  * — the [[ValidationJob]] twin for the curation/tokenize/export side: a
  * user writes YAML, `graft.Main pipeline.yaml` runs the full
  * lang-filter → quality → redact → line/span-dedup → dedup →
  * decontaminate → cap/mixture → tokenize → shard/pack lifecycle with
  * the SAME library operators a Scala caller composes
  * (`TextAnalysis.langId`/`gopherRules`, `Curation.redactPii`/
  * `lineDedup`/`spanDedup`/`perDomainCap`/`mixtureWeights`/
  * `contamination`, `Dedup.exact`/LSH+CC, `Tokenize.bpeEncodeIds`,
  * `Chunking.packBins`/`fixedSequences` over the `shuffleShards`
  * assignment — each individually oracle-gated), so the declarative
  * surface adds zero new semantics to verify.
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

    // advance one stage: checkpoint (stages are reused by everything
    // downstream), recount, record
    def step(name: String)(next: DataFrame): Unit = {
      val before = nDocs
      docs = next.localCheckpoint()
      nDocs = docs.count()
      stages += StageReport(name, before, nDocs)
    }

    cfg.langFilter.foreach { lf =>
      require(lf.keep.nonEmpty, "lang_filter needs a non-empty keep set")
      step("lang_filter") {
        docs.filter(TextAnalysis.langId(col(text)).isin(lf.keep: _*))
      }
    }

    cfg.quality.foreach { q =>
      step(s"quality_${q.ruleSet}") {
        q.ruleSet match {
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
      }
    }

    cfg.redact.foreach { _ =>
      // mask BEFORE any fingerprint/tokenizer touches the text — nothing
      // downstream ever sees the raw PII
      step("redact") {
        Curation.redactPii(docs, text)
          .withColumn(text, col("redacted"))
          .drop("redacted", "n_emails", "n_ips")
      }
    }

    cfg.lineDedup.foreach { ld =>
      // lineDedup emits (id, clean_text, line counts) — rejoin so the
      // doc payload columns survive, with the cleaned text in place
      step("line_dedup") {
        docs.drop(text).join(
          Curation.lineDedup(docs, id, text, ld.minCount)
            .select(col(id), col("clean_text").as(text)),
          Seq(id))
      }
    }

    cfg.spanDedup.foreach { sd =>
      step("span_dedup") {
        docs.drop(text).join(
          Curation.spanDedup(docs, id, text, sd.k, sd.minCount)
            .select(col(id), col("clean_text").as(text)),
          Seq(id))
      }
    }

    cfg.dedup.foreach { d =>
      step(s"dedup_${d.method}") {
        d.method match {
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
      }
    }

    cfg.decontaminate.foreach { dc =>
      step("decontaminate") {
        val bench = SourceReader.read(spark, dc.source)
        val contaminated = Curation.contamination(docs, bench, id, text,
            dc.ngram)
          .filter(col("contaminated") === 1L)
          .select(col("id").as(id))
        docs.join(contaminated, Seq(id), "left_anti")
      }
    }

    cfg.sourceCap.foreach { sc =>
      step("source_cap") {
        Curation.perDomainCap(docs, sc.domainColumn, id, sc.cap)
          .drop("domain_rank")
      }
    }

    cfg.mixture.foreach { mx =>
      step("mixture") {
        val weights = Curation.mixtureWeights(
          docs.select(col(mx.domainColumn),
            TextAnalysis.tokenEstimate(col(text)).as("__toks")),
          mx.domainColumn, "__toks", mx.shares)
        Curation.applyMixture(docs, mx.domainColumn, id, weights)
          .drop("rate_q20")
      }
    }

    var out = docs
    // the tokenizer's artifacts, held for the export stage: (merge
    // table, loaded merges, specials, scheme) — a trained merge table
    // would otherwise be LOST with the job, leaving the exported corpus
    // undecodable
    var tokArtifacts
        : Option[(DataFrame, Seq[(String, String)], Seq[String], String)] =
      None
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
        case "bytes" =>
          tokArtifacts = Some((mergesDf, merges, tk.specials, "bytes"))
          Tokenize.bpeEncodeIds(docs, id, text, merges,
            specials = tk.specials, boundary = tk.boundary)
        case "word" =>
          require(tk.specials.isEmpty && tk.boundary.isEmpty,
            "specials/boundary are byte-scheme only (the word scheme " +
              "has no reserved-id space)")
          // a TRAINED word-scheme merge table must survive the job too
          tokArtifacts = Some((mergesDf, merges, Nil, "word"))
          Tokenize.bpeEncode(docs, id, text, merges)
        case other => throw new IllegalArgumentException(
          s"unknown tokenize scheme `$other` (bytes | word)")
      }
      stages += StageReport(s"tokenize_${tk.scheme}", nDocs, nDocs)
    }

    cfg.export.foreach { ex =>
      // config validation FIRST — the YAML loader enforces these too,
      // repeated here for programmatically built configs; they must all
      // fire before the (expensive, eager) encode materialization below
      require(cfg.tokenize.nonEmpty,
        "`export` packs token counts — it requires `tokenize`")
      require(ex.sequenceLength <= 0 ||
          cfg.tokenize.exists(_.boundary.nonEmpty),
        "`sequence_length` needs `tokenize.boundary` — fixed-length " +
          "sequences concatenate documents and rely on the boundary " +
          "token to mark where each ends")
      require(ex.padTokenId.isEmpty || ex.sequenceLength > 0,
        "`pad_token_id` only applies with `sequence_length`")
      // a pad id outside the declared vocabulary would poison every
      // trailing sequence with an id no decoder or embedding table has
      for ((_, merges, specials, "bytes") <- tokArtifacts;
          p <- ex.padTokenId)
        require(p >= 0 && p < 256 + merges.length + specials.length,
          s"pad_token_id $p is outside the vocabulary " +
            s"[0, ${256 + merges.length + specials.length}) induced by " +
            "this merge table + specials")
      // the export consumes the encoded corpus up to three times (pack
      // counts, token-shard write, sequence ids) and the BPE encode is
      // the expensive pass — materialize it ONCE. localCheckpoint is
      // executor-disk-backed and bounded by the token stream; at
      // extreme scale prefer `write_tokens: true` and point loaders at
      // that artifact (the checkpoint then saves the same recomputes
      // during this job)
      out = out.localCheckpoint()
      // t_export_packed's exact composition: deterministic hash shuffle
      // into shards, greedy contiguous packing within each shard in
      // (hash, id) order — one narrow encode pass upstream + one
      // shard-keyed exchange here. The id tiebreak keeps a 64-bit hash
      // collision (near-certain at 10^10 docs) deterministic, and
      // carrying the id through the pack window removes the join back
      val enc = out.select(col("id").as(id), col("n_tokens"))
      val sharded = enc
        .withColumn("h", xxhash64(col(id)))
        .withColumn("shard", pmod(col("h"), lit(ex.shards.toLong)))
      val packed = Chunking.packBins(sharded, "shard", Seq("h", id),
          "n_tokens", ex.packCapacity)
        .select(col(id), col("shard"), col("n_tokens"),
          col("bin_id"), col("bin_offset_tokens"))
      packed.write.mode("overwrite")
        .option("maxRecordsPerFile", ex.maxRecordsPerFile)
        .parquet(s"${ex.outputDirectory}/packed")
      // tokenizer artifacts ride the export: the merge table (trained
      // ones exist nowhere else — both schemes) and, for the byte
      // scheme, the induced id→token vocabulary — everything an
      // external decoder / a later encode job needs. Metadata-sized,
      // one file each
      tokArtifacts.foreach { case (mergesDf, merges, specials, scheme) =>
        mergesDf.coalesce(1).write.mode("overwrite")
          .parquet(s"${ex.outputDirectory}/merges")
        if (scheme == "bytes")
          Tokenize.vocabDf(spark, merges, specials).coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${ex.outputDirectory}/vocab")
      }
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
        val cut = Chunking.fixedSequences(sharded
            .join(out.select(col("id").as(id), col("token_ids")), Seq(id)),
            "shard", "h", id, "token_ids", ex.sequenceLength,
            ex.padTokenId)
        // shuffled: the rows leave shuffleSequences already repartitioned
        // + sorted by (out_shard, pos), so the partitioned write streams
        // each output shard in permuted order
        val seqOut = if (ex.shuffleSequences)
          Chunking.shuffleSequences(cut, "shard", "seq_id", ex.shards)
        else cut
        seqOut.write.mode("overwrite")
          .option("maxRecordsPerFile", ex.maxRecordsPerFile)
          .partitionBy(if (ex.shuffleSequences) "out_shard" else "shard")
          .parquet(s"${ex.outputDirectory}/sequences")
      }
      out = spark.read.parquet(s"${ex.outputDirectory}/packed")
      stages += StageReport("export_packed", nDocs, out.count())
    }

    (stages.toSeq.toDF("stage", "rows_in", "rows_out"), out)
  }
}
