package graft.config

/** Quality-filter stage: `rule_set: gopher` applies the exact published
  * Gopher rule conjunction ([[graft.ops.TextAnalysis.gopherRules]]);
  * `rule_set: score` keeps documents whose heuristic
  * [[graft.ops.TextAnalysis.qualityScore]] reaches `min_score`. */
final case class QualitySpec(
    ruleSet: String = "gopher",
    minWords: Long = 50,
    maxWords: Long = 100000,
    minScore: Double = 0.5)

/** Dedup stage: `method: exact` keeps the min-id document per exact
  * normalized-text fingerprint; `method: minhash` runs the full
  * LSH-candidate → connected-components pipeline and keeps each
  * duplicate group's root (its min id). */
final case class DedupSpec(method: String = "exact")

/** Decontamination stage: drop documents sharing at least one word
  * `ngram`-shingle with the benchmark corpus read from `source`. */
final case class DecontaminateSpec(source: SourceSpec, ngram: Int = 8)

/** Tokenize stage: `scheme: bytes` (GPT-2 byte-level) or `scheme: word`.
  * `merges_path` points at a pre-trained (rank, left, right, freq)
  * parquet merge table; absent, the stage TRAINS `num_merges` merges on
  * the pipeline's own (already filtered) corpus. */
final case class TokenizeSpec(
    scheme: String = "bytes",
    mergesPath: Option[String] = None,
    numMerges: Int = 24,
    minFreq: Long = 2L)

/** Export stage: deterministic hash shuffle into `shards`, greedy
  * contiguous packing into `pack_capacity`-token bins within each shard
  * (the [[graft.ops.Chunking.packBins]] discipline), written to
  * `output_directory/packed`. With `write_tokens: true` the encoded
  * documents themselves (token ids and all) are ALSO materialized as a
  * loader-consumable `output_directory/tokens` shard layout
  * ([[graft.ops.Sampling.shardWrite]] — same hash assignment as the
  * packed frame, `shard=K/` files in pos order, rolled at
  * `max_records_per_file`). */
final case class ExportSpec(
    shards: Int = 8,
    packCapacity: Long = 2048L,
    outputDirectory: String,
    maxRecordsPerFile: Long = 0L,
    writeTokens: Boolean = false,
    // `sequence_length` > 0 additionally cuts each shard's concatenated
    // id stream into exact fixed-length rows
    // ([[graft.ops.Chunking.fixedSequences]]) at
    // `output_directory/sequences` — the loader-final form
    sequenceLength: Int = 0)

/** Typed `pipeline:` YAML surface — the reference's config-as-API idea
  * (SURVEY §1.5) generalized from validation to the curation/tokenize/
  * export side: a training-data pipeline (quality filter → dedup →
  * decontaminate → tokenize → shard/pack) declared as configuration and
  * executed by [[graft.core.PipelineJob]], no Scala required. Stages are
  * all optional and run in the fixed order above; the export stage
  * requires tokenize (it packs token counts). */
final case class PipelineConfig(
    source: SourceSpec,
    idColumn: String = "doc_id",
    textColumn: String = "text",
    quality: Option[QualitySpec] = None,
    dedup: Option[DedupSpec] = None,
    decontaminate: Option[DecontaminateSpec] = None,
    tokenize: Option[TokenizeSpec] = None,
    export: Option[ExportSpec] = None)
