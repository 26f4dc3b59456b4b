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

/** Language filter stage: keep documents whose
  * [[graft.ops.TextAnalysis.langId]] prediction is in `keep` — the
  * standard first cut of a web-corpus pipeline (drop everything not in
  * the target language set before paying any deeper stage). */
final case class LangFilterSpec(keep: Seq[String])

/** PII redaction stage ([[graft.ops.Curation.redactPii]]): emails and
  * IPv4 literals masked IN the text column, so nothing downstream —
  * dedup fingerprints, tokenizer, export — ever sees the raw PII. */
final case class RedactSpec()

/** Line-dedup stage ([[graft.ops.Curation.lineDedup]]): every
  * occurrence of any line repeated >= `min_count` times corpus-wide is
  * removed (nav menus, cookie banners, licence footers); the text
  * column is replaced by the cleaned reassembly. */
final case class LineDedupSpec(minCount: Long = 2)

/** Span-dedup stage ([[graft.ops.Curation.spanDedup]]): any `k`-token
  * window repeated >= `min_count` times corpus-wide marks its tokens
  * for removal (Lee et al. 2022 at token-window granularity). NOTE the
  * operator's contract: the cleaned text is the NORMALIZED
  * (lowercased, single-spaced) surviving token stream — declare this
  * stage only when that normalization is acceptable downstream. */
final case class SpanDedupSpec(k: Int = 5, minCount: Long = 2)

/** Per-source cap stage ([[graft.ops.Curation.perDomainCap]]): at most
  * `cap` documents per `domain_column` value, deterministic by id
  * order — the anti-domination guard of corpus assembly. */
final case class SourceCapSpec(domainColumn: String = "source", cap: Int)

/** Mixture stage ([[graft.ops.Curation.mixtureWeights]] +
  * [[graft.ops.Curation.applyMixture]]): downsample each
  * `domain_column` value to the largest corpus hitting the target
  * token `shares` (which must sum to 1) without upsampling any domain;
  * domains absent from `shares` drop entirely. The draw is the
  * deterministic per-id Bernoulli — stable under reruns and
  * partitioning. */
final case class MixtureSpec(
    domainColumn: String,
    shares: Seq[(String, Double)])

/** Tokenize stage: `scheme: bytes` (GPT-2 byte-level) or `scheme: word`.
  * `merges_path` points at a pre-trained (rank, left, right, freq)
  * parquet merge table; absent, the stage TRAINS `num_merges` merges on
  * the pipeline's own (already filtered) corpus.
  *
  * `specials` reserves control-token ids AFTER the merge ids
  * ([[graft.ops.Tokenize.bpeVocabWithSpecial]] — data spelling a
  * special literally still encodes as plain bytes), and `boundary`
  * names the special the encoder appends after every document — the
  * `<|endoftext|>` marker fixed-length sequence cutting relies on.
  * Both are byte-scheme only (the word scheme has no id space). */
final case class TokenizeSpec(
    scheme: String = "bytes",
    mergesPath: Option[String] = None,
    numMerges: Int = 24,
    minFreq: Long = 2L,
    specials: Seq[String] = Nil,
    boundary: Option[String] = None)

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
    // `output_directory/sequences` — the loader-final form. REQUIRES a
    // tokenize `boundary` (the sequences contract: cut rows need the
    // markers to know where documents end)
    sequenceLength: Int = 0,
    // `pad_token_id` right-pads each shard's trailing partial sequence
    // to exactly `sequence_length` tokens (GPT-2 practice: pad with the
    // <|endoftext|> id); absent, the partial row is emitted short with
    // `complete = false` and the loader chooses
    padTokenId: Option[Int] = None,
    // `shuffle_sequences: true` additionally permutes the cut rows
    // globally ([[graft.ops.Chunking.shuffleSequences]] — stream order
    // is document order, i.e. correlated samples; training wants them
    // shuffled) and writes `output_directory/sequences` partitioned by
    // the OUTPUT shard in permuted `pos` order
    shuffleSequences: Boolean = false)

/** Typed `pipeline:` YAML surface — the reference's config-as-API idea
  * (SURVEY §1.5) generalized from validation to the curation/tokenize/
  * export side: a training-data pipeline declared as configuration and
  * executed by [[graft.core.PipelineJob]], no Scala required. Stages
  * are all optional and run in the FIXED curation order below (each
  * wraps one already-oracle-gated library operator — the declarative
  * surface adds zero new semantics):
  *
  *   lang_filter → quality_filter → redact → line_dedup → span_dedup →
  *   dedup → decontaminate → source_cap → mixture → tokenize → export
  *
  * (cheap scan filters first; PII masked before any fingerprint is
  * taken; line/span boilerplate removed before document-level dedup
  * fingerprints the text, the RefinedWeb ordering; caps and mixture on
  * the final curated set.) The export stage requires tokenize (it
  * packs token counts). */
/** Typed `feed:` YAML surface — the CONTINUOUS twin of `pipeline:`: a
  * curated loader feed ([[graft.ops.CuratedFeed]]) declared as
  * configuration and driven by [[graft.core.FeedJob]]. Each invocation
  * is one CATCH-UP PASS: the streaming source picks up every file under
  * `source.path` not yet recorded in the co-located checkpoint (batch
  * ids continue across invocations), runs the per-batch curation chain
  * — quality filter → PII masking → persistent first-occurrence dedup
  * → boundary-tokened byte-BPE encode → incremental fixed-length cut —
  * into the two stores under `state_directory`, and exits. Cron-style
  * continuous ingestion without a resident process; the stores stay
  * queryable between passes. `merges_path` is REQUIRED (a stream
  * cannot train its own merge table — train one with the batch
  * `pipeline:` surface or [[graft.ops.Tokenize.bpeTrainBytes]] first);
  * the boundary special is required by the sequence cut and must be
  * declared in `specials`. */
final case class FeedConfig(
    source: SourceSpec,
    stateDirectory: String,
    mergesPath: String,
    idColumn: String = "doc_id",
    textColumn: String = "text",
    minWords: Long = 1L,
    maxWords: Long = Long.MaxValue,
    specials: Seq[String] = Seq("<|endoftext|>"),
    boundary: String = "<|endoftext|>",
    sequenceLength: Int = 2048,
    shards: Int = 8,
    buckets: Int = 256,
    maxBatchParts: Int = 16,
    decontaminate: Option[DecontaminateSpec] = None,
    ledger: Boolean = true)

/** The declarative `epoch:` surface ([[graft.core.EpochJob]]): export
  * one training epoch — a fresh deterministic global permutation — from
  * a PUBLISHED SNAPSHOT of a sequence feed. `snapshot` is a published
  * id or None = the latest one; epochs are refused over the live store
  * (arrivals shift `row_number` positions, so resume cursors and
  * re-reads would silently drift — publish first). `cursor` resumes a
  * died loader mid-epoch from its (shard, pos). The output lands under
  * `{output}/epoch=<seed>`, partitioned by `out_shard` so a loader
  * streams each shard in permuted `pos` order. */
final case class EpochConfig(
    stateDirectory: String,
    output: String,
    nOut: Int,
    seed: Long = 0L,
    snapshot: Option[Long] = None,
    cursor: Option[(Long, Long)] = None)

final case class PipelineConfig(
    source: SourceSpec,
    idColumn: String = "doc_id",
    textColumn: String = "text",
    langFilter: Option[LangFilterSpec] = None,
    quality: Option[QualitySpec] = None,
    redact: Option[RedactSpec] = None,
    lineDedup: Option[LineDedupSpec] = None,
    spanDedup: Option[SpanDedupSpec] = None,
    dedup: Option[DedupSpec] = None,
    decontaminate: Option[DecontaminateSpec] = None,
    sourceCap: Option[SourceCapSpec] = None,
    mixture: Option[MixtureSpec] = None,
    tokenize: Option[TokenizeSpec] = None,
    export: Option[ExportSpec] = None)
