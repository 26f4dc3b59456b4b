package graft.config

import java.io.{File, FileInputStream}
import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Loads the reference's YAML config surface (SURVEY §1.5) into a typed
  * [[ValidationConfig]].
  *
  * Accepted keys mirror `config.yaml` of the reference: `databases`
  * (exactly two names), `data_type`, `threshold`, `composite_id_columns`,
  * `check_column` (or the multi-column `check_columns:` list, each entry
  * `{column, data_type, threshold}`), `{db}_table_name`,
  * `{db}_database_date_column`,
  * `start_date`/`end_date`, `output_directory` — plus a generalization the
  * reference lacked: an optional `sources:` map describing each database
  * as an arbitrary Spark source (`format`/`path`/`options`/`query`), which
  * is how non-JDBC backends (parquet, csv, delta) plug in. Credentials are
  * merged per the reference's scheme: one JSON file per source under
  * `credentials_dir`, keyed by filename (`config.py:29-54`).
  */
object ConfigLoader {

  def fromYamlFile(path: String): ValidationConfig = {
    val in = new FileInputStream(path)
    try fromMap(new Yaml().load[JMap[String, Object]](in).asScala.toMap)
    finally in.close()
  }

  def fromYamlString(yaml: String): ValidationConfig =
    fromMap(new Yaml().load[JMap[String, Object]](yaml).asScala.toMap)

  private def str(m: Map[String, Object], k: String): Option[String] =
    m.get(k).map {
      // snakeyaml parses unquoted `2024-01-05` as java.util.Date, whose
      // toString is useless — normalize back to ISO
      case d: java.util.Date =>
        val f = new java.text.SimpleDateFormat("yyyy-MM-dd")
        // snakeyaml materializes the date at UTC midnight; format in UTC
        // too or any JVM west of UTC shifts the date back a day
        f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        f.format(d)
      case v => v.toString
    }

  def fromMap(m: Map[String, Object]): ValidationConfig = {
    val dbs = m.get("databases") match {
      case Some(l: JList[_]) => l.asScala.map(_.toString).toSeq
      case _ => throw new IllegalArgumentException("config needs `databases: [a, b]`")
    }
    require(dbs.size == 2,
      s"exactly two databases required, got ${dbs.size}") // running_validation.py:614-615

    val sources = m.get("sources") match {
      case Some(s: JMap[_, _]) =>
        s.asScala.map { case (k, v) =>
          k.toString -> sourceSpec(v.asInstanceOf[JMap[String, Object]].asScala.toMap,
            m, k.toString)
        }.toMap
      case _ => Map.empty[String, SourceSpec]
    }

    def specFor(name: String): SourceSpec =
      sources.getOrElse(name, jdbcSpec(m, name))

    val checkAll = m.get("check_columns") match {
      case Some(s: String) if s.equalsIgnoreCase("all") => true
      case _ => false
    }
    val multiChecks: Seq[CheckSpec] = m.get("check_columns") match {
      case Some(s: String) if s.equalsIgnoreCase("all") => Seq.empty
      case Some(l: JList[_]) => l.asScala.toSeq.map {
        case cm: JMap[_, _] =>
          val c = cm.asScala.map { case (k, v) => k.toString -> v }
            .toMap.asInstanceOf[Map[String, Object]]
          CheckSpec(
            column = str(c, "column").getOrElse(throw new
              IllegalArgumentException("check_columns entries need `column`")),
            dataType = str(c, "data_type").getOrElse("string"),
            threshold = str(c, "threshold").map(_.toDouble).getOrElse(1.0))
        case other => throw new IllegalArgumentException(
          s"check_columns entries must be maps, got $other")
      }
      case _ => Seq.empty
    }

    ValidationConfig(
      first = specFor(dbs.head),
      second = specFor(dbs(1)),
      firstName = dbs.head,
      secondName = dbs(1),
      compositeIdColumns = m.get("composite_id_columns") match {
        case Some(l: JList[_]) => l.asScala.map(_.toString).toSeq
        case _ => Seq.empty
      },
      // `check_column` is required only on the CLASSIC single-column path.
      // A multi-column config (a `check_columns:` list or `all`) never
      // reads it — default it from the first listed check so the field
      // stays total, and demand it only when neither surface is present.
      checkColumn = str(m, "check_column")
        .orElse(multiChecks.headOption.map(_.column))
        .getOrElse {
          if (checkAll) "" // zero-config whole-row mode: resolved at run time
          else throw new IllegalArgumentException(
            "config needs `check_column` (or a `check_columns` list / `all`)")
        },
      dataType = str(m, "data_type").getOrElse("string"),
      threshold = str(m, "threshold").map(_.toDouble).getOrElse(1.0),
      startDate = str(m, "start_date"),
      endDate = str(m, "end_date"),
      dateColumnFirst = str(m, s"${dbs.head}_database_date_column"),
      dateColumnSecond = str(m, s"${dbs(1)}_database_date_column"),
      outputDirectory = str(m, "output_directory").getOrElse("./output"),
      checkAllColumns = checkAll,
      checkColumns = multiChecks,
      incremental = m.get("incremental") match {
        case Some(b: java.lang.Boolean) => b.booleanValue()
        case Some(s) => s.toString.equalsIgnoreCase("true")
        case None => false
      },
      stateDirectory = str(m, "state_directory"),
      incrementalBuckets =
        str(m, "incremental_buckets").map(_.toInt).getOrElse(4096),
      reportIncremental = m.get("report_incremental") match {
        case Some(b: java.lang.Boolean) => b.booleanValue()
        case Some(s) => s.toString.equalsIgnoreCase("true")
        case None => true
      },
      minRowsForIncremental =
        str(m, "min_rows_for_incremental").map(_.toLong).getOrElse(0L),
      reportBuckets =
        str(m, "report_buckets").map(_.toInt).getOrElse(256))
  }

  // ---- pipeline surface (`pipeline:` root key) -----------------------

  /** Does this YAML declare a pipeline (vs a validation)? [[graft.Main]]
    * dispatches on it. */
  def isPipeline(path: String): Boolean = {
    val in = new FileInputStream(path)
    try Option(new Yaml().load[JMap[String, Object]](in))
      .exists(_.asScala.contains("pipeline"))
    finally in.close()
  }

  /** Does this YAML declare a continuous feed? [[graft.Main]]
    * dispatches on it. */
  def isFeed(path: String): Boolean = {
    val in = new FileInputStream(path)
    try Option(new Yaml().load[JMap[String, Object]](in))
      .exists(_.asScala.contains("feed"))
    finally in.close()
  }

  /** Does this YAML declare an epoch export? [[graft.Main]]
    * dispatches on it. */
  def isEpoch(path: String): Boolean = {
    val in = new FileInputStream(path)
    try Option(new Yaml().load[JMap[String, Object]](in))
      .exists(_.asScala.contains("epoch"))
    finally in.close()
  }

  def epochFromYamlFile(path: String): EpochConfig = {
    val in = new FileInputStream(path)
    try epochFromMap(new Yaml().load[JMap[String, Object]](in)
      .asScala.toMap)
    finally in.close()
  }

  def epochFromYamlString(yaml: String): EpochConfig =
    epochFromMap(new Yaml().load[JMap[String, Object]](yaml).asScala.toMap)

  def epochFromMap(root: Map[String, Object]): EpochConfig = {
    val m = sub(root, "epoch").getOrElse(throw new
      IllegalArgumentException("config needs an `epoch:` map"))
    val cfg = EpochConfig(
      stateDirectory = str(m, "state_directory").getOrElse(throw new
        IllegalArgumentException("epoch needs `state_directory` (a " +
          "sequence-feed state with a published snapshot)")),
      output = str(m, "output").getOrElse(throw new
        IllegalArgumentException("epoch needs `output`")),
      nOut = str(m, "n_out").map(_.toInt).getOrElse(throw new
        IllegalArgumentException("epoch needs `n_out` (output shards)")),
      seed = str(m, "seed").map(_.toLong).getOrElse(0L),
      // `snapshot: latest` (or omitted) = the newest published id
      snapshot = str(m, "snapshot").filter(_ != "latest").map(_.toLong),
      cursor = sub(m, "cursor").map { c =>
        (str(c, "shard").map(_.toLong).getOrElse(throw new
          IllegalArgumentException("cursor needs `shard`")),
          str(c, "pos").map(_.toLong).getOrElse(throw new
            IllegalArgumentException("cursor needs `pos`")))
      })
    require(cfg.nOut > 0, "`n_out` must be positive")
    require(cfg.seed >= 0, "`seed` (the epoch number) must be >= 0")
    cfg
  }

  def feedFromYamlFile(path: String): FeedConfig = {
    val in = new FileInputStream(path)
    try feedFromMap(new Yaml().load[JMap[String, Object]](in)
      .asScala.toMap)
    finally in.close()
  }

  def feedFromYamlString(yaml: String): FeedConfig =
    feedFromMap(new Yaml().load[JMap[String, Object]](yaml).asScala.toMap)

  def feedFromMap(root: Map[String, Object]): FeedConfig = {
    val m = sub(root, "feed").getOrElse(throw new
      IllegalArgumentException("config needs a `feed:` map"))
    val source = sub(m, "source").map(plainSourceSpec).getOrElse(throw new
      IllegalArgumentException("feed needs `source:`"))
    // the streaming reader is file-based: a feed source names a parquet
    // directory files LAND in (the checkpoint tracks which are consumed)
    require(source.format == "parquet" && source.path.nonEmpty &&
        source.query.isEmpty,
      "a feed `source:` must be a parquet `path:` (files landing in a " +
        "directory are the stream; JDBC/query sources have no arrival " +
        "semantics for the checkpoint to track)")
    val tok = sub(m, "tokenize").getOrElse(throw new
      IllegalArgumentException("feed needs `tokenize:` (merges_path + " +
        "specials/boundary)"))
    val mergesPath = str(tok, "merges_path").getOrElse(throw new
      IllegalArgumentException("feed tokenize needs `merges_path` — a " +
        "stream cannot train its own merge table; train one with the " +
        "batch `pipeline:` surface first"))
    val specials =
      strSeq(tok, "specials").getOrElse(Seq("<|endoftext|>"))
    val boundary = str(tok, "boundary").getOrElse("<|endoftext|>")
    require(specials.contains(boundary),
      s"feed tokenize `boundary` ($boundary) must be one of `specials` " +
        s"(${specials.mkString(", ")})")
    val q = sub(m, "quality_filter")
    val cfg = FeedConfig(
      source = source,
      stateDirectory = str(m, "state_directory").getOrElse(throw new
        IllegalArgumentException("feed needs `state_directory`")),
      mergesPath = mergesPath,
      idColumn = str(m, "id_column").getOrElse("doc_id"),
      textColumn = str(m, "text_column").getOrElse("text"),
      minWords =
        q.flatMap(str(_, "min_words")).map(_.toLong).getOrElse(1L),
      maxWords =
        q.flatMap(str(_, "max_words")).map(_.toLong)
          .getOrElse(Long.MaxValue),
      specials = specials,
      boundary = boundary,
      sequenceLength =
        str(m, "sequence_length").map(_.toInt).getOrElse(2048),
      shards = str(m, "shards").map(_.toInt).getOrElse(8),
      buckets = str(m, "buckets").map(_.toInt).getOrElse(256),
      maxBatchParts =
        str(m, "max_batch_parts").map(_.toInt).getOrElse(16),
      // same shape as the pipeline stage: a static benchmark source +
      // shingle width. The benchmark must stay CONTENT-IDENTICAL for
      // the feed's lifetime (the recipe pin enforces it) — replays
      // re-derive survivors from it.
      decontaminate = sub(m, "decontaminate").map { d =>
        DecontaminateSpec(
          source = sub(d, "source").map(plainSourceSpec).getOrElse(
            throw new IllegalArgumentException(
              "decontaminate needs `source:`")),
          ngram = str(d, "ngram").map(_.toInt).getOrElse(8))
      },
      // the per-batch curation-funnel accounting; costs batch-sized
      // recounts, so it is declinable
      ledger = str(m, "ledger").forall(_.toBoolean))
    require(cfg.sequenceLength > 0, "`sequence_length` must be positive")
    require(cfg.minWords >= 1 && cfg.maxWords >= cfg.minWords,
      "quality_filter word bounds must satisfy 1 <= min_words <= max_words")
    cfg
  }

  def pipelineFromYamlFile(path: String): PipelineConfig = {
    val in = new FileInputStream(path)
    try pipelineFromMap(new Yaml().load[JMap[String, Object]](in)
      .asScala.toMap)
    finally in.close()
  }

  def pipelineFromYamlString(yaml: String): PipelineConfig =
    pipelineFromMap(new Yaml().load[JMap[String, Object]](yaml).asScala.toMap)

  private def sub(m: Map[String, Object], k: String): Option[Map[String, Object]] =
    m.get(k).map {
      case s: JMap[_, _] =>
        s.asScala.map { case (a, b) => a.toString -> b.asInstanceOf[Object] }.toMap
      // a bare `redact:` key (YAML null) declares the stage with all
      // defaults — same meaning as `redact: {}`
      case null => Map.empty[String, Object]
      case other => throw new IllegalArgumentException(
        s"`$k` must be a map, got $other")
    }

  /** A YAML string list (`keep: [en, de]` / block form) as Seq[String]. */
  private def strSeq(m: Map[String, Object], k: String): Option[Seq[String]] =
    m.get(k).map {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case other => throw new IllegalArgumentException(
        s"`$k` must be a list, got $other")
    }

  /** A pipeline source is a PLAIN Spark source map (format/path/options/
    * query) — no `{db}_table_name` / credential merging, which are the
    * validation surface's reference-parity conventions. */
  private def plainSourceSpec(s: Map[String, Object]): SourceSpec = {
    val opts = s.get("options") match {
      case Some(o: JMap[_, _]) =>
        o.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => Map.empty[String, String]
    }
    SourceSpec(
      format = s.get("format").map(_.toString).getOrElse("parquet"),
      options = opts,
      path = s.get("path").map(_.toString),
      query = s.get("query").map(_.toString))
  }

  def pipelineFromMap(root: Map[String, Object]): PipelineConfig = {
    val m = sub(root, "pipeline").getOrElse(throw new
      IllegalArgumentException("config needs a `pipeline:` map"))
    val source = sub(m, "source").map(plainSourceSpec).getOrElse(throw new
      IllegalArgumentException("pipeline needs `source:`"))
    val quality = sub(m, "quality_filter").map { q =>
      QualitySpec(
        ruleSet = str(q, "rule_set").getOrElse("gopher"),
        minWords = str(q, "min_words").map(_.toLong).getOrElse(50L),
        maxWords = str(q, "max_words").map(_.toLong).getOrElse(100000L),
        minScore = str(q, "min_score").map(_.toDouble).getOrElse(0.5))
    }
    val dedup = sub(m, "dedup").map(d =>
      DedupSpec(method = str(d, "method").getOrElse("exact")))
    val decont = sub(m, "decontaminate").map { d =>
      DecontaminateSpec(
        source = sub(d, "source").map(plainSourceSpec).getOrElse(throw new
          IllegalArgumentException("decontaminate needs `source:`")),
        ngram = str(d, "ngram").map(_.toInt).getOrElse(8))
    }
    val langFilter = sub(m, "lang_filter").map { l =>
      LangFilterSpec(keep = strSeq(l, "keep").getOrElse(throw new
        IllegalArgumentException("lang_filter needs `keep: [lang, ...]`")))
    }
    val redact = sub(m, "redact").map(_ => RedactSpec())
    val lineDd = sub(m, "line_dedup").map { l =>
      LineDedupSpec(minCount = str(l, "min_count").map(_.toLong).getOrElse(2L))
    }
    val spanDd = sub(m, "span_dedup").map { sd =>
      SpanDedupSpec(
        k = str(sd, "k").map(_.toInt).getOrElse(5),
        minCount = str(sd, "min_count").map(_.toLong).getOrElse(2L))
    }
    val sourceCap = sub(m, "source_cap").map { sc =>
      SourceCapSpec(
        domainColumn = str(sc, "domain_column").getOrElse("source"),
        cap = str(sc, "cap").map(_.toInt).getOrElse(throw new
          IllegalArgumentException("source_cap needs `cap`")))
    }
    val mixture = sub(m, "mixture").map { mx =>
      MixtureSpec(
        domainColumn = str(mx, "domain_column").getOrElse(throw new
          IllegalArgumentException("mixture needs `domain_column`")),
        shares = sub(mx, "shares").getOrElse(throw new
            IllegalArgumentException(
              "mixture needs `shares: {domain: share, ...}`"))
          .toSeq.map { case (k, v) => k -> v.toString.toDouble }.sortBy(_._1))
    }
    val tokenize = sub(m, "tokenize").map { t =>
      TokenizeSpec(
        scheme = str(t, "scheme").getOrElse("bytes"),
        mergesPath = str(t, "merges_path"),
        numMerges = str(t, "num_merges").map(_.toInt).getOrElse(24),
        minFreq = str(t, "min_freq").map(_.toLong).getOrElse(2L),
        specials = strSeq(t, "specials").getOrElse(Nil),
        boundary = str(t, "boundary"))
    }
    val export = sub(m, "export").map { e =>
      ExportSpec(
        shards = str(e, "shards").map(_.toInt).getOrElse(8),
        packCapacity =
          str(e, "pack_capacity").map(_.toLong).getOrElse(2048L),
        outputDirectory = str(e, "output_directory").getOrElse(throw new
          IllegalArgumentException("export needs `output_directory`")),
        maxRecordsPerFile =
          str(e, "max_records_per_file").map(_.toLong).getOrElse(0L),
        writeTokens = str(e, "write_tokens").exists(_.toBoolean),
        sequenceLength =
          str(e, "sequence_length").map(_.toInt).getOrElse(0),
        padTokenId = str(e, "pad_token_id").map(_.toInt),
        shuffleSequences = str(e, "shuffle_sequences").exists(_.toBoolean))
    }
    require(export.forall(e => !e.shuffleSequences || e.sequenceLength > 0),
      "`shuffle_sequences` permutes the fixed-length rows — it requires " +
        "`sequence_length`")
    require(export.isEmpty || tokenize.nonEmpty,
      "`export:` packs token counts — it requires `tokenize:`")
    // the sequences contract (Chunking.fixedSequences): fixed-length
    // rows concatenate documents, so the stream MUST carry boundary
    // markers — a boundary-less sequence export would be unusable for
    // training (consecutive documents indistinguishable)
    require(export.forall(_.sequenceLength <= 0) ||
        tokenize.exists(t => t.boundary.nonEmpty),
      "`export.sequence_length` needs `tokenize.boundary` (e.g. " +
        "specials: ['<|endoftext|>'], boundary: '<|endoftext|>') — " +
        "fixed-length sequences concatenate documents and rely on the " +
        "boundary token to mark where each ends")
    PipelineConfig(
      source = source,
      idColumn = str(m, "id_column").getOrElse("doc_id"),
      textColumn = str(m, "text_column").getOrElse("text"),
      langFilter = langFilter,
      quality = quality,
      redact = redact,
      lineDedup = lineDd,
      spanDedup = spanDd,
      dedup = dedup,
      decontaminate = decont,
      sourceCap = sourceCap,
      mixture = mixture,
      tokenize = tokenize,
      export = export)
  }

  private def sourceSpec(s: Map[String, Object], root: Map[String, Object],
      name: String): SourceSpec = {
    val opts = s.get("options") match {
      case Some(o: JMap[_, _]) => o.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => Map.empty[String, String]
    }
    val format = s.get("format").map(_.toString).getOrElse("parquet")
    val tableName = str(root, s"${name}_table_name")
    // jdbc sources address tables via the dbtable option, not a load path
    val jdbcTableOpt =
      if (format == "jdbc" && !opts.contains("dbtable") && !s.contains("query"))
        tableName.map("dbtable" -> _).toMap
      else Map.empty[String, String]
    val jdbcFetchOpt =
      if (format == "jdbc" && !opts.contains("fetchsize"))
        str(root, "batch_size").map("fetchsize" -> _).toMap
      else Map.empty[String, String]
    SourceSpec(
      format = format,
      options = opts ++ credentialOptions(root, name) ++ jdbcTableOpt ++ jdbcFetchOpt,
      path = s.get("path").map(_.toString)
        .orElse(tableName.filter(_ => format != "jdbc")),
      query = s.get("query").map(_.toString))
  }

  /** Reference-style JDBC source: table name from `{db}_table_name`,
    * connection options from `credentials_dir/{db}.json`. */
  private def jdbcSpec(root: Map[String, Object], name: String): SourceSpec =
    SourceSpec(
      format = "jdbc",
      options = credentialOptions(root, name) ++
        str(root, s"${name}_table_name").map("dbtable" -> _).toMap ++
        str(root, "batch_size").map("fetchsize" -> _).toMap,
      path = None,
      query = None)

  /** `creds/{name}.json` -> flat option map (url/user/password/...), the
    * reference's per-source credential files (`config.py:29-54`). Parsed
    * with Spark's bundled Jackson. */
  private def credentialOptions(root: Map[String, Object], name: String): Map[String, String] = {
    val dir = str(root, "credentials_dir").getOrElse("creds")
    val f = new File(dir, s"$name.json")
    if (!f.isFile) Map.empty
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(f)
      node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
  }
}
