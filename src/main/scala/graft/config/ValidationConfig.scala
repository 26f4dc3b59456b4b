package graft.config

/** Describes one side of a validation: any `spark.read` source.
  *
  * Generalizes the reference's four hard-coded connectors
  * (postgres/oracle/aws/ali, `running_validation.py:30-212`) to arbitrary
  * Spark sources: `format` + `options` is the whole contract
  * (`jdbc`, `parquet`, `csv`, ...). For `jdbc`, `options` carries
  * url/dbtable/user/password/fetchsize and — for scale — the partitioned-read
  * quartet (partitionColumn/lowerBound/upperBound/numPartitions), replacing
  * the reference's serial `fetchmany` loop.
  *
  * `query` is the escape hatch restoring the reference's legacy
  * manual-query mode (`config.yaml:9,44-49`): when set on a jdbc source it
  * is passed as the `query` option so the SQL runs remotely verbatim.
  */
final case class SourceSpec(
    format: String,
    options: Map[String, String] = Map.empty,
    path: Option[String] = None,
    query: Option[String] = None)

/** One column of a multi-column validation: the per-column twin of the
  * top-level (`check_column`, `data_type`, `threshold`) trio. */
final case class CheckSpec(
    column: String,
    dataType: String = "string",
    threshold: Double = 1.0)

/** Typed equivalent of the reference's `config.yaml` surface
  * (SURVEY §1.5). Exactly two sources per job, as the reference enforces
  * (`running_validation.py:614-615`). `checkColumns` extends the
  * reference's one-column-per-job contract (`config.yaml:21`) to
  * whole-row validation: when non-empty, [[graft.core.ValidationJob.runMulti]]
  * validates every listed column in ONE pass instead of k job reruns.
  */
final case class ValidationConfig(
    first: SourceSpec,
    second: SourceSpec,
    firstName: String,
    secondName: String,
    compositeIdColumns: Seq[String],   // config.yaml:19
    checkColumn: String,               // config.yaml:21
    dataType: String,                  // integer | string | date (config.yaml:8)
    threshold: Double = 1.0,           // config.yaml:11 (fuzzy similarity)
    startDate: Option[String] = None,  // config.yaml:16
    endDate: Option[String] = None,    // config.yaml:17
    dateColumnFirst: Option[String] = None,  // {db}_database_date_column
    dateColumnSecond: Option[String] = None,
    outputDirectory: String = "./output",
    checkColumns: Seq[CheckSpec] = Seq.empty, // multi-column extension
    // `check_columns: all` — infer the whole-row check list from the two
    // sources' shared schema at run time (ValidationJob.inferChecks)
    checkAllColumns: Boolean = false,
    // `incremental: true` — answer the summary through
    // [[graft.core.IncrementalValidation]]'s stored per-bucket state
    // (digest-pruned re-validation); the state lives at
    // `state_directory` (default `<output_directory>/validation_state`)
    // with `incremental_buckets` buckets
    incremental: Boolean = false,
    stateDirectory: Option[String] = None,
    incrementalBuckets: Int = 4096,
    // `report_incremental: false` — escape hatch: under `incremental:
    // true` the row-level reports are maintained incrementally (stored
    // bucket-partitioned, only churned buckets' partitions rewritten);
    // set false to keep the classic full-input report computation while
    // still answering the summary through the digest state
    reportIncremental: Boolean = true,
    // `min_rows_for_incremental` — size floor for the incremental path:
    // when > 0 and the two inputs together hold fewer rows, the job
    // runs the CLASSIC full computation and leaves the stored state
    // untouched (below the floor a direct pass is cheaper than digest
    // scans + state IO; the library surfaces take the same floor as a
    // parameter)
    minRowsForIncremental: Long = 0L,
    // `report_buckets` — bucket count for the STORED report tables. The
    // report table has one partition directory per bucket and is tiny
    // next to its inputs: hundreds suffice, thousands of near-empty
    // directories cost more in listing/footer overhead than the finer
    // recompute granularity buys (measured in v_incremental_diff)
    reportBuckets: Int = 256)
