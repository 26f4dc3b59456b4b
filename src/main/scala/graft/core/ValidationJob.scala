package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.ValidationConfig
import graft.report.ReportWriter
import graft.sources.SourceReader

/** The full query lifecycle of the reference (`SURVEY.md §3`): config ->
  * two source reads -> keyed projection (+ optional date filter) ->
  * validate -> reports. One call replaces `config.py` + `running_validation
  * .main`.
  *
  * The two source scans are independent stages — Spark schedules them
  * concurrently (the reference used a 2-thread pool,
  * `running_validation.py:626-631`). Pushdown does the rest: only
  * (key cols, check col, date col) leave each source.
  */
object ValidationJob {

  def compareMode(cfg: ValidationConfig): CompareMode = cfg.dataType match {
    case "integer" | "numeric" => CompareMode.Numeric
    case "date"                => CompareMode.Date
    case "string"              => CompareMode.Fuzzy(cfg.threshold)
    case other => throw new IllegalArgumentException(
      s"unknown data_type '$other' (expected integer|string|date)") // running_validation.py:651-653
  }

  /** Read one side, apply the optional date-range filter (exclusive both
    * ends — reference semantics), project to (id, check). */
  private def side(spark: SparkSession, cfg: ValidationConfig,
      spec: graft.config.SourceSpec, dateCol: Option[String]): DataFrame = {
    val raw = SourceReader.read(spark, spec)
    val filtered = (cfg.startDate, cfg.endDate, dateCol) match {
      case (Some(s), Some(e), Some(dc)) =>
        Validator.dateFiltered(raw, dc, s"$s 00:00:00", s"$e 00:00:00")
      case _ => raw
    }
    Validator.keyed(filtered, cfg.compositeIdColumns, cfg.checkColumn)
  }

  /** Run the validation; write tidy + compat reports; return the output. */
  def run(spark: SparkSession, cfg: ValidationConfig,
      writeReports: Boolean = true): (ValidationOutput, DataFrame) = {
    val first = side(spark, cfg, cfg.first, cfg.dateColumnFirst)
    val second = side(spark, cfg, cfg.second, cfg.dateColumnSecond)
    val out = Validator.validate(first, second, compareMode(cfg),
      cfg.firstName, cfg.secondName, cfg.checkColumn)
    if (writeReports) {
      ReportWriter.writeTidy(out, s"${cfg.outputDirectory}/tidy")
      ReportWriter.writeCompat(out, s"${cfg.outputDirectory}/result",
        cfg.firstName, cfg.secondName, cfg.checkColumn)
    }
    val summary = Validator.summaryFast(first, second, compareMode(cfg)) // single job, all modes
    (out, summary)
  }
}
