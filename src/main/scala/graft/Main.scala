package graft

import org.apache.spark.sql.{Row, SparkSession}

import graft.config.ConfigLoader
import graft.core.ValidationJob

/** One-command CLI — the engine's equivalent of the reference's canonical
  * lifecycle `python config.py config.yaml` (`config.py:57-71`): load the
  * YAML config, read both sources, validate, write the tidy + compat
  * reports under `output_directory`, and print the one-row summary.
  *
  * Usage: `sbt "runMain graft.Main config.yaml"` (or `spark-submit --class
  * graft.Main` on a cluster — the session builder only sets master/confs
  * when nothing is set, so cluster submission wins).
  */
object Main {

  /** JSON string literal with `\`, `"` and the C0 control range escaped —
    * a column NAME is user data too (a `"` in one would otherwise emit
    * invalid JSON lines). */
  private def jstr(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1F]", " ") + "\""

  /** Run the config-driven lifecycle on an existing session; returns the
    * summary row (also printed). Factored out of [[main]] so tests and
    * embedding callers reuse their session. */
  def run(spark: SparkSession, configPath: String): Row = {
    val cfg = ConfigLoader.fromYamlFile(configPath)
    // a config with `check_columns:` (a list or `all`) opts into the
    // one-pass whole-row validation; the classic single-column lifecycle
    // is unchanged
    if (cfg.checkColumns.nonEmpty || cfg.checkAllColumns) {
      val (summary, _) = ValidationJob.runMulti(spark, cfg)
      val rows = summary.orderBy("column_name").collect()
      val cols = summary.columns
      rows.foreach { r =>
        println(cols.zipWithIndex
          .map { case (c, i) => s"${jstr(c)}:${r.get(i) match {
            case s: String => jstr(s)
            case v => v
          }}" }
          .mkString("{", ",", "}"))
      }
      println(s"reports written to ${cfg.outputDirectory}/multi_diff " +
        s"(hive-partitioned by column_name)")
      return rows.head
    }
    val (_, summary) = ValidationJob.run(spark, cfg)
    val row = summary.collect()(0)
    val fields = summary.columns.zipWithIndex
      .map { case (c, i) => s"${jstr(c)}:${row.get(i)}" }
    // one machine-readable line + a human echo of where the reports went
    println(fields.mkString("{", ",", "}"))
    println(s"reports written to ${cfg.outputDirectory} " +
      s"(tidy/ + result/output_${cfg.firstName}_${cfg.secondName}_${cfg.checkColumn}_result.csv)")
    row
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("Usage: graft.Main <config.yaml>")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .appName("graft-validate")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // pandas-coerce parity
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0))
    catch {
      case e: Exception =>
        System.err.println(s"validation failed: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
