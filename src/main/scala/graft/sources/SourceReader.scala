package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.SourceSpec

/** Resolves a [[SourceSpec]] to a DataFrame.
  *
  * Replaces the reference's four hand-rolled connectors + dispatch map
  * (`running_validation.py:30-212, 568-611`) with Spark's reader
  * infrastructure: batching (`fetchsize`), typing, predicate/column
  * pushdown and parallel partitioned reads all come from the source
  * implementation instead of per-dialect Python.
  */
object SourceReader {

  def read(spark: SparkSession, spec: SourceSpec): DataFrame = {
    val base = spark.read.format(spec.format).options(spec.options)
    val withQuery = spec.query match {
      case Some(q) if spec.format == "jdbc" => base.option("query", q)
      case _ => base
    }
    spec.path match {
      case Some(p) => withQuery.load(p)
      case None    => withQuery.load()
    }
  }
}
