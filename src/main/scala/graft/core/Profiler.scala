package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality companion to table diffing: per
  * column, row/null/distinct counts and min/max. The natural first step
  * of a validation job (compare profiles cheaply before row-level diff).
  *
  * Single pass: all per-column aggregates are computed in ONE aggregation
  * (no shuffle beyond the final single-row reduce; count_distinct adds its
  * expand but stays one job), then unpivoted driver-side into the tidy
  * (column, metric...) shape. At 100 TB this is a full scan but no
  * row-level shuffle.
  */
object Profiler {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct,
    * min_val, max_val) with values rendered as strings. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: one output row per column (row count shared)
    val stackArgs = cols.map { c =>
      s"'$c', `__n`, `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_rows, n_null, n_distinct, min_val, max_val)")
  }
}
