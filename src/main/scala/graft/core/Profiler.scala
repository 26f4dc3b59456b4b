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
    // index-based aliases: column names never enter generated SQL text,
    // so quotes/backticks/dots in names can't break the stack() expression
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$i"),
        countDistinct(col(c)).as(s"__dist_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: one output row per column (row count shared);
    // the name literal is single-quote-escaped
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      val lit = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$lit', `__n`, `__null_$i`, `__dist_$i`, `__min_$i`, `__max_$i`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_rows, n_null, n_distinct, min_val, max_val)")
  }
}
