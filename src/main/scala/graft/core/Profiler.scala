package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality companion to table diffing: per
  * column, row/null/distinct counts and min/max. The natural first step
  * of a validation job (compare profiles cheaply before row-level diff).
  *
  * Distinct-count strategy (the scale-critical choice):
  *   - `exact = false` (default): `approx_count_distinct` (HLL++) keeps the
  *     whole profile ONE single-pass aggregation with full map-side partial
  *     aggregation and no row multiplication — the only sane default at
  *     100 TB.
  *   - `exact = true`: exact counts WITHOUT Spark's multi-countDistinct
  *     Expand (which replays every row N+1 times through the first
  *     aggregate — a 5× scan multiplier for 4 columns). Instead: a second
  *     pass unpivots to (column_idx, value) pairs and two-level aggregates
  *     — level 1 reduces to distinct (idx, value) pairs with map-side
  *     combine, level 2 counts them. Each row is shuffled at most once per
  *     profiled column AFTER local dedup, so heavy-duplicate columns
  *     (flags, statuses) shuffle only their distinct values.
  * Both shapes survive a 100× scale-up; the Expand shape does not.
  */
object Profiler {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct,
    * min_val, max_val) with values rendered as strings. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    // index-based aliases: column names never enter generated SQL text,
    // so quotes/backticks/dots in names can't break the stack() expression
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      val dist =
        if (exact) lit(0L).as(s"__dist_$i") // filled from the pair pass below
        else approx_count_distinct(col(c)).as(s"__dist_$i")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$i"),
        dist,
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: one output row per column (row count shared);
    // the name literal is single-quote-escaped. idx rides along so the
    // exact-pass join below keys on position, not name — profiling the
    // same column twice must not fan the join out
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      val lit = c.replace("\\", "\\\\").replace("'", "\\'")
      s"$i, '$lit', `__n`, `__null_$i`, `__dist_$i`, `__min_$i`, `__max_$i`"
    }.mkString(", ")
    val base = one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (idx, column_name, n_rows, n_null, n_distinct, min_val, max_val)")
    if (!exact) base.drop("idx")
    else {
      // exact pass: unpivot to (idx, value-as-string) and count distinct
      // pairs in two levels. The cast must be injective per column:
      //  - float/double: normalize -0.0 to 0.0 first — every SQL engine's
      //    COUNT(DISTINCT) treats them as one value, but their string
      //    images "-0.0"/"0.0" differ
      //  - binary: hex() — a UTF-8 string cast mangles invalid sequences,
      //    collapsing distinct byte strings
      //  - everything else: plain string cast
      def injective(c: String): org.apache.spark.sql.Column = {
        import org.apache.spark.sql.types._
        df.schema.find(_.name == c).map(_.dataType) match {
          case Some(FloatType) | Some(DoubleType) =>
            when(col(c) === 0, lit(0.0)).otherwise(col(c)).cast("string")
          case Some(BinaryType) => hex(col(c))
          case _ => col(c).cast("string")
        }
      }
      val pairs = df.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(typedLit(i).as("idx"), injective(c).as("v"))
      }: _*)).as("p")).select(col("p.idx"), col("p.v")).where(col("v").isNotNull)
      val distinctCounts = pairs
        .distinct() // level 1: map-side combine, shuffle only distinct (idx, value)
        .groupBy("idx").agg(count(lit(1)).as("__exact_dist")) // level 2: tiny
      base.drop("n_distinct")
        .join(broadcast(distinctCounts), Seq("idx"), "left")
        .select(col("column_name"), col("n_rows"), col("n_null"),
          coalesce(col("__exact_dist"), lit(0L)).as("n_distinct"),
          col("min_val"), col("max_val"))
    }
  }
}
