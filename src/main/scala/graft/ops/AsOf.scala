package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent right
  * row with `right.time <= left.time` for the same key — the canonical
  * time-series enrichment operator (Spark has no built-in equivalent).
  *
  * Implementation is the union+window trick, NOT a range join: tag both
  * sides, union them, and run `last(_, ignoreNulls)` over a window
  * partitioned by key and ordered by (time, tag). Right rows sort before
  * left rows at equal timestamps (tag 0 < 1), giving `<=` semantics.
  *
  * Scale: exactly ONE shuffle (partition by key) + one sort — wall-clock
  * and shuffle volume are linear in |L|+|R|. A naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + max) explodes quadratically per
  * key; the window form survives 100 TB where the range join dies.
  */
object AsOf {

  /** @param rightCols (sourceCol -> outputCol) right-side payload columns
    *        to carry; output names must not collide with left columns. */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[(String, String)]): DataFrame = {
    val leftOut = left.columns.toSeq
    val rightSchema = right.schema
    val leftSchema = left.schema

    def rightType(c: String) = rightSchema(c).dataType
    def leftType(c: String) = leftSchema(c).dataType

    // union schema: leftCols ++ __payload struct ++ (__t, __tag).
    // The right payload travels as ONE struct (null for left rows,
    // non-null for every right row even when its fields are null) so the
    // window fill below can never stitch fields from different right rows
    // — per-column last(ignoreNulls) would resurrect stale values over a
    // genuine null in the as-of row.
    val fromLeft = left.select(
      leftOut.map(col) ++
        Seq(lit(null).cast(org.apache.spark.sql.types.StructType(
            rightCols.map { case (src, out) =>
              org.apache.spark.sql.types.StructField(out, rightType(src)) })).as("__payload"),
          col(leftTime).as("__t"), lit(1).as("__tag")): _*)
    val fromRight = right.select(
      leftOut.map(c =>
        if (keys.contains(c)) col(c) else lit(null).cast(leftType(c)).as(c)) ++
        Seq(struct(rightCols.map { case (src, out) => col(src).as(out) }: _*).as("__payload"),
          col(rightTime).as("__t"), lit(0).as("__tag")): _*)

    // __payload as the final sort key: ties on (key, time) between right
    // rows resolve deterministically (last = max payload) instead of by
    // partition order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = fromLeft.unionByName(fromRight)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
    val withCols = rightCols.foldLeft(filled) { case (df, (_, out)) =>
      df.withColumn(out, col("__payload").getField(out))
    }
    withCols.filter(col("__tag") === 1).drop("__payload", "__t", "__tag")
  }
}
