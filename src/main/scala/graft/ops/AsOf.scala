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

    // union schema: leftCols ++ rightOutCols ++ (__t, __tag)
    val fromLeft = left.select(
      leftOut.map(col) ++
        rightCols.map { case (src, out) => lit(null).cast(rightType(src)).as(out) } ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")): _*)
    val fromRight = right.select(
      leftOut.map(c =>
        if (keys.contains(c)) col(c) else lit(null).cast(leftType(c)).as(c)) ++
        rightCols.map { case (src, out) => col(src).as(out) } ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.foldLeft(fromLeft.unionByName(fromRight)) {
      case (df, (_, out)) =>
        df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1).drop("__t", "__tag")
  }
}
