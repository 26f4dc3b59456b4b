package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): match dirty records to a clean
  * reference table by blocking + fuzzy verification + best-match
  * selection — the classic data-quality pipeline the reference's fuzzy
  * comparator (difflib ratio) naturally extends to.
  *
  * Scale shape: the blocking key turns the O(|dirty|·|clean|) all-pairs
  * comparison into a keyed equi-join (one shuffle per side, candidate
  * volume = sum of per-block products — choose the key so blocks stay
  * small); the verifier is the codegen difflib-ratio expression (no
  * UDF); winner selection is a window partitioned by the left id, ties
  * broken by the right id for determinism.
  */
object Linkage {

  /** Best fuzzy match per dirty record. Both frames carry (idCol,
    * nameCol); `blockOf` derives the blocking key from the name (applied
    * identically to both sides — e.g. last character, phonetic code,
    * length band). A dirty record with no candidate at/above `threshold`
    * produces no row (standard linkage semantics: unmatched -> residual).
    */
  def bestMatch(dirty: DataFrame, clean: DataFrame, idCol: String,
      nameCol: String, blockOf: Column => Column,
      threshold: Double): DataFrame = {
    val d = dirty.select(col(idCol).as("left_id"), col(nameCol).as("left_name"))
      .withColumn("block", blockOf(col("left_name")))
    val c = clean.select(col(idCol).as("right_id"), col(nameCol).as("right_name"))
      .withColumn("block", blockOf(col("right_name")))
    val cand = d.join(c, Seq("block"))
      .withColumn("ratio",
        graft.functions.seqRatio(col("left_name"), col("right_name")))
      .filter(col("ratio") >= threshold)
    val w = Window.partitionBy("left_id")
      .orderBy(col("ratio").desc, col("right_id"))
    cand.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
      .select("left_id", "left_name", "right_id", "right_name", "ratio")
  }
}
