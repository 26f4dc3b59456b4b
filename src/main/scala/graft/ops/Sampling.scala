package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment step of
  * a training-data pipeline.
  *
  * Assignment is a pure expression over the row's id (`pmod(xxhash64(id),
  * 10000)` against cumulative basis-point thresholds): no RNG state, no
  * sampling pass, stable under reruns/retries/repartitioning, and any
  * engine can recompute membership from the id alone. One scan, no
  * shuffle — the property that matters at 100 TB is exactly this
  * statelessness: adding data later never reassigns existing rows.
  */
object Sampling {

  /** Assign each row to a named split by hashed-id bucket. `splits` are
    * (name, weight-in-basis-points) and must sum to 10000. Appends
    * `split_bucket` (0..9999) and `split`. */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 10000,
      s"split weights must sum to 10000 bp, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "every split needs positive weight")
    val bucket = pmod(xxhash64(col(idCol)), lit(10000L))
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    val cases = splits.zip(cums).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
      when(col("split_bucket") < cum, name).otherwise(rest)
    }
    df.withColumn("split_bucket", bucket).withColumn("split", cases)
  }
}
