package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge — the lakehouse `MERGE INTO` that keeps a
  * snapshot table current against an upsert/delete stream (the Delta /
  * Iceberg / Hudi compaction primitive; the semantics are the classic
  * "latest wins per key, delete removes").
  *
  * At 100 TB the merge is the nightly heavy job of every CDC-fed lake:
  * the design constraint is ONE key-partitioned exchange over
  * base ∪ changes, nothing driver-side, and no join — a join-based
  * merge shuffles the base twice (once to join, once to union the
  * non-matched rows); tagging base rows as seq = −∞ inserts and taking
  * the per-key latest does it in a single window over the union. On a
  * real lake the base side is additionally pruned to the key-buckets
  * the change batch touches (the fingerprint-index pattern,
  * [[Curation.writeFingerprintIndex]]) so an incremental batch never
  * rewrites cold partitions.
  */
object ChangeData {

  /** Apply `changes` — rows (key, `seqCol`, `opCol`, payload...) with op
    * ∈ {I, U, D} — to `base` (key, payload...): per key the
    * HIGHEST-`seqCol` change wins; `D` deletes the key; keys untouched
    * by the stream keep their base row. Base and changes must share the
    * payload schema (base rows are treated as seq = −∞ inserts).
    *
    * Determinism contract: `seqCol` must be a total order per key
    * (CDC readers emit a log sequence number; ties would make "latest"
    * ill-defined on ANY engine, so duplicated (key, seq) pairs are the
    * caller's bug — the tie-break here is `opCol` descending then the
    * first payload column, making even that case deterministic).
    * Everything is integer/string comparison — engine-exact. */
  def cdcMerge(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    // a base column named like seqCol/opCol would land in `payload` and
    // then be clobbered by the withColumn tags — a silently wrong merged
    // schema, not an error. Refuse instead.
    require(!base.columns.contains(seqCol) && !base.columns.contains(opCol),
      s"base already has a column named '$seqCol' or '$opCol' — pick " +
        "sequence/op column names that do not collide with the payload")
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val taggedBase = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("I"))
    val all = taggedBase.select(
        (keyCols ++ Seq(seqCol, opCol) ++ payload).map(col): _*)
      .unionByName(changes.select(
        (keyCols ++ Seq(seqCol, opCol) ++ payload).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc,
        col(payload.headOption.getOrElse(keyCols.head)).desc)
    all.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col(opCol) =!= "D")
      .drop("__rk", seqCol, opCol)
  }
}
