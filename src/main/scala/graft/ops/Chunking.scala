package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus chunking + sequence packing — the two shaping operations every
  * LLM training-data pipeline runs between curation and tokenization.
  *
  * Both are pure Catalyst expression pipelines (no UDF): chunking is a
  * per-row `sequence` + `explode` + `substring` (embarrassingly parallel,
  * no shuffle); packing is a keyed running sum (one shuffle on the pack
  * key). At 100 TB chunking scales with the scan, and packing's window is
  * PARTITIONED (per source/shard) — a global ordering would serialize on
  * one task, so the API requires a pack key.
  */
object Chunking {

  /** Fixed-size character chunks with overlap. Chunk k (0-based) covers
    * `[k*stride, k*stride + size)` of the text where
    * `stride = size - overlap`; chunks are emitted while their start is
    * inside the text, so the final chunk may be short. Empty/null text
    * yields no chunks. Output: (id, chunk_idx, chunk_text).
    */
  def chunkChars(docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // number of chunks: 1 + floor((len-1)/stride) for len > 0
    val len = length(col(textCol))
    docs
      .where(col(textCol).isNotNull && len > 0)
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), ((len - 1) / stride).cast("int"))).as("chunk_idx"),
        col(textCol))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        substring(col(textCol), col("chunk_idx") * stride + 1, lit(size)).as("chunk_text"))
  }

  /** Greedy contiguous sequence packing: within each `packKey` partition,
    * documents are taken in `orderCol` order and assigned to bins by the
    * running token count — a document opens a new bin when the PREVIOUS
    * cumulative count has reached the next capacity boundary
    * (`bin = floor(prev_cumsum / capacity)`). Bins are contiguous runs;
    * a document straddling a boundary stays in the earlier bin (the
    * standard pack-then-truncate shape for context-window filling).
    * Output: one row per doc with its bin assignment and offset.
    */
  def packBins(docs: DataFrame, packKey: String, orderCol: String,
      tokenCountCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(packKey).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("__prev", col("__cum") - col(tokenCountCol))
      .select(col(packKey), col(orderCol), col(tokenCountCol),
        // integer division: `/` on longs is double division in Spark SQL
        expr(s"__prev DIV $capacity").as("bin_id"),
        col("__prev").as("bin_offset_tokens"))
  }
}
