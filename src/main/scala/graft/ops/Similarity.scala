package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosineSimilarity, dotProduct, l2Norm}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the query set is broadcast
  *    (small side), the corpus is scanned once; the dot product is a pure
  *    `zip_with`/`aggregate` expression (codegen, no UDF). At 100 TB the
  *    corpus scan is embarrassingly parallel and never shuffles; only the
  *    per-query top-k aggregation shuffles k rows per partition.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by a 16-bit
  *    signature; a query probes only its own bucket (and optionally
  *    Hamming-1 neighbors). Sub-linear scan at the cost of recall.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * +-1 from splitmix64 — no RNG state, identical on every executor. */
  private def planeSign(plane: Int, dim: Int): Double = {
    var x = plane.toLong * 1000003L + dim.toLong + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^= (x >>> 31)
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** 16-bit random-hyperplane signature of a vector. */
  private[graft] def hyperplaneSig(v: Seq[Float], bits: Int): Int = {
    var sig = 0
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planeSign(p, i); i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  def hyperplaneSigUdf(bits: Int) = udf { (v: Seq[Float]) =>
    if (v == null) 0 else hyperplaneSig(v, bits)
  }

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries` must be small (it is broadcast); self-matches (same id)
    * are excluded. Ties broken by corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", cosineSimilarity(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: both sides keyed by hyperplane
    * signature; the join is an equi-join on the bucket (shuffle or
    * broadcast — AQE decides), so each query scores only its bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = hyperplaneSigUdf(bits)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      sig(col(vecCol)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      sig(col(vecCol)).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", cosineSimilarity(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: cosine above `threshold` among
    * LSH-bucket colliders (approximate; exact within buckets). */
  def embeddingNearDups(vectors: DataFrame, threshold: Double, bits: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = hyperplaneSigUdf(bits)
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sig(col(vecCol)).as("bucket"))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosineSimilarity(col("vec_a"), col("vec_b")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Per-vector L2 norm + dimension — a cheap embedding sanity profile. */
  def vectorStats(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol),
      size(col(vecCol)).cast("long").as("dim"),
      l2Norm(col(vecCol)).as("l2_norm"),
      dotProduct(col(vecCol), col(vecCol)).as("sq_sum"))
}
