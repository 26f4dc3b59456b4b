package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Recall of the approximate ANN tiers against exact brute force on the
  * labeled embeddings table (10 clusters — clusterable by construction). */
class AnnRecallSpec extends AnyFunSuite with SparkSpec {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val q = e.filter(col("vec_id") < 20)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF top-k recall vs brute force is high on clustered data") {
    val exact = topkSet(Similarity.bruteForceTopK(e, q, k = 5))
    val ivf = topkSet(Similarity.ivfTopK(e, q, k = 5, nCentroids = 16, nprobe = 3))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("hyperplane-LSH top-k recall vs brute force") {
    // coarse buckets for a 500-vector corpus: 16 buckets x 8 tables; at
    // scale bits grows with log(corpus) to keep bucket size constant
    val exact = topkSet(Similarity.bruteForceTopK(e, q, k = 5))
    val lsh = topkSet(Similarity.lshTopK(e, q, k = 5, bits = 4, tables = 8))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val nd = Similarity.embeddingNearDups(e, threshold = 0.9, bits = 6).collect()
    nd.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) > 0.9)
    }
  }
}
