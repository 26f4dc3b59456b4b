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

  // ---- documented recall floors at each tier's QUALITY setting ----------
  // The bench queries run speed-leaning parameters; these pin that every
  // tier's knob reaches high recall on the same corpus (measured on the
  // deterministic sf0.001 fixture: ivf nprobe8 0.94, lsh 4bit x 16tables
  // 0.92, pq m8/ksub32 + exact rerank 0.80, rp outDim24/shortlist200
  // 0.90 — floors leave a small margin, everything below is determinism,
  // not noise). The rehearsal ann_recall leg emits both settings per
  // scale.

  private lazy val q10 = e.filter(col("vec_id") < 10)
  private lazy val exact10 = topkSet(Similarity.bruteForceTopK(e, q10, k = 5))
  private def recall10(s: Set[(Long, Long)]): Double =
    s.intersect(exact10).size.toDouble / exact10.size

  test("IVF at nprobe=8 reaches recall@5 >= 0.9") {
    val r = recall10(topkSet(Similarity.ivfTopK(e, q10, k = 5,
      nCentroids = 16, nprobe = 8)))
    assert(r >= 0.9, s"tuned IVF recall too low: $r")
  }

  test("LSH at 4 bits x 16 tables reaches recall@5 >= 0.9") {
    val r = recall10(topkSet(Similarity.lshTopK(e, q10, k = 5,
      bits = 4, tables = 16)))
    assert(r >= 0.9, s"tuned LSH recall too low: $r")
  }

  test("PQ m=8/ksub=32 with exact rerank reaches recall@5 >= 0.75") {
    val r = recall10(topkSet(Similarity.pqTopKRerank(e, q10, k = 5,
      m = 8, ksub = 32, shortlist = 100)))
    assert(r >= 0.75, s"tuned PQ-rerank recall too low: $r")
  }

  test("RP at outDim=24/shortlist=200 reaches recall@5 >= 0.85") {
    val r = recall10(topkSet(Similarity.rpTopK(e, q10, k = 5, dim = 64,
      outDim = 24, shortlist = 200)))
    assert(r >= 0.85, s"tuned RP recall too low: $r")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val nd = Similarity.embeddingNearDups(e, threshold = 0.9, bits = 6).collect()
    nd.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) > 0.9)
    }
  }
}
