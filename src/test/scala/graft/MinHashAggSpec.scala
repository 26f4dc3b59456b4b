package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAgg.minhashAgg
import graft.ops.Dedup

/** The distributive aggregate must produce bit-identical signatures to the
  * per-document kernel — that equivalence is what lets the engine switch
  * to shuffle-light partial aggregation at scale. */
class MinHashAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("minhash_agg over exploded shingles equals the per-doc kernel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val expected = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1).toSeq).toMap

    // explode normalized word-3-gram shingle hashes, aggregate per doc
    val shingleUdf = udf { (text: String) => Dedup.shingleHashes(text, 3) }
    val exploded = docs.select(col("doc_id"),
      explode(shingleUdf(graft.ops.TextAnalysis.normalized(col("text")))).as("sh"))
    val got = exploded.groupBy("doc_id").agg(minhashAgg(col("sh")).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSeq).toMap

    assert(got.keySet == expected.keySet)
    for ((k, sig) <- got) assert(sig == expected(k), s"signature mismatch for doc $k")
  }

  test("minhash_agg merges across partitions (repartition invariance)") {
    val data = (1L to 1000L).map(i => (i % 7, i * 2654435761L)).toDF("g", "sh")
    val a = data.repartition(1).groupBy("g").agg(minhashAgg(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val b = data.repartition(13).groupBy("g").agg(minhashAgg(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(a == b)
  }
}
