package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ChangeData, Frequency, Graph, Indexing, Layout, SetSim, Similarity, Skyline}

/** Round-9 surface: d-dimensional skyline, stored term-bucketed text
  * index, native graph node ids, map-side k-means argmin, contract
  * guards (zValue domain, cdcMerge column collisions), and the
  * single-partition-window removal in the set-similarity join. */
class Round9OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- skylineND ---------------------------------------------------------

  /** brute-force dominance filter (the definition, quadratic) */
  private def bruteSkyline(rows: Seq[(Long, Seq[Long])]): Set[(Long, Seq[Long])] =
    rows.filter { case (_, a) =>
      !rows.exists { case (_, b) =>
        a.indices.forall(i => b(i) >= a(i)) && a.indices.exists(i => b(i) > a(i))
      }
    }.toSet

  test("skylineND equals brute-force dominance in 3-D under several " +
      "partitionings, with duplicates and negatives") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, Seq(rnd.nextInt(20).toLong - 10, rnd.nextInt(20).toLong - 10,
        rnd.nextInt(20).toLong - 10)))
    // duplicated coordinate vectors: both ids must survive if undominated
    val dups = Seq((401L, pts.head._2), (402L, pts.head._2))
    val all = pts ++ dups
    val exact = bruteSkyline(all)
    for (parts <- Seq(1, 3, 13)) {
      val df = all.map { case (id, v) => (id, v(0), v(1), v(2)) }
        .toDF("id", "a", "b", "c").repartition(parts)
      val got = Skyline.skylineND(df, "id", Seq("a", "b", "c"))
        .collect().map(r => (r.getLong(0),
          Seq(r.getLong(1), r.getLong(2), r.getLong(3)))).toSet
      assert(got == exact, s"parts=$parts")
    }
  }

  test("skylineND in 2-D agrees with skyline2D exactly") {
    val rnd = new scala.util.Random(13)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = pts.toDF("id", "x", "y").repartition(5)
    val a = Skyline.skyline2D(df, "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Skyline.skylineND(df, "id", Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("skylineND 1-D is the argmax set (every id at the max)") {
    val df = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 0L)).toDF("id", "v")
      .repartition(3)
    val got = Skyline.skylineND(df, "id", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 9L), (3L, 9L)))
  }

  test("skylineND 4-D matches brute force (higher-d sweep stays lossless)") {
    val rnd = new scala.util.Random(23)
    val pts = (1L to 250L).map(i =>
      (i, Seq.fill(4)(rnd.nextInt(8).toLong)))
    val exact = bruteSkyline(pts)
    val df = pts.map { case (id, v) => (id, v(0), v(1), v(2), v(3)) }
      .toDF("id", "a", "b", "c", "d").repartition(9)
    val got = Skyline.skylineND(df, "id", Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toSet
    assert(got == exact)
  }

  // ---- contract guards ---------------------------------------------------

  test("zValue fails loudly on an input past 2^bits-1 instead of aliasing") {
    val ok = Seq((32767L, 32767L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 15).as("z"))
    assert(ok.head().getLong(0) >= 0)
    val bad = Seq((32768L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 15).as("z"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null || e.getCause != null)
    val neg = Seq((-1L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 15).as("z"))
    intercept[Exception](neg.collect())
  }

  test("cdcMerge refuses a base column colliding with seq/op names") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "seq")
    val changes = Seq((1L, "b", 1L, "u")).toDF("k", "v", "seq", "op")
    val e = intercept[IllegalArgumentException](
      ChangeData.cdcMerge(base, changes, Seq("k"), "seq", "op"))
    assert(e.getMessage.contains("seq"))
  }

  // ---- native graph node ids ----------------------------------------------

  test("pageRank with BIGINT ids equals the stringified run, and " +
      "mismatched endpoint types are refused") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val intDf = edges.toDF("a", "b")
    val strDf = edges.map { case (a, b) => (s"$a", s"$b") }.toDF("a", "b")
    val viaInt = Graph.pageRank(intDf, "a", "b")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    val viaStr = Graph.pageRank(strDf, "a", "b")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaInt == viaStr)
    val mixed = Seq((1L, "2")).toDF("a", "b")
    intercept[IllegalArgumentException](Graph.pageRank(mixed, "a", "b"))
  }

  test("triangleCounts with BIGINT ids equals the stringified run") {
    // two triangles sharing edge (2,3) plus a dangling edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L), (4L, 5L))
    val viaInt = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    val viaStr = Graph.triangleCounts(
        edges.map { case (a, b) => (s"$a", s"$b") }.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaInt == viaStr)
    assert(viaInt("2") == 2L && viaInt("1") == 1L && !viaInt.contains("5"))
    intercept[IllegalArgumentException](
      Graph.triangleCounts(Seq((1L, "x")).toDF("a", "b"), "a", "b"))
  }

  // ---- stored text index ---------------------------------------------------

  test("searchIndexStored equals the in-flight searchIndex, is idempotent " +
      "across rebuilds, and never scans the corpus") {
    val docs = (1L to 200L).map { i =>
      val words = Seq("scan", "merge", "window", "sort", "hash", "join")
      (i, (0 until (i % 7 + 1).toInt).map(j => words(((i + j) % 6).toInt))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(docs, "doc_id", "text")
    val expected = Indexing.searchIndex(idx, nDocs = 200L,
        terms = Seq("scan", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Indexing.indexWrite(docs, "r9_text_idx", numBuckets = 4)
    val stored1 = Indexing.searchIndexStored(spark, "r9_text_idx",
        terms = Seq("scan", "merge"), k = 10)
    val got1 = stored1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got1 == expected)
    // the stored search must answer from the postings table only — no
    // leaf of the plan may read anything but the bucketed index tables
    val leaves = stored1.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.toLowerCase.contains("r9_text_idx_postings"), leaves)
    assert(!leaves.contains("documents") && !leaves.contains("Exists"),
      s"stored search must not rescan the corpus:\n$leaves")
    // rebuild over the same name (fresh-catalog orphan discipline)
    Indexing.indexWrite(docs, "r9_text_idx", numBuckets = 4)
    val got2 = Indexing.searchIndexStored(spark, "r9_text_idx",
        terms = Seq("scan", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == expected)
  }

  // ---- plan pins -----------------------------------------------------------

  test("jaccardJoin plan: vocabulary rank has no single-partition exchange") {
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma delta token$i token${i % 5}")).toDF("id", "text")
    val out = SetSim.jaccardJoin(docs, "id", "text", tn = 1, td = 2)
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange SinglePartition"),
      s"vocabulary rank must use the partition-offset decomposition:\n$p")
  }

  test("kmeansFitStats / semanticDedup argmin: no corpus-sized window " +
      "(min_by partial aggregate instead)") {
    val rnd = new scala.util.Random(3)
    val e = (1L to 64L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val k = Similarity.kmeansFitStats(e, k = 4, iters = 2)
    val kp = k.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!kp.contains("Window"),
      s"kmeans assignment must be a min_by aggregate, not a window:\n$kp")
    assert(kp.contains("min_by"), kp)
    // behavior: every vector lands in exactly one cell and stats cover k
    val stats = k.collect()
    assert(stats.nonEmpty)
  }
}
