package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operators: idempotent + hive-partition-aware compaction,
  * union-nomination corpus drift. */
class Round12OpsSpec extends AnyFunSuite with SparkSpec {

  private def mtimes(dir: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(base)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    } finally s.close()
  }

  test("compact always materializes dst: an already-compact source is " +
      "byte-copied (rewritten=false), never re-encoded, source untouched") {
    import graft.ops.Compaction
    val a = java.nio.file.Files.createTempDirectory("graft_idem_a").toString
    val b = a.replace("_a", "_b")
    val c = a.replace("_a", "_c")
    spark.range(0, 20000).selectExpr("id",
        "repeat(cast(id as string), 8) AS pad")
      .repartition(40).write.mode("overwrite").parquet(a)
    val first = Compaction.compact(spark, a, b, 64L * 1024).head()
    assert(first.getAs[Boolean]("rewritten"),
      "fragmented input must be rewritten")
    assert(first.getAs[Long]("files_planned") >= 1 &&
      first.getAs[Long]("files_planned") <= first.getAs[Long]("files_in"),
      s"files_planned out of range: $first")
    val pinned = mtimes(b)
    val second = Compaction.compact(spark, b, c, 64L * 1024).head()
    assert(!second.getAs[Boolean]("rewritten"),
      s"compact's own output must re-run without re-encoding: $second")
    assert(second.getAs[Long]("files_out") == second.getAs[Long]("files_in"))
    assert(second.getAs[Long]("bytes_out") == second.getAs[Long]("bytes_in"))
    // the contract callers rely on: dst holds the COMPLETE table even on
    // the no-op path (byte copy, same file names and sizes)
    assert(spark.read.parquet(c).count() == 20000,
      "no-op path must still materialize dst as a complete table")
    val bFiles = mtimes(b).keys.map(p => p.substring(p.lastIndexOf('/'))).toSet
    val cFiles = mtimes(c).keys.map(p => p.substring(p.lastIndexOf('/'))).toSet
    // only committer markers/crc sidecars may be absent from the copy —
    // they are not data files (the listing's visibility rule)
    assert((bFiles -- cFiles).forall(f =>
      f.contains("crc") || f.contains("_SUCCESS")),
      s"copied dst must carry the source's data files: $bFiles vs $cFiles")
    assert(mtimes(b) == pinned, "copy must not touch any source file")
  }

  test("compactInPlace: fragmented dir is governed where it stands; " +
      "a re-run is a one-listing no-op that touches no file") {
    import graft.ops.Compaction
    val d = java.nio.file.Files.createTempDirectory("graft_inpl").toString
    spark.range(0, 20000).selectExpr("id",
        "repeat(cast(id as string), 8) AS pad")
      .repartition(40).write.mode("overwrite").parquet(d)
    val before = spark.read.parquet(d).orderBy("id").collect().toSeq
    val st = Compaction.compactInPlace(spark, d, 64L * 1024).head()
    assert(st.getAs[Boolean]("rewritten"))
    assert(st.getAs[Long]("files_out") < st.getAs[Long]("files_in"))
    assert(spark.read.parquet(d).orderBy("id").collect().toSeq == before,
      "in-place rewrite must preserve the data")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(d + "__graft_compact_tmp")),
      "staging dir must be swapped away")
    val pinned = mtimes(d)
    val again = Compaction.compactInPlace(spark, d, 64L * 1024).head()
    assert(!again.getAs[Boolean]("rewritten"),
      s"re-run over governed dir must no-op: $again")
    assert(mtimes(d) == pinned, "no-op must not touch any file")
  }

  test("compact still rewrites when files are oversized or many are tiny") {
    import graft.ops.Compaction
    // 2+ sub-half-target files -> not compact, even if each is close
    assert(!invokeAlready(Seq(("x", 10L), ("y", 10L)), 64L))
    // one tail file is the rewrite's own shape -> compact
    assert(invokeAlready(Seq(("x", 60L), ("t", 5L)), 64L))
    // an oversized file always re-enters governance
    assert(!invokeAlready(Seq(("x", 200L), ("t", 60L)), 64L))
    // empty dir: nothing to do, but not "compact" either (callers get a
    // rewrite of an empty frame, which is still cheap)
    assert(!invokeAlready(Seq.empty, 64L))
  }

  // alreadyCompact is private by design; exercise it through compact()'s
  // observable behavior on tiny synthetic dirs
  private def invokeAlready(files: Seq[(String, Long)], target: Long)
      : Boolean = {
    val d = java.nio.file.Files.createTempDirectory("graft_band").toString
    files.foreach { case (n, sz) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$n.parquet"),
        Array.fill[Byte](sz.toInt)(1))
    }
    // a no-op returns files_out == files_in without reading the files as
    // parquet (the fakes above are not parquet, so a rewrite would throw)
    try {
      val st = graft.ops.Compaction
        .compact(spark, d, s"$d/../never", target).head()
      !st.getAs[Boolean]("rewritten")
    } catch { case _: Exception => false }
  }

  test("compactPartitioned preserves hive layout, governs each leaf " +
      "independently, and no-ops partition-by-partition on re-run") {
    import graft.ops.Compaction
    val src = java.nio.file.Files.createTempDirectory("graft_part_src")
      .toString
    val dst = src.replace("_src", "_dst")
    val dst2 = src.replace("_src", "_dst2")
    spark.range(0, 30000)
      .selectExpr("id", "repeat(cast(id as string), 8) AS pad",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'es' " +
          "ELSE 'fr' END AS lang")
      .repartition(20)
      .write.partitionBy("lang").mode("overwrite").parquet(src)
    val st = Compaction.compactPartitioned(spark, src, dst, 64L * 1024)
      .collect().map(r => r.getAs[String]("partition") -> r).toMap
    assert(st.keySet == Set("lang=en", "lang=es", "lang=fr"),
      s"expected one row per leaf partition, got ${st.keySet}")
    assert(st.values.forall(_.getAs[Boolean]("rewritten")))
    assert(st.values.forall(r =>
      r.getAs[Long]("files_out") < r.getAs[Long]("files_in")))
    // layout preserved: partition column reconstructs identically
    val a = spark.read.parquet(src).orderBy("id")
      .select("id", "pad", "lang").collect()
    val b = spark.read.parquet(dst).orderBy("id")
      .select("id", "pad", "lang").collect()
    assert(a.toSeq == b.toSeq)
    // re-run over the governed output: every leaf is byte-copied, source
    // untouched, and dst2 is a COMPLETE partition tree
    val pinned = mtimes(dst)
    val again = Compaction.compactPartitioned(spark, dst, dst2, 64L * 1024)
      .collect()
    assert(again.forall(!_.getAs[Boolean]("rewritten")),
      s"second run must copy, not re-encode, per partition: ${again.toSeq}")
    assert(spark.read.parquet(dst2).count() == 30000,
      "copied leaves must make dst2 a complete table")
    assert(mtimes(dst) == pinned)
    // the OPTIMIZE WHERE analogue: filter governs a subset of leaves
    val some = Compaction.compactPartitioned(spark, src,
        src.replace("_src", "_dst3"), 64L * 1024, _.endsWith("=es"))
      .collect()
    assert(some.map(_.getAs[String]("partition")).toSeq == Seq("lang=es"))
  }

  test("corpusDrift topOverUnion: tvd_ppm identical to the closed-form " +
      "base path; only the nomination universe may change; corpus still " +
      "scanned once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = graft.ops.TextAnalysis.corpusDrift(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("tvd_ppm"))).toMap
    val uniDf = graft.ops.TextAnalysis.corpusDrift(docs, topOverUnion = true)
    val uni = uniDf.collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("tvd_ppm"))).toMap
    assert(base.nonEmpty && uni.keySet == base.keySet)
    for ((k, v) <- base) assert(uni(k) == v,
      s"slice $k: union (n_tokens, tvd)=${uni(k)} != base $v")
    // union nomination may only ever RAISE the winning deviation: every
    // present term is still a candidate
    val baseDev = graft.ops.TextAnalysis.corpusDrift(docs).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("top_term_dev_ppm")).toMap
    val uniDev = graft.ops.TextAnalysis
      .corpusDrift(docs, topOverUnion = true).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("top_term_dev_ppm")).toMap
    for ((k, d) <- baseDev) assert(uniDev(k) >= d,
      s"slice $k: union winner ${uniDev(k)} < present-only winner $d")
    val plan = uniDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"union variant must still scan the corpus once:\n$plan")
  }

  test("compactPartitioned on a flat directory falls back to one '/' leaf") {
    import graft.ops.Compaction
    val src = java.nio.file.Files.createTempDirectory("graft_flat_src")
      .toString
    val dst = src.replace("_src", "_dst")
    spark.range(0, 5000).selectExpr("id", "repeat('x', 32) AS pad")
      .repartition(12).write.mode("overwrite").parquet(src)
    val rows = Compaction.compactPartitioned(spark, src, dst, 64L * 1024)
      .collect()
    assert(rows.map(_.getAs[String]("partition")).toSeq == Seq("/"))
    assert(spark.read.parquet(dst).count() == 5000)
  }
}
