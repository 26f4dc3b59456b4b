package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 surface: skyline conf=1 regression (ADVICE high), stored
  * fingerprint index, streaming table diff, validation rehearsal. */
class Round11OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- skyline: the conf=1 silent-local-skyline regression --------------

  test("skyline reduction always runs a final global sweep, even when " +
      "spark.sql.shuffle.partitions is 1 and the input has many partitions") {
    import graft.ops.Skyline
    def brute2(rows: Seq[(Long, Long, Long)]): Set[Long] =
      rows.filter { case (_, x, y) =>
        !rows.exists { case (_, bx, by) =>
          bx >= x && by >= y && (bx > x || by > y) }
      }.map(_._1).toSet
    val rnd = new scala.util.Random(1101)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // conf = 1: the old `while (parts > 1)` loop never ran, returning
    // concatenated LOCAL skylines — dominated rows survived whenever the
    // INPUT (file-scan/repartition geometry, independent of the conf)
    // had more than one partition
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val df = pts.toDF("id", "x", "y").repartition(8)
      val got2d = Skyline.skyline2D(df, "id", "x", "y")
        .collect().map(_.getLong(0)).toSet
      assert(got2d == brute2(pts))
      val gotNd = Skyline.skylineND(df, "id", Seq("x", "y"))
        .collect().map(_.getLong(0)).toSet
      assert(gotNd == brute2(pts))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // ---- stored fingerprint index: StoredArtifacts discipline --------------

  /** newest file mtime under a warehouse table directory — a rebuild
    * rewrites the parquet files, a stamp-hit leaves them untouched */
  private def newestMtime(table: String): Long = {
    val dir = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table.toLowerCase(java.util.Locale.ROOT))
    def walk(f: java.io.File): Long =
      if (f.isDirectory) (f.lastModified() +: f.listFiles().toSeq.map(walk)).max
      else f.lastModified()
    walk(dir)
  }

  test("writeFingerprintIndex: identical input+params skips the rebuild; " +
      "changed input, params, or force rebuilds") {
    import graft.ops.Curation
    val corpus = (0L until 200L).map(i => (i, s"fp${i % 50}")).toDF("id", "fp")
    Curation.writeFingerprintIndex(corpus, "fp", "r11_fp_idx", numBuckets = 4)
    val m1 = newestMtime("r11_fp_idx")
    Thread.sleep(20)
    // same input, same params -> stamp hit, no rewrite
    Curation.writeFingerprintIndex(corpus, "fp", "r11_fp_idx", numBuckets = 4)
    assert(newestMtime("r11_fp_idx") == m1,
      "identical input must not rebuild the stored fingerprint index")
    // changed membership -> rebuild, and the index answers for the NEW corpus
    Curation.writeFingerprintIndex(corpus.filter(col("id") < 100L),
      "fp", "r11_fp_idx", numBuckets = 4)
    assert(newestMtime("r11_fp_idx") != m1, "changed input must rebuild")
    val batch = (0L until 60L).map(i => (1000L + i, s"fp$i")).toDF("id", "fp")
    val got = Curation.incrementalNewIndexed(batch, "fp", "r11_fp_idx")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // corpus' first 100 rows hold fp0..fp49; batch fp50..fp59 are new
    assert(got == (1050L until 1060L))
    // changed params -> rebuild
    val m2 = newestMtime("r11_fp_idx")
    Thread.sleep(20)
    Curation.writeFingerprintIndex(corpus.filter(col("id") < 100L),
      "fp", "r11_fp_idx", numBuckets = 2)
    assert(newestMtime("r11_fp_idx") != m2, "changed params must rebuild")
    // force = true rebuilds despite a matching stamp
    val m3 = newestMtime("r11_fp_idx")
    Thread.sleep(20)
    Curation.writeFingerprintIndex(corpus.filter(col("id") < 100L),
      "fp", "r11_fp_idx", numBuckets = 2, force = true)
    assert(newestMtime("r11_fp_idx") != m3, "force must rebuild")
  }

  test("fingerprint index survives catalog loss: re-registered with the " +
      "bucket spec intact (batch-side-only exchange), no rebuild") {
    import graft.ops.Curation
    val corpus = (0L until 200L).map(i => (i, s"fp${i % 50}")).toDF("id", "fp")
    Curation.writeFingerprintIndex(corpus, "fp", "r11_fp_reuse", numBuckets = 4)
    val m1 = newestMtime("r11_fp_reuse")
    // simulate a fresh session: move directories aside, drop catalog
    // entries, move them back — a new JVM's exact state
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    for (t <- Seq("r11_fp_reuse", "r11_fp_reuse_meta")) {
      val src = new java.io.File(wh, t)
      assert(src.renameTo(new java.io.File(wh, t + ".save")))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(new java.io.File(wh, t + ".save").renameTo(src))
      assert(!spark.catalog.tableExists(t))
    }
    Thread.sleep(20)
    // path A: a rebuild call stamp-hits from the surviving _meta directory
    Curation.writeFingerprintIndex(corpus, "fp", "r11_fp_reuse", numBuckets = 4)
    assert(newestMtime("r11_fp_reuse") == m1,
      "catalog loss with intact directories must not rebuild")
    // path B: drop the catalog again and go straight to the READER — it
    // must self-register from meta (bucket count recorded there)
    for (t <- Seq("r11_fp_reuse", "r11_fp_reuse_meta")) {
      val src = new java.io.File(wh, t)
      assert(src.renameTo(new java.io.File(wh, t + ".save")))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(new java.io.File(wh, t + ".save").renameTo(src))
    }
    val batch = (0L until 60L).map(i => (1000L + i, s"fp$i")).toDF("id", "fp")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = Curation.incrementalNewIndexed(batch, "fp", "r11_fp_reuse")
      val got = res.collect().map(_.getAs[Long]("id")).sorted.toSeq
      assert(got == (1050L until 1060L))
      // the restored bucket spec must still satisfy the join's index-side
      // distribution by layout: exactly one (batch-side) exchange
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(ln =>
        ln.contains("Exchange") && !ln.contains("ReusedExchange"))
      assert(exchanges == 1, s"expected batch-side-only exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("stamp file witness: in-place regeneration of a file-backed input " +
      "(same ids, fresh part files) forces a rebuild") {
    import graft.ops.Curation
    val dir = java.nio.file.Files.createTempDirectory("r11_fpsrc").toString
    val mk = () => (0L until 100L).map(i => (i, s"fp${i % 20}")).toDF("id", "fp")
    mk().write.mode("overwrite").parquet(dir)
    Curation.writeFingerprintIndex(spark.read.parquet(dir), "fp",
      "r11_fp_witness", numBuckets = 2)
    val m1 = newestMtime("r11_fp_witness")
    Thread.sleep(20)
    // regenerate the source IN PLACE: identical ids and payload, but a
    // Spark writer emits fresh UUID part-file names -> witness mismatch
    mk().write.mode("overwrite").parquet(dir)
    Curation.writeFingerprintIndex(spark.read.parquet(dir), "fp",
      "r11_fp_witness", numBuckets = 2)
    assert(newestMtime("r11_fp_witness") != m1,
      "regenerated input files must miss the stamp and rebuild")
  }

  test("streamingTableDiff == batch full-outer diff across random " +
      "overlap/duplicate/null-value regimes") {
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.streaming.OutputMode
    val rnd = new scala.util.Random(1111)
    for (trial <- 1 to 8) {
      val keySpace = rnd.nextInt(40) + 5
      def side(n: Int) = (1 to n).map { _ =>
        val id = (rnd.nextInt(keySpace) + 1).toLong
        val v = if (rnd.nextDouble() < 0.15) null
          else java.lang.Double.valueOf(rnd.nextInt(6).toDouble)
        (id, v)
      }.toDF("id", "value")
      val obsB = side(rnd.nextInt(150))
      val refB = side(rnd.nextInt(150))
      val d = java.nio.file.Files.createTempDirectory(s"r11_std_$trial").toString
      obsB.repartition(2).write.parquet(s"$d/o")
      refB.repartition(2).write.parquet(s"$d/r")
      def streamOf(p: String) = spark.readStream
        .schema(spark.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val got = StreamingOps.withShufflePartitions(spark, 3) {
        StreamingOps.runToMemory(
          StreamingOps.streamingTableDiff(
            streamOf(s"$d/o"), streamOf(s"$d/r"), "id", "value"),
          s"r11_std_t$trial", OutputMode.Complete())
      }
      // batch definition: per-key per-side max (the op's documented
      // multi-value reduction), full-outer, null-safe compare
      val batch = obsB.groupBy("id").agg(max("value").as("observed"))
        .join(refB.groupBy("id").agg(max("value").as("expected")),
          Seq("id"), "full_outer")
        .join(obsB.select("id").distinct()
          .withColumn("in_o", lit(1)), Seq("id"), "left_outer")
        .join(refB.select("id").distinct()
          .withColumn("in_r", lit(1)), Seq("id"), "left_outer")
        .select(col("id"),
          when(col("in_r").isNull, "missing_in_reference")
            .when(col("in_o").isNull, "missing_in_stream")
            .when(!(col("observed") <=> col("expected")), "differing").as("kind"),
          col("observed"), col("expected"))
        .filter(col("kind").isNotNull)
      assert(got.except(batch).isEmpty && batch.except(got).isEmpty,
        s"trial $trial diverged")
    }
  }

  test("skylineNDInstrumented: same answer as skylineND, and the diag's " +
      "per-round inflow/task counts are consistent") {
    import graft.ops.Skyline
    val rnd = new scala.util.Random(1102)
    val pts = (1L to 2000L).map(i =>
      (i, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
        rnd.nextInt(60).toLong))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val df = pts.toDF("id", "a", "b", "c").repartition(16)
      val plain = Skyline.skylineND(df, "id", Seq("a", "b", "c"))
        .collect().map(_.getLong(0)).toSet
      val (inst, diag) = Skyline.skylineNDInstrumented(df, "id", Seq("a", "b", "c"))
      val got = inst.collect().map(_.getLong(0)).toSet
      assert(got == plain)
      // conf 64, fanIn 32 -> two reduction rounds (2 parts, then 1)
      val rounds = diag.report
      assert(rounds.startsWith("[{\"parts\":2,") && rounds.contains("{\"parts\":1,"),
        s"unexpected rounds: $rounds")
      // the final round's single task ingests exactly the candidates that
      // survived round 1, which is at least the answer
      assert(diag.maxTaskInflow >= got.size)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("assignSplitByGroup: no near-dup pair straddles a split boundary, " +
      "and singletons agree with assignSplit exactly") {
    import graft.ops.{Dedup, Sampling}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = Dedup.minhashCandidates(sigs)
    val labels = Dedup.connectedComponentsStar(pairs)
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val byGroup = Sampling.assignSplitByGroup(docs, "doc_id", labels, splits)
      .select("doc_id", "split_group", "split")
    // the leakage property: every LSH candidate pair lands in ONE split
    val straddlers = pairs
      .join(byGroup.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(byGroup.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddlers.isEmpty,
      straddlers.collect().take(5).mkString("\n"))
    // outside duplicate groups the two rules are IDENTICAL (same hash of
    // the same key), so adopting the safe split never reshuffles the
    // singleton majority
    val byId = Sampling.assignSplit(docs, "doc_id", splits)
      .select(col("doc_id"), col("split").as("split_by_id"))
    val singletonsDiffer = byGroup.filter(col("split_group") === col("doc_id"))
      .join(byId, Seq("doc_id"))
      .filter(col("split") =!= col("split_by_id"))
    assert(singletonsDiffer.isEmpty)
    // sanity: the corpus has at least one real multi-doc group, so the
    // straddler assertion was not vacuous
    assert(labels.filter(col("id") =!= col("component")).count() > 0)
  }

  // ---- corpus drift (per-slice TVD vs the corpus distribution) ----------

  test("corpusDrift: hand-checked TVD, absent-term closed form, argmax term") {
    import graft.ops.TextAnalysis
    // slices: A = {x x x y}, B = {x y y y}, C = {z z z z}; N = 12,
    // corpus counts x:4 y:4 z:4 (q = 1/3 each)
    val docs = Seq(
      (1L, "x x x y", "A"), (2L, "x y y y", "B"), (3L, "z z z z", "C"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.corpusDrift(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // A: p=(3/4,1/4,0) -> TVD = (|3/4-1/3|+|1/4-1/3|+1/3)/2 = 5/12
    //    deviations d_x=3*12-4*4=20, d_y=|1*12-16|=4, absent z: 4*4=16
    //    tvd_ppm = 40e6 div 96 = 416666; top x dev 20e6 div 48 = 416666
    // B symmetric to A with y dominant -> top term y
    // C: pure z -> TVD = 2/3; d_z=32, absent x,y: 32 -> 666666
    assert(got(0) == ("A", 4L, 416666L, "x", 416666L))
    assert(got(1) == ("B", 4L, 416666L, "y", 416666L))
    assert(got(2) == ("C", 4L, 666666L, "z", 666666L))
  }

  test("corpusDrift: equal-deviation tie breaks by term ascending; " +
      "identical slices score zero drift") {
    import graft.ops.TextAnalysis
    // A = {x x x y}, B = {x y y y}: d_x and d_y both 8 in each slice ->
    // tie resolves to the lexicographically smallest term
    val tied = Seq((1L, "x x x y", "A"), (2L, "x y y y", "B"))
      .toDF("doc_id", "text", "source")
    val gotTied = TextAnalysis.corpusDrift(tied).orderBy("source").collect()
    assert(gotTied.map(_.getString(3)).toSeq == Seq("x", "x"))
    assert(gotTied.map(_.getLong(2)).toSeq == Seq(250000L, 250000L))
    // two identical slices: every deviation is exactly 0
    val same = Seq((1L, "a b c", "A"), (2L, "a b c", "B"))
      .toDF("doc_id", "text", "source")
    val gotSame = TextAnalysis.corpusDrift(same).collect()
    assert(gotSame.forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L))
  }

  // ---- small-file compaction --------------------------------------------

  test("packBins: best-fit-decreasing hand check, oversized isolation, " +
      "deterministic name tie-break") {
    import graft.ops.Compaction.packBins
    // target 10, sizes 6,4,4,3,2,1 -> bins {6,4} and {4,3,2,1}
    val got = packBins(Seq(("a", 6L), ("b", 4L), ("c", 4L), ("d", 3L),
      ("e", 2L), ("f", 1L)), 10L).map(t => t._1 -> t._3).toMap
    assert(got("a") == 0 && got("b") == 0)
    assert(Seq("c", "d", "e", "f").forall(got(_) == 1))
    // an oversized file gets a bin of its own; nothing joins it
    val over = packBins(Seq(("big", 12L), ("s1", 2L), ("s2", 2L)), 5L)
    val bigBin = over.find(_._1 == "big").get._3
    assert(over.filter(_._3 == bigBin).map(_._1) == Seq("big"))
    assert(over.filter(_._1 != "big").map(_._3).distinct.size == 1)
    // equal sizes order by name, so the assignment is reproducible
    val x = packBins(Seq(("n2", 4L), ("n1", 4L), ("n3", 4L)), 8L)
    val y = packBins(Seq(("n3", 4L), ("n1", 4L), ("n2", 4L)), 8L)
    assert(x.sortBy(_._1) == y.sortBy(_._1))
  }

  test("compactionPlan lists data files only; compact rewrites many " +
      "small files into few target-sized ones, shuffle-free, " +
      "preserving every row and restoring session confs") {
    import graft.ops.Compaction
    val src = java.nio.file.Files.createTempDirectory("graft_compact_src")
      .toString
    val dst = src.replace("_src", "_dst")
    // ~40 small files of a few KB each
    spark.range(0, 20000).selectExpr("id",
        "repeat(cast(id as string), 8) AS pad")
      .repartition(40).write.mode("overwrite").parquet(src)
    // a killed write's leftovers: files under _temporary are invisible
    // to Spark's scan and must be invisible to the plan and the stats
    // too (the visibility rule checks every path SEGMENT, not the leaf)
    val tmp = java.nio.file.Paths.get(src, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-phantom.parquet"),
      Array.fill[Byte](4096)(1))
    val plan = Compaction.compactionPlan(spark, src, 64L * 1024)
    assert(plan.filter(col("file").contains("phantom")).isEmpty,
      "_temporary contents must not be binned")
    val nIn = plan.count()
    assert(nIn >= 35) // the 40 parts (allowing empty-partition elision)
    assert(plan.filter(col("file").contains("_SUCCESS")).isEmpty)
    assert(plan.select("bin").distinct().count() < nIn / 4)
    val before = (spark.conf.getOption("spark.sql.files.maxPartitionBytes"),
      spark.conf.getOption("spark.sql.files.minPartitionNum"))
    val stats = Compaction.compact(spark, src, dst, 64L * 1024).head()
    assert((spark.conf.getOption("spark.sql.files.maxPartitionBytes"),
      spark.conf.getOption("spark.sql.files.minPartitionNum")) == before)
    val (filesIn, filesOut) = (stats.getLong(0), stats.getLong(2))
    assert(filesIn == nIn)
    assert(filesOut < filesIn / 4 && filesOut >= 1)
    // "target-sized" is a size claim, not just a count claim: the scan
    // packs <= targetBytes of INPUT per partition, so each re-encoded
    // output file stays within 2x the target (encoding slack + footer)
    val outSizes = Compaction.compactionPlan(spark, dst, 64L * 1024)
      .select("bytes").collect().map(_.getLong(0))
    assert(outSizes.forall(_ <= 2 * 64L * 1024),
      s"output file exceeds 2x target: ${outSizes.toSeq}")
    // every row survives the rewrite
    val a = spark.read.parquet(src).orderBy("id").collect()
    val b = spark.read.parquet(dst).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("compactClustered rewrites into target-sized files whose cluster-" +
      "key ranges are pairwise disjoint (zone-map-prunable), all rows kept") {
    import graft.ops.Compaction
    val src = java.nio.file.Files.createTempDirectory("graft_cc_src").toString
    val dst = src.replace("_src", "_dst")
    // ids arrive SCATTERED across files (hash repartition), so before the
    // rewrite every file spans ~the whole id domain — no stat can prune
    spark.range(0, 30000).selectExpr("id",
        "repeat(cast(id as string), 8) AS pad")
      .repartition(40).write.mode("overwrite").parquet(src)
    val st = Compaction.compactClustered(spark, src, dst, 96L * 1024, "id")
      .head()
    assert(st.getLong(2) <= st.getLong(4) && st.getLong(2) >= 2,
      s"expected 2..n_bins output files, got $st")
    assert(spark.read.parquet(dst).count() == 30000)
    // per-file min/max of the cluster key must not overlap across files
    import org.apache.spark.sql.functions._
    val ranges = spark.read.parquet(dst)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("SignedProjection instances with equal sign matrices are equal " +
      "(semanticEquals-able), unequal matrices are not") {
    import graft.functions.{SignedProjection, columnExpr}
    val e = columnExpr(col("v"))
    val s1 = IndexedSeq.tabulate(8)(i => if (i % 2 == 0) 1L else -1L)
    val s2 = IndexedSeq.tabulate(8)(i => if (i % 2 == 0) 1L else -1L)
    val s3 = s1.updated(3, 1L)
    assert(SignedProjection(e, 4, 2, s1) == SignedProjection(e, 4, 2, s2))
    assert(SignedProjection(e, 4, 2, s1).semanticEquals(
      SignedProjection(e, 4, 2, s2)))
    assert(SignedProjection(e, 4, 2, s1) != SignedProjection(e, 4, 2, s3))
  }
}
