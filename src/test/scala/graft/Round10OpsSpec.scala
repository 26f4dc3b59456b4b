package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 surface: the fused integer vector kernels
  * ([[graft.functions.IntCosRankKey]] / [[graft.functions.IntCosGte]] /
  * [[graft.functions.IntSqDist]]) pinned bit-identical — including null
  * semantics — to the compositional decimal/lambda forms they replace on
  * the ANN hot paths. */
class Round10OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Random float vectors plus every edge shape the compositional forms
    * have defined semantics for: negative components (negative dots),
    * zero vectors, a null array, a null element, a length mismatch,
    * near-parallel pairs (rank-key ties at the 1e-12 resolution), and
    * exact duplicates (cos = 1 boundary). */
  private def pairFrame() = {
    val rnd = new scala.util.Random(42)
    def vec(dim: Int): Seq[java.lang.Float] =
      Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextDouble() * 2 - 1).toFloat))
    val base = (1 to 200).map { i =>
      (i.toLong, vec(16), vec(16))
    }
    val dup = vec(16)
    val nearDup = dup.updated(0, java.lang.Float.valueOf(dup.head * 1.0000001f))
    val zero = Seq.fill(16)(java.lang.Float.valueOf(0f))
    val edge = Seq(
      (1001L, dup, dup),                       // cosine exactly 1
      (1002L, dup, nearDup),                   // near-tie
      (1003L, dup, dup.map(x => java.lang.Float.valueOf(-x))), // cosine -1
      (1004L, zero, dup),                      // zero left norm
      (1005L, dup, zero),                      // zero right norm
      (1006L, zero, zero),                     // both zero
      (1007L, null, dup),                      // null array
      (1008L, dup, vec(8)),                    // length mismatch
      (1009L, dup.updated(3, null.asInstanceOf[java.lang.Float]), dup), // null element
      // combined edges — one conjunct FALSE while another is NULL: the
      // three-valued And yields FALSE, not NULL (null && false = false)
      (1010L, vec(16), zero.take(8)),          // mismatch x zero-norm
      (1011L, null, zero),                     // null array x zero-norm
      (1012L, dup.updated(3, null.asInstanceOf[java.lang.Float]), zero), // null elem x zero
      (1013L, zero.take(8), vec(16)))          // zero-norm short side x longer
    (base ++ edge).toDF("id", "a", "b")
  }

  test("fused IntCosRankKey is null-safe-equal to the three-limb decimal " +
      "form on random vectors and every edge shape") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val df = pairFrame()
      .withColumn("ref", intCosRankKey(q24Vec(col("a")), q24Vec(col("b"))))
      .withColumn("fused", intCosRankKeyFused(col("a"), col("b")))
    val bad = df.filter(!(col("ref") <=> col("fused")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
    // the decimal form's IntegralDivide yields LongType — the fused key
    // must keep the exact same ordering type, not a decimal
    assert(df.schema("fused").dataType ==
      org.apache.spark.sql.types.LongType)
    // sanity on the magnitudes the bit-equality rides on: an exact
    // duplicate pair keys at +10^12, an antiparallel pair at -10^12
    val byId = df.select("id", "fused").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1001L).contains(1000000000000L))
    // q24(-x) is not exactly -q24(x) (floor(v+0.5) rounds half toward
    // +inf), so the antiparallel key sits within one resolution step of
    // -10^12 rather than exactly on it — in BOTH forms, bit-identically
    assert(byId(1003L).exists(k => k.asInstanceOf[Long] <= -999999999990L))
    assert(byId(1006L).isEmpty && byId(1007L).isEmpty && byId(1008L).isEmpty)
  }

  test("fused IntCosRankKey accepts pre-quantized bigint arrays and mixed " +
      "kinds, matching the decimal form over the same quantized inputs") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val df = pairFrame()
      .withColumn("qa", q24Vec(col("a"))).withColumn("qb", q24Vec(col("b")))
    val both = df
      .withColumn("ref", intCosRankKey(col("qa"), col("qb")))
      .withColumn("fused_ll", intCosRankKeyFused(col("qa"), col("qb")))
      .withColumn("fused_mix", intCosRankKeyFused(col("a"), col("qb")))
    val bad = both.filter(!(col("ref") <=> col("fused_ll")) ||
      !(col("ref") <=> col("fused_mix")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  test("fused IntCosGte is null-safe-equal to the compositional " +
      "conjunction across thresholds, on raw and quantized inputs") {
    import graft.functions.{intCosineGte, intCosineGteFused, q24Vec}
    for ((tn, td) <- Seq((95, 100), (1, 100), (100, 100), (1, 2))) {
      val df = pairFrame()
        .withColumn("ref", intCosineGte(q24Vec(col("a")), q24Vec(col("b")), tn, td))
        .withColumn("fused", intCosineGteFused(col("a"), col("b"), tn, td))
        .withColumn("fused_q",
          intCosineGteFused(q24Vec(col("a")), q24Vec(col("b")), tn, td))
      val bad = df.filter(!(col("ref") <=> col("fused")) ||
        !(col("ref") <=> col("fused_q")))
      assert(bad.isEmpty, s"tn=$tn td=$td: " +
        bad.collect().take(5).mkString("\n"))
    }
    intercept[IllegalArgumentException] {
      graft.functions.intCosineGteFused(col("a"), col("b"), 501, 100)
    }
  }

  test("fused IntSqDist is null-safe-equal to the zip_with/aggregate form " +
      "on raw and quantized inputs") {
    import graft.functions.{intSqDist, intSqDistFused, q24Vec}
    val df = pairFrame()
      .withColumn("ref", intSqDist(q24Vec(col("a")), q24Vec(col("b"))))
      .withColumn("fused", intSqDistFused(col("a"), col("b")))
      .withColumn("fused_q", intSqDistFused(q24Vec(col("a")), q24Vec(col("b"))))
    val bad = df.filter(!(col("ref") <=> col("fused")) ||
      !(col("ref") <=> col("fused_q")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  // ---- fused signed projection -------------------------------------------

  test("SignedProjection equals the unrolled element_at form (incl. null " +
      "element, short array, extra elements) and materializes once") {
    import graft.functions.{exprColumn, columnExpr, q24Vec, SignedProjection}
    import graft.ops.Similarity
    val dim = 8; val outDim = 4
    val rnd = new scala.util.Random(5)
    val rows = (1 to 100).map(i => (i.toLong,
      Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextDouble() * 2 - 1).toFloat)))) ++
      Seq(
        (201L, null),
        (202L, Seq.fill(dim - 1)(java.lang.Float.valueOf(0.5f))), // short
        (203L, Seq.fill(dim + 3)(java.lang.Float.valueOf(0.5f))), // extra
        (204L, Seq.tabulate(dim)(k => if (k == 2) null
          else java.lang.Float.valueOf(0.25f)))) // null element
    val df = rows.toDF("id", "v")
    // the unrolled reference: q24 per element, +-1 sum via element_at
    val signs = IndexedSeq.tabulate(outDim * dim)(k =>
      Similarity.projSign(k / dim, k % dim))
    val unrolled = (0 until outDim).map { j =>
      (0 until dim).map { i =>
        val e = element_at(q24Vec(col("v")), i + 1)
        if (signs(j * dim + i) > 0) e else -e
      }.reduce(_ + _).as(s"r$j")
    }
    val fusedCol = exprColumn(SignedProjection(columnExpr(col("v")),
      dim, outDim, signs))
    val both = df.select(col("id") +: fusedCol.as("p") +: unrolled: _*)
    val bad = both.filter((0 until outDim)
      .map(j => !(element_at(col("p"), j + 1) <=> col(s"r$j")))
      .reduce(_ || _))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
    // plan pin: the projection must evaluate ONCE per row — a
    // CollapseProject regression would inline it into every p_j column
    // spark.range input: a local Seq would constant-fold to a
    // LocalTableScan and hide the projection from the plan entirely
    val rp = Similarity.randomProjection(
      spark.range(100).selectExpr("id AS vec_id",
        s"transform(sequence(0, ${dim - 1}), " +
          "j -> CAST((id * 7 + j) % 13 AS FLOAT) / 13.0) AS embedding"),
      dim, outDim)
    val planStr = rp.queryExecution.executedPlan.toString
    val occurrences = "signed_projection".r.findAllIn(planStr).size
    assert(occurrences == 1,
      s"signed_projection must appear exactly once, saw $occurrences:\n$planStr")
  }

  // ---- round-10 contract guards ------------------------------------------

  test("skyline operators refuse non-integral id/dim columns instead of " +
      "silently casting to null") {
    import graft.ops.Skyline
    val bad = Seq((1L, 2.5, 3L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](Skyline.skyline2D(bad, "id", "x", "y"))
    intercept[IllegalArgumentException](Skyline.skylineND(bad, "id", Seq("x", "y")))
    val badId = Seq(("a", 2L, 3L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](Skyline.skyline2D(badId, "id", "x", "y"))
  }

  test("skylineND multi-round candidate reduction (>fanIn partitions) " +
      "still equals brute force, including anti-correlated data") {
    import graft.ops.Skyline
    def brute(rows: Seq[(Long, Seq[Long])]): Set[Long] =
      rows.filter { case (_, a) =>
        !rows.exists { case (_, b) =>
          a.indices.forall(i => b(i) >= a(i)) && a.indices.exists(i => b(i) > a(i))
        }
      }.map(_._1).toSet
    val rnd = new scala.util.Random(11)
    // anti-correlated: points near the plane x+y+z = const, where local
    // skylines approach partition size — the case the fan-in rounds exist
    // for
    val anti = (1L to 300L).map { i =>
      val a = rnd.nextInt(100).toLong; val b = rnd.nextInt(100 - a.toInt).toLong
      (i, Seq(a, b, 99L - a - b + rnd.nextInt(3)))
    }
    // shuffle-partitions conf 64 > fanIn=32 forces a two-round reduction
    // (the round count reads the conf — never the input RDD, which would
    // eagerly execute an AQE plan)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val df = anti.map { case (id, v) => (id, v(0), v(1), v(2)) }
        .toDF("id", "a", "b", "c").repartition(64)
      val got = Skyline.skylineND(df, "id", Seq("a", "b", "c"))
        .collect().map(_.getLong(0)).toSet
      assert(got == brute(anti))
      // 2-D path through the same multi-round shape
      val got2 = Skyline.skyline2D(df, "id", "a", "b")
        .collect().map(_.getLong(0)).toSet
      assert(got2 == brute(anti.map { case (id, v) => (id, v.take(2)) }))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("zBucketAdaptive sizes the interleave from the key domain: same " +
      "buckets as a hand-sized zBucket, no raise_error past 15-bit keys") {
    import graft.ops.Layout
    // keys spread up past 2^15 — the old hard-coded bits=15 would
    // raise_error on the larger ones
    val df = spark.range(0L, 512L)
      .selectExpr("id * 129 AS x", "CAST((id * 129) % 1024 AS BIGINT) AS y")
    val adaptive = Layout.zBucketAdaptive(df, col("x"), col("y"), log2Buckets = 6)
      .select("x", "zbucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // max key is 2^16+511 -> bit length 17
    val manual = Layout.zBucket(df, col("x"), col("y"), bits = 17, log2Buckets = 6)
      .select("x", "zbucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adaptive == manual)
    assert(adaptive.values.toSet.size > 1, "buckets must not collapse")
  }

  // ---- content-stamped stored-index idempotence --------------------------

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

  private def textDocs(n: Long) = {
    val words = Seq("scan", "merge", "window", "sort", "hash", "join")
    (1L to n).map { i =>
      (i, (0 until (i % 7 + 1).toInt).map(j => words(((i + j) % 6).toInt))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("indexWrite: identical input+params skips the rebuild; changed " +
      "input or params rebuilds (stale index never reused)") {
    import graft.ops.Indexing
    val docs = textDocs(200L)
    assert(Indexing.indexWrite(docs, "r10_stamp_idx", numBuckets = 4) == 200L)
    val expected = Indexing.searchIndexStored(spark, "r10_stamp_idx",
      terms = Seq("scan", "merge"), k = 10).collect().toSeq
    val m1 = newestMtime("r10_stamp_idx_postings")
    Thread.sleep(20)
    // same input, same params -> stamp hit, no rewrite
    assert(Indexing.indexWrite(docs, "r10_stamp_idx", numBuckets = 4) == 200L)
    assert(newestMtime("r10_stamp_idx_postings") == m1,
      "identical input must not rebuild the stored index")
    assert(Indexing.searchIndexStored(spark, "r10_stamp_idx",
      terms = Seq("scan", "merge"), k = 10).collect().toSeq == expected)
    // changed input -> rebuild (and the answer tracks the NEW corpus)
    assert(Indexing.indexWrite(docs.filter(col("doc_id") <= 100),
      "r10_stamp_idx", numBuckets = 4) == 100L)
    assert(newestMtime("r10_stamp_idx_postings") != m1,
      "changed input must rebuild")
    // changed params (same input) -> rebuild too
    val m2 = newestMtime("r10_stamp_idx_postings")
    Thread.sleep(20)
    Indexing.indexWrite(docs.filter(col("doc_id") <= 100),
      "r10_stamp_idx", numBuckets = 2)
    assert(newestMtime("r10_stamp_idx_postings") != m2,
      "changed build params must rebuild")
    // force = true rebuilds even on a stamp hit — the escape hatch for
    // in-place payload edits under unchanged ids (stamp is membership)
    val m3 = newestMtime("r10_stamp_idx_postings")
    Thread.sleep(20)
    Indexing.indexWrite(docs.filter(col("doc_id") <= 100),
      "r10_stamp_idx", numBuckets = 2, force = true)
    assert(newestMtime("r10_stamp_idx_postings") != m3,
      "force = true must rebuild despite a matching stamp")
  }

  test("stored indexes survive catalog loss: a fresh catalog re-registers " +
      "the surviving directories (bucket spec restored) without rebuilding") {
    import graft.ops.{Indexing, Similarity}
    val docs = textDocs(150L)
    Indexing.indexWrite(docs, "r10_reuse_idx", numBuckets = 4)
    val expected = Indexing.searchIndexStored(spark, "r10_reuse_idx",
      terms = Seq("scan", "hash"), k = 10).collect().toSeq
    val m1 = newestMtime("r10_reuse_idx_postings")
    // simulate a fresh session: move the data aside (DROP on a managed
    // table deletes it), drop the catalog entries, move the data back —
    // leaving exactly a new JVM's state: directories, no catalog
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val tables = Seq("r10_reuse_idx_postings", "r10_reuse_idx_meta")
    for (t <- tables) {
      val src = new java.io.File(wh, t)
      assert(src.renameTo(new java.io.File(wh, t + ".save")))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(new java.io.File(wh, t + ".save").renameTo(src))
      assert(!spark.catalog.tableExists(t))
    }
    Thread.sleep(20)
    // stamp hit from the surviving _meta directory -> re-register, no build
    assert(Indexing.indexWrite(docs, "r10_reuse_idx", numBuckets = 4) == 150L)
    assert(newestMtime("r10_reuse_idx_postings") == m1,
      "catalog loss with intact directories must not rebuild")
    val stored = Indexing.searchIndexStored(spark, "r10_reuse_idx",
      terms = Seq("scan", "hash"), k = 10)
    assert(stored.collect().toSeq == expected)
    // the restored registration must keep the term-bucketed layout: the
    // search's literal term filter prunes buckets on disk
    val scan = stored.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("SelectedBucketsCount"),
      s"re-registered table lost its bucket spec:\n$scan")

    // same flow for the PQ index: build, lose the catalog, reuse
    val vecs = spark.range(64).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), j -> CAST((id * 7 + j) % 13 AS FLOAT) / 13.0) AS embedding")
    Similarity.pqIndexWrite(vecs, "r10_pq_reuse", m = 2, ksub = 4,
      numBuckets = 2)
    val pqExpected = Similarity.pqSearchIndexed(spark, "r10_pq_reuse",
      vecs.filter(col("vec_id") < 4), k = 3, m = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val pm1 = newestMtime("r10_pq_reuse_codes")
    for (t <- Seq("r10_pq_reuse_books", "r10_pq_reuse_codes", "r10_pq_reuse_meta")) {
      val src = new java.io.File(wh, t)
      assert(src.renameTo(new java.io.File(wh, t + ".save")))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(new java.io.File(wh, t + ".save").renameTo(src))
    }
    Thread.sleep(20)
    Similarity.pqIndexWrite(vecs, "r10_pq_reuse", m = 2, ksub = 4,
      numBuckets = 2)
    assert(newestMtime("r10_pq_reuse_codes") == pm1,
      "PQ index must be reused across catalog loss, not refit")
    assert(Similarity.pqSearchIndexed(spark, "r10_pq_reuse",
      vecs.filter(col("vec_id") < 4), k = 3, m = 2)
      .orderBy("query_id", "rank").collect().toSeq == pqExpected)
  }

  test("fused kernels equal the compositional forms across random dims " +
      "(1..64) and budget-edge magnitudes (|x| up to 2)") {
    import graft.functions._
    val rnd = new scala.util.Random(101)
    for (trial <- 1 to 8) {
      val dim = rnd.nextInt(64) + 1
      // amp 2.0 drives |q24| to ~2^25 — the documented component budget
      // ceiling, where the DECIMAL(38,0) three-limb form sits closest to
      // its 38-digit headroom (dot^2 * 10^4 ~ 5e37)
      val amp = if (trial % 2 == 0) 2.0 else 1.0 / (trial + 1)
      def vec() = Seq.fill(dim)(
        java.lang.Float.valueOf(((rnd.nextDouble() * 2 - 1) * amp).toFloat))
      val df = (1 to 60).map(i => (i.toLong, vec(), vec())).toDF("id", "a", "b")
        .withColumn("qa", q24Vec(col("a"))).withColumn("qb", q24Vec(col("b")))
      val bad = df
        .withColumn("k_ref", intCosRankKey(col("qa"), col("qb")))
        .withColumn("k_fused", intCosRankKeyFused(col("a"), col("b")))
        .withColumn("g_ref", intCosineGte(col("qa"), col("qb"), 95, 100))
        .withColumn("g_fused", intCosineGteFused(col("a"), col("b"), 95, 100))
        .withColumn("d_ref", intSqDist(col("qa"), col("qb")))
        .withColumn("d_fused", intSqDistFused(col("a"), col("b")))
        .filter(!(col("k_ref") <=> col("k_fused")) ||
          !(col("g_ref") <=> col("g_fused")) ||
          !(col("d_ref") <=> col("d_fused")))
      assert(bad.isEmpty,
        s"trial $trial dim=$dim amp=$amp:\n" + bad.collect().take(3).mkString("\n"))
    }
  }

  test("fused kernels survive the interpreted (non-codegen) path with " +
      "identical results") {
    import graft.functions.{intCosRankKey, intCosRankKeyFused, q24Vec}
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = pairFrame()
        .withColumn("ref", intCosRankKey(q24Vec(col("a")), q24Vec(col("b"))))
        .withColumn("fused", intCosRankKeyFused(col("a"), col("b")))
      val bad = df.filter(!(col("ref") <=> col("fused")))
      assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
