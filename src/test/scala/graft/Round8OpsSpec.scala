package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Frequency, Graph, Layout, Sampling, SetSim}

/** Round-8 operators: z-order layout, triangle counting, prefix-filter
  * set-similarity join, grouped HLL, largest-remainder allocation. */
class Round8OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- Layout (Morton / Z-order) ----------------------------------------

  /** reference Morton interleave in plain Scala */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference interleave on a grid + edge values") {
    val pts = for (x <- 0 to 17; y <- 0 to 17) yield (x.toLong, y.toLong)
    val extra = Seq((32767L, 0L), (0L, 32767L), (32767L, 32767L), (12345L, 6789L))
    val df = (pts ++ extra).toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 15))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") ==
        morton(r.getAs[Long]("x"), r.getAs[Long]("y"), 15),
        s"(${r.get(0)}, ${r.get(1)})")
    }
  }

  test("zValueSql is the identical arithmetic (replayed through Spark SQL)") {
    val df = Seq((12345L, 6789L), (1L, 2L), (32767L, 32767L)).toDF("x", "y")
    val viaSql = df.selectExpr(s"${Layout.zValueSql("x", "y", 15)} AS z")
      .as[Long].collect()
    val viaCol = df.select(Layout.zValue(col("x"), col("y"), 15)).as[Long].collect()
    assert(viaSql.sameElements(viaCol))
  }

  test("zBucket narrows BOTH dimensions' zone maps vs a one-key layout") {
    // uniform grid: under z-bucketing into 64 buckets each bucket should
    // span ~1/8 of each dimension; under bucketing by an unrelated key
    // every bucket spans everything
    val n = 1 << 12
    val grid = spark.range(n).selectExpr(
      "id % 64 AS x", "id DIV 64 AS y", "id AS k")
    val z = Layout.zBucket(grid, col("x"), col("y"), bits = 6, log2Buckets = 6)
    val zm = Layout.zoneMaps(z, "zbucket", col("x"), col("y")).collect()
    assert(zm.length == 64)
    zm.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 7)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 7)
    }
    // bucket by a HASH of the key — uncorrelated with x and y (k % 64
    // would literally equal x on this grid)
    val h = grid.withColumn("hb", pmod(xxhash64(col("k")), lit(64L)))
    val hm = Layout.zoneMaps(h, "hb", col("x"), col("y")).collect()
    // a hash bucket's ~64 samples span nearly (not always exactly) the
    // full domain — the contrast with <= 7 above is the point
    hm.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") >= 48)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") >= 48)
    }
  }

  // ---- Graph.triangleCounts ---------------------------------------------

  test("triangle counts: K4 + pendant path + disconnected edge") {
    // K4 on {a,b,c,d}: 4 triangles, each node in 3. Pendant e-a and
    // disconnected f-g: in none.
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("e", "a"), ("f", "g")).toDF("u", "v")
    val tc = Graph.triangleCounts(edges, "u", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tc == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("triangle counts ignore duplicate/reversed edges and self-loops") {
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"), // one undirected edge
      ("b", "c"), ("c", "a"),
      ("a", "a") // self-loop
    ).toDF("u", "v")
    val tc = Graph.triangleCounts(edges, "u", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tc == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangle plan: equi-joins only, no nested-loop/cartesian") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("u", "v")
    val plan = Graph.triangleCounts(edges, "u", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // ---- SetSim.jaccardJoin -----------------------------------------------

  /** brute-force distinct-shingle Jaccard in plain Scala */
  private def bruteJaccard(docs: Seq[(Long, String)], w: Int, tn: Int,
      td: Int): Set[(Long, Long, Long, Long)] = {
    def sh(t: String): Set[String] = {
      val ts = t.trim.split("\\s+").filter(_.nonEmpty)
      if (w == 1) ts.toSet
      else if (ts.length < w) Set.empty
      else ts.sliding(w).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }.toMap
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) & sets(b)).size.toLong
      un = (sets(a) | sets(b)).size.toLong
      if un > 0 && inter * td >= tn * un
    } yield (a, b, inter, un)).toSet
  }

  private val simDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (4L, "an entirely different document about distributed query engines"),
    (5L, "the quick brown cat naps under the warm sun all afternoon"),
    (6L, "xy"), // single token: no 3-gram shingles
    (7L, ""))

  test("jaccardJoin(3-gram) equals brute force") {
    val got = SetSim.jaccardJoin(simDocs.toDF("doc_id", "text"),
      "doc_id", "text", tn = 2, td = 5, shingleW = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == bruteJaccard(simDocs, 3, 2, 5))
    assert(got.exists(p => p._1 == 1L && p._2 == 3L)) // exact dup found
  }

  test("jaccardJoin(tokens, w=1) equals brute force at a high threshold") {
    val got = SetSim.jaccardJoin(simDocs.toDF("doc_id", "text"),
      "doc_id", "text", tn = 9, td = 10, shingleW = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == bruteJaccard(simDocs, 1, 9, 10))
  }

  test("jaccardJoin prefix filter really prunes (candidate count < all pairs)") {
    // sanity on the filtering claim: with 3-gram shingles on these docs,
    // the only candidate pairs share a PREFIX shingle; doc 4 and doc 5
    // share no shingles with anything, so nothing pairs them
    val got = SetSim.jaccardJoin(simDocs.toDF("doc_id", "text"),
      "doc_id", "text", tn = 2, td = 5, shingleW = 3).collect()
    assert(!got.exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L))
  }

  // ---- Frequency: grouped HLL -------------------------------------------

  test("grouped HLL sketch with one group == global sketch; distributed " +
    "decimal estimate == driver BigInt estimate") {
    val items = spark.range(5000).selectExpr(
      "CAST(id % 1700 AS STRING) AS k", "'g' AS g")
    val global = Frequency.hllSketch(items, "k", p = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grouped = Frequency.hllSketchGrouped(items, "k", "g", p = 8)
    assert(grouped.collect().map(r => (r.getLong(1), r.getLong(2))).toSet == global)
    val viaDriver = Frequency.hllEstimate(
      Frequency.hllSketch(items, "k", p = 8), p = 8)
      .collect()(0).getAs[Long]("n_est")
    val viaGroups = Frequency.hllEstimateGrouped(grouped, "g", p = 8)
      .collect()(0).getAs[Long]("n_est")
    assert(viaDriver == viaGroups,
      s"decimal path $viaGroups != BigInt path $viaDriver")
  }

  test("grouped HLL separates groups (estimates track per-group cardinality)") {
    // both cardinalities inside the raw estimator's >= 2.5*m working
    // range (m = 256): ~5000 vs ~800 distinct. Sequential decimal keys
    // on purpose — the un-finalized fnv1a estimated such sets 2-3.4x
    // high (measured), so these bounds also pin the finalizer's effect
    val items = spark.range(40000).selectExpr(
      "CASE WHEN id % 2 = 0 THEN CAST(id % 10000 AS STRING) " +
        "ELSE CAST(id % 1600 AS STRING) END AS k",
      "CASE WHEN id % 2 = 0 THEN 'big' ELSE 'small' END AS g")
    val est = Frequency.hllEstimateGrouped(
      Frequency.hllSketchGrouped(items, "k", "g", p = 8), "g", p = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_est")).toMap
    // even ids -> id % 10000 even: 5000 distinct; odd ids -> id % 1600
    // odd: 800 distinct. raw-estimator error at p=8 is ~6.5%
    assert(est("big") > 4200 && est("big") < 5800, est.toString)
    assert(est("small") > 650 && est("small") < 950, est.toString)
  }

  // ---- PQ index idempotence across sessions -----------------------------

  test("pqIndexWrite survives an orphaned warehouse location (fresh-catalog rerun)") {
    import graft.ops.Similarity
    // simulate a PREVIOUS session's leftovers: the in-memory catalog has
    // no table entry, but the warehouse directory exists — exactly the
    // state that made saveAsTable refuse with LOCATION_ALREADY_EXISTS
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val orphan = new java.io.File(wh, "pq_orphan_spec_books")
    orphan.mkdirs()
    assert(orphan.exists())
    val vecs = spark.range(64).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), j -> CAST((id * 7 + j) % 13 AS FLOAT) / 13.0) AS embedding")
    Similarity.pqIndexWrite(vecs, "pq_orphan_spec", m = 2, ksub = 4,
      numBuckets = 2)
    assert(spark.table("pq_orphan_spec_books").count() > 0)
    assert(spark.table("pq_orphan_spec_codes").count() == 64 * 2)
    spark.sql("DROP TABLE IF EXISTS pq_orphan_spec_books")
    spark.sql("DROP TABLE IF EXISTS pq_orphan_spec_codes")
  }

  // ---- Sampling.largestRemainderAllocate --------------------------------

  test("largest-remainder allocation: exact budget, hand-checked quotas") {
    // counts 5, 3, 2 over budget 7: quotas 3.5, 2.1, 1.4 -> floors 3,2,1
    // (sum 6), one leftover goes to the largest remainder (.5 -> a)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("g")
    val got = Sampling.largestRemainderAllocate(df, "g", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("largest-remainder allocation sums to the budget and ties break by name") {
    // equal counts, budget not divisible: remainders all equal -> the
    // +1s go to the alphabetically first groups
    val df = (1 to 40).map(i => s"g${(i - 1) % 4}").toDF("g")
    val got = Sampling.largestRemainderAllocate(df, "g", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got.values.sum == 10L)
    assert(got == Map("g0" -> 3L, "g1" -> 3L, "g2" -> 2L, "g3" -> 2L))
  }

  // ---- k-core -----------------------------------------------------------

  test("kCore peels a pendant tree off a clique; fixed rounds reproduce " +
      "non-fixpoint states") {
    import graft.ops.Graph
    // K4 {a,b,c,d} + a path d-e-f-g: the 3-core is exactly the K4, and
    // peeling eats the path one vertex per round from the outside in
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("f", "g")).toDF("u", "v")
    val core = Graph.kCore(edges, "u", "v", k = 3, rounds = 5)
    val got = core.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    assert(Graph.kCoreConverged(core, 3))
    // one round of k=2 peeling only removes g (deg 1); e and f survive
    // round 1 — the fixed-round contract exposes the intermediate state
    val oneRound = Graph.kCore(edges, "u", "v", k = 2, rounds = 1)
    val nodes1 = oneRound.collect().map(_.getString(0)).toSet
    assert(nodes1 == Set("a", "b", "c", "d", "e", "f"))
    assert(!Graph.kCoreConverged(oneRound, 2)) // f now has deg 1
    val conv = Graph.kCore(edges, "u", "v", k = 2, rounds = 3)
    assert(Graph.kCoreConverged(conv, 2))
    assert(conv.collect().map(_.getString(0)).toSet == Set("a", "b", "c", "d"))
  }

  // ---- heavy hitters ----------------------------------------------------

  test("heavyHitters equals the exact answer under several partitionings " +
      "and skew") {
    import graft.ops.Frequency
    val rnd = new scala.util.Random(11)
    // zipf-ish: key i appears ~ 3000/i times
    val rows = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"k$i")) ++
      (1 to 2000).map(i => s"rare$i")
    val n = rows.size.toLong
    val divisor = 40L
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * divisor >= n }.toMap
    assert(exact.nonEmpty && exact.size < 60)
    for (parts <- Seq(1, 7, 32)) {
      val df = rnd.shuffle(rows).toDF("k").repartition(parts)
      val got = Frequency.heavyHitters(df, "k", divisor)
        .as[(String, Long)].collect().toMap
      assert(got == exact, s"parts=$parts")
    }
    // pathological skew: everything in one partition of many
    val skewed = rows.toDF("k").coalesce(1).repartition(1)
    assert(Frequency.heavyHitters(skewed, "k", divisor)
      .as[(String, Long)].collect().toMap == exact)
  }

  test("systematicSample plan: the running-sum window is partition-keyed, " +
      "never a global ORDER BY window") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "w")
    val plan = Sampling.systematicSample(df, "id", "w", k = 10L)
      .queryExecution.executedPlan.toString
    // the cumulative sum must run per range-partition (__pid) — a bare
    // row_number/sum OVER (ORDER BY ...) would funnel all rows through
    // one task. (The one-ROW total aggregate's SinglePartition exchange
    // is metadata-sized and fine.)
    assert("Window \\[[^\\n]*\\], \\[__pid".r.findFirstIn(plan).isDefined, plan)
    assert(!"Window \\[[^\\n]*\\], \\[\\]".r.findFirstIn(plan).isDefined, plan)
  }

  test("heavyHitters plan: candidate set probes via broadcast") {
    import graft.ops.Frequency
    val df = (1 to 1000).map(i => s"k${i % 20}").toDF("k")
    val plan = Frequency.heavyHitters(df, "k", divisor = 30L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan)
  }

  // ---- skyline ----------------------------------------------------------

  test("skyline2D equals brute-force dominance under several partitionings, " +
      "incl. ties and exact duplicates") {
    import graft.ops.Skyline
    val rnd = new scala.util.Random(17)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      Seq((401L, 39L, 39L), (402L, 39L, 39L)) // exact-duplicate frontier pts
    def dominated(b: (Long, Long, Long)) = pts.exists { a =>
      a._1 != b._1 && a._2 >= b._2 && a._3 >= b._3 &&
        (a._2 > b._2 || a._3 > b._3)
    }
    val want = pts.filterNot(dominated).toSet
    for (parts <- Seq(1, 5, 32)) {
      val df = rnd.shuffle(pts).toDF("id", "x", "y").repartition(parts)
      val got = Skyline.skyline2D(df, "id", "x", "y")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
    // both exact duplicates survive (neither dominates the other)
    assert(want.contains((401L, 39L, 39L)) && want.contains((402L, 39L, 39L)))
  }

  // ---- streaming CDC merge ----------------------------------------------

  test("streamingCdcMerge complete-mode == batch cdcMerge") {
    import graft.ops.ChangeData
    import graft.streaming.StreamingOps
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "tag")
    val changes = Seq(
      (1L, 100L, "U", 11L, "a1"), (1L, 200L, "U", 12L, "a2"),
      (2L, 100L, "D", 0L, ""), (4L, 100L, "I", 40L, "d"),
      (5L, 100L, "U", 50L, "e"), (5L, 200L, "D", 0L, ""),
      (6L, 100L, "D", 0L, ""), (6L, 200L, "I", 60L, "f")
    ).toDF("k", "seq", "op", "v", "tag")
    val want = ChangeData.cdcMerge(base, changes, Seq("k"), "seq", "op")
      .as[(Long, Long, String)].collect().toSet
    // stream the same tagged union through the running max_by
    val dir = java.nio.file.Files.createTempDirectory("scdc_spec_").toString
    val tagged = base.withColumn("seq", lit(Long.MinValue))
      .withColumn("op", lit("I"))
      .select("k", "seq", "op", "v", "tag")
      .unionByName(changes.select("k", "seq", "op", "v", "tag"))
    tagged.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(tagged.schema).parquet(s"$dir/in")
    val merged = StreamingOps.streamingCdcMerge(stream, Seq("k"), "seq", "op")
    val got = StreamingOps.withShufflePartitions(spark, 4) {
      StreamingOps.runToMemory(merged, s"scdc_spec_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }.as[(Long, Long, String)].collect().toSet
    assert(got == want)
  }

  // ---- systematic PPS sampling ------------------------------------------

  test("systematicSample draws exactly k with weight-proportional picks") {
    // weights 1..100 (W = 5050); k = 10 -> grid step 505: row 100
    // (interval [4950, 5050)) always contains >= 1 grid point
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "w")
    val got = Sampling.systematicSample(df, "id", "w", k = 10L)
      .select("id", "picks").as[(Long, Long)].collect().toMap
    assert(got.values.sum == 10L)
    // independent replay of the grid rule: picks(i) counts the grid
    // points j*W/10 (j = 0..9) inside [cum_lo, cum_hi)
    val W = 5050L
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    val want = (1 to 100).map { i =>
      val hi = i.toLong * (i + 1) / 2; val lo = hi - i
      i.toLong -> (ceilDiv(10 * hi, W) - ceilDiv(10 * lo, W))
    }.filter(_._2 > 0).toMap
    assert(got == want)
    // a row heavier than the whole rest must carry multiplicity
    val heavy = Seq((1L, 1L), (2L, 1000L), (3L, 1L)).toDF("id", "w")
    val h = Sampling.systematicSample(heavy, "id", "w", k = 5L)
      .select("id", "picks").as[(Long, Long)].collect().toMap
    assert(h.values.sum == 5L && h(2L) >= 4L)
  }

  test("systematicSample drops non-positive weights and keeps determinism " +
      "under repartitioning") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 5L)).toDF("id", "w")
    val a = Sampling.systematicSample(df, "id", "w", k = 3L)
      .select("id", "picks").as[(Long, Long)].collect().toSet
    val b = Sampling.systematicSample(df.repartition(7), "id", "w", k = 3L)
      .select("id", "picks").as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(!a.exists(p => p._1 == 2L || p._1 == 3L))
    assert(a.toSeq.map(_._2).sum == 3L)
  }

  // ---- CDC merge --------------------------------------------------------

  test("cdcMerge: latest wins, deletes remove, untouched keys survive") {
    import graft.ops.ChangeData
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "tag")
    val changes = Seq(
      (1L, 100L, "U", 11L, "a1"), // update k=1
      (1L, 200L, "U", 12L, "a2"), // later update wins
      (2L, 100L, "D", 0L, ""),    // delete k=2
      (4L, 100L, "I", 40L, "d"),  // insert new key
      (5L, 100L, "U", 50L, "e"),  // upsert-on-missing behaves as insert
      (5L, 200L, "D", 0L, ""),    // ... then deleted
      (6L, 100L, "D", 0L, ""),    // delete of a never-seen key: no row
      (6L, 200L, "I", 60L, "f")   // re-insert after delete
    ).toDF("k", "seq", "op", "v", "tag")
    val got = ChangeData.cdcMerge(base, changes, Seq("k"), "seq", "op")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 12L, "a2"), (3L, 30L, "c"), (4L, 40L, "d"),
      (6L, 60L, "f")))
  }

  test("cdcMerge plan: single keyed window over the union, no join") {
    import graft.ops.ChangeData
    val base = Seq((1L, 10L, "a")).toDF("k", "v", "tag")
    val changes = Seq((1L, 1L, "U", 11L, "x")).toDF("k", "seq", "op", "v", "tag")
    val plan = ChangeData.cdcMerge(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  // ---- collocations (lift / PMI) ----------------------------------------

  test("collocations: hand-checked lift on a tiny corpus") {
    import graft.ops.TextAnalysis
    // "x y" appears 6x, x appears 6x, y appears 6x, N = 18 tokens
    // lift = 6*18/(6*6) = 3.0 -> 3_000_000 ppm
    val docs = (1 to 6).map(i => (i.toLong, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("lift_ppm")).toMap
    assert(got == Map(("x", "y") -> 3000000L, ("y", "z") -> 3000000L))
  }

  // ---- sortedIntersectSize ----------------------------------------------

  test("sortedIntersectSize == size(array_intersect) on sorted distinct " +
      "arrays (randomized, both codegen and interpreted paths)") {
    val rnd = new scala.util.Random(8)
    val rows = (1 to 300).map { i =>
      def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b").persist()
    val got = df.select(col("id"),
        graft.functions.sortedIntersectSize(col("a"), col("b")).as("s"))
      .as[(Long, Long)].collect().toMap
    val ref = df.select(col("id"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
    // interpreted path (codegen disabled) agrees
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(col("id"),
          graft.functions.sortedIntersectSize(col("a"), col("b")).as("s"))
        .as[(Long, Long)].collect().toMap
      assert(interp == ref)
    }
    df.unpersist()
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  // ---- EditJoin ---------------------------------------------------------

  /** reference Levenshtein */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("editJoin equals brute force (incl. short strings and empties)") {
    import graft.ops.EditJoin
    val strs = Seq(
      1L -> "large brown widget", 2L -> "large brown widgets",
      3L -> "larg brown widget", 4L -> "small green bolt",
      5L -> "small green bolts", 6L -> "entirely unrelated name",
      7L -> "ab", 8L -> "b", 9L -> "", 10L -> "large brown widget",
      11L -> "xy", 12L -> "abc")
    for (d <- Seq(1, 2, 3)) {
      val got = EditJoin.editJoin(strs.toDF("id", "nm"), "id", "nm", d)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      assert(got == want, s"d=$d")
    }
  }

  test("editJoin candidate plan: equi-joins only") {
    import graft.ops.EditJoin
    val df = Seq(1L -> "abcdef", 2L -> "abcxef", 3L -> "zzzzzz").toDF("id", "nm")
    val plan = EditJoin.editJoin(df, "id", "nm", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // ---- random projection ------------------------------------------------

  test("randomProjection matches a per-row Scala replay and its SQL form") {
    import graft.ops.Similarity
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => (i + 1) * 0.125f)),
      (2L, Array.tabulate(8)(i => -1.0f + i * 0.25f)),
      (3L, Array.fill(8)(0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, dim = 8, outDim = 4)
      .orderBy("vec_id").collect()
    // independent replay: q24 then +-1 sums with the same sign source
    def q24(x: Float): Long = math.floor(x.toDouble * 16777216.0 + 0.5).toLong
    vecs.sortBy(_._1).zip(got).foreach { case ((id, v), row) =>
      assert(row.getLong(0) == id)
      for (j <- 0 until 4) {
        val want = (0 until 8).map(i => Similarity.projSign(j, i) * q24(v(i))).sum
        assert(row.getLong(1 + j) == want, s"id=$id p$j")
      }
    }
    // the generated SQL computes the identical numbers through Spark SQL.
    // It targets DuckDB's 1-BASED list subscripts; Spark's [] is 0-based,
    // so prepend a sentinel 0 — then the same 1-based text indexes the
    // original elements
    df.select(col("vec_id"),
        concat(array(lit(0L)), graft.functions.q24Vec(col("embedding")))
          .as("qv"))
      .createOrReplaceTempView("rp_qv")
    val viaSql = spark.sql("SELECT vec_id, " +
        Similarity.randomProjectionSql(8, 4, "qv").mkString(", ") +
        " FROM rp_qv ORDER BY vec_id").collect()
    got.zip(viaSql).foreach { case (a, b) => assert(a == b) }
  }

  test("rpTopK with a corpus-covering shortlist IS the exact integer topK; " +
      "a tight shortlist keeps high recall on clustered data") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(21)
    // 10 well-separated centers, 30 points each: JL projection must keep
    // same-cluster points closest
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val pts = for (c <- 0 until 10; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      ((c * 30 + i).toLong, v)
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 30 === 0) // one per cluster
    val exact = Similarity.rpTopK(corpus, queries, k = 5, dim = 64,
        outDim = 16, shortlist = 300)
      .as[(Long, Long, Long, Long)].collect().toSet
    // covering shortlist == brute-force integer ranking (independent replay)
    def q24(x: Float) = math.floor(x.toDouble * 16777216.0 + 0.5).toLong
    val qv = pts.map { case (id, v) => id -> v.map(q24) }.toMap
    val want = (for ((qid, q) <- qv.toSeq if qid % 30 == 0) yield {
      qv.toSeq.filter(_._1 != qid)
        .map { case (cid, c) =>
          (cid, c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (cid, d) => (d, cid) }.take(5).zipWithIndex
        .map { case ((cid, d), r) => (qid, cid, d, (r + 1).toLong) }
    }).flatten.toSet
    assert(exact == want)
    // tight shortlist: top-5 must stay within the query's own cluster
    val tight = Similarity.rpTopK(corpus, queries, k = 5, dim = 64,
        outDim = 16, shortlist = 20)
      .as[(Long, Long, Long, Long)].collect()
    val inCluster = tight.count { case (q, c, _, _) => q / 30 == c / 30 }
    assert(inCluster.toDouble / tight.length >= 0.9,
      s"$inCluster/${tight.length}")
  }

  test("editJoin equals brute force on a RANDOM small-alphabet corpus " +
      "(dense tie/edge-case coverage)") {
    import graft.ops.EditJoin
    val rnd = new scala.util.Random(33)
    // strings over {a,b,c} of length 0..6: many exact ties, many pairs
    // at every distance, empties, and lengths straddling the short-string
    // fallback boundary for every d
    val strs = (1 to 120).map { i =>
      i.toLong -> Seq.fill(rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString
    }
    for (d <- Seq(1, 2)) {
      val got = EditJoin.editJoin(strs.toDF("id", "nm"), "id", "nm", d)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      assert(got == want, s"d=$d: ${(got diff want).take(3)} extra, " +
        s"${(want diff got).take(3)} missing")
    }
  }

  test("jaccardJoin equals brute force on a RANDOM small-vocab corpus") {
    val rnd = new scala.util.Random(34)
    val vocab = Vector("the", "data", "spark", "join", "scan", "row")
    val docs = (1 to 80).map { i =>
      i.toLong -> Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(6)))
        .mkString(" ")
    }
    for ((tn, td, w) <- Seq((1, 3, 2), (1, 2, 3), (3, 4, 1))) {
      val got = SetSim.jaccardJoin(docs.toDF("doc_id", "text"),
          "doc_id", "text", tn, td, w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == bruteJaccard(docs, w, tn, td), s"t=$tn/$td w=$w")
    }
  }

  test("skyline2D anti-correlated worst case: every point IS the frontier") {
    import graft.ops.Skyline
    val pts = (0L until 50L).map(i => (i, i, 49L - i)) // x + y constant
    val got = Skyline.skyline2D(pts.toDF("id", "x", "y").repartition(7),
        "id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == pts.toSet)
  }

  test("systematicSample with k exceeding the row count multiplies picks") {
    val df = Seq((1L, 3L), (2L, 1L)).toDF("id", "w") // W = 4
    val got = Sampling.systematicSample(df, "id", "w", k = 10L)
      .select("id", "picks").as[(Long, Long)].collect().toMap
    assert(got.values.sum == 10L)
    // grid step W/k = 0.4: row 1 covers [0,3) -> grid pts 0,.4,...,2.8
    // (8 of them); row 2 covers [3,4) -> 3.2, 3.6 (2)
    assert(got == Map(1L -> 8L, 2L -> 2L))
  }

  test("kCore on a graph of only self-loops and duplicates returns empty") {
    import graft.ops.Graph
    val edges = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("u", "v")
    assert(Graph.kCore(edges, "u", "v", k = 1, rounds = 2).isEmpty)
  }

  // ---- index search -----------------------------------------------------

  test("searchIndex: whole-bit tf-idf hand-check, term pruning") {
    import graft.ops.Indexing
    val docs = Seq(
      (1L, "apple banana apple"),      // apple tf 2, banana tf 1
      (2L, "apple cherry"),            // apple tf 1
      (3L, "banana banana banana banana"), // banana tf 4
      (4L, "durian")                   // matches nothing
    ).toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(docs, "doc_id", "text")
    val got = Indexing.searchIndex(idx, nDocs = 4L,
        terms = Seq("apple", "banana"), k = 10)
      .as[(Long, Long, Long)].collect().toList
    // df(apple)=2 -> w = bitlen(4 div 2)=2; df(banana)=2 -> w=2
    // doc1: apple tf2 (bitlen 2) + banana tf1 (bitlen 1) -> 2*2+2*1 = 6
    // doc2: apple tf1 -> 2
    // doc3: banana tf4 (bitlen 3) -> 6; tie with doc1 -> doc1 first
    assert(got == List((1L, 2L, 6L), (3L, 1L, 6L), (2L, 1L, 2L)))
  }

  test("collocations rank by lift, not raw count") {
    import graft.ops.TextAnalysis
    // "a b" is frequent but a,b are everywhere (low lift); "p q" is
    // rarer but exclusive (high lift) and must rank first
    val noise = (1 to 20).map(i => (i.toLong, "a b a c b a"))
    val signal = (21 to 25).map(i => (i.toLong, "p q"))
    val docs = (noise ++ signal).toDF("doc_id", "text")
    val rows = TextAnalysis.collocations(docs, minCount = 5, topK = 3)
      .collect()
    assert(rows.head.getString(0) == "p" && rows.head.getString(1) == "q")
  }
}
