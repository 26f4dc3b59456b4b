package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CompareMode, Validator}

/** Randomized cross-implementation equivalence: the optimized operators
  * must agree with their naive counterparts on arbitrary inputs —
  * duplicates, nulls, disjoint keys, empty sides included. Fixed seed. */
class RandomizedEquivalenceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  // nullIdRate > 0 only for the summaryFast test: NULL ids are impossible
  // through compositeKey, but raw keyed inputs are nullable — summaryFast
  // must reproduce summary()'s null-id semantics (count toward the side's
  // total and its missing-in-the-other metric, never toward
  // differing/matched). reconcile/differingBuckets contractually take
  // non-null keys.
  private def randomKeyed(n: Int, keySpace: Int, nullRate: Double,
      nullIdRate: Double = 0.0) = {
    val rows = Seq.fill(n) {
      val id = if (rnd.nextDouble() < nullIdRate) null
        else (rnd.nextInt(keySpace) + 1).toString
      val v = if (rnd.nextDouble() < nullRate) null
        else if (rnd.nextDouble() < 0.1) "garbage" + rnd.nextInt(3)
        else (rnd.nextInt(50) + rnd.nextInt(2) * 1000).toString
      (id, v)
    }
    rows.toDF("id", "check")
  }

  test("summaryFast == summary across 20 random duplicate/null-heavy inputs") {
    for (trial <- 1 to 20) {
      val f = randomKeyed(rnd.nextInt(120), rnd.nextInt(30) + 5,
        rnd.nextDouble() * 0.4, nullIdRate = 0.05)
      val s = randomKeyed(rnd.nextInt(120), rnd.nextInt(30) + 5,
        rnd.nextDouble() * 0.4, nullIdRate = 0.05)
      val mode = if (trial % 2 == 0) CompareMode.Numeric else CompareMode.Fuzzy(1.0)
      val slow = Validator.summary(f, s, Validator.validate(f, s, mode)).collect()(0)
      val fast = Validator.summaryFast(f, s, mode).collect()(0)
      for (c <- Seq("n_first", "n_second", "missing_in_first", "missing_in_second",
          "n_differing", "n_matched"))
        assert(fast.getAs[Long](c) == slow.getAs[Long](c),
          s"trial $trial $mode $c: fast=${fast.getAs[Long](c)} slow=${slow.getAs[Long](c)}")
    }
  }

  // multi-column frames: numeric-ish, date-ish and a small fuzzy string
  // domain, with nulls, garbage and duplicate/null ids — summaryMulti and
  // diffMulti must agree with k independent single-column runs
  private def randomMulti(n: Int, keySpace: Int, nullIdRate: Double) = {
    val fuzzyDomain = Seq("alpha one", "alpha two", "beta", "gamma ray", "delta")
    val rows = Seq.fill(n) {
      val id = if (rnd.nextDouble() < nullIdRate) null
        else (rnd.nextInt(keySpace) + 1).toString
      def maybe[T >: Null](v: T): T = if (rnd.nextDouble() < 0.25) null else v
      val num = maybe(if (rnd.nextDouble() < 0.1) "garbage"
        else (rnd.nextInt(40) + rnd.nextInt(2) * 500).toString)
      val dt = maybe(if (rnd.nextDouble() < 0.1) "not-a-date"
        else f"2024-01-${rnd.nextInt(5) + 1}%02d")
      val fz = maybe(fuzzyDomain(rnd.nextInt(fuzzyDomain.length)))
      (id, num, dt, fz)
    }
    rows.toDF("id", "num", "dt", "fz")
  }

  private val multiChecks = Seq(
    ("num", CompareMode.Numeric),
    ("dt", CompareMode.Date),
    ("fz", CompareMode.Fuzzy(0.6)))

  test("summaryMulti == per-column summaryFast across 12 random inputs") {
    for (trial <- 1 to 12) {
      val f = randomMulti(rnd.nextInt(100) + 5, rnd.nextInt(25) + 5, 0.05)
      val s = randomMulti(rnd.nextInt(100) + 5, rnd.nextInt(25) + 5, 0.05)
      val multi = Validator.summaryMulti(f, s, multiChecks).collect()
        .map(r => r.getAs[String]("column_name") -> r).toMap
      assert(multi.keySet == multiChecks.map(_._1).toSet)
      for ((c, mode) <- multiChecks) {
        val single = Validator.summaryFast(
          f.select(col("id"), col(c).as("check")),
          s.select(col("id"), col(c).as("check")), mode).collect()(0)
        for (m <- Seq("n_first", "n_second", "missing_in_first",
            "missing_in_second", "n_differing", "n_matched"))
          assert(multi(c).getAs[Long](m) == single.getAs[Long](m),
            s"trial $trial col $c $m: multi=${multi(c).getAs[Long](m)} " +
              s"single=${single.getAs[Long](m)}")
      }
    }
  }

  test("summaryMulti on empty and null-id-only inputs still emits one row " +
      "per column with summaryFast's numbers") {
    val empty = randomMulti(0, 5, 0.0)
    val nullsOnly = randomMulti(30, 5, 1.0) // every id null
    for ((f, s) <- Seq((empty, empty), (nullsOnly, empty),
        (nullsOnly, nullsOnly))) {
      val multi = Validator.summaryMulti(f, s, multiChecks).collect()
        .map(r => r.getAs[String]("column_name") -> r).toMap
      assert(multi.keySet == multiChecks.map(_._1).toSet,
        s"must emit one row per column even with no non-null ids: " +
          s"${multi.keySet}")
      for ((c, mode) <- multiChecks) {
        val single = Validator.summaryFast(
          f.select(col("id"), col(c).as("check")),
          s.select(col("id"), col(c).as("check")), mode).collect()(0)
        for (m <- Seq("n_first", "n_second", "missing_in_first",
            "missing_in_second", "n_differing", "n_matched"))
          assert(multi(c).getAs[Long](m) == single.getAs[Long](m),
            s"col $c $m: multi=${multi(c).getAs[Long](m)} " +
              s"single=${single.getAs[Long](m)}")
      }
    }
  }

  test("diffMulti == per-column validate().differing across 8 random inputs") {
    for (trial <- 1 to 8) {
      val f = randomMulti(rnd.nextInt(80) + 5, rnd.nextInt(20) + 5, 0.0)
      val s = randomMulti(rnd.nextInt(80) + 5, rnd.nextInt(20) + 5, 0.0)
      def nn(x: String) = if (x == null) "\u0000NULL" else x
      val multi = Validator.diffMulti(f, s, multiChecks).collect()
        .map(r => (r.getAs[String]("column_name"), r.getAs[String]("id"),
          nn(r.getAs[String]("check_first")), nn(r.getAs[String]("check_second"))))
        .groupBy(_._1).map { case (k, v) => k -> v.toSeq.sorted }
      for ((c, mode) <- multiChecks) {
        val single = Validator.validate(
          f.select(col("id"), col(c).cast("string").as("check")),
          s.select(col("id"), col(c).cast("string").as("check")), mode)
          .differing.collect()
          .map(r => (c, r.getAs[String]("id"), nn(r.getAs[String]("check_first")),
            nn(r.getAs[String]("check_second")))).toSeq.sorted
        assert(multi.getOrElse(c, Seq.empty) == single,
          s"trial $trial col $c: multi=${multi.getOrElse(c, Seq.empty).size} " +
            s"single=${single.size}")
      }
    }
  }

  test("reconcile statuses partition the key universe consistently with validate") {
    for (_ <- 1 to 10) {
      val f = randomKeyed(80, 25, 0.2).dropDuplicates("id")
      val s = randomKeyed(80, 25, 0.2).dropDuplicates("id")
      val rec = Validator.reconcile(f, s).collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      val out = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
      val m1 = out.missingInFirst.as[String].collect().toSet
      val m2 = out.missingInSecond.as[String].collect().toSet
      val diff = out.differing.select("id").as[String].collect().toSet
      assert(m1 == rec.filter(_._2 == "only_second").keySet)
      assert(m2 == rec.filter(_._2 == "only_first").keySet)
      assert(diff == rec.filter(_._2 == "conflict").keySet)
      // every key accounted for exactly once (unique ids)
      val allKeys = (f.select("id").as[String].collect() ++
        s.select("id").as[String].collect()).toSet
      assert(rec.keySet == allKeys)
    }
  }

  test("globalRunningSum == single-partition window across random shapes") {
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(500) + 1
      val rows = Seq.fill(n)((rnd.nextLong().abs % 100000,
        (rnd.nextInt(1000) + 1).toLong))
      // ids may collide: disambiguate into a total order first
      val df = rows.zipWithIndex
        .map { case ((id, v), i) => (id * 1000 + i, v) }.toDF("id", "v")
      val got = graft.ops.Indexing
        .globalRunningSum(df, Seq(col("id").asc), "v", "cum")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"))).sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
        .rowsBetween(Long.MinValue, 0)
      val want = df.withColumn("cum", sum("v").over(w))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"))).sorted.toSeq
      assert(got == want, s"n=$n")
    }
  }

  test("incrementalNew == plain anti-join across random overlap/fpp regimes") {
    for (trial <- 1 to 8) {
      val corpusN = rnd.nextInt(300) + 1
      val batchN = rnd.nextInt(300) + 1
      val space = rnd.nextInt(200) + 10
      val corpus = Seq.fill(corpusN)(("fp" + rnd.nextInt(space)))
        .zipWithIndex.map { case (fp, i) => (i.toLong, fp) }.toDF("id", "fp")
      val batch = Seq.fill(batchN)(("fp" + rnd.nextInt(space * 2)))
        .zipWithIndex.map { case (fp, i) => (1000L + i, fp) }.toDF("id", "fp")
      val fpp = if (trial % 2 == 0) 0.5 else 0.01
      val expected = math.max(1L, (trial % 3) * 100L) // includes undersized
      val got = graft.ops.Curation.incrementalNew(batch, corpus, "fp", expected, fpp)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = batch.join(corpus.select("fp").distinct(), Seq("fp"), "left_anti")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"trial=$trial corpusN=$corpusN batchN=$batchN")
    }
  }

  test("minhashCandidates == definitional bucket contract incl. mixed over-cap regimes") {
    // the contract: distinct union of (a) all pairs sharing >=1 small
    // bucket and (b) star pairs of every over-cap bucket. The production
    // path emits each pair once (first small agreeing band) — verify the
    // set matches a brute-force evaluation of the definition on crafted
    // signatures whose buckets mix over-cap and small regimes, including
    // pairs whose FIRST agreeing band is over-cap but that also meet in a
    // later small bucket (the case a naive first-agreement rule drops).
    val bands = 8; val numHashes = 32; val rows = 4; val cap = 4
    def bandHash(sig: Array[Long], b: Int): Long = {
      var h = 0xcbf29ce484222325L ^ b
      var i = b * rows
      while (i < (b + 1) * rows) {
        var x = sig(i); var k = 0
        while (k < 8) { h ^= (x & 0xFF); h *= 0x100000001b3L; x >>>= 8; k += 1 }
        i += 1
      }
      h
    }
    var sawMixedRegime = false
    for (trial <- 1 to 6) {
      val nDocs = rnd.nextInt(90) + 40
      // tiny component alphabet => organic bucket collisions at all sizes
      val sigs = (0 until nDocs).map { id =>
        (id.toLong, Array.tabulate(numHashes)(i => (i % rows + rnd.nextInt(2)).toLong))
      }
      val bh = sigs.map { case (id, s) => id -> Array.tabulate(bands)(bandHash(s, _)) }.toMap
      val expected = scala.collection.mutable.Set[(Long, Long)]()
      val smallAgree = scala.collection.mutable.Map[(Long, Long), Int]()
      for (b <- 0 until bands) {
        val byBucket = bh.keys.toSeq.groupBy(id => bh(id)(b))
        for ((_, ids) <- byBucket) {
          val sorted = ids.sorted
          if (sorted.length > 1 && sorted.length <= cap) {
            for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
              expected += ((sorted(i), sorted(j)))
              val k = (sorted(i), sorted(j))
              if (!smallAgree.contains(k)) smallAgree(k) = b
            }
          } else if (sorted.length > cap) {
            val mn = sorted.head
            for (id <- sorted.tail) expected += ((mn, id))
          }
        }
      }
      // did this trial exercise the dangerous case? (first AGREEING band
      // over-cap, first SMALL agreeing band comes later)
      for (((a, b2), firstSmall) <- smallAgree) {
        val firstAgree = (0 until bands).find(x => bh(a)(x) == bh(b2)(x)).get
        if (firstAgree < firstSmall) sawMixedRegime = true
      }
      val sigsDF = sigs.toDF("id", "sig")
      val got = graft.ops.Dedup.minhashCandidates(sigsDF, numHashes, bands, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected.toSet,
        s"trial $trial: missing=${(expected.toSet -- got).take(5)} extra=${(got -- expected.toSet).take(5)}")
    }
    assert(sawMixedRegime, "test data never exercised the over-cap-then-small regime")
  }

  test("differingBuckets never misses a bucket containing a difference") {
    for (_ <- 1 to 10) {
      val f = randomKeyed(150, 60, 0.15)
      val s = randomKeyed(150, 60, 0.15)
      val bucket = pmod(col("id").cast("long"), lit(8L))
      val flagged = Validator.differingBuckets(f, s, bucket)
        .select("bucket").as[Long].collect().toSet
      // ground truth: buckets where the multiset of (id, cents) differs
      val toCents = (df: org.apache.spark.sql.DataFrame) => df
        .select((col("id").cast("long") % 8).as("b"), col("id"),
          expr("CAST(ROUND(CAST(check AS DOUBLE)*100) AS BIGINT)").as("c"))
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
      val fm = toCents(f).groupBy(_._1)
      val sm = toCents(s).groupBy(_._1)
      for (b <- (fm.keySet ++ sm.keySet)) {
        val fv = fm.getOrElse(b, Seq()).map(x => x._3).sortBy(_.toString)
        val sv = sm.getOrElse(b, Seq()).map(x => x._3).sortBy(_.toString)
        val fn = fm.getOrElse(b, Seq()).size
        val sn = sm.getOrElse(b, Seq()).size
        val sumF = fv.flatten.map(_.asInstanceOf[Long]).sum
        val sumS = sv.flatten.map(_.asInstanceOf[Long]).sum
        if (fn != sn || sumF != sumS)
          assert(flagged.contains(b), s"bucket $b has differences but was not flagged")
      }
    }
  }

  test("corpusDrift == brute-force BigInt TVD across 15 random corpora " +
      "(empty texts, shared and disjoint vocabularies, single slices)") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "dd", "ee", "zz", "q")
    for (trial <- 1 to 15) {
      val nSlices = rnd.nextInt(4) + 1
      val docs = Seq.fill(rnd.nextInt(40) + 1) {
        val slice = "s" + rnd.nextInt(nSlices)
        val text =
          if (rnd.nextDouble() < 0.1) "" // empty text -> one "" token
          else Seq.fill(rnd.nextInt(12) + 1)(
            vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (slice, text)
      }
      val df = docs.toDF("source", "text")
      val got = graft.ops.TextAnalysis.corpusDrift(df).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
      // brute force: token counts straight off the input rows
      val toks = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
      val bySlice = toks.groupBy(_._1).map { case (s, xs) =>
        s -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.size.toLong }
      }
      val corpus = toks.groupBy(_._2).map { case (t, ys) => t -> ys.size.toLong }
      val ncz = BigInt(corpus.values.sum)
      assert(got.keySet == bySlice.keySet)
      bySlice.foreach { case (s, counts) =>
        val nsz = BigInt(counts.values.sum)
        var sumAbs = BigInt(0); var topD = BigInt(-1); var topT: String = null
        corpus.keySet.toSeq.sorted.foreach { t =>
          val d = (BigInt(counts.getOrElse(t, 0L)) * ncz -
            nsz * BigInt(corpus(t))).abs
          sumAbs += d
          // top_term nominates among PRESENT terms only (absent terms
          // contribute to the TVD sum but not the argmax — documented)
          if (counts.contains(t) && d > topD) { topD = d; topT = t }
        }
        val exp = (nsz.toLong, (sumAbs * 1000000 / (2 * nsz * ncz)).toLong,
          topT, (topD * 1000000 / (nsz * ncz)).toLong)
        assert(got(s) == exp, s"trial $trial slice $s: got ${got(s)}, expected $exp")
      }
    }
  }

  test("packBins invariants across 25 random file sets: every file placed " +
      "exactly once, no bin overflows (except singleton oversized files), " +
      "input order never changes the assignment") {
    import graft.ops.Compaction.packBins
    for (trial <- 1 to 25) {
      val target = rnd.nextInt(1000) + 10L
      val files = Seq.tabulate(rnd.nextInt(60) + 1)(i =>
        (f"f$i%03d", rnd.nextInt(2 * target.toInt).toLong + 1))
      val packed = packBins(files, target)
      assert(packed.map(_._1).sorted == files.map(_._1).sorted,
        s"trial $trial: files lost or duplicated")
      packed.foreach { case (name, bytes, _) =>
        assert(files.toMap.apply(name) == bytes) }
      packed.groupBy(_._3).foreach { case (bin, members) =>
        val total = members.map(_._2).sum
        assert(total <= target ||
          (members.size == 1 && members.head._2 > target),
          s"trial $trial bin $bin overflows: $members (target $target)")
      }
      val shuffled = packBins(rnd.shuffle(files), target)
      assert(shuffled.sortBy(_._1) == packed.sortBy(_._1),
        s"trial $trial: assignment depends on input order")
    }
  }
}
