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

  private def randomKeyed(n: Int, keySpace: Int, nullRate: Double) = {
    val rows = Seq.fill(n) {
      val id = (rnd.nextInt(keySpace) + 1).toString
      val v = if (rnd.nextDouble() < nullRate) null
        else if (rnd.nextDouble() < 0.1) "garbage" + rnd.nextInt(3)
        else (rnd.nextInt(50) + rnd.nextInt(2) * 1000).toString
      (id, v)
    }
    rows.toDF("id", "check")
  }

  test("summaryFast == summary across 20 random duplicate/null-heavy inputs") {
    for (trial <- 1 to 20) {
      val f = randomKeyed(rnd.nextInt(120), rnd.nextInt(30) + 5, rnd.nextDouble() * 0.4)
      val s = randomKeyed(rnd.nextInt(120), rnd.nextInt(30) + 5, rnd.nextDouble() * 0.4)
      val mode = if (trial % 2 == 0) CompareMode.Numeric else CompareMode.Fuzzy(1.0)
      val slow = Validator.summary(f, s, Validator.validate(f, s, mode)).collect()(0)
      val fast = Validator.summaryFast(f, s, mode).collect()(0)
      for (c <- Seq("n_first", "n_second", "missing_in_first", "missing_in_second",
          "n_differing", "n_matched"))
        assert(fast.getAs[Long](c) == slow.getAs[Long](c),
          s"trial $trial $mode $c: fast=${fast.getAs[Long](c)} slow=${slow.getAs[Long](c)}")
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
}
