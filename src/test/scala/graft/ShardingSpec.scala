package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Deterministic shuffle-shard export ([[Sampling.shuffleShards]] /
  * [[Sampling.shardWrite]]): permutation correctness, reproducibility,
  * balance, plan shape, and the one-file-per-shard export layout. */
class ShardingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("pos is a 0..|shard|-1 permutation within every shard; shards " +
      "partition the input exactly; assignment reproducible across runs") {
    val df = ids(5000)
    val a = Sampling.shuffleShards(df, "id", 8).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos")))
    assert(a.length == 5000)
    assert(a.map(_._1).distinct.length == 5000, "no row lost or duplicated")
    for ((shard, rows) <- a.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == (0L until rows.length.toLong),
        s"shard $shard positions must be a dense permutation")
    }
    // reproducible: a second run (different partitioning) agrees row-wise
    val b = Sampling.shuffleShards(df.repartition(7), "id", 8).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos"))).sortBy(_._1)
    assert(a.sortBy(_._1).toSeq == b.toSeq)
  }

  test("shards are hash-balanced: max/min size within 25% of each other " +
      "at 5000 rows over 8 shards; and the permutation is not the " +
      "identity (it actually shuffles)") {
    val sizes = Sampling.shuffleShards(ids(5000), "id", 8)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(sizes.length == 8)
    assert(sizes.max.toDouble / sizes.min <= 1.25,
      s"imbalanced: ${sizes.mkString(",")}")
    // within shard 0, consecutive positions are NOT consecutive ids
    val s0 = Sampling.shuffleShards(ids(5000), "id", 8)
      .filter(col("shard") === 0).orderBy("pos")
      .select("id").as[Long].collect()
    val sortedRun = s0.sliding(2).count(p => p(1) == p(0) + 1)
    assert(sortedRun < s0.length / 10,
      "pos order must not be id order — this is a shuffle")
  }

  test("plan shape: ONE exchange (hash on shard), per-shard sort — " +
      "never a global range sort; the WRITE frame adds no second " +
      "exchange") {
    val plan = Sampling.shuffleShards(ids(1000), "id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(plan).size == 1,
      s"one shard-keyed exchange:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no global sort exchange:\n$plan")
    // the export path: repartition BEFORE the window, so the window
    // reuses that distribution — exactly one Exchange in total
    val wplan = Sampling.shardFrame(ids(1000), "id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(wplan).size == 1,
      s"shardFrame must carry exactly one exchange:\n$wplan")
    // and it is row-identical to shuffleShards' assignment
    val a = Sampling.shuffleShards(ids(500), "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Sampling.shardFrame(ids(500), "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("shardWrite: one file per shard directory; reading a shard in " +
      "pos order replays the assignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = ids(2000).withColumn("payload", col("id") * 3)
    Sampling.shardWrite(df, "id", 4, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (k <- 0 until 4) {
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/shard=$k"))
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k must be one file, " +
        s"got ${files.length}")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    // payload survives; (shard, pos) matches a fresh assignment
    val fresh = Sampling.shuffleShards(df, "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val stored = back.select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), (r.getAs[Number]("shard").longValue(),
        r.getLong(2)))).toMap
    assert(stored == fresh)
  }

  test("shardWrite with file rolling: each shard splits into multiple " +
      "files that concatenate lexicographically in pos order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shroll").toString
    val df = ids(2000).withColumn("payload", col("id") * 3)
    Sampling.shardWrite(df, "id", 4, dir, maxRecordsPerFile = 150L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (k <- 0 until 4) {
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/shard=$k"))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      assert(files.length >= 2,
        s"shard $k (~500 rows) must roll at 150 records/file")
      // a loader streaming the rolled files in name order sees the
      // shard's rows in contiguous ascending pos order
      val posSeq = files.flatMap(f =>
        spark.read.parquet(f.toString).select("pos")
          .collect().map(_.getLong(0)))
      assert(posSeq.toSeq == posSeq.indices.map(_.toLong),
        s"shard $k rolled files must concatenate in pos order")
    }
    // row set identical to the unrolled export
    val fresh = Sampling.shuffleShards(df, "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val stored = spark.read.parquet(dir).select("id", "shard", "pos")
      .collect()
      .map(r => (r.getLong(0), (r.getAs[Number]("shard").longValue(),
        r.getLong(2)))).toMap
    assert(stored == fresh)
  }
}
