package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the round-17 optimization targets (test
  * source set — never ships). Times the phases of the slowest incremental
  * queries so optimization effort lands where the seconds are.
  * Usage: sbt "Test/runMain graft.PhaseProfile [annpq|vinc|minhash|idx]"
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // per-job timing: which Spark jobs a phase actually pays for
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = e.stageInfos.lastOption.map(si =>
            s"${si.name} [${e.stageInfos.size} stages, " +
              s"${e.stageInfos.map(_.numTasks).sum} tasks]").getOrElse("?")
          jobStart.put(e.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStart.remove(e.jobId)
          if (st != null && sys.env.contains("PHASE_JOBS"))
            System.err.println(f"  JOB ${e.jobId}%4d ${(System.nanoTime() - st._1) / 1e9}%7.3f s  ${st._2}")
        }
      })
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PHASE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def tag(dir: String): String = {
      val t = dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
      s"${t}_${java.lang.Long.toHexString(dir.hashCode & 0xffffffffL)}"
    }
    val which = args.headOption.getOrElse("annpq")
    val tmp = System.getProperty("java.io.tmpdir")

    // warm pass at sf0.001: codegen/JIT for the plan shapes
    val warmName = which match {
      case "annpq" => "t_ann_pq_incremental"
      case "vinc" => "v_incremental_diff"
      case "vincm" => "v_multi_incremental"
      case "minhash" => "t_minhash_incremental"
      case "idx" => "t_index_search_incremental"
      case other => other
    }
    try noop(SparkEntry.queries(warmName)(s, "/root/testdata/sf0.001"))
    catch { case e: Throwable => System.err.println(s"warm failed: $e") }

    for (round <- 1 to 2) {
      System.err.println(s"=== $which round $round (sf=$sfDir) ===")
      which match {
        case "annpq" =>
          val e = s.read.parquet(s"$sfDir/embeddings.parquet")
          val stateDir = s"$tmp/graft_incpq_${tag(sfDir)}"
          val rep1 = phase("maintain seed (expect 0 dirty)") {
            graft.ops.Similarity.pqIndexIncremental(e, stateDir,
              m = 4, ksub = 16, nBuckets = 256)._2
          }
          System.err.println(s"  seed: $rep1")
          phase("digest scan alone (ckpt+count)") {
            graft.ops.IncrementalAgg.digests(e, "vec_id", Seq("embedding"),
              256, None).localCheckpoint().count()
          }
          val churned = e
            .withColumn("embedding",
              when(col("vec_id") % 31 === 3,
                expr("transform(embedding, x -> float(-x))"))
                .otherwise(col("embedding")))
            .filter(col("vec_id") % 43 =!= 11)
          val rep2 = phase("maintain churned") {
            graft.ops.Similarity.pqIndexIncremental(churned, stateDir,
              m = 4, ksub = 16, nBuckets = 256, dirtyFractionLimit = 1.0)._2
          }
          System.err.println(s"  churn: $rep2")
          val rep3 = phase("maintain restore") {
            graft.ops.Similarity.pqIndexIncremental(e, stateDir,
              m = 4, ksub = 16, nBuckets = 256, dirtyFractionLimit = 1.0)._2
          }
          System.err.println(s"  restore: $rep3")
          phase("search (noop)") {
            noop(graft.ops.Similarity.pqSearchIncremental(s, stateDir,
                e.filter(col("vec_id") < 10), k = 5, m = 4)
              .select(col("query_id"), col("corpus_id"), col("adist"),
                col("rank").cast("long").as("rank"))
              .orderBy("query_id", "rank"))
          }
        case "vinc" =>
          import graft.core.{IncrementalValidation, CompareMode}
          val o = s.read.parquet(s"$sfDir/orders.parquet")
          def keyed(check: String) = o.selectExpr(
            "CAST(o_orderkey AS STRING) AS id", s"$check AS check")
          val dec = (df: DataFrame) => df.withColumn("check",
            col("check").cast("decimal(18,2)"))
          val f = dec(keyed("o_totalprice"))
          val sec = dec(keyed("o_totalprice"))
          val stateDir = s"$tmp/graft_increp_${tag(sfDir)}"
          val restated = col("id").cast("long") < 30
          val prior2 = sec
            .withColumn("check",
              when(restated, col("check") + 7).otherwise(col("check")))
            .filter(!(restated && col("id").cast("long") % 3 === 0))
          val r1 = phase("reportIncremental seed(prior)") {
            IncrementalValidation.reportIncremental(
              f, prior2, CompareMode.Numeric, stateDir, nBuckets = 256)._2
          }
          System.err.println(s"  seed: $r1")
          val (cur, r2) = phase("reportIncremental current") {
            IncrementalValidation.reportIncremental(
              f, sec, CompareMode.Numeric, stateDir, nBuckets = 256)
          }
          System.err.println(s"  current: $r2")
          phase("orderBy+noop of report") {
            noop(cur.orderBy("kind", "id"))
          }
        case "minhash" =>
          val d = s.read.parquet(s"$sfDir/documents.parquet")
            .select("doc_id", "text")
          val docs = d.unionByName(
            d.filter(col("doc_id") < 20).select(
              (col("doc_id") + 100000).as("doc_id"),
              array_join(
                filter(split(col("text"), " "), (w, i) => i % 7 =!= 3),
                " ").as("text")))
          val stateDir = s"$tmp/graft_incmh_prof_${tag(sfDir)}"
          val restated = col("doc_id") < 30
          val prior = docs
            .withColumn("text", when(restated,
              concat(coalesce(col("text"), lit("")), lit(" restated prior")))
              .otherwise(col("text")))
            .filter(!(restated && col("doc_id") % 3 === 0))
          val r1 = phase("minhashIncremental prior") {
            graft.ops.Dedup.minhashIncremental(prior, stateDir,
              nBuckets = 256)._2
          }
          System.err.println(s"  prior: $r1")
          val r2 = phase("minhashIncremental current") {
            graft.ops.Dedup.minhashIncremental(docs, stateDir,
              nBuckets = 256)._2
          }
          System.err.println(s"  current: $r2")
          val sigs = phase("signaturesFromStore ckpt") {
            graft.ops.Dedup.signaturesFromStore(s, stateDir)
              .localCheckpoint(true)
          }
          phase("candidates+join+noop") {
            noop(graft.ops.Dedup.minhashCandidates(sigs)
              .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")),
                Seq("id_a"))
              .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
                Seq("id_b"))
              .select(col("id_a"), col("id_b"),
                graft.ops.Dedup.sigJaccard(col("sig_a"), col("sig_b"))
                  .as("est_jaccard"))
              .filter(col("est_jaccard") >= 0.5))
          }
        case "idx" =>
          val docs = s.read.parquet(s"$sfDir/documents.parquet")
          val stateDir = s"$tmp/graft_incidx_${tag(sfDir)}"
          val restated = col("doc_id") < 30
          val prior = docs
            .withColumn("text", when(restated,
              concat(coalesce(col("text"), lit("")), lit(" restated prior")))
              .otherwise(col("text")))
            .filter(!(restated && col("doc_id") % 3 === 0))
          val r1 = phase("indexIncremental prior") {
            graft.ops.Indexing.indexIncremental(prior, stateDir,
              nBuckets = 256)._2
          }
          System.err.println(s"  prior: $r1")
          val r2 = phase("indexIncremental current") {
            graft.ops.Indexing.indexIncremental(docs, stateDir,
              nBuckets = 256)._2
          }
          System.err.println(s"  current: $r2")
          phase("searchIndexIncremental (noop)") {
            noop(graft.ops.Indexing.searchIndexIncremental(s, stateDir,
              terms = Seq("scan", "merge", "window"), k = 20))
          }
        case "vincm" =>
          import graft.core.{IncrementalValidation, CompareMode}
          val o = s.read.parquet(s"$sfDir/orders.parquet")
          val db1 = o.selectExpr("CAST(o_orderkey AS STRING) AS id",
            "o_totalprice", "o_orderdate", "o_orderpriority")
          val db2 = o.selectExpr("CAST(o_orderkey AS STRING) AS id",
            "o_totalprice", "o_orderdate", "o_orderpriority")
          val checks = Seq(
            ("o_totalprice", CompareMode.Numeric),
            ("o_orderdate", CompareMode.Date),
            ("o_orderpriority", CompareMode.Fuzzy(0.9)))
          val stateDir = s"$tmp/graft_incvalm_${tag(sfDir)}"
          val restated = col("id").cast("long") < 600
          val prior2 = db2
            .withColumn("o_totalprice",
              when(restated, col("o_totalprice") + 7)
                .otherwise(col("o_totalprice")))
            .filter(!(restated && col("id").cast("long") % 3 === 0))
          phase("summaryMultiIncremental prior") {
            IncrementalValidation.summaryMultiIncremental(
              db1, prior2, checks, stateDir, nBuckets = 4096)
              .collect()
          }
          phase("summaryMultiIncremental current") {
            noop(IncrementalValidation.summaryMultiIncremental(
              db1, db2, checks, stateDir, nBuckets = 4096)
              .orderBy("column_name"))
          }
        case "feed" =>
          val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
            "/root/repo/src/test/resources/bpe_bytes_merges.parquet"))
          val stateDir = s"$tmp/graft_curfeed_prof_${System.nanoTime()}"
          val d = s.read.parquet(s"$sfDir/documents.parquet")
            .select("doc_id", "text")
          val all = d
            .unionByName(d.filter(col("doc_id") < 25).select(
              (col("doc_id") + 500000).as("doc_id"), col("text")))
            .unionByName(d.filter(col("doc_id") < 10).select(
              (col("doc_id") + 900000).as("doc_id"), col("text")))
          for (b <- 0L to 2L)
            phase(s"curatedAppend batch $b") {
              graft.ops.CuratedFeed.curatedAppend(
                all.filter(pmod(col("doc_id"), lit(3L)) === b), b, stateDir,
                merges, seqLen = 2048, nShards = 8,
                minWords = 20, maxWords = 80)
            }
          phase("sequences read + orderBy + noop") {
            noop(graft.ops.CuratedFeed.sequences(s, stateDir)
              .select(col("shard"), col("seq_id"), col("n_tokens"),
                col("n_docs"), col("first_doc"), col("last_doc"))
              .orderBy("shard", "seq_id"))
          }
        case other =>
          System.err.println(s"unknown target $other")
      }
    }
    s.stop()
  }
}
