package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Indexing, Multimodal, Similarity, TextAnalysis, Tokenize}

/** Scale rehearsal: run the dedup / near-dup / ANN pipelines on a corpus
  * replicated N× from sf0.1, with a deliberately skewed boilerplate
  * cluster, and record candidate-pair counts + wall time per stage.
  *
  * This is the empirical check behind the "candidate volume stays linear"
  * claims in [[graft.ops.Dedup]] and [[graft.ops.Similarity]]: a quadratic
  * candidate generator would show ~N² pair growth between scale=1 and
  * scale=N; the capped-bucket two-regime generators should show ~N growth.
  * The boilerplate cluster (1,000 identical docs / near-identical vectors)
  * is the 100 TB failure mode in miniature — one hot bucket that must go
  * through the linear star regime, never C(n,2) expansion.
  *
  * Corpus construction (deterministic, no RNG):
  *  - documents ×N: replica r offsets doc_id by r·10⁷; docs with
  *    doc_id%3==0 get a replica-unique token appended (near-dups of the
  *    base doc), the rest are byte-identical copies (exact-dup clusters of
  *    size N — the common web-crawl case);
  *  - +1,000 boilerplate docs sharing one text (star-regime stress);
  *  - embeddings ×N: replica 1 is a mild perturbation of the base vector
  *    (a true near-dup at cosine ≥ 0.95); replicas ≥ 2 sign-flip
  *    alternating components (decorrelated — NOT near-dups), so true-pair
  *    count grows linearly in N while bucket occupancy grows with the
  *    corpus — exactly what separates candidate growth from result growth;
  *  - +1,000 near-identical boilerplate vectors (one hot hyperplane
  *    bucket).
  *
  * Usage: runMain graft.Rehearsal [scale ...] (default: 1 10).
  * Emits one JSON line per (scale, stage) and a trailing summary line;
  * also written to /tmp/rehearsal.json.
  */
object Rehearsal {

  private val Off = 10000000L // replica id offset: keeps ids disjoint

  private def scaledDocs(spark: SparkSession, dir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val replicas = (0 until n).map { r =>
      if (r == 0) base
      else base.select(
        (col("doc_id") + lit(r * Off)).as("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(s" replica token r$r")))
          .otherwise(col("text")).as("text"))
    }
    val boiler = spark.range(1000).select(
      (col("id") + lit(900000000L)).as("doc_id"),
      lit("standard header terms of service apply all rights reserved " +
        "contact support for details this page is intentionally generic")
        .as("text"))
    replicas.reduce(_ unionByName _).unionByName(boiler)
  }

  private def scaledEmbeddings(spark: SparkSession, dir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val replicas = (0 until n).map { r =>
      if (r == 0) base
      else if (r == 1) base.select(
        (col("vec_id") + lit(Off)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * 1.02f).otherwise(x)).as("embedding"))
      else base.select(
        (col("vec_id") + lit(r * Off)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i % (r + 1) === 0, -x).otherwise(x)).as("embedding"))
    }
    // boilerplate vectors: 1,000 tiny perturbations of base vector 0 —
    // mutually near-identical, all in one hyperplane bucket
    val v0 = base.filter(col("vec_id") === 0).select(col("embedding")).head()
      .getSeq[Float](0)
    import spark.implicits._
    val boiler = spark.createDataset(
      (0 until 1000).map(i => (900000000L + i,
        v0.zipWithIndex.map { case (x, d) =>
          if (d == 0) x * (1.0f + i * 1e-5f) else x }))
    ).toDF("vec_id", "embedding")
    replicas.reduce(_ unionByName _).unionByName(boiler)
  }

  /** Synthesized validation pair (each side `(id, check)`) for the
    * engine's namesake workload, deterministic (no RNG), in two regimes:
    *
    *  - `skewed = false` — the J3 many-to-many regime
    *    (`running_validation.py:233-239`): n/4 distinct composite keys,
    *    each with multiplicity 4 PER SIDE, so the differing-pair algebra
    *    multiplies 4x4 per shared key;
    *  - `skewed = true` — one hot key ("hot") holding ~1% of all rows on
    *    each side (bounded to 20 distinct check values so the per-id
    *    distinct-pair scoring stays 20x20 while the SHUFFLE sees the full
    *    1% landing in one partition), the rest unique keys.
    *
    * Both regimes drop keys per side (%97 / %89 — the anti-join food) and
    * perturb check values on residue classes: k%29 a full rewrite (fuzzy-
    * differing at 0.9), k%23 a single-char edit of a 24-char string
    * (ratio 47/48 ~ 0.979: fuzzy-EQUAL at 0.9, exact-differing). */
  private def validationSide(spark: SparkSession, n: Long, skewed: Boolean,
      dropMod: Long, perturb: Boolean): DataFrame = {
    val checkOf = (kExpr: String) =>
      if (!perturb) s"substring(md5(CAST($kExpr AS STRING)), 1, 24)"
      else s"""CASE
        WHEN $kExpr % 29 = 0 THEN substring(md5(concat(CAST($kExpr AS STRING), '!')), 1, 24)
        WHEN $kExpr % 23 = 0 THEN concat(substring(md5(CAST($kExpr AS STRING)), 1, 23), 'z')
        ELSE substring(md5(CAST($kExpr AS STRING)), 1, 24) END"""
    if (!skewed) {
      val kDistinct = math.max(n / 4, 1L)
      spark.range(n).selectExpr(s"id % $kDistinct AS k")
        .filter(s"k % $dropMod != 0")
        .selectExpr("concat('k', CAST(k AS STRING)) AS id",
          s"${checkOf("k")} AS check")
    } else {
      // hot check values: (id DIV 100) % 20, NOT id % 20 — hot ids are
      // the multiples of 100, so id % 20 would be constantly 0 and the
      // hot key would carry ONE distinct value instead of the 20 the
      // distinct-pair scoring stress needs. Short values ('b0'..'b19')
      // keep the per-pair ratio kernel cheap so the leg measures pair
      // VOLUME, not an artificial long-string DP.
      spark.range(n)
        .filter(s"id % $dropMod != 0")
        .selectExpr("id", "CASE WHEN id % 100 = 0 THEN -1 ELSE id END AS k")
        .selectExpr(
          "CASE WHEN k = -1 THEN 'hot' ELSE concat('k', CAST(k AS STRING)) END AS id",
          s"""CASE WHEN k = -1 THEN concat('b', CAST((id DIV 100) % 20 AS STRING))
              ELSE ${checkOf("k")} END AS check""")
    }
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new StringBuilder
    def emit(line: String): Unit = { println(line); out.append(line).append('\n') }

    for (scale <- scales) {
      val docs = scaledDocs(spark, dir, scale).localCheckpoint(true)
      val nDocs = docs.count()

      val (sigs, tSig) = timed {
        Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint(true)
      }
      val (nCand, tCand) = timed { Dedup.minhashCandidates(sigs).count() }
      emit(s"""{"scale":$scale,"stage":"minhash_candidates","input_rows":$nDocs,"output_rows":$nCand,"sig_sec":$tSig,"sec":$tCand}""")

      val (nComp, tCc) = timed {
        Dedup.connectedComponentsStar(Dedup.minhashCandidates(sigs))
          .select("component").distinct().count()
      }
      emit(s"""{"scale":$scale,"stage":"connected_components","input_rows":$nCand,"output_rows":$nComp,"sec":$tCc}""")

      val (nSim, tSim) = timed {
        Dedup.simhashCandidates(Dedup.simhashes(docs, "doc_id", "text")).count()
      }
      emit(s"""{"scale":$scale,"stage":"simhash_pairs","input_rows":$nDocs,"output_rows":$nSim,"sec":$tSim}""")

      // image/audio near-dup legs: REAL encode+decode per row; the 1,000
      // boilerplate docs share one payload, so each modality carries the
      // same hot-bucket star-regime stress as the text legs — the
      // star-fallback claim is MEASURED per modality, not inherited
      val (nImg, tImg) = timed {
        Dedup.simhashCandidates(
          Multimodal.imageDHash(
            Multimodal.asMediaImages(docs, "doc_id", "text"))).count()
      }
      emit(s"""{"scale":$scale,"stage":"image_dhash_pairs","input_rows":$nDocs,"output_rows":$nImg,"sec":$tImg}""")

      val (nAud, tAud) = timed {
        Dedup.simhashCandidates(
          Multimodal.audioEnergyHash(
            Multimodal.asMediaAudio(docs, "doc_id", "text"))).count()
      }
      emit(s"""{"scale":$scale,"stage":"audio_energy_pairs","input_rows":$nDocs,"output_rows":$nAud,"sec":$tAud}""")

      val vecs = scaledEmbeddings(spark, dir, scale).localCheckpoint(true)
      val nVecs = vecs.count()

      val (nNd, tNd) = timed {
        Similarity.embeddingNearDups(vecs, threshold = 0.95, bits = 8).count()
      }
      emit(s"""{"scale":$scale,"stage":"embed_neardup","input_rows":$nVecs,"output_rows":$nNd,"sec":$tNd}""")

      val (nIvf, tIvf) = timed {
        Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 10), k = 5,
          nCentroids = 16, nprobe = 3).count()
      }
      emit(s"""{"scale":$scale,"stage":"ivf_topk","input_rows":$nVecs,"output_rows":$nIvf,"sec":$tIvf}""")

      // PQ leg: full fit + encode + ADC search — fit cost is dominated by
      // the corpus-scan assignment (linear), encode by the broadcast
      // argmin (linear), search by the code-table scan (linear); nothing
      // here may grow with corpus^2 or collect anything corpus-sized
      val (nPq, tPq) = timed {
        Similarity.pqTopK(vecs, vecs.filter(col("vec_id") < 10), k = 5,
          m = 4, ksub = 16).count()
      }
      emit(s"""{"scale":$scale,"stage":"pq_topk","input_rows":$nVecs,"output_rows":$nPq,"sec":$tPq}""")

      // stored PQ-index legs: same build-once/search-many split for the
      // vector side — the ADC search scans the stored CODE table (m
      // small ints per vector, never the raw embeddings), so search cost
      // scales with the code table, not with refit + corpus rewrite
      val (_, tPqBuild) = timed {
        Similarity.pqIndexWrite(vecs, s"rehearsal_pq_idx_$scale",
          m = 4, ksub = 16)
      }
      val (nPqS, tPqSearch) = timed {
        Similarity.pqSearchIndexed(spark, s"rehearsal_pq_idx_$scale",
          vecs.filter(col("vec_id") < 10), k = 5, m = 4).count()
      }
      emit(s"""{"scale":$scale,"stage":"pq_index_stored_search","input_rows":$nVecs,"output_rows":$nPqS,"build_sec":$tPqBuild,"sec":$tPqSearch}""")

      // ANN recall leg: implementation-exactness (the oracle replay) and
      // speed (the timed legs above) say nothing about RETRIEVAL QUALITY
      // — the number an LLM-pipeline user reads first. recall@k of each
      // approximate tier's id set against the exact cosine top-k, same
      // parameters as the t_ann_* bench queries, over the scaled corpus
      // (replicas >= 2 are decorrelated sign-flips, so the exact answer
      // stays dominated by base + near-dup replicas while bucket
      // occupancy grows — recall must not decay with corpus growth)
      {
        val k = 5
        val qs = vecs.filter(col("vec_id") < 10)
        def ids(df: DataFrame): Set[(Long, Long)] =
          df.select("query_id", "corpus_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = ids(Similarity.bruteForceTopK(vecs, qs, k))
        def recall(approx: Set[(Long, Long)]): Double =
          if (exact.isEmpty) 1.0
          else approx.intersect(exact).size.toDouble / exact.size
        // two parameterizations per tier: the bench queries' speed-leaning
        // params, and the recall-leaning setting each tier's knob reaches
        // (probe more cells / more+coarser tables / bigger codebooks with
        // exact re-rank / wider projection with a deeper shortlist) — the
        // recall-vs-cost dial is the deliverable, not one magic number
        val rIvf = recall(ids(Similarity.ivfTopK(vecs, qs, k,
          nCentroids = 16, nprobe = 3)))
        val rIvfT = recall(ids(Similarity.ivfTopK(vecs, qs, k,
          nCentroids = 16, nprobe = 8)))
        val rLsh = recall(ids(Similarity.lshTopK(vecs, qs, k, bits = 8)))
        val rLshT = recall(ids(Similarity.lshTopK(vecs, qs, k,
          bits = 4, tables = 16)))
        val rPq = recall(ids(Similarity.pqTopK(vecs, qs, k, m = 4, ksub = 16)))
        val rPqT = recall(ids(Similarity.pqTopKRerank(vecs, qs, k,
          m = 8, ksub = 32, shortlist = 100)))
        val rRp = recall(ids(Similarity.rpTopK(vecs, qs, k, dim = 64,
          outDim = 16, shortlist = 100)))
        val rRpT = recall(ids(Similarity.rpTopK(vecs, qs, k, dim = 64,
          outDim = 24, shortlist = 200)))
        emit(s"""{"scale":$scale,"stage":"ann_recall","input_rows":$nVecs,"k":$k,"recall_ivf":$rIvf,"recall_lsh":$rLsh,"recall_pq":$rPq,"recall_rp":$rRp,"recall_ivf_nprobe8":$rIvfT,"recall_lsh_b4t16":$rLshT,"recall_pq_rerank":$rPqT,"recall_rp_o24s200":$rRpT}""")
      }

      // bigram-LM leg: replicas are (near-)identical, so the DISTINCT
      // bigram vocabulary stays ~base-sized while instance counts scale —
      // the map-side combine must absorb the duplication (count-table
      // rows ~flat, time ~linear)
      val (nLm, tLm) = timed { TextAnalysis.ngramLmSurprisal(docs).count() }
      emit(s"""{"scale":$scale,"stage":"ngram_lm","input_rows":$nDocs,"output_rows":$nLm,"sec":$tLm}""")

      // BPE legs: TRAINING iterates on the distinct-word set, which the
      // replicated corpus keeps ~base-sized — train time must stay ~flat
      // while the single wordFreqs corpus scan grows; ENCODING is the
      // shuffle-free mapPartitions pass whose tokens/sec must stay ~flat
      // (per-partition memo makes the merge loop once-per-distinct-word)
      val (bpeMerges, tBpeTrain) = timed {
        Tokenize.loadMerges(Tokenize.bpeTrain(docs, "text", numMerges = 24))
      }
      val ((nEncDocs, nTokens), tBpeEnc) = timed {
        val r = Tokenize.bpeEncode(docs, "doc_id", "text", bpeMerges)
          .agg(count(lit(1)), sum("n_tokens")).head()
        (r.getLong(0), r.getLong(1))
      }
      emit(s"""{"scale":$scale,"stage":"bpe_train","input_rows":$nDocs,"merges":${bpeMerges.size},"sec":$tBpeTrain}""")
      emit(s"""{"scale":$scale,"stage":"bpe_encode","input_rows":$nEncDocs,"tokens":$nTokens,"sec":$tBpeEnc,"tokens_per_sec":${(nTokens / math.max(tBpeEnc, 1e-9)).toLong}}""")

      // BPE delta-maintenance leg: FORCED-distributed training over a
      // vocabulary that actually GROWS with the run (30k x scale
      // distinct hash-derived words) — the regime the distributed merge
      // loop exists for (the replicated docs corpus keeps its
      // distinct-word set ~flat, which the hybrid local finish handles
      // without any distributed merges at all). The per-merge trace
      // emits affected vs working per merge: the delta path's shuffle
      // carries only the affected words' ±pairs (~1-2% of the set for
      // hash-random words), so its per-merge cost must track AFFECTED
      // while the recount twin re-explodes the ENTIRE working set's
      // pairs every merge and tracks |working|. (traced per-merge secs
      // include the trace's own filter-count job; headline totals are
      // untraced)
      {
        val vocabDocs = spark.range(scale.toLong * 30000)
          .selectExpr("id AS doc_id",
            "lower(conv(substring(md5(cast(id AS string)), 1, 13), 16, 36)) AS text")
          .localCheckpoint(true)
        val perMerge =
          scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double)]
        Tokenize.bpeTrain(vocabDocs, "text", numMerges = 12,
          localThreshold = 0L,
          trace = Some((r, a, w, s) => perMerge += ((r, a, w, s))))
        val (_, tDelta) = timed {
          Tokenize.bpeTrain(vocabDocs, "text", numMerges = 12,
            localThreshold = 0L).count()
        }
        val (_, tRecount) = timed {
          Tokenize.bpeTrain(vocabDocs, "text", numMerges = 12,
            localThreshold = 0L, deltaCounts = false).count()
        }
        val aArr = perMerge.map(_._2).mkString("[", ",", "]")
        val wArr = perMerge.map(_._3).mkString("[", ",", "]")
        val sArr = perMerge.map(m => f"${m._4}%.3f").mkString("[", ",", "]")
        emit(s"""{"scale":$scale,"stage":"bpe_train_delta","distinct_words":${scale.toLong * 30000},"merges":${perMerge.size},"affected_per_merge":$aArr,"working_per_merge":$wArr,"sec_per_merge_traced":$sArr,"sec_delta":$tDelta,"sec_recount":$tRecount}""")
        vocabDocs.unpersist()
      }

      // PageRank skew leg: a power-law hub — 10^5 sources all pointing at
      // one node ("hub") — on top of a sparse deterministic ring graph
      // whose node count scales with the run. Per iteration the cost is
      // one keyed equi-join (ranks to edges on the SOURCE — the hub's
      // 10^5 OUT-edges after symmetrization are one AQE-splittable join
      // key) plus one destination-keyed aggregate, where the hub's 10^5
      // in-contributions collapse to ONE row per map partition by partial
      // aggregation BEFORE the shuffle — so the reduce side never sees
      // the hub's fan-in, and wall time must stay ~linear in scale. If
      // this leg ever degrades superlinearly, the fix is
      // Skew.saltedCountSum inside the iteration (two-phase aggregate).
      val (nPr, tPr) = timed {
        // ids stay BIGINT (hub node = -1): pageRank now preserves native
        // key types — the kCore precedent measured 3.7x at the 50x leg
        val nNodes = 100000L * scale
        val ring = spark.range(nNodes).select(
          col("id").as("a"),
          ((col("id") * 7 + 1) % nNodes).as("b"))
        val hub = spark.range(100000L).select(
          (col("id") % nNodes).as("a"), lit(-1L).as("b"))
        val base = ring.unionByName(hub)
        val edges = base.unionByName(
          base.select(col("b").as("a"), col("a").as("b")))
        graft.ops.Graph.pageRank(edges, "a", "b", iterations = 3).count()
      }
      emit(s"""{"scale":$scale,"stage":"pagerank_hub","input_rows":${200000L * scale + 200000L},"output_rows":$nPr,"sec":$tPr}""")

      // inverted-index leg: exact-dup replicas multiply df per term, so
      // posting pages per term grow ~linearly; no aggregation group may
      // exceed the page size regardless of scale
      val (nIdx, tIdx) = timed {
        Indexing.invertedIndex(docs, "doc_id", "text", 1024).count()
      }
      emit(s"""{"scale":$scale,"stage":"inverted_index","input_rows":$nDocs,"output_rows":$nIdx,"sec":$tIdx}""")

      // stored text-index legs: build once (content-stamped), search
      // many — the production split. Build cost may scale with the
      // corpus; the SEARCH must answer from hash(term)-pruned buckets of
      // the stored posting table (SelectedBucketsCount in the scan, no
      // corpus leaf), touching the query terms' posting lists, not the
      // corpus — per-search cost stays ~flat as the corpus scales
      val (_, tIdxBuild) = timed {
        Indexing.indexWrite(docs, s"rehearsal_text_idx_$scale",
          numBuckets = 64)
      }
      val storedSearch = Indexing.searchIndexStored(spark,
        s"rehearsal_text_idx_$scale",
        terms = Seq("standard", "header", "generic"), k = 20)
      val searchLeaves = storedSearch.queryExecution.executedPlan
        .collectLeaves().map(_.toString).mkString("\n")
      val bucketPruned = searchLeaves.contains("SelectedBucketsCount")
      val (nIdxS, tIdxSearch) = timed { storedSearch.count() }
      emit(s"""{"scale":$scale,"stage":"text_index_stored_search","input_rows":$nDocs,"output_rows":$nIdxS,"build_sec":$tIdxBuild,"sec":$tIdxSearch,"bucket_pruned":$bucketPruned}""")

      // set-similarity-join leg: the EXACT join's own output is
      // quadratic in per-group duplication (k identical docs MUST emit
      // C(k,2) pairs — that is the correct answer, not a plan defect),
      // so production runs it after the O(n) exact pass, and so does the
      // leg: exact-dedup first, then the prefix-filter join on the
      // remainder. What must stay ~linear is candidate generation over
      // the deduped corpus (rarest-first prefixes keep posting lists
      // short even as the corpus grows).
      val (nSsj, tSsj) = timed {
        val deduped = Dedup.exact(docs, "doc_id", Seq("text"))
        graft.ops.SetSim.jaccardJoin(deduped, "doc_id", "text",
          tn = 2, td = 5, shingleW = 3).count()
      }
      emit(s"""{"scale":$scale,"stage":"setsim_join","input_rows":$nDocs,"output_rows":$nSsj,"sec":$tSsj}""")

      // triangle-counting leg on a hub graph of the PageRank leg's SHAPE
      // (ring + 10^5-degree hub; half the node count — the wedge join is
      // the cost driver here, not the iteration):
      // the literal curse-of-the-last-reducer setup (Suri &
      // Vassilvitskii 2011) — a 10^5-degree hub whose naive (id-ordered)
      // wedge join would enumerate C(10^5, 2) ~ 5e9 hub wedges. Degree
      // orientation points every hub edge AWAY from its low-degree
      // endpoint, so the hub's OUT-degree is ~0 and the wedge join stays
      // ~linear in the edge count. If this leg degrades superlinearly
      // the orientation is broken.
      val (nTri, tTri) = timed {
        // ids stay BIGINT (hub node = -1): native key types, as pageRank
        val nNodes = 100000L * scale
        val ring = spark.range(nNodes).select(
          col("id").as("a"),
          ((col("id") * 7 + 1) % nNodes).as("b"))
        val hub = spark.range(100000L).select(
          (col("id") % nNodes).as("a"), lit(-1L).as("b"))
        graft.ops.Graph.triangleCounts(ring.unionByName(hub), "a", "b")
          .count()
      }
      emit(s"""{"scale":$scale,"stage":"triangles_hub","input_rows":${100000L * scale + 100000L},"output_rows":$nTri,"sec":$tTri}""")

      // edit-join leg: random 16-hex-char strings (no accidental
      // near-pairs) + 1% injected single-edit twins — the PASS-JOIN
      // segment filter must keep candidate volume ~linear in n because
      // random strings share no (length, index, segment) key; if this
      // leg goes superlinear the filter is broken
      val (nEj, tEj) = timed {
        val n = 100000L * scale
        val strs = spark.range(n).selectExpr("id",
          "substring(md5(CAST(id AS STRING)), 1, 16) AS s")
        val twins = spark.range(n / 100).selectExpr(
          s"id + ${Long.MaxValue / 2} AS id",
          "concat('z', substring(md5(CAST(id * 100 AS STRING)), 2, 15)) AS s")
        graft.ops.EditJoin.editJoin(strs.unionByName(twins), "id", "s", d = 2)
          .count()
      }
      emit(s"""{"scale":$scale,"stage":"edit_join","input_rows":${100000L * scale + 1000L * scale},"output_rows":$nEj,"sec":$tEj}""")

      // heavy-hitters leg: 7 hot keys over a long uniform tail — the
      // Misra-Gries pass must stay one scan with bounded per-task state;
      // candidate nomination is partitioning-dependent but the output is
      // pinned (7 rows at every scale)
      val (nHh, tHh) = timed {
        val n = 1000000L * scale
        val keys = spark.range(n).selectExpr(
          "CASE WHEN id % 5 = 0 THEN concat('hot', id % 7) " +
            "ELSE concat('cold', id) END AS k")
        graft.ops.Frequency.heavyHitters(keys, "k", divisor = 50L).count()
      }
      emit(s"""{"scale":$scale,"stage":"heavy_hitters","input_rows":${1000000L * scale},"output_rows":$nHh,"sec":$tHh}""")

      // anti-correlated skyline leg: points on (and just under) the
      // a+b+c ~ const simplex, duplicate-heavy — the documented worst
      // case where local skylines approach partition size and the
      // frontier is a large fraction of the distinct grid. Shuffle
      // partitions are raised to 64 (> fanIn=32) around the call so the
      // multi-round fan-in reduction actually runs (64 -> 2 -> 1; the
      // round count reads the conf — never the input RDD, which would
      // eagerly execute an AQE plan); the final task streams the
      // candidates with kept state bounded by the DISTINCT frontier
      // (duplicate compression in the sweep) — ~grid cells, not rows
      var skyDiag: graft.ops.Skyline.SkylineDiag = null
      val (nSky, tSky) = timed {
        val n = 50000L * scale
        val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        try {
          val pts = spark.range(n).selectExpr("id",
            "abs(xxhash64(id)) % 51 AS a", "abs(xxhash64(id * 31)) % 51 AS b",
            "abs(xxhash64(id * 61)) % 3 AS e")
            .selectExpr("id", "a", "b", "102 - a - b + e AS c")
          val (sky, d) = graft.ops.Skyline.skylineNDInstrumented(
            pts.repartition(64), "id", Seq("a", "b", "c"))
          skyDiag = d
          sky.count()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      // rounds: per reduction round, total rows in and the largest
      // single-task inflow — the fan-in<=~32-local-skylines claim as a
      // measured number instead of an argument
      emit(s"""{"scale":$scale,"stage":"skyline_anticorr","input_rows":${50000L * scale},"output_rows":$nSky,"sec":$tSky,"rounds":${skyDiag.report},"max_task_in":${skyDiag.maxTaskInflow}}""")

      // k-core leg: a ring (every node degree 2) with one pendant spoke
      // per ring node — at k = 2 the spokes peel in round one and the
      // ring survives; per-round cost must stay linear in edges. Node
      // ids stay BIGINT (ring 0..n-1, spokes n..2n-1): kCore preserves
      // key types, and integer keys shuffle ~2x leaner than strings
      val (nKc, tKc) = timed {
        val n = 200000L * scale
        val ring = spark.range(n).select(
          col("id").as("a"), ((col("id") + 1) % n).as("b"))
        val spokes = spark.range(n).select(
          col("id").as("a"), (col("id") + n).as("b"))
        graft.ops.Graph.kCore(ring.unionByName(spokes), "a", "b",
          k = 2, rounds = 3).count()
      }
      emit(s"""{"scale":$scale,"stage":"kcore_ring","input_rows":${400000L * scale},"output_rows":$nKc,"sec":$tKc}""")

      // compaction leg: the small-files problem — 512 micro-files at
      // every scale (constant per-file overhead, growing bytes), rewritten
      // shuffle-free to ~32 MB targets; throughput must stay ~flat in
      // MB/s since the rewrite is one narrow read-once/write-once pass
      {
        val n = 2000000L * scale
        val src = s"/tmp/rehearsal_compact_src_$scale"
        val dst = s"/tmp/rehearsal_compact_dst_$scale"
        spark.range(n).selectExpr("id", "md5(CAST(id AS STRING)) AS pad")
          .repartition(512).write.mode("overwrite").parquet(src)
        val (st, tComp) = timed {
          graft.ops.Compaction.compact(spark, src, dst,
            32L * 1024 * 1024).head()
        }
        val bytesIn = st.getAs[Long]("bytes_in")
        emit(s"""{"scale":$scale,"stage":"compaction","files_in":${st.getAs[Long]("files_in")},"files_out":${st.getAs[Long]("files_out")},"bytes_in":$bytesIn,"sec":$tComp,"mb_per_sec":${(bytesIn / 1e6 / math.max(tComp, 1e-9)).toLong}}""")
        // clustered variant over the same input: the measured price of
        // the range shuffle that buys disjoint per-file key ranges
        val dstC = s"/tmp/rehearsal_compact_dstc_$scale"
        val (stc, tClus) = timed {
          graft.ops.Compaction.compactClustered(spark, src, dstC,
            32L * 1024 * 1024, "id").head()
        }
        emit(s"""{"scale":$scale,"stage":"compaction_clustered","files_out":${stc.getAs[Long]("files_out")},"n_bins":${stc.getAs[Long]("n_bins")},"sec":$tClus,"mb_per_sec":${(bytesIn / 1e6 / math.max(tClus, 1e-9)).toLong}}""")
        val hconf = spark.sparkContext.hadoopConfiguration
        for (d <- Seq(src, dst, dstC)) {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(hconf).delete(p, true)
        }
      }

      // validation legs — the engine's NAMESAKE workload at scale:
      // summaryFast + both anti-joins + the fuzzy string diff over a
      // synthesized pair, in the two regimes the reference's own data
      // model hits (duplicate composite keys: J3 many-to-many; one hot
      // key holding ~1% of rows). Per-row cost must stay ~flat across
      // scales, and summaryFast's single-keyed-exchange pin must hold
      // (the exchange count is emitted from the EXECUTED plan).
      for ((regime, skewed) <- Seq(("dupkey", false), ("skew", true))) {
        val n = 100000L * scale
        val f = validationSide(spark, n, skewed, dropMod = 97L, perturb = false)
          .localCheckpoint(true)
        val s = validationSide(spark, n, skewed, dropMod = 89L, perturb = true)
          .localCheckpoint(true)
        val rowsF = f.count(); val rowsS = s.count()
        val totalRows = rowsF + rowsS

        val mode = graft.core.CompareMode.Fuzzy(0.9)
        val sumDf = graft.core.Validator.summaryFast(f, s, mode)
        val (sumRow, tSum) = timed { sumDf.collect().head }
        val sumPlan = sumDf.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val exchanges = sumPlan.linesIterator.count(ln =>
          ln.contains("Exchange hashpartitioning") &&
            !ln.contains("ReusedExchange"))
        emit(s"""{"scale":$scale,"stage":"validate_summary_$regime","input_rows":$totalRows,"n_differing":${sumRow.getAs[Long]("n_differing")},"sec":$tSum,"us_per_row":${tSum * 1e6 / totalRows},"keyed_exchanges":$exchanges}""")

        val v = graft.core.Validator.validate(f, s, mode)
        val (nMiss, tMiss) = timed {
          v.missingInFirst.count() + v.missingInSecond.count()
        }
        emit(s"""{"scale":$scale,"stage":"validate_antijoins_$regime","input_rows":$totalRows,"output_rows":$nMiss,"sec":$tMiss,"us_per_row":${tMiss * 1e6 / totalRows}}""")

        // fuzzy diff: every joined (id) pair runs the guarded seqRatioGte
        // kernel — pairs = sum over shared ids of m x n multiplicity
        // (computed from id-count aggregates, cheap), so the emitted
        // pairs_per_sec is the kernel's throughput, which must stay flat
        val pairs = f.groupBy("id").agg(count(lit(1)).as("c1"))
          .join(s.groupBy("id").agg(count(lit(1)).as("c2")), Seq("id"))
          .agg(coalesce(sum(col("c1") * col("c2")), lit(0L))).head().getLong(0)
        val (nDiff, tDiff) = timed { v.differing.count() }
        emit(s"""{"scale":$scale,"stage":"validate_fuzzy_$regime","input_rows":$totalRows,"pairs":$pairs,"output_rows":$nDiff,"sec":$tDiff,"pairs_per_sec":${(pairs / math.max(tDiff, 1e-9)).toLong}}""")

        f.unpersist(); s.unpersist()
      }

      // multi-column validation leg: k=3 columns (numeric, date, string)
      // through summaryMulti's single id-keyed shuffle vs k independent
      // summaryFast passes over the same sides — the measured version of
      // the "k columns must not mean k scans" claim. Exchange count read
      // from the executed plan.
      {
        val n = 100000L * scale
        val kDistinct = math.max(n / 4, 1L)
        def multiSide(dropMod: Long, perturb: Boolean) = {
          def p(norm: String, pert: String) = if (perturb) pert else norm
          spark.range(n).selectExpr(s"id % $kDistinct AS k")
            .filter(s"k % $dropMod != 0")
            .selectExpr(
              "concat('k', CAST(k AS STRING)) AS id",
              p("k", "CASE WHEN k % 31 = 0 THEN k + 1 ELSE k END") + " AS c_num",
              p("date_add(DATE '2024-01-01', CAST(k % 365 AS INT))",
                "CASE WHEN k % 37 = 0 THEN date_add(DATE '2024-01-01', CAST(k % 365 AS INT) + 1) " +
                  "ELSE date_add(DATE '2024-01-01', CAST(k % 365 AS INT)) END") + " AS c_date",
              p("substring(md5(CAST(k AS STRING)), 1, 16)",
                "CASE WHEN k % 29 = 0 THEN concat(substring(md5(CAST(k AS STRING)), 1, 15), 'z') " +
                  "ELSE substring(md5(CAST(k AS STRING)), 1, 16) END") + " AS c_str")
            .localCheckpoint(true)
        }
        val f = multiSide(97L, perturb = false)
        val s = multiSide(89L, perturb = true)
        val rowsIn = f.count() + s.count()
        val checks = Seq(
          ("c_num", graft.core.CompareMode.Numeric),
          ("c_date", graft.core.CompareMode.Date),
          ("c_str", graft.core.CompareMode.Fuzzy(1.0)))
        val mDf = graft.core.Validator.summaryMulti(f, s, checks)
        val (mRows, tMulti) = timed { mDf.collect() }
        val mPlan = mDf.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val idExchanges = mPlan.linesIterator.count(ln =>
          ln.contains("Exchange hashpartitioning(id#") &&
            !ln.contains("ReusedExchange"))
        val nDiffTotal = mRows.map(_.getAs[Long]("n_differing")).sum
        val (_, tSingles) = timed {
          for ((c, m) <- checks)
            graft.core.Validator.summaryFast(
              f.select(col("id"), col(c).as("check")),
              s.select(col("id"), col(c).as("check")), m).collect()
        }
        emit(s"""{"scale":$scale,"stage":"validate_multi_k3","input_rows":$rowsIn,"n_differing_total":$nDiffTotal,"sec":$tMulti,"sec_3_single_passes":$tSingles,"speedup":${(tSingles / math.max(tMulti, 1e-9) * 100).toLong / 100.0},"us_per_row":${tMulti * 1e6 / rowsIn},"id_keyed_exchanges":$idExchanges}""")
        f.unpersist(); s.unpersist()
      }

      // incremental validation leg — the daily re-run shape: build the
      // per-bucket state once over tables PARTITIONED BY THE BUCKET
      // COLUMN (withBucket — the layout the op is designed to ride),
      // then re-validate after a CONSTANT-SIZE restated batch (~20 ids:
      // the table grows, yesterday's correction does not). Dirty buckets
      // <= changed ids, so the dirty fraction falls with scale, the
      // partition-pruned recompute touches only the churned FILES, and
      // the advantage over a full summaryFast must WIDEN with scale.
      // Equality of the two summaries is asserted in-leg — a rehearsal
      // that got a wrong answer fast would be worse than useless.
      {
        val n = 100000L * scale
        val nB = 512
        val mode = graft.core.CompareMode.Fuzzy(0.9)
        val legDir = java.nio.file.Files
          .createTempDirectory(s"graft_incleg_$scale").toString
        // one file per bucket dir: repartition ON the bucket column before
        // partitionBy, or every task writes a sliver into every dir and
        // the layout becomes the small-files problem it exists to avoid
        def writeBucketed(df: DataFrame, name: String): DataFrame = {
          graft.core.IncrementalValidation.withBucket(df, nB)
            .repartition(col("bucket"))
            .write.partitionBy("bucket").mode("overwrite")
            .parquet(s"$legDir/$name")
          spark.read.parquet(s"$legDir/$name")
        }
        val f0 = writeBucketed(validationSide(spark, n, skewed = false,
          dropMod = 97L, perturb = false), "f0")
        val s0raw = validationSide(spark, n, skewed = false, dropMod = 89L,
          perturb = true)
        val s0 = writeBucketed(s0raw, "s0")
        val rowsIn = f0.count() + s0.count()
        // the restated batch: ids k1000..k1019 get a new value on the
        // second side, two of them disappear, three new ids appear
        val kNum = substring(col("id"), 2, 100).cast("long")
        val s1 = writeBucketed(s0raw
          .withColumn("check",
            when(kNum.between(1000, 1019), concat(col("check"), lit("X")))
              .otherwise(col("check")))
          .filter(!kNum.between(1018, 1019))
          .unionByName(spark.range(3).selectExpr(
            "concat('znew', CAST(id AS STRING)) AS id",
            "substring(md5(CAST(id AS STRING)), 1, 24) AS check")), "s1")
        val stateDir = s"$legDir/state"
        val (_, tBuild) = timed {
          graft.core.IncrementalValidation.run(f0, s0, mode, stateDir,
            nBuckets = nB, bucketCol = Some("bucket"))
        }
        val ((incRow, rep), tInc) = timed {
          val (df, r) = graft.core.IncrementalValidation.run(f0, s1, mode,
            stateDir, nBuckets = nB, bucketCol = Some("bucket"))
          (df.collect().head, r)
        }
        val (fullRow, tFull) = timed {
          graft.core.Validator.summaryFast(f0, s1, mode).collect().head
        }
        for (c <- Seq("n_first", "n_second", "missing_in_first",
            "missing_in_second", "n_differing", "n_matched"))
          require(incRow.getAs[Long](c) == fullRow.getAs[Long](c),
            s"incremental leg summary mismatch on $c: $incRow vs $fullRow")
        emit(s"""{"scale":$scale,"stage":"validate_incremental","input_rows":$rowsIn,"dirty_buckets":${rep.dirtyBuckets},"total_buckets":${rep.totalBuckets},"build_sec":$tBuild,"sec_incremental":$tInc,"sec_full":$tFull,"speedup_vs_full":${(tFull / math.max(tInc, 1e-9) * 100).toLong / 100.0}}""")
      }

      // churn-priced materialized-aggregate leg (IncrementalAgg.run):
      // maintaining the BIGRAM LM MODEL TABLE (the corpus-derived count
      // table ngramLmSurprisal / DSIR-style scoring builds) after a
      // FIXED-SIZE churn (20 docs re-texted, 3 dropped) of a corpus that
      // GROWS with scale (20k docs x scale, ~24 tokens each, hash-
      // derived 5k-word vocabulary, so the bigram key space is large
      // and the full recompute's exchange is data-sized). The full twin
      // re-aggregates AND re-materializes the whole table — what a
      // non-incremental daily pipeline does; the incremental run prices
      // at one per-row digest scan plus the churned buckets' partials.
      // A sum-collapsing aggregate (plain 5k-term vocab counts) shows
      // NO incremental win — map-side combine makes full aggregation
      // scan-cost; the win is real exactly when the aggregate's key
      // space or partial cost is data-sized, as here. Store == full
      // table is asserted in-leg by count + hash-sum.
      {
        val nB = 512
        val legDir = java.nio.file.Files
          .createTempDirectory(s"graft_aggleg_$scale").toString
        def bucketed(df: DataFrame, name: String): DataFrame = {
          df.withColumn("bucket",
              when(col("doc_id").isNull, lit(-1L))
                .otherwise(pmod(xxhash64(col("doc_id").cast("string")),
                  lit(nB.toLong))))
            .repartition(col("bucket"))
            .write.partitionBy("bucket").mode("overwrite")
            .parquet(s"$legDir/$name")
          spark.read.parquet(s"$legDir/$name")
        }
        val d0raw = spark.range(20000L * scale).select(
          col("id").as("doc_id"),
          expr("concat_ws(' ', transform(sequence(0, 23), " +
            "i -> concat('w', pmod(xxhash64(id, i), 5000))))").as("text"))
        val d0 = bucketed(d0raw, "d0")
        val rowsIn = d0.count()
        val d1 = bucketed(d0raw
          .withColumn("text",
            when(col("doc_id").between(100, 119),
              concat(col("text"), lit(" restated leg token")))
              .otherwise(col("text")))
          .filter(!col("doc_id").between(120, 122)), "d1")
        val stateDir = s"$legDir/state"
        // the SHIPPED named instance, not a leg-local re-implementation
        // — the benchmark must measure the aggregate users run
        def maintain(t: DataFrame) = graft.ops.IncrementalAgg.bigrams(
          t, stateDir, nBuckets = nB, bucketCol = Some("bucket"))
        val (_, tBuild) = timed { maintain(d0) }
        // the daily job: bring the stored model table up to date
        val ((merged, rep), tInc) = timed { maintain(d1) }
        // the non-incremental twin: recompute AND re-materialize the
        // whole table (a pipeline's model table is a stored artifact);
        // written independently of the op under test
        val (_, tFull) = timed {
          d1.select(split(lower(col("text")), "[^a-z0-9]+").as("t"))
            .filter(size(col("t")) >= 2)
            .select(explode(expr(
              "filter(transform(sequence(0, size(t)-2), " +
                "i -> struct(t[i] AS w1, t[i+1] AS w2)), " +
                "p -> p.w1 <> '' AND p.w2 <> '')")).as("bg"))
            .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
            .agg(count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(s"$legDir/full_model")
        }
        def chk(df: DataFrame): (Long, java.math.BigDecimal) = {
          val r = df.agg(count(lit(1)),
            sum(xxhash64(col("w1"), col("w2"), col("n").cast("string"))
              .cast("decimal(38,0)"))).collect().head
          (r.getLong(0), r.getDecimal(1))
        }
        val got = chk(merged)
        val want = chk(spark.read.parquet(s"$legDir/full_model"))
        require(got == want,
          s"agg_incremental leg model mismatch at scale $scale: " +
            s"$got vs $want")
        emit(s"""{"scale":$scale,"stage":"agg_incremental","input_rows":$rowsIn,"dirty_buckets":${rep.dirtyBuckets},"total_buckets":${rep.totalBuckets},"model_rows":${got._1},"build_sec":$tBuild,"sec_incremental":$tInc,"sec_full_recompute":$tFull,"speedup_vs_full":${(tFull / math.max(tInc, 1e-9) * 100).toLong / 100.0}}""")
      }

      // incremental STORED-INDEX legs (round 15): the daily-churn price
      // of the posting store and the PQ code store vs their full-rebuild
      // twins (what the stamp-guarded indexWrite/pqIndexWrite do on ANY
      // churn). Fixed small churn while the corpus grows with scale —
      // the incremental cost must stay flat while the rebuild grows.
      {
        val nB = 512
        val legDir = java.nio.file.Files
          .createTempDirectory(s"graft_idxleg_$scale").toString
        def bucketed(df: DataFrame, name: String): DataFrame = {
          df.withColumn("bucket",
              when(col("doc_id").isNull, lit(-1L))
                .otherwise(pmod(xxhash64(col("doc_id").cast("string")),
                  lit(nB.toLong))))
            .repartition(col("bucket"))
            .write.partitionBy("bucket").mode("overwrite")
            .parquet(s"$legDir/$name")
          spark.read.parquet(s"$legDir/$name")
        }
        val d0raw = spark.range(20000L * scale).select(
          col("id").as("doc_id"),
          expr("concat_ws(' ', transform(sequence(0, 23), " +
            "i -> concat('w', pmod(xxhash64(id, i), 5000))))").as("text"))
        val d0 = bucketed(d0raw, "d0")
        val rowsIn = d0.count()
        val d1 = bucketed(d0raw
          .withColumn("text",
            when(col("doc_id").between(100, 119),
              concat(col("text"), lit(" restated leg token")))
              .otherwise(col("text")))
          .filter(!col("doc_id").between(120, 122)), "d1")
        val stateDir = s"$legDir/state"
        def maintain(t: DataFrame) = graft.ops.Indexing.indexIncremental(
          t, stateDir, nBuckets = nB, bucketCol = Some("bucket"))
        val (_, tBuild) = timed { maintain(d0) }
        val ((_, rep), tInc) = timed { maintain(d1) }
        // the non-incremental daily twin: re-tokenize and re-materialize
        // the WHOLE posting index (what a stamp mismatch forces)
        val (_, tFull) = timed {
          graft.ops.Indexing.invertedIndex(d1, "doc_id", "text")
            .write.mode("overwrite").parquet(s"$legDir/full_index")
        }
        // correctness in-leg: the store answers the same retrieval as
        // the freshly built index
        val terms = Seq("w17", "w4242", "w999")
        val got = graft.ops.Indexing.searchIndexIncremental(
          spark, stateDir, terms, 20).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val want = graft.ops.Indexing.searchIndex(
          spark.read.parquet(s"$legDir/full_index"), d1.count(), terms, 20)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        require(got == want,
          s"index_incremental leg retrieval mismatch at scale $scale")
        emit(s"""{"scale":$scale,"stage":"index_incremental","input_rows":$rowsIn,"dirty_buckets":${rep.dirtyBuckets},"total_buckets":${rep.totalBuckets},"build_sec":$tBuild,"sec_incremental":$tInc,"sec_full_recompute":$tFull,"speedup_vs_full":${(tFull / math.max(tInc, 1e-9) * 100).toLong / 100.0}}""")
      }

      {
        val nB = 512
        val legDir = java.nio.file.Files
          .createTempDirectory(s"graft_pqleg_$scale").toString
        def bucketed(df: DataFrame, name: String): DataFrame = {
          df.withColumn("bucket",
              pmod(xxhash64(col("vec_id").cast("string")), lit(nB.toLong)))
            .repartition(col("bucket"))
            .write.partitionBy("bucket").mode("overwrite")
            .parquet(s"$legDir/$name")
          spark.read.parquet(s"$legDir/$name")
        }
        // production-shaped embeddings: dim 64, m=8 subspaces, ksub=32
        // codewords — encode cost per row must be REAL (a dim-16/m=4 toy
        // makes the full re-encode so cheap the churn pricing can never
        // show; the op exists for corpora where encode dominates)
        val e0raw = spark.range(20000L * scale).select(
          col("id").as("vec_id"),
          expr("transform(sequence(0, 63), i -> " +
            "float(pmod(xxhash64(id, i), 1000)) / float(500.0) - " +
            "float(1.0))").as("embedding"))
        val e0 = bucketed(e0raw, "e0")
        val rowsIn = e0.count()
        val e1 = bucketed(e0raw
          .withColumn("embedding",
            when(col("vec_id").between(100, 119),
              expr("transform(embedding, x -> float(-x))"))
              .otherwise(col("embedding")))
          .filter(!col("vec_id").between(120, 122)), "e1")
        val stateDir = s"$legDir/state"
        def maintain(t: DataFrame) = graft.ops.Similarity.pqIndexIncremental(
          t, stateDir, m = 8, ksub = 32, nBuckets = nB,
          bucketCol = Some("bucket"))
        val (_, tBuild) = timed { maintain(e0) } // includes the one-time fit
        val ((codes, rep), tInc) = timed { maintain(e1) }
        // the non-incremental daily twin: re-encode and re-materialize
        // the WHOLE code table under the same frozen books (fit-once
        // applies to both sides; the stamp-guarded path would pay it too)
        val books = spark.read.parquet(s"$stateDir/books")
        val (_, tFull) = timed {
          graft.ops.Similarity.pqEncode(e1, books, m = 8,
              idCol = "vec_id", vecCol = "embedding")
            .write.mode("overwrite").parquet(s"$legDir/full_codes")
        }
        def chk(df: DataFrame): (Long, java.math.BigDecimal) = {
          val r = df.agg(count(lit(1)),
            sum(xxhash64(col("vec_id"), col("sub"), col("code"))
              .cast("decimal(38,0)"))).collect().head
          (r.getLong(0), r.getDecimal(1))
        }
        val got = chk(codes.select("vec_id", "sub", "code"))
        val want = chk(spark.read.parquet(s"$legDir/full_codes"))
        require(got == want,
          s"pq_incremental leg code mismatch at scale $scale: $got vs $want")
        emit(s"""{"scale":$scale,"stage":"pq_incremental","input_rows":$rowsIn,"dirty_buckets":${rep.dirtyBuckets},"total_buckets":${rep.totalBuckets},"build_sec":$tBuild,"sec_incremental":$tInc,"sec_full_recompute":$tFull,"speedup_vs_full":${(tFull / math.max(tInc, 1e-9) * 100).toLong / 100.0}}""")
      }

      // streaming legs — the last unrehearsed family: throughput and
      // STATE-SIZE-vs-scale for the two continuous monitors, driven
      // through multi-file parquet streams replayed in disordered
      // micro-batches (maxFilesPerTrigger=1). The geometry claims become
      // measured numbers: streamingTableDiff state = one row per
      // DISTINCT key (held CONSTANT here while event volume grows with
      // scale — state must not grow with rows), streamingDrift state =
      // one vocab-sized map per distinct window (fixed window count →
      // state rows constant across scales).
      {
        import org.apache.spark.sql.streaming.OutputMode
        val sd = java.nio.file.Files.createTempDirectory("rh_stream").toString
        val n = 100000L * scale
        val keys = 100000L // FIXED key universe: state must track keys, not rows
        val obs = spark.range(n)
          .selectExpr(s"id % $keys AS k", "id")
          .filter("k % 97 != 0")
          .selectExpr("k AS id", "CAST(k % 1000 AS DOUBLE) AS v")
        val ref = spark.range(n)
          .selectExpr(s"id % $keys AS k", "id")
          .filter("k % 89 != 0")
          .selectExpr("k AS id",
            "CASE WHEN k % 31 = 0 THEN CAST(k % 1000 AS DOUBLE) + 1.0 " +
              "ELSE CAST(k % 1000 AS DOUBLE) END AS v")
        obs.repartition(8).write.mode("overwrite").parquet(s"$sd/obs")
        ref.repartition(8).write.mode("overwrite").parquet(s"$sd/ref")
        val rowsIn = spark.read.parquet(s"$sd/obs").count() +
          spark.read.parquet(s"$sd/ref").count()
        val distinctKeys = spark.read.parquet(s"$sd/obs").select("id")
          .union(spark.read.parquet(s"$sd/ref").select("id"))
          .distinct().count()
        def streamOf(p: String) = spark.readStream
          .schema(spark.read.parquet(p).schema)
          .option("maxFilesPerTrigger", "1").parquet(p)

        def runWithProgress(df: DataFrame, name: String, mode: OutputMode)
            : (Long, Long, Long) = {
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode(mode).start()
          try {
            q.processAllAvailable()
            val progs = q.recentProgress
            val stateRows = progs.reverse
              .flatMap(p => Option(p.stateOperators).toSeq.flatten.headOption)
              .headOption.map(_.numRowsTotal).getOrElse(-1L)
            val dataBatches = progs.count(_.numInputRows > 0).toLong
            val outRows = spark.table(name).count()
            (stateRows, dataBatches, outRows)
          } finally q.stop()
        }

        val diffDf = graft.streaming.StreamingOps.streamingTableDiff(
          streamOf(s"$sd/obs"), streamOf(s"$sd/ref"), "id", "v")
        val ((stateRows, batches, outRows), tDiff) = timed {
          runWithProgress(diffDf, s"rh_tdiff_$scale", OutputMode.Complete())
        }
        emit(s"""{"scale":$scale,"stage":"streaming_table_diff","input_rows":$rowsIn,"distinct_keys":$distinctKeys,"batches":$batches,"output_rows":$outRows,"state_rows":$stateRows,"sec":$tDiff,"rows_per_sec":${(rowsIn / math.max(tDiff, 1e-9)).toLong}}""")

        // drift: fixed 8-window, 50-term geometry; volume grows with
        // scale, open-window state must not
        val vocab = 50
        val windows = 8
        val ev = spark.range(n).selectExpr(
          s"concat('t', CAST(id % $vocab AS STRING)) AS event_type",
          s"timestamp_micros(CAST(1700000000000000 + (id % ${windows * 3600L}) * 1000000 AS LONG)) AS ts")
        ev.repartition(8).write.mode("overwrite").parquet(s"$sd/ev")
        // the state bound to verify against: DISTINCT event-time windows
        // (the epoch is not hour-aligned, so `windows` hours span
        // windows+1 hourly buckets)
        val distinctWindows = spark.read.parquet(s"$sd/ev")
          .select(window(col("ts"), "60 minutes")).distinct().count()
        val reference = (0 until vocab)
          .map(i => s"t$i" -> (i + 1).toLong).toMap
        val driftDf = graft.streaming.StreamingOps.streamingDrift(
          streamOf(s"$sd/ev"), reference, windowMinutes = 60,
          watermark = None).toDF()
        val ((dState, dBatches, dOut), tDrift) = timed {
          runWithProgress(driftDf, s"rh_drift_$scale", OutputMode.Update())
        }
        emit(s"""{"scale":$scale,"stage":"streaming_drift","input_rows":$n,"windows":$distinctWindows,"vocab":$vocab,"batches":$dBatches,"output_rows":$dOut,"state_rows":$dState,"sec":$tDrift,"rows_per_sec":${(n / math.max(tDrift, 1e-9)).toLong}}""")

        val hconf = spark.sparkContext.hadoopConfiguration
        val pth = new org.apache.hadoop.fs.Path(sd)
        pth.getFileSystem(hconf).delete(pth, true)
      }

      docs.unpersist(); sigs.unpersist(); vecs.unpersist()
    }

    try {
      val w = new java.io.PrintWriter("/tmp/rehearsal.json")
      try w.print(out.toString) finally w.close()
    } catch { case _: Throwable => }
    spark.stop()
  }
}
