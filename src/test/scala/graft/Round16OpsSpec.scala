package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, IncrementalAgg, Similarity, Tokenize}

/** Round-16 surfaces: hash-collision-proof packing order, the
  * fixed-sequence pad policy, the distributed BPE decode, the append
  * store's fence OWNERSHIP (checkpoint-reset detection + rebase), and
  * the frozen-codebook drift signal. */
class Round16OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshStateDir(): String =
    java.nio.file.Files.createTempDirectory("graft_r16").toString

  private def viaParquet(df: DataFrame): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("graft_r16in").toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  // ---- packBins (h, id) order ------------------------------------------

  test("packBins multi-column order: equal leading keys (a forced 64-bit " +
      "hash collision) tie-break on the id — deterministic bins, ids " +
      "carried through, partitioning-independent") {
    // two rows share h=5 (the collision); id breaks the tie
    val df = Seq((0L, 5L, 2L, 3L), (0L, 5L, 1L, 3L), (0L, 1L, 9L, 3L))
      .toDF("k", "h", "id", "n")
    def run(d: DataFrame) =
      Chunking.packBins(d, "k", Seq("h", "id"), "n", 4L)
        .select("id", "bin_id", "bin_offset_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(df)
    // stream order (h, id): (1,9) -> (5,1) -> (5,2); prev cumsums 0,3,6
    assert(got == Seq((1L, 0L, 3L), (2L, 1L, 6L), (9L, 0L, 0L)),
      s"got $got")
    // exactly one output row per input row — no collision fan-out (the
    // old join-on-h-alone shape emitted 4 rows for 2 colliding inputs)
    assert(got.length == 3)
    // plan/partitioning cannot perturb the tie
    assert(run(df.repartition(7)) == got)
    assert(run(df.orderBy(desc("id"))) == got)
    // the single-order-column overload still stands (t_pack's shape)
    val one = Chunking.packBins(df, "k", "id", "n", 4L)
    assert(one.columns.toSeq ==
      Seq("k", "id", "n", "bin_id", "bin_offset_tokens"))
  }

  // ---- fixedSequences pad policy ----------------------------------------

  test("fixedSequences padTokenId: trailing partial right-pads to exactly " +
      "seqLen with n_pad counted, complete stays false, checksum covers " +
      "the pads; exact-fit shards emit no padded row; None is unchanged") {
    val d = Seq(
      (0L, 0L, 1L, (1 to 11).toArray),  // 11 tokens: one full + 3-token tail
      (1L, 0L, 2L, (1 to 8).toArray))   // exactly one full sequence
      .toDF("shard", "ord", "doc", "ids")
    def collect(pad: Option[Int]) =
      Chunking.fixedSequences(d, "shard", "ord", "doc", "ids", 8, pad)
        .orderBy("shard", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getAs[scala.collection.Seq[Int]]("token_ids").toSeq,
          r.getLong(r.fieldIndex("ids_sum")), r.getBoolean(8),
          r.getLong(r.fieldIndex("n_pad"))))
    val padded = collect(Some(99))
    assert(padded.length == 3)
    // shard 0 row 0: complete, untouched
    assert(padded(0) == (0L, 0L, 8L, (1 to 8).toSeq, 36L, true, 0L))
    // shard 0 row 1: 3 real tokens + 5 pads; n_tokens/ids_sum describe
    // the EMITTED array; complete stays false
    assert(padded(1) == (0L, 1L, 8L,
      Seq(9, 10, 11, 99, 99, 99, 99, 99), 30L + 5 * 99L, false, 5L))
    // shard 1: exact fit — complete, NO padded trailing row
    assert(padded(2) == (1L, 0L, 8L, (1 to 8).toSeq, 36L, true, 0L))
    // None: the legacy short-tail shape, n_pad uniformly 0
    val bare = collect(None)
    assert(bare(1) == (0L, 1L, 3L, Seq(9, 10, 11), 30L, false, 0L))
    assert(bare.forall(_._7 == 0L))
  }

  test("shuffleSequences: deterministic bijection — every row keeps its " +
      "payload, (out_shard, pos) is dense per shard, the permutation is " +
      "partitioning-independent and actually decorrelates stream order") {
    val rows = for (s <- 0L to 3L; k <- 0L until 50L)
      yield (s, k, s * 1000 + k) // payload encodes the identity
    val df = rows.toDF("shard", "seq_id", "payload")
    def run(d: DataFrame) =
      Chunking.shuffleSequences(d, "shard", "seq_id", nOut = 8)
        .select("shard", "seq_id", "payload", "out_shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    val got = run(df)
    assert(got.length == rows.length, "bijection: no row lost or duplicated")
    assert(got.forall { case (s, k, p, _, _) => p == s * 1000 + k },
      "payload rides the permutation untouched")
    // (out_shard, pos) unique, and pos dense 0..n-1 within each shard
    val byOut = got.groupBy(_._4)
    assert(byOut.values.map(_.length).sum == rows.length)
    for ((o, g) <- byOut)
      assert(g.map(_._5).sorted == (0L until g.length).toVector,
        s"positions in out_shard $o must be dense from 0")
    // pure function of (shard, seq_id): layout cannot perturb it
    assert(run(df.repartition(13)) == got)
    assert(run(df.orderBy(desc("seq_id"))) == got)
    // decorrelation: consecutive stream rows (same shard, k and k+1) do
    // NOT stay adjacent — in any out_shard, the share of adjacent pairs
    // that were stream-consecutive is small
    val posOf = got.map(t => (t._4, t._5) -> (t._1, t._2)).toMap
    val adjacentStreamPairs = byOut.toSeq.flatMap { case (o, g) =>
      (0L until (g.length - 1).toLong).map { p =>
        val (s1, k1) = posOf((o, p)); val (s2, k2) = posOf((o, p + 1))
        if (s1 == s2 && math.abs(k1 - k2) == 1) 1 else 0
      }
    }.sum
    assert(adjacentStreamPairs < rows.length / 10,
      s"shuffle left $adjacentStreamPairs stream-adjacent pairs adjacent")
  }

  test("epoch seeds: seed 0 is the base permutation, distinct seeds give " +
      "distinct decorrelated permutations of the same rows, and " +
      "epochResume is exactly the lexicographic tail from the cursor") {
    val rows = for (s <- 0L to 3L; k <- 0L until 50L)
      yield (s, k, s * 1000 + k)
    val df = rows.toDF("shard", "seq_id", "payload")
    def run(seed: Long) =
      Chunking.shuffleSequences(df, "shard", "seq_id", nOut = 8,
          seed = seed)
        .select("shard", "seq_id", "payload", "out_shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    val base = run(0L)
    assert(base == Chunking.shuffleSequences(df, "shard", "seq_id", 8)
      .select("shard", "seq_id", "payload", "out_shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq,
      "seed 0 must be byte-identical to the unseeded base shuffle")
    val epochs = Seq(1L, 2L, 3L).map(run)
    for (e <- epochs) {
      assert(e.length == rows.length, "every epoch is a bijection")
      val byOut = e.groupBy(_._4)
      for ((o, g) <- byOut)
        assert(g.map(_._5).sorted == (0L until g.length).toVector,
          s"epoch positions in out_shard $o must be dense from 0")
    }
    // pairwise decorrelation: two epochs assign the same (out_shard,
    // pos) to the same identity only about 1/n of the time
    for (Seq(a, b) <- (base +: epochs).combinations(2)) {
      val same = a.zip(b).count { case (x, y) => (x._4, x._5) == (y._4, y._5) }
      assert(same < rows.length / 10,
        s"epoch orders too correlated: $same/${rows.length} fixed points")
    }
    // resume == the (out_shard, pos) >= cursor tail, in any epoch
    val e1 = Chunking.shuffleSequences(df, "shard", "seq_id", 8, seed = 1L)
    def collectR(d: DataFrame) = d
      .select("shard", "seq_id", "out_shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._3, t._4)).toSeq
    val all = collectR(e1)
    assert(collectR(Chunking.epochResume(e1, 0L, 0L)) == all,
      "cursor (0,0) resumes the whole epoch")
    val (cs, cp) = (3L, 7L)
    val tail = collectR(Chunking.epochResume(e1, cs, cp))
    assert(tail == all.filter(t => t._3 > cs || (t._3 == cs && t._4 >= cp)))
    assert(tail.nonEmpty && tail.length < all.length)
    // consumed ++ resumed partitions the epoch exactly
    assert(all.filter(t => t._3 < cs || (t._3 == cs && t._4 < cp))
      ++ tail == all)
    assert(collectR(Chunking.epochResume(e1, 99L, 0L)).isEmpty)
  }

  test("epochRates + epochMixture: floor(rate) copies plus a seeded q20 " +
      "fractional extra per row, dense unique positions, deterministic, " +
      "absent domains rate-0, guards raise on contract violations") {
    val rows =
      (0L until 100L).map(k => (0L, k, "a")) ++
      (0L until 50L).map(k => (1L, k, "b")) ++
      (0L until 10L).map(k => (2L, k, "c")) ++
      (0L until 5L).map(k => (3L, k, "zz")) // not in the target set
    val df = rows.toDF("shard", "seq_id", "domain")
    val rates = Chunking.epochRates(df, "domain",
      Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), epochSequences = 160L)
    val got = rates.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got("a") == (100L, 0.5 * 160 / 100))
    assert(got("b") == (50L, 0.3 * 160 / 50))
    assert(got("c") == (10L, 0.2 * 160 / 10)) // 3.2: upsampling
    assert(!got.contains("zz"), "domains outside the target set get no rate")
    def run(seed: Long, d: DataFrame = df) =
      Chunking.epochMixture(d, "domain", "shard", "seq_id", rates, 8,
          seed = seed)
        .select("shard", "seq_id", "domain", "copy", "out_shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(t => (t._1, t._2, t._4)).toSeq
    val e = run(1L)
    assert(e.forall(_._3 != "zz"), "absent domains leave the epoch")
    // per-identity copy counts: floor(rate) or floor(rate)+1, dense 0..n-1
    val byId = e.groupBy(t => (t._1, t._2))
    val floorOf = Map("a" -> 0L, "b" -> 0L, "c" -> 3L)
    for (((s, k), g) <- byId) {
      val d0 = g.head._3
      assert(g.map(_._4).sorted == (0L until g.length).toVector)
      assert(g.length == floorOf(d0) || g.length == floorOf(d0) + 1,
        s"($s,$k,$d0) emitted ${g.length} copies")
    }
    // the fractional extras hit ~frac of each domain (q20 Bernoulli)
    val aCount = e.count(_._3 == "a")
    assert(aCount > 20 && aCount < 80, s"a kept $aCount of 100 at rate 0.5")
    // positions dense and unique within each out_shard
    for ((o, g) <- e.groupBy(_._5))
      assert(g.map(_._6).sorted == (0L until g.length).toVector,
        s"positions in out_shard $o not dense")
    // deterministic: layout cannot perturb it
    assert(run(1L, df.repartition(13)) == e)
    // a different seed moves both the extras and the positions
    val e2 = run(2L)
    assert(e2.map(t => (t._1, t._2, t._4)).toSet
      != e.map(t => (t._1, t._2, t._4)).toSet
      || e2 != e, "seed must perturb the epoch")
    // guard: a rate at/above 64 raises before emitting wrong positions
    val hot = Chunking.epochRates(df, "domain",
      Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), epochSequences = 4000L)
    val boom = intercept[Exception] {
      Chunking.epochMixture(df, "domain", "shard", "seq_id", hot, 8)
        .count()
    }
    assert(boom.getMessage.contains("below 64"))
    // guard: a shard outside [0, 2^17) raises (the copy packing would
    // silently collide)
    val wide = Seq((1L << 17, 0L, "a")).toDF("shard", "seq_id", "domain")
    val boom2 = intercept[Exception] {
      Chunking.epochMixture(wide, "domain", "shard", "seq_id", rates, 8)
        .count()
    }
    assert(boom2.getMessage.contains("shard out of"))
  }

  test("auditStore: a healthy feed audits all-zero; each corruption " +
      "class — duplicated id, gapped id, wrong length, wrong checksum — " +
      "fires exactly its own counter") {
    import graft.ops.SequenceFeed
    val stateDir = freshStateDir()
    val enc = (0L until 40L)
      .map(i => (i % 2, i, i, Array.fill(32)((i % 7).toInt)))
      .toDF("shard", "ord", "doc", "ids")
    SequenceFeed.sequencesAppend(enc, 0L, stateDir,
      "shard", "ord", "doc", "ids", 64)
    def auditOf(dir: String) =
      SequenceFeed.auditStore(spark, dir, 64)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val healthy = auditOf(stateDir)
    assert(healthy.nonEmpty)
    for ((s, (nRows, maxId, dup, gap, lenBad, sumBad)) <- healthy) {
      assert(nRows == maxId + 1, s"shard $s: dense ids imply n = max+1")
      assert((dup, gap, lenBad, sumBad) == (0L, 0L, 0L, 0L),
        s"shard $s: healthy store must audit clean")
    }
    // corrupt a COPY of the store, one violation class per shard
    val store = SequenceFeed.sequencesFromStore(spark, stateDir)
    val c0 = store.filter(col("shard") === 0 && col("seq_id") === 0)
    val corrupted = store
      // shard 0: duplicate seq_id 0
      .unionByName(c0)
      // shard 1: drop seq_id 0 (gap at the bottom of the range)
      .filter(!(col("shard") === 1 && col("seq_id") === 0))
      .unionByName(
        // a third shard with one row of each row-local corruption
        // length-bad row: checksum kept consistent with the truncated
        // array so ONLY the length counter fires
        c0.select(lit(2L).as("shard"), lit(0L).as("seq_id"),
            col("n_tokens"), col("n_docs"), col("first_doc"),
            col("last_doc"), slice(col("token_ids"), 1, 10)
              .as("token_ids"),
            aggregate(slice(col("token_ids"), 1, 10), lit(0L),
              (acc, x) => acc + x).as("ids_sum"))
          .unionByName(c0.select(lit(2L).as("shard"),
            lit(1L).as("seq_id"), col("n_tokens"), col("n_docs"),
            col("first_doc"), col("last_doc"), col("token_ids"),
            (col("ids_sum") + 1L).as("ids_sum"))))
    val dir2 = freshStateDir()
    corrupted.write.mode("overwrite").parquet(s"$dir2/seqstore")
    val bad = auditOf(dir2)
    assert(bad(0L)._3 == 1L && bad(0L)._4 == 0L, s"dup fires: ${bad(0L)}")
    assert(bad(1L)._4 == 1L && bad(1L)._3 == 0L, s"gap fires: ${bad(1L)}")
    val (_, _, d2, g2, len2, sum2) = bad(2L)
    assert(len2 == 1L && sum2 == 1L && d2 == 0L && g2 == 0L,
      s"row-local corruptions fire their own counters: ${bad(2L)}")
  }

  // ---- distributed BPE decode -------------------------------------------

  test("bpeDecodeIdsDf round-trips the gnarly spec corpus (case, " +
      "punctuation, unicode, non-BMP, literal-special rows) and agrees " +
      "with the driver-side decode; out-of-vocabulary ids fail loudly") {
    val eot = "<|endoftext|>"
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_spec_merges.parquet"))
    val texts = spark.read
      .parquet("src/test/resources/bpe_bytes_spec.parquet")
      .select("text_id", "text")
    val want = texts.collect()
      .map(r => r.getAs[Long]("text_id") -> r.getAs[String]("text")).toMap
    val enc = Tokenize.bpeEncodeIds(texts, "text_id", "text", merges,
      specials = Seq(eot), boundary = Some(eot))
    val got = Tokenize.bpeDecodeIdsDf(enc, "id", "token_ids", merges,
        specials = Seq(eot))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == want.keySet)
    for ((id, text) <- want)
      assert(got(id) == text, s"round trip of '$text' (id $id)")
    // the distributed decode IS the driver-side decode
    val encRows = enc.select("id", "token_ids").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    for ((id, ids) <- encRows)
      assert(got(id) == Tokenize.bpeDecodeIds(ids, merges, Seq(eot)))
    // decoding with the wrong vocabulary must throw, not emit garbage
    val bad = Seq((1L, Array(0, 999999))).toDF("id", "token_ids")
    val ex = intercept[Exception] {
      Tokenize.bpeDecodeIdsDf(bad, "id", "token_ids", merges).collect()
    }
    assert(ex.getMessage != null)
  }

  test("vocabDf: dense GPT-2 id order, specials flagged, identical to " +
      "bpeVocabWithSpecial") {
    val eot = "<|endoftext|>"
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_spec_merges.parquet"))
    val got = Tokenize.vocabDf(spark, merges, Seq(eot))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2)))
    val want = Tokenize.bpeVocabWithSpecial(merges, Seq(eot))
      .map { case (tok, id) => (id, tok, id >= 256 + merges.length) }
    assert(got.toSeq == want)
    assert(got.length == 256 + merges.length + 1)
    assert(got.count(_._3) == 1 && got.last == ((got.length - 1, eot, true)))
  }

  // ---- fence ownership ---------------------------------------------------

  private def writeCheckpointIdentity(stateDir: String, id: String): Unit = {
    val dir = java.nio.file.Paths.get(stateDir, "checkpoint")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("metadata"),
      s"""{"id":"$id"}""")
  }

  private def vocabCounts(stateDir: String): Map[String, Long] =
    IncrementalAgg.vocabFromStore(spark, stateDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("append-store fence ownership: a reset checkpoint (new query id) " +
      "fails loudly instead of silently swallowing below-fence batches; " +
      "same-id replays still skip; rebaseAppendStore recovers") {
    val stateDir = freshStateDir()
    val b0 = Seq((1L, "alpha beta"), (2L, "beta")).toDF("doc_id", "text")
    val b1 = Seq((3L, "alpha")).toDF("doc_id", "text")
    val b2 = Seq((4L, "gamma alpha")).toDF("doc_id", "text")

    // stream A builds the store
    writeCheckpointIdentity(stateDir, "query-A")
    IncrementalAgg.vocabAppend(b0, 0L, stateDir, nBuckets = 8)
    IncrementalAgg.vocabAppend(b1, 1L, stateDir, nBuckets = 8)
    assert(vocabCounts(stateDir) ==
      Map("alpha" -> 2L, "beta" -> 2L))
    // ownership was adopted on first append
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(stateDir, "agg_fence_owner")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(stateDir, "agg_fence_owner")) == "query-A")

    // compaction raises the fence to 1; a same-query replay of batch 1
    // (foreachBatch at-least-once) skips silently — counts unchanged
    IncrementalAgg.compactVocabStore(spark, stateDir)
    IncrementalAgg.vocabAppend(b1, 1L, stateDir, nBuckets = 8)
    assert(vocabCounts(stateDir) == Map("alpha" -> 2L, "beta" -> 2L),
      "same-query replay of a folded batch must not double-count")

    // the checkpoint resets (new uuid) while the store is kept: batch
    // ids restart at 0 — appending MUST throw, both below the fence
    // (would be silently swallowed) and at any id (the old stream's
    // partitions are not this stream's to overwrite)
    writeCheckpointIdentity(stateDir, "query-B")
    val ex = intercept[IllegalStateException] {
      IncrementalAgg.vocabAppend(b2, 0L, stateDir, nBuckets = 8)
    }
    assert(ex.getMessage.contains("rebaseAppendStore"))
    assert(vocabCounts(stateDir) == Map("alpha" -> 2L, "beta" -> 2L),
      "the refused append must not have touched the store")

    // an empty key list would fold the store's keys away — refused
    intercept[IllegalArgumentException] {
      IncrementalAgg.rebaseAppendStore(spark, stateDir, Nil, "n")
    }
    // the deliberate recovery: rebase folds history to the base, resets
    // the fence and clears owner + stale checkpoint; the new stream's
    // batch 0 then lands (neither skipped nor double-counted)
    // through the CLI recovery surface (graft.Main --rebase-append)
    Main.runRebaseAppend(spark, stateDir, Seq("term"), "n")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(stateDir, "checkpoint")),
      "rebase must retire the stale checkpoint")
    writeCheckpointIdentity(stateDir, "query-B")
    IncrementalAgg.vocabAppend(b2, 0L, stateDir, nBuckets = 8)
    assert(vocabCounts(stateDir) ==
      Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L),
      "post-rebase appends fold on top of the kept history")
  }

  // ---- continuous loader feed ---------------------------------------------

  private def feedCorpus(n: Int): Seq[(Long, Long, Long, Array[Int])] = {
    val rnd = new scala.util.Random(20260816)
    (0L until n.toLong).map { i =>
      (i % 3, i * 10, i, Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(300)))
    }
  }

  test("sequence feed: three batches cut exactly what one fixedSequences " +
      "pass over the concatenated stream cuts (seq_id continuous, carry " +
      "== the trailing partials); replay idempotent; gaps rejected") {
    import graft.ops.SequenceFeed
    val stateDir = freshStateDir()
    val rows = feedCorpus(60)
    // batches by doc % 3, IN ORDER — the arrival order the feed defines
    for (b <- 0L to 2L) {
      val batch = rows.filter(_._3 % 3 == b)
        .toDF("shard", "ord", "doc", "ids")
      SequenceFeed.sequencesAppend(batch, b, stateDir,
        "shard", "ord", "doc", "ids", seqLen = 16)
    }
    // reference: ONE cut over the concatenated stream — arrival order
    // is (batch, ord, doc), emulated as ord2 = batch * 2^32 + ord
    val concat = rows.map { case (s, o, d, ids) =>
      (s, (d % 3) * 4294967296L + o, d, ids)
    }.toDF("shard", "ord", "doc", "ids")
    val ref = Chunking.fixedSequences(concat, "shard", "ord", "doc",
      "ids", 16)
    def key(df: DataFrame) = df
      .select("shard", "seq_id", "n_tokens", "n_docs", "first_doc",
        "last_doc", "token_ids", "ids_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        r.getAs[scala.collection.Seq[Int]](6).toSeq, r.getLong(7)))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = key(SequenceFeed.sequencesFromStore(spark, stateDir))
    val want = key(ref.filter(col("complete")))
    assert(got == want, "feed == single-pass cut, complete rows")
    // the carry is exactly the reference's trailing partials
    val carry = SequenceFeed.carrySnapshot(spark, stateDir)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("next_seq"),
          r.getAs[scala.collection.Seq[Int]]("ids").toSeq))).toMap
    val tails = ref.filter(!col("complete"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[scala.collection.Seq[Int]](6).toSeq))).toMap
    for ((s, (seqId, ids)) <- tails) {
      assert(carry.contains(s), s"carry missing shard $s")
      assert(carry(s) == ((seqId, ids)), s"carry of shard $s")
    }
    // replay of the last batch: byte-identical store (idempotent)
    SequenceFeed.sequencesAppend(
      rows.filter(_._3 % 3 == 2).toDF("shard", "ord", "doc", "ids"),
      2L, stateDir, "shard", "ord", "doc", "ids", seqLen = 16)
    assert(key(SequenceFeed.sequencesFromStore(spark, stateDir)) == want,
      "replayed batch must not change the store")
    // a GAP is an error, never a skip: order-dependence means a missing
    // batch loses stream content silently otherwise
    val ex = intercept[IllegalArgumentException] {
      SequenceFeed.sequencesAppend(
        rows.take(1).toDF("shard", "ord", "doc", "ids"),
        5L, stateDir, "shard", "ord", "doc", "ids", seqLen = 16)
    }
    assert(ex.getMessage.toLowerCase.contains("gap"))
  }

  test("sequence feed randomized equivalence: across 8 random corpora, " +
      "batch counts and split points — with auto-compaction interleaved " +
      "— the feed always equals the single-pass cut") {
    import graft.ops.SequenceFeed
    val rnd = new scala.util.Random(816)
    for (trial <- 0 until 8) {
      val stateDir = freshStateDir()
      val n = 20 + rnd.nextInt(60)
      val rows = (0L until n.toLong).map { i =>
        (i % (1 + rnd.nextInt(4)), i, i,
          Array.fill(1 + rnd.nextInt(30))(rnd.nextInt(500)))
      }
      // random contiguous split into 2..5 arrival batches
      val nBatches = 2 + rnd.nextInt(4)
      val cuts = (Seq(0, rows.length) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(rows.length + 1)))
        .sorted.distinct
      val batches = cuts.zip(cuts.tail)
        .map { case (a, b) => rows.slice(a, b) }
      val seqLen = 8 + rnd.nextInt(24)
      val maxParts = 1 + rnd.nextInt(2)
      for ((b, k) <- batches.zipWithIndex) {
        SequenceFeed.sequencesAppend(
          b.toDF("shard", "ord", "doc", "ids"), k.toLong, stateDir,
          "shard", "ord", "doc", "ids", seqLen)
        // interleave the auto-compaction policy a live stream runs
        SequenceFeed.maybeCompactFeedStore(spark, stateDir, maxParts)
      }
      // the single-pass reference: arrival order = (batch, ord)
      val withBatch = batches.zipWithIndex.flatMap { case (b, k) =>
        b.map { case (s, o, d, ids) =>
          (s, k.toLong * (1L << 32) + o, d, ids)
        }
      }
      val want = Chunking.fixedSequences(
          withBatch.toDF("shard", "ord", "doc", "ids"),
          "shard", "ord", "doc", "ids", seqLen)
        .filter(col("complete"))
        .select("shard", "seq_id", "n_docs", "first_doc", "last_doc",
          "token_ids", "ids_sum")
        .collect().map(_.toString).sorted.toSeq
      val got = SequenceFeed.sequencesFromStore(spark, stateDir)
        .select("shard", "seq_id", "n_docs", "first_doc", "last_doc",
          "token_ids", "ids_sum")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"trial $trial (n=$n batches=${batches.length} seqLen=$seqLen " +
          s"maxParts=$maxParts)")
    }
  }

  test("sequence feed compaction: folds batch partitions into the base " +
      "with rows unchanged, fences folded replays, accepts the next " +
      "batch, and heals a stranded swap") {
    import graft.ops.SequenceFeed
    val stateDir = freshStateDir()
    val rows = feedCorpus(60)
    def batchDf(b: Long) =
      rows.filter(_._3 % 3 == b).toDF("shard", "ord", "doc", "ids")
    for (b <- 0L to 1L)
      SequenceFeed.sequencesAppend(batchDf(b), b, stateDir,
        "shard", "ord", "doc", "ids", seqLen = 16)
    def snap() = SequenceFeed.sequencesFromStore(spark, stateDir)
      .select("shard", "seq_id", "ids_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val before = snap()
    SequenceFeed.compactFeedStore(spark, stateDir)
    assert(snap() == before, "compaction must not change the rows")
    // the store now holds only the base partition
    val storeDirs = new java.io.File(s"$stateDir/seqstore").listFiles()
      .map(_.getName).filter(_.startsWith("__batch=")).toSeq
    assert(storeDirs == Seq("__batch=-1"), s"got $storeDirs")
    // a replay of a FOLDED batch is fenced (its rows are in the base)
    SequenceFeed.sequencesAppend(batchDf(1L), 1L, stateDir,
      "shard", "ord", "doc", "ids", seqLen = 16)
    assert(snap() == before, "fenced replay must not duplicate rows")
    // the next batch continues normally on top of the base
    SequenceFeed.sequencesAppend(batchDf(2L), 2L, stateDir,
      "shard", "ord", "doc", "ids", seqLen = 16)
    val after = snap()
    assert(after.length > before.length)
    // stranded swap: simulate the crash window (store renamed aside,
    // complete staging present) — the next read must heal by promoting
    // the staging
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/seqstore")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/seqstore__staging")
    val old = new org.apache.hadoop.fs.Path(s"$stateDir/seqstore__old")
    // staging := a full copy (what a completed staging write leaves)
    org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, tmp, false,
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, old))
    assert(snap() == after, "reader must promote the stranded staging")
    assert(!fs.exists(old) && !fs.exists(tmp) && fs.exists(p))
  }

  test("sequence feed fence ownership: a reset checkpoint over a kept " +
      "feed throws (a feed cannot be rebased)") {
    import graft.ops.SequenceFeed
    val stateDir = freshStateDir()
    writeCheckpointIdentity(stateDir, "query-A")
    val batch = feedCorpus(12).toDF("shard", "ord", "doc", "ids")
    SequenceFeed.sequencesAppend(batch, 0L, stateDir,
      "shard", "ord", "doc", "ids", seqLen = 16)
    writeCheckpointIdentity(stateDir, "query-B")
    val ex = intercept[IllegalStateException] {
      SequenceFeed.sequencesAppend(batch, 0L, stateDir,
        "shard", "ord", "doc", "ids", seqLen = 16)
    }
    assert(ex.getMessage.contains("fresh stateDir"))
  }

  test("maintainSequences: the streaming wrapper feeds the store through " +
      "foreachBatch; a one-batch run equals the direct fixedSequences cut") {
    import graft.ops.{SequenceFeed, Tokenize}
    val stateDir = freshStateDir()
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_merges.parquet"))
    val src = java.nio.file.Files.createTempDirectory("sfeed").toString
    docs.write.mode("overwrite").parquet(src)
    val stream = graft.streaming.StreamingOps.readEvents(spark, src)
    val q = graft.streaming.StreamingOps.withShufflePartitions(spark, 8) {
      graft.streaming.StreamingOps.maintainSequences(stream, stateDir,
        merges, seqLen = 512, nShards = 4)
    }
    try q.processAllAvailable() finally q.stop()
    val got = SequenceFeed.sequencesFromStore(spark, stateDir)
      .select("shard", "seq_id", "n_tokens", "ids_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    val enc = Tokenize.bpeEncodeIds(docs, "doc_id", "text", merges,
        specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
      .select(col("id").as("doc_id"), col("token_ids"))
      .withColumn("h", xxhash64(col("doc_id")))
      .withColumn("shard", pmod(col("h"), lit(4L)))
    val want = Chunking.fixedSequences(enc, "shard", "h", "doc_id",
        "token_ids", 512)
      .filter(col("complete"))
      .select("shard", "seq_id", "n_tokens", "ids_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == want, "one-batch stream == direct cut (complete rows)")
    assert(got.nonEmpty)
  }

  // ---- PQ drift signal ---------------------------------------------------

  private def embCorpus(n: Int, lo: Float = -1f, hi: Float = 1f,
      salt: Int = 0): DataFrame =
    (0 until n).map { i =>
      val r = new scala.util.Random(i * 7919 + salt)
      (i.toLong, Array.fill(8)(lo + r.nextFloat() * (hi - lo)))
    }.toDF("vec_id", "embedding")

  test("pqDrift: the seed corpus measures ~1 against its own fit-time " +
      "baseline; a distribution-shifted slice raises the measure; the " +
      "maintenance report surfaces the baseline") {
    val stateDir = freshStateDir()
    val seed = viaParquet(embCorpus(300))
    val (_, report) = Similarity.pqIndexIncremental(seed, stateDir,
      m = 4, ksub = 8, nBuckets = 32)
    // the run record carries the re-fit baseline
    assert(report.meta.contains("pq_seed_mean_err"), report.meta.toString)
    assert(report.meta.contains("pq_books_signature"))
    val seedMean = BigDecimal(report.meta("pq_seed_mean_err"))
    assert(seedMean > 0)
    // the seed corpus against its own books: EXACTLY the baseline
    // (same integer arithmetic) -> ratio 1. m derives from the STORED
    // books — no caller parameter to get wrong
    val self = Similarity.pqDrift(spark, stateDir, seed).head()
    assert(self.getAs[Long]("seed_n") == 300L)
    assert(self.getAs[Long]("slice_n") == 300L)
    assert(math.abs(self.getAs[Double]("drift_ratio") - 1.0) < 1e-12,
      s"self-drift must be 1, got $self")
    // a shifted slice (fit range was [-1,1]; these live in [2,4])
    // quantizes far worse under the frozen books — the re-fit cue
    val shifted = viaParquet(embCorpus(100, lo = 2f, hi = 4f, salt = 7))
    val drift = Similarity.pqDrift(spark, stateDir, shifted).head()
    assert(drift.getAs[Double]("drift_ratio") > 2.0,
      s"shifted slice must raise the measure, got $drift")
    // work scales with the slice: the frame passed in is what's scanned
    assert(drift.getAs[Long]("slice_n") == 100L)
  }

  // ---- incremental MinHash signature store -------------------------------

  /** A small corpus with near-dups, an exact dup pair, an empty and a
    * null text — the gnarly signature cases. */
  private def sigCorpus(): DataFrame = {
    val base = (0L until 40L).map { i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i " +
        s"word${i % 5} word${i % 7} tail tail tail")
    }
    val nearDups = (0L until 8L).map { i =>
      (100L + i, s"alpha beta gamma delta epsilon zeta eta theta doc$i " +
        s"word${i % 5} CHANGED tail tail tail")
    }
    val edge = Seq((200L, ""), (201L, null: String), (202L, "alpha beta"))
    (base ++ nearDups ++ edge).toDF("doc_id", "text")
  }

  private def collectSigs(df: DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](1).toSeq).toMap

  test("minhashIncremental: churn re-prices to dirty buckets only and the " +
      "stored signatures equal a fresh minhashSignatures pass — " +
      "deletions, edits and inserts included") {
    val stateDir = freshStateDir()
    val docs = viaParquet(sigCorpus())
    // prior corpus: doc_id < 10 restated (text differs), %3==0 of those
    // deleted; doc 300 existed only in the prior (a deletion)
    val restated = col("doc_id") < 10
    val prior = docs
      .withColumn("text", when(restated,
        concat(coalesce(col("text"), lit("")), lit(" prior")))
        .otherwise(col("text")))
      .filter(!(restated && col("doc_id") % 3 === 0))
      .unionByName(Seq((300L, "only in the prior corpus")).toDF("doc_id", "text"))
    val (_, seedRep) = graft.ops.Dedup.minhashIncremental(prior, stateDir,
      nBuckets = 32)
    assert(seedRep.rebuilt)
    val priorSigs = collectSigs(
      graft.ops.Dedup.signaturesFromStore(spark, stateDir))
    assert(priorSigs == collectSigs(
      graft.ops.Dedup.minhashSignatures(prior, "doc_id", "text")))
    // maintain to the CURRENT corpus: only buckets holding churned ids
    // re-shingle
    val (_, rep) = graft.ops.Dedup.minhashIncremental(docs, stateDir,
      nBuckets = 32)
    assert(!rep.rebuilt, rep.toString)
    assert(rep.dirtyBuckets > 0 && rep.dirtyBuckets < rep.totalBuckets,
      rep.toString)
    val got = collectSigs(graft.ops.Dedup.signaturesFromStore(spark, stateDir))
    val want = collectSigs(
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text"))
    assert(got == want)
    // a third run over the unchanged corpus touches nothing
    val (_, clean) = graft.ops.Dedup.minhashIncremental(docs, stateDir,
      nBuckets = 32)
    assert(!clean.rebuilt && clean.dirtyBuckets == 0, clean.toString)
    // parameter change = different aggKey -> wholesale rebuild (the safe
    // direction), never mixed signatures
    val (_, rekeyed) = graft.ops.Dedup.minhashIncremental(docs, stateDir,
      shingleLen = 2, nBuckets = 32)
    assert(rekeyed.rebuilt)
    assert(collectSigs(graft.ops.Dedup.signaturesFromStore(spark, stateDir))
      == collectSigs(graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text",
        shingleLen = 2)))
  }

  test("minhashAppend: batch folds accumulate to exactly the single-pass " +
      "signatures; replays are idempotent; compaction preserves the table " +
      "and fences folded batches") {
    val stateDir = freshStateDir()
    val docs = viaParquet(sigCorpus())
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    val want = collectSigs(
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text"))
    graft.ops.Dedup.minhashAppend(b0, 0L, stateDir, nBuckets = 32)
    graft.ops.Dedup.minhashAppend(b1, 1L, stateDir, nBuckets = 32)
    // at-least-once replay of batch 1: dynamic overwrite replaces its
    // own partitions — no signature stacking
    graft.ops.Dedup.minhashAppend(b1, 1L, stateDir, nBuckets = 32)
    graft.ops.IncrementalAgg.compactAppendStore(spark, stateDir,
      Seq("id", "h"), "sigv")
    // post-compaction: the fold is the identity over one-row (id, h)
    // groups, and a replay of the folded batch is fenced (skipped)
    graft.ops.Dedup.minhashAppend(b1, 1L, stateDir, nBuckets = 32)
    graft.ops.Dedup.minhashAppend(b2, 2L, stateDir, nBuckets = 32)
    val got = collectSigs(
      graft.ops.Dedup.signaturesFromStore(spark, stateDir))
    assert(got == want)
    // the store is servable by the SAME candidate chain as direct sigs
    val sigs = graft.ops.Dedup.signaturesFromStore(spark, stateDir)
      .localCheckpoint(true)
    val fromStore = graft.ops.Dedup.minhashCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = graft.ops.Dedup.minhashCandidates(
        graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text")
          .localCheckpoint(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore == direct && fromStore.nonEmpty)
  }

  // ---- persistent seen-set ------------------------------------------------

  test("seenAppend: the store accumulates exactly the first occurrence " +
      "per fingerprint — within-batch min-order ties, cross-batch history " +
      "wins, null fps dedup null-safely, replays and fenced replays are " +
      "no-ops, compaction preserves the corpus") {
    val stateDir = freshStateDir()
    // (id, fp, payload): fp collisions within batch 0 (ids 1,2), across
    // batches (fp "a" again in batch 1; fp "b" in batch 2), null fps in
    // two batches (only the first survives), and a unique row per batch
    val b0 = viaParquet(Seq(
      (2L, "a", "x2"), (1L, "a", "x1"), (3L, "b", "x3"),
      (4L, null: String, "x4")).toDF("id", "fp", "payload"))
    val b1 = viaParquet(Seq(
      (5L, "a", "x5"), (6L, "c", "x6"),
      (7L, null: String, "x7")).toDF("id", "fp", "payload"))
    val b2 = viaParquet(Seq(
      (8L, "b", "x8"), (9L, "d", "x9")).toDF("id", "fp", "payload"))
    def survivors(): Set[(Long, String, String)] =
      graft.ops.Curation.seenRows(spark, stateDir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
    val want = Set(
      (1L, "a", "x1"),              // min id of the batch-0 "a" pair
      (3L, "b", "x3"),
      (4L, null: String, "x4"),     // first null-fp arrival
      (6L, "c", "x6"),
      (9L, "d", "x9"))
    graft.ops.Curation.seenAppend(b0, 0L, stateDir, "fp", "id",
      nBuckets = 8)
    assert(survivors() == Set((1L, "a", "x1"), (3L, "b", "x3"),
      (4L, null: String, "x4")))
    graft.ops.Curation.seenAppend(b1, 1L, stateDir, "fp", "id",
      nBuckets = 8)
    // at-least-once replay of batch 1: decision excludes its own
    // partitions, so it re-derives identical survivors (overwritten in
    // place) — nothing lost, nothing doubled
    graft.ops.Curation.seenAppend(b1, 1L, stateDir, "fp", "id",
      nBuckets = 8)
    graft.ops.Curation.compactSeenStore(spark, stateDir)
    // post-fold replay of batch 0 is fenced outright
    graft.ops.Curation.seenAppend(b0, 0L, stateDir, "fp", "id",
      nBuckets = 8)
    graft.ops.Curation.seenAppend(b2, 2L, stateDir, "fp", "id",
      nBuckets = 8)
    assert(survivors() == want)
    // idempotent end state under a second compaction
    graft.ops.Curation.compactSeenStore(spark, stateDir)
    assert(survivors() == want)
  }

  test("maintainSeen: the streaming wrapper filters a duplicate-injected " +
      "stream to first occurrences — wrapper == the batch rule") {
    val stateDir = freshStateDir()
    val src = java.nio.file.Files.createTempDirectory("graft_r16seen").toString
    val rows = (0L until 50L).map(i => (i, s"fp${i % 17}", s"p$i"))
    rows.toDF("id", "fp", "payload").write.mode("overwrite").parquet(src)
    val stream = graft.streaming.StreamingOps.readEvents(spark, src)
    val q = graft.streaming.StreamingOps.maintainSeen(stream, stateDir,
      "fp", "id", nBuckets = 8)
    try q.processAllAvailable() finally q.stop()
    val got = graft.ops.Curation.seenRows(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    // one survivor per fingerprint: the min id (all files land in one
    // micro-batch here; across batches the earlier batch would win)
    val want = rows.groupBy(_._2).values.map(_.minBy(_._1)).toSet
    assert(got == want && got.size == 17)
  }

  test("maintainSignatures: the streaming wrapper folds a document stream " +
      "into the same store the batch surface reads — wrapper == direct") {
    val stateDir = freshStateDir()
    val src = java.nio.file.Files.createTempDirectory("graft_r16mh").toString
    sigCorpus().write.mode("overwrite").parquet(src)
    val stream = graft.streaming.StreamingOps.readEvents(spark, src)
    val q = graft.streaming.StreamingOps.maintainSignatures(
      stream, stateDir, nBuckets = 32)
    try q.processAllAvailable() finally q.stop()
    val got = collectSigs(
      graft.ops.Dedup.signaturesFromStore(spark, stateDir))
    val want = collectSigs(graft.ops.Dedup.minhashSignatures(
      spark.read.parquet(src), "doc_id", "text"))
    assert(got == want)
  }
}
