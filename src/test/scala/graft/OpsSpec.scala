package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog again and again today"), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules engine"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup groups") {
    val g = Dedup.exactGroups(docs, "doc_id", Seq("text"))
    val dup = g.filter(col("n_copies") > 1).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keep_id") == 1L)
    assert(dup(0).getAs[Long]("n_copies") == 2L)
    assert(Dedup.exact(docs, "doc_id", Seq("text")).count() == 4)
  }

  test("minhash: identical docs have identical signatures; near dups collide") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val byId = sigs.collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(byId(1L) == byId(2L))
    val cands = Dedup.minhashCandidates(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: exact dup 1.0, near dup high, disjoint 0.0") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t3 = "the quick brown fox leaps over the lazy dog again and again today"
    assert(Dedup.ngramJaccard(t1, t1) == 1.0)
    val nd = Dedup.ngramJaccard(t1, t3)
    assert(nd > 0.4 && nd < 1.0)
    assert(Dedup.ngramJaccard(t1, "x y z w v u t s r q") == 0.0)
  }

  test("connected components group near-dup chains into one component") {
    // chain 1-2-3 + pair 10-11 + chain 20-21-22-23 (path, diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    val comp = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(comp) == Seq(1L, 1L, 1L))
    assert(Seq(10L, 11L).map(comp) == Seq(10L, 10L))
    assert(Seq(20L, 21L, 22L, 23L).map(comp).forall(_ == 20L))
  }

  test("simhash: dups distance 0, near dups small distance, candidates found") {
    val a = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again today")
    val b = Dedup.simhash64("the quick brown fox leaps over the lazy dog again and again today")
    val far = Dedup.simhash64("completely different content about spark catalyst optimizer rules engine")
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ far))
    val pairs = Dedup.simhashCandidates(Dedup.simhashes(docs, "doc_id", "text"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("brute-force ANN top-k: nearest neighbor of a vector is its duplicate") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("corpus_id") == 1L)
    assert(top(0).getAs[Double]("cosine") > 0.999)
    assert(top.length == 2)
  }

  test("LSH bucketing: identical vectors share a bucket; topk finds them") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.2f, -0.3f, 0.5f)),
      (1L, Array(1.0f, 0.2f, -0.3f, 0.5f)),
      (2L, Array(-1.0f, -0.2f, 0.3f, -0.5f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0), k = 1, bits = 8)
      .collect()
    assert(res.length == 1 && res(0).getAs[Long]("corpus_id") == 1L)
  }

  test("embedding near-dups: saturated bucket degrades to a linear min-id star") {
    // 10 identical vectors all land in one hyperplane bucket; with the
    // bucket cap below the occupancy the pair output must be the LINEAR
    // star against the min id (9 pairs), never the quadratic 45 all-pairs
    val dup = (0L until 10L).map(i => (i, Array(1.0f, 0.2f, -0.3f, 0.5f)))
      .toDF("vec_id", "embedding")
    val star = Similarity.embeddingNearDups(dup, threshold = 0.9, bits = 8,
      maxBucket = 4).collect()
    assert(star.length == 9, s"expected linear star, got ${star.length} pairs")
    assert(star.forall(_.getAs[Long]("id_a") == 0L),
      "star pairs must anchor at the bucket's min id")
    assert(star.forall(_.getAs[Double]("cosine") > 0.999))
    // same input under the cap: full all-pairs within the bucket
    val full = Similarity.embeddingNearDups(dup, threshold = 0.9, bits = 8,
      maxBucket = 64).collect()
    assert(full.length == 45)
  }

  test("text analysis: token counts, quality, langid, fingerprints") {
    val stats = TextAnalysis.stats(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats(5L).getAs[Long]("n_tokens") == 0L)
    assert(stats(1L).getAs[Long]("n_tokens") == 13L)
    assert(stats(1L).getAs[String]("fingerprint") == stats(2L).getAs[String]("fingerprint"))
    assert(stats(1L).getAs[String]("fingerprint") != stats(3L).getAs[String]("fingerprint"))

    val lang = docs.select(TextAnalysis.langId(col("text")).as("l"))
      .collect().map(_.getString(0))
    assert(lang.count(_ == "en") >= 3) // stopword-rich english docs

    val es = Seq((1L, "el perro y el gato que corren por la casa con los ninos")).toDF("doc_id", "text")
    assert(es.select(TextAnalysis.langId(col("text"))).collect()(0).getString(0) == "es")
    val zh = Seq((1L, "中文文本处理引擎测试")).toDF("doc_id", "text")
    assert(zh.select(TextAnalysis.langId(col("text"))).collect()(0).getString(0) == "zh")
  }

  test("quality score in [0,1], higher for clean prose than empty/junk") {
    val q = docs.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(5L))
  }

  test("multimodal resize: metadata transformed, payload shrunk deterministically") {
    val media = Multimodal.asMedia(docs.filter(col("doc_id") =!= 5L), "doc_id", "text", "image")
    val resized = Multimodal.resize(media, 32, 32).collect()
    assert(resized.forall(m => m.width == 32 && m.height == 32))
    val orig = media.collect().map(r => r.getAs[Long]("media_id") ->
      r.getAs[Array[Byte]]("payload").length).toMap
    resized.foreach(m => assert(m.payload.length <= orig(m.media_id)))
    val again = Multimodal.resize(media, 32, 32).collect()
    assert(resized.map(m => (m.media_id, m.payload.toSeq)).sortBy(_._1).toSeq ==
      again.map(m => (m.media_id, m.payload.toSeq)).sortBy(_._1).toSeq)
  }

  test("real image resize: 4x4 result is the exact 2x2 floor box average") {
    // known text -> known 8x8 pixels p(i) = charAt(i % len) & 0xFF
    val text = "The quick brown fox jumps over the lazy dog 0123456789"
    val media = Multimodal.asMediaImages(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.extractFeatures(Multimodal.resize(media, 4, 4).toDF())
      .collect().head
    assert(out.decoded_w == 4 && out.decoded_h == 4, "resized image must re-decode at 4x4")
    val p = Array.tabulate(64)(i => text.charAt(i % text.length).toInt & 0xFF)
    val v = Array.tabulate(16) { i =>
      val r = i / 4; val c = i % 4
      (p(8 * (2 * r) + 2 * c) + p(8 * (2 * r) + 2 * c + 1) +
        p(8 * (2 * r + 1) + 2 * c) + p(8 * (2 * r + 1) + 2 * c + 1)) / 4
    }
    val expBright = v.sum.toDouble / 16 / 255.0
    val expSharp = (for (r <- 0 until 4; c <- 1 until 4)
      yield math.abs(v(4 * r + c) - v(4 * r + c - 1))).sum.toDouble / 12 / 255.0
    assert(out.brightness == expBright, s"brightness ${out.brightness} != $expBright")
    assert(out.sharpness == expSharp, s"sharpness ${out.sharpness} != $expSharp")
  }

  test("chunking: boundaries, overlap, short tail, empty text") {
    import graft.ops.Chunking
    val docs = Seq((1L, "a" * 500), (2L, "xy"), (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunkChars(docs, "doc_id", "text", size = 256, overlap = 32)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text"))).sortBy(c => (c._1, c._2))
    // doc 1: 500 chars, stride 224 -> chunks at 0, 224, 448 (tail 52 chars)
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1(0)._3.length == 256 && d1(1)._3.length == 256 && d1(2)._3.length == 52)
    // overlap property: chunk k+1 starts 224 chars after chunk k
    assert(d1(0)._3.substring(224) == d1(1)._3.substring(0, 32))
    // doc 2: shorter than size -> one short chunk; empty/null -> none
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("xy"))
    assert(!chunks.exists(c => c._1 == 3L || c._1 == 4L))
  }

  test("packing: per-key running-sum bins respect capacity boundaries") {
    import graft.ops.Chunking
    val d = Seq(("s1", 1L, 1000L), ("s1", 2L, 1000L), ("s1", 3L, 100L),
      ("s1", 4L, 3000L), ("s1", 5L, 10L), ("s2", 1L, 5L))
      .toDF("source", "doc_id", "n_tokens")
    val packed = Chunking.packBins(d, "source", "doc_id", "n_tokens", capacity = 2048L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset_tokens"))).toMap
    // cumsums in s1: 1000, 2000, 2100, 5100, 5110 -> prev: 0, 1000, 2000, 2100, 5100
    assert(packed(("s1", 1L)) == (0L, 0L))
    assert(packed(("s1", 2L)) == (0L, 1000L))    // straddles: stays in bin 0
    assert(packed(("s1", 3L)) == (0L, 2000L))    // prev 2000 < 2048: still bin 0
    assert(packed(("s1", 4L)) == (1L, 2100L))    // prev 2100 -> bin 1
    assert(packed(("s1", 5L)) == (2L, 5100L))    // prev 5100 -> bin 2
    assert(packed(("s2", 1L)) == (0L, 0L))       // independent key
  }

  test("contamination flags docs sharing benchmark n-grams; clean docs pass") {
    import graft.ops.Curation
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains the benchmark's first 8-gram verbatim inside other text
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix tail"),
      (2L, "completely different content with no overlap at all here okay"),
      (3L, "")).toDF("doc_id", "text")
    val out = Curation.contamination(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("contaminated"))).toMap
    assert(out(1L)._1 >= 1 && out(1L)._2 == 1L, s"doc 1 must be flagged: $out")
    assert(out(2L) == (0L, 0L), s"clean doc must pass: $out")
    assert(!out.contains(3L), "empty doc has no shingles, no row")
  }

  test("PII redaction masks emails and IPs and counts them") {
    import graft.ops.Curation
    val d = Seq((1L, "reach me at jane.doe+x@corp.example.org or 192.168.0.17 thanks"),
      (2L, "no pii here just 3.14 and words")).toDF("doc_id", "text")
    val out = Curation.redactPii(d, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "reach me at <EMAIL> or <IP> thanks")
    assert(out(2L) == (0L, 0L, "no pii here just 3.14 and words"),
      "a bare decimal must not be mistaken for an IP")
  }

  test("split assignment is deterministic, stateless, and roughly proportional") {
    import graft.ops.Sampling
    val ids = spark.range(0, 10000).toDF("id")
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val a = Sampling.assignSplit(ids, "id", splits).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val b = Sampling.assignSplit(ids, "id", splits).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(a == b, "same ids must always land in the same split")
    // statelessness: a subset's assignments are unchanged by the rest of
    // the data (the add-data-later-never-reassigns property)
    val sub = Sampling.assignSplit(ids.filter(col("id") < 100), "id", splits)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(sub.forall { case (k, v) => a(k) == v })
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 9000) < 300, s"train ~90%: $counts")
    assert(math.abs(counts("val") - 500) < 150 && math.abs(counts("test") - 500) < 150, s"$counts")
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 5000, "b" -> 4000))
    }
  }

  test("real audio decode: WAV roundtrip yields exact closed-form features") {
    val text = "Hello audio world 42"
    val media = Multimodal.asMediaAudio(
      Seq((1L, text), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.extractAudioFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // closed form: sample i = charAt(i % len) & 0xFF, centered at 128
    val k = Array.tabulate(256)(i => (text.charAt(i % text.length).toInt & 0xFF) - 128)
    val expRms = math.sqrt(k.map(x => x.toLong * x).sum.toDouble / (128.0 * 128.0) / 256)
    val expCross = (1 until 256).count(i => k(i) * k(i - 1) < 0).toLong
    assert(out(1L).n_samples == 256L, "WAV must decode back to all 256 samples")
    assert(out(1L).rms == expRms, s"rms ${out(1L).rms} != $expRms")
    assert(out(1L).zero_crossings == expCross)
    // empty text: all samples 0 -> centered -128 -> rms exactly 1, no crossings
    assert(out(2L).rms == 1.0 && out(2L).zero_crossings == 0L)
  }

  test("framed audio: per-frame closed forms over the decoded PCM slices") {
    val text = "frame analysis check: " * 20 // > 256 chars, wraps naturally
    val media = Multimodal.asMediaAudio(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.audioFrames(media, frameSize = 64, hop = 64)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 4 && frames.forall(_.n_samples == 64))
    val k = Array.tabulate(256)(i => (text.charAt(i % text.length).toInt & 0xFF) - 128)
    for (f <- 0 until 4) {
      val slice = k.slice(f * 64, f * 64 + 64)
      val expRms = math.sqrt(slice.map(x => x.toLong * x).sum.toDouble / (128.0 * 128.0) / 64)
      val expCross = (1 until 64).count(j => slice(j) * slice(j - 1) < 0).toLong
      assert(frames(f).rms == expRms, s"frame $f rms")
      assert(frames(f).zero_crossings == expCross, s"frame $f crossings")
    }
  }

  test("fast WAV encode/decode match the JDK codec byte-for-byte") {
    import javax.sound.sampled._
    val texts = Seq("", "a", "Hello audio world 42", "x" * 300,
      "éł mixed £", "frame analysis check: " * 20)
    for (t <- texts; n <- Seq(1, 64, 256)) {
      val fast = Multimodal.encodePcmWav(t, n)
      // reference encoder: the JDK writer over the same samples/format
      val len = t.length
      val data = Array.tabulate(n)(i =>
        (if (len == 0) 0 else t.charAt(i % len) & 0xFF).toByte)
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, baos)
      assert(java.util.Arrays.equals(fast, baos.toByteArray),
        s"container bytes differ for text='${t.take(20)}' n=$n")
      // fast RIFF walk == JDK decode of the same container
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(fast))
      val jdk = try ais.readAllBytes() finally ais.close()
      assert(java.util.Arrays.equals(
        Multimodal.decodeCanonicalPcmWav(fast), jdk))
    }
    // non-canonical containers are refused by the fast path (the
    // AudioSystem fallback decides for them, so behavior is unchanged)
    val fmt16 = new AudioFormat(8000f, 16, 1, true, false)
    val baos16 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt16, 32L),
      AudioFileFormat.Type.WAVE, baos16)
    assert(Multimodal.decodeCanonicalPcmWav(baos16.toByteArray) == null)
    assert(Multimodal.decodeCanonicalPcmWav(
      "not a wav at all, just text....................".getBytes) == null)
  }

  test("multimodal plumbing: features + frame samples are deterministic") {
    val media = Multimodal.asMedia(docs.filter(col("doc_id") =!= 5L), "doc_id", "text", "image")
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 4)
    assert(feats(1L).checksum == feats(2L).checksum) // same payload
    assert(feats(1L).brightness > 0 && feats(1L).brightness <= 1.0)
    val frames = Multimodal.sampleFrames(media, strideBytes = 16).collect()
    assert(frames.nonEmpty)
    val again = Multimodal.sampleFrames(media, strideBytes = 16).collect()
    assert(frames.map(_.frame_checksum).sorted.toSeq == again.map(_.frame_checksum).sorted.toSeq)
  }

  test("global row number equals the single-partition window, deterministically") {
    import graft.ops.Indexing
    // deliberately unsorted, >1 value per partition, duplicate-free key
    val df = spark.range(0, 1000).select(
      ((col("id") * 7919) % 1000).as("k"), col("id").as("v"))
    val got = Indexing.globalRowNumber(df, Seq("k"), numPartitions = Some(7))
      .orderBy("k").collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("rn")))
    assert(got.map(_._1).toSeq == (0L until 1000L).toSeq) // k is a permutation
    assert(got.map(_._2).toSeq == (1L to 1000L).toSeq, "gap-free 1..N by k order")
    val again = Indexing.globalRowNumber(df, Seq("k"), numPartitions = Some(7))
      .orderBy("k").collect().map(r => r.getAs[Long]("rn"))
    assert(again.toSeq == (1L to 1000L).toSeq)
  }

  test("interval join: inclusive start, exclusive end, multi-bucket spans, negatives") {
    import graft.ops.Temporal
    val facts = Seq((1L, 0L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, -15L),
      (6L, 500L)).toDF("k", "pos").withColumn("g", lit("a"))
    val intervals = Seq(
      ("a", 0L, 100L, "first"),    // spans buckets 0..3 at bucketSize 30
      ("a", 100L, 200L, "second"),
      ("a", -30L, 0L, "neg"),      // negative-position interval
      ("a", 300L, 300L, "empty")   // empty: matches nothing
    ).toDF("g", "lo", "hi", "label")
    val out = Temporal.intervalJoin(facts, intervals, Seq("g"),
        "pos", "lo", "hi", bucketSize = 30L,
        payload = Seq("label" -> "label"))
      .select(col("k"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "first", 2L -> "first", 3L -> "first",
      4L -> "second", 5L -> "neg")) // 6 (pos 500) matches nothing
  }

  test("large-star/small-star CC: chain, forest, and random graph match label propagation") {
    import graft.ops.Dedup.{connectedComponents, connectedComponentsStar}
    def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // chain 1-2-...-12: diameter 11 stresses round count; all -> 1
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainGot = labels(connectedComponentsStar(chain))
    assert(chainGot == (1L to 12L).map(i => (i, 1L)).toSet)
    // two components + a pair
    val forest = Seq((10L, 20L), (20L, 30L), (50L, 40L), (7L, 8L))
      .toDF("id_a", "id_b")
    assert(labels(connectedComponentsStar(forest)) ==
      labels(connectedComponents(forest, maxIter = 20)))
    // deterministic pseudo-random graph: 300 edges over 100 nodes (LCG)
    var seed = 123456789L
    def nxt(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); math.abs(seed) }
    val rand = (1 to 300).map { _ => (nxt() % 100, nxt() % 100) }
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    assert(labels(connectedComponentsStar(rand)) ==
      labels(connectedComponents(rand, maxIter = 30)))
  }

  test("repetition metrics: hand-computed ppm on a repetitive doc; clean doc low") {
    // "ab cd ab cd ab cd" (17 chars): 2-gram counts -> "ab cd":3, "cd ab":2
    // top2 = 1e6*3*5/17 = 882352; dup5: 5-grams "ab cd ab cd ab":2? no —
    // 5-grams: [ab cd ab cd ab](1), [cd ab cd ab cd](1) ... wait 6 tokens
    // -> two 5-grams, distinct -> dup5 = 0. Use an 8-token doc instead.
    val d = Seq(
      (1L, "ab cd ab cd ab cd ab cd"),             // 23 chars, 8 tokens
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: top 2-gram "ab cd" count 4, len 5 -> 1e6*4*5/23 = 869565
    assert(m(1L).getAs[Long]("top2_ppm") == 1000000L * 4 * 5 / 23)
    // 5-grams of doc 1: "ab cd ab cd ab" x2, "cd ab cd ab cd" x2 ->
    // dup chars = 2*14 + 2*14 = 56 -> 1e6*56/23
    assert(m(1L).getAs[Long]("dup5_ppm") == 1000000L * 56 / 23)
    // clean doc: every 2-gram unique -> top2 covers exactly one occurrence
    val top2 = m(2L).getAs[Long]("top2_ppm")
    assert(top2 > 0 && top2 < 300000, s"unique-2gram doc should be low: $top2")
    assert(m(2L).getAs[Long]("dup5_ppm") == 0L)
    assert(m(3L).getAs[Long]("top2_ppm") == 0L) // empty text -> all zero
  }

  test("repetition tie-break: equal-count top n-gram resolves lexicographically") {
    // "zz yy zz yy" : "zz yy":2? no — 2-grams: [zz yy],[yy zz],[zz yy] ->
    // "zz yy":2 beats "yy zz":1. Build a genuine tie instead:
    // "b a b c b a b c" has "b a":2, "a b":2, "b c":2, "c b":1 — tie on 2
    // between "a b", "b a", "b c" -> lexicographically smallest "a b" wins
    val d = Seq((1L, "b a b c b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d).collect()(0)
    // "a b" count 2, len 3, total 15 -> 1e6*2*3/15 = 400000
    assert(r.getAs[Long]("top2_ppm") == 400000L)
  }

  test("bm25 key terms: distinctive rare term outranks common term") {
    val d = Seq(
      (1L, "spark spark catalyst common common common"),
      (2L, "common words appear here common"),
      (3L, "other doc with common words")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25KeyTerms(d, topK = 2).collect()
    val doc1 = out.filter(_.getAs[Long]("doc_id") == 1L).sortBy(_.getAs[Long]("rank"))
    // "spark" (tf 2, df 1) must beat "common" (tf 3, df 3): idf dominates
    assert(doc1.head.getAs[String]("term") == "spark", doc1.mkString(","))
    assert(doc1.head.getAs[Long]("df") == 1L)
    assert(doc1.head.getAs[Long]("tf") == 2L)
    // deterministic: rerun yields identical rows
    val again = TextAnalysis.bm25KeyTerms(d, topK = 2).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // every doc produces exactly topK rows (>= topK distinct terms each)
    assert(out.groupBy(_.getAs[Long]("doc_id")).forall(_._2.length == 2))
  }

  test("image dHash near-dup: re-uploads at distance 0, one-pixel edits within 2 bits") {
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far"
    // pixel 10 drops from 'b' (98) below its left neighbor ' ' (32), so
    // the p[9] > p[10] comparison — dHash bit 9 — is guaranteed to flip
    val edited = base.updated(10, '\t').toString
    val frame = Seq(
      (1L, base), (2L, base), // byte-identical re-upload
      (3L, edited),           // one-pixel edit -> 1..2 dHash bits
      (4L, "zzz completely different pixels come from this other unrelated text")
    ).toDF("doc_id", "text")
    val hashes = Multimodal.imageDHash(
      Multimodal.asMediaImages(frame, "doc_id", "text"))
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == byId(2L))
    val d13 = java.lang.Long.bitCount(byId(1L) ^ byId(3L))
    assert(d13 >= 1 && d13 <= 2, s"edit distance $d13")
    val pairs = Dedup.simhashCandidates(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) == d13)
  }

  test("record linkage: every dirty nation links back to its true clean row") {
    val clean = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"))
    val dirty = clean.select((col("id") + 1000L).as("id"),
      regexp_replace(col("name"), "_", "").as("name"))
    val m = graft.ops.Linkage
      .bestMatch(dirty, clean, "id", "name", n => substring(n, -1, 1), 0.85)
      .collect().map(r => r.getAs[Long]("left_id") -> r.getAs[Long]("right_id"))
      .toMap
    // the true counterpart must win every block (ratio 0.93 beats the
    // 0.875 same-last-digit decoys), for all 25 records
    assert(m.size == 25 && m.forall { case (l, r) => l == r + 1000L }, m.toString)
  }

  test("audio energy hash: re-encodes at distance 0, local edits within 2 bits") {
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far"
    // sample 10 moves from 'b' (98) to tab (9): only frame 2's integer
    // energy changes, so at most its two adjacent comparisons flip
    val edited = base.updated(10, '\t').toString
    val frame = Seq((1L, base), (2L, base), (3L, edited),
      (4L, "zzz completely different waveform comes from this other unrelated text")
    ).toDF("doc_id", "text")
    val hashes = Multimodal.audioEnergyHash(
      Multimodal.asMediaAudio(frame, "doc_id", "text"))
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == byId(2L))
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(3L)) <= 2)
    val pairs = Dedup.simhashCandidates(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)))
  }

  test("corpus frequency score: common-token docs outscore rare-token docs") {
    val d = Seq((1L, "a a a"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    // corpus counts: a=4, b=1, z=1
    val m = TextAnalysis.corpusFreqScore(d).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"), r.getAs[Long]("freq_sum"))))
      .toMap
    assert(m(1L) == ((3L, 12L))) // 3 occurrences of 'a', each c=4
    assert(m(2L) == ((2L, 5L)))  // 4 + 1
    assert(m(3L) == ((1L, 1L)))  // the rare-token doc scores lowest
  }

  test("keepBest: best-scored representative per group, singletons survive") {
    val corpus = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L))
      .toDF("doc_id", "score")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "component")
    val kept = Dedup.keepBest(corpus, labels, "doc_id", "score")
      .orderBy("component")
      .collect().map(r => (r.getAs[Long]("component"), r.getAs[Long]("doc_id")))
    // group {1,2,3}: score tie 30 between 2 and 3 -> min id 2 wins;
    // doc 4 is unlabeled -> its own singleton group
    assert(kept.toSeq == Seq((1L, 2L), (4L, 4L)))
  }

  test("incremental dedup: bloom pre-filter is exactness-preserving vs plain anti-join") {
    // deliberately undersized, high-fpp filter (expected 10 items for 50
    // distinct fps at fpp 0.5) so the maybe-branch carries false
    // positives — the confirm join must still produce the exact result
    val corpus = (0L until 200L).map(i => (i, s"fp${i % 50}")).toDF("id", "fp")
    val batch = (0L until 300L).map(i => (1000L + i, s"fp$i")).toDF("id", "fp")
    val got = graft.ops.Curation
      .incrementalNew(batch, corpus, "fp", expectedCorpusRows = 10, fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = batch.join(corpus.select("fp").distinct(), Seq("fp"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(got.size == 250) // fp0..fp49 are known; fp50..fp299 are new
  }

  test("indexed incremental dedup: exact result, index side joins without re-shuffle") {
    val corpus = (0L until 200L).map(i => (i, s"fp${i % 50}")).toDF("id", "fp")
    val batch = (0L until 300L).map(i => (1000L + i, s"fp$i")).toDF("id", "fp")
    graft.ops.Curation.writeFingerprintIndex(corpus, "fp", "fp_index_spec", numBuckets = 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = graft.ops.Curation.incrementalNewIndexed(batch, "fp", "fp_index_spec")
      val got = res.collect().map(_.getAs[Long]("id")).sorted.toSeq
      val want = batch.join(corpus.select("fp").distinct(), Seq("fp"), "left_anti")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want)
      // the 10^10-regime contract: the bucketed index satisfies the join's
      // distribution by layout, so the only Exchange in the final plan is
      // the batch side (broadcast disabled so the pinned shape is the SMJ
      // the real scale would use, not a small-data broadcast special case)
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(ln =>
        ln.contains("Exchange") && !ln.contains("ReusedExchange"))
      assert(exchanges == 1, s"expected batch-side-only exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS fp_index_spec")
    }
  }

  test("semantic dedup: twins drop to their smaller-id base, bases all survive") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val perturbed = e.filter(col("vec_id") < 10).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x * 1.05f).otherwise(x)).as("embedding"))
    val corpus = e.unionByName(perturbed)
    val out = Similarity.semanticDedup(corpus, threshold = 0.95,
      k = 4, iters = 2, maxCluster = 4096)
    val kept = out.collect().map(_.getLong(0)).toSet
    val baseIds = e.collect().map(_.getLong(0)).toSet
    // base vectors have no natural near-dups (max pairwise cosine ~0.5),
    // so every base survives; each twin has its base as a smaller-id
    // near-dup in the same cluster, so every twin drops
    assert(kept == baseIds, s"kept ${kept.size}, expected ${baseIds.size} bases; " +
      s"twins kept: ${kept.filter(_ >= 100000)}")
    // deterministic end to end (fit, assignment, pair scan)
    val again = Similarity.semanticDedup(corpus, threshold = 0.95,
      k = 4, iters = 2, maxCluster = 4096).collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("PQ: ADC search puts an injected exact duplicate at rank 1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // exact copies of the query vectors under new ids: a copy's codes are
    // its query's per-subspace argmin codewords, so its ADC distance is
    // the minimal achievable LUT sum -> rank 1 (ties impossible here:
    // base vectors are mutually far, so no other vector shares the
    // minimal distance in every subspace)
    val dup = e.filter(col("vec_id") < 10).select(
      (col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = e.unionByName(dup)
    val out = Similarity.pqTopK(corpus, e.filter(col("vec_id") < 10),
        k = 5, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("adist"), r.getAs[Int]("rank")))
    val rank1 = out.filter(_._4 == 1).map(t => t._1 -> (t._2, t._3)).toMap
    for (q <- 0L until 10L) {
      val (cid, _) = rank1(q)
      assert(cid == q + 100000, s"query $q rank-1 was $cid")
    }
    // codes: m rows per vector, every code is a seed-derived codeword id
    val books = Similarity.pqFit(corpus, m = 4, ksub = 16)
    val bookIds = books.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val codes = Similarity.pqEncode(corpus, books, m = 4)
    assert(codes.count() == corpus.count() * 4)
    val codeIds = codes.select("code").distinct().collect().map(_.getLong(0)).toSet
    assert(codeIds.subsetOf(bookIds))
    // deterministic end to end
    val again = Similarity.pqTopK(corpus, e.filter(col("vec_id") < 10),
        k = 5, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("rank")))
    assert(again.toSeq == out.map(t => (t._1, t._2, t._4)).toSeq)
  }

  test("intCosRankKey orders exactly like double cosine on non-boundary data") {
    import graft.functions.{intCosRankKey, q24Vec, cosineSimilarity}
    // deterministic pseudo-random vectors, including negative-cosine and
    // near-parallel pairs; gaps in cos^2 are ~1e-2 .. 1e-5, far above the
    // key's 1e-12 resolution, so orderings must agree EXACTLY
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 60L).map { i =>
      (i, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = df.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        intCosRankKey(q24Vec(col("qv")), q24Vec(col("cv"))).as("ikey"),
        cosineSimilarity(col("qv"), col("cv")).as("cos"))
      .collect()
    scored.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byKey = rows.sortBy(r => (-r.getLong(2), r.getLong(1))).map(_.getLong(1)).toSeq
      val byCos = rows.sortBy(r => (-r.getDouble(3), r.getLong(1))).map(_.getLong(1)).toSeq
      assert(byKey == byCos, "integer key ordering diverged from cosine ordering")
    }
    // sign correctness: key is negative exactly when cosine is
    scored.foreach { r =>
      assert((r.getLong(2) < 0) == (r.getDouble(3) < 0), s"sign mismatch: $r")
    }
    // top-of-budget regression: dim 64, every |component| = 1 puts
    // dot^2 at the documented maximum 2^108 ~ 3.2e32, where a 10^6 limb
    // base overflowed DECIMAL(38,0) and silently nulled the key (the
    // 10^4 three-limb form stays inside the budget). Parallel all-ones
    // vectors: cos = 1 exactly -> key must be exactly 10^12.
    val ones = Seq((0L, Seq.fill(64)(1.0f)), (1L, Seq.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val topKey = ones.as("a").join(ones.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(intCosRankKey(q24Vec(col("a.embedding")),
        q24Vec(col("b.embedding"))).as("k"))
      .head()
    assert(!topKey.isNullAt(0), "key overflowed to null at the budget top")
    assert(topKey.getLong(0) == 1000000000000L)
  }

  test("PQ stored index: search touches tables only, equals in-flight search") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    try {
      Similarity.pqIndexWrite(e, "pq_idx_spec", m = 4, ksub = 16, numBuckets = 8)
      // queries as an in-memory frame so the ONLY possible file scans in
      // the search plan are the stored index tables
      val qRows = e.filter(col("vec_id") < 10).collect().toSeq
      val q = spark.createDataFrame(
        spark.sparkContext.parallelize(qRows, 1), e.schema)
      val viaIndex = Similarity.pqSearchIndexed(spark, "pq_idx_spec", q,
        k = 5, m = 4)
      val direct = Similarity.pqTopK(e, e.filter(col("vec_id") < 10),
        k = 5, m = 4, ksub = 16)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Long]("adist"), r.getAs[Int]("rank"))).toSet
      assert(rows(viaIndex) == rows(direct),
        "stored-index search must replay the in-flight index exactly")
      // plan pin: the 100 TB contract — the search never scans the raw
      // embedding corpus, only the persisted code/book tables
      val p = viaIndex.queryExecution.executedPlan.toString
      assert(p.contains("pq_idx_spec_codes"),
        s"search must read the stored code table:\n$p")
      assert(!p.toLowerCase.contains("embeddings"),
        s"search plan must not scan the raw corpus:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS pq_idx_spec_codes")
      spark.sql("DROP TABLE IF EXISTS pq_idx_spec_books")
    }
  }

  test("PQ recall@10: ADC regression floor; two-stage re-rank recovers to ~0.96") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 50)
    def topSets(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val bf = topSets(Similarity.bruteForceTopK(e, q, 10))
    def recallOf(m: Map[Long, Set[Long]]) = bf.keys.toSeq.map(k =>
      (m.getOrElse(k, Set.empty) & bf(k)).size.toDouble / 10).sum / bf.size
    // ADC-only: iid unit vectors are near-incompressible, so the coarse
    // 4x16 quantizer's recall is intrinsically low (~0.17 here, matching
    // an independent numpy replay of the same geometry) — the floor only
    // catches a silent metric/encode regression
    val adc = recallOf(topSets(Similarity.pqTopK(e, q, 10, m = 4, ksub = 16)))
    info(f"ADC-only recall@10 = $adc%.3f")
    assert(adc >= 0.10, f"ADC recall collapsed: $adc%.3f")
    // the production contract is the two-stage shape: ADC shortlist +
    // exact re-rank recovers recall while the exact kernel touches only
    // shortlist-many vectors per query (measured 0.96 at this geometry)
    val rr = recallOf(topSets(
      Similarity.pqTopKRerank(e, q, 10, m = 8, ksub = 32, shortlist = 200)))
    info(f"rerank recall@10 = $rr%.3f")
    assert(rr >= 0.85, f"rerank recall collapsed: $rr%.3f")
  }

  test("mixture weights: binding domain saturates at 1.0, others hit target shares") {
    val rows = Seq(("en", 600L), ("en", 600L), ("de", 300L), ("fr", 100L))
      .toDF("lang", "toks")
    // totals en=1200, de=300, fr=100; budgets 1200/.5=2400, 300/.25=1200,
    // 100/.25=400 -> binding budget 400
    val out = graft.ops.Curation.mixtureWeights(rows, "lang", "toks",
        Seq("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(out("fr") == (100L, 1.0)) // binding domain: keep everything
    assert(out("en") == (1200L, 0.5 * 400 / 1200.0))
    assert(out("de") == (300L, 0.25 * 400 / 300.0))
    // resulting mixture is exactly on target: share_d*B tokens per domain
    val mixed = out.map { case (d, (t, r)) => d -> t * r }
    assert(math.abs(mixed.values.sum - 400.0) < 1e-9)
    assert(math.abs(mixed("en") / 400.0 - 0.5) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Curation.mixtureWeights(rows, "lang", "toks",
        Seq("en" -> 0.5, "de" -> 0.25))
    }
  }

  test("applyMixture: deterministic hash draw replays the rate thresholds") {
    import graft.ops.Curation
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "a" else if (i % 3 == 0) "b" else "c"))
      .toDF("doc_id", "dom")
    val weights = Seq(("a", 1.0), ("b", 0.5)).toDF("domain", "rate")
    val kept = Curation.applyMixture(docs, "dom", "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rate_q20")).toMap
    def draw(id: Long): Long =
      java.lang.Math.floorMod(Dedup.fnv1a(id.toString), 1048576L)
    // rate 1.0 -> threshold 2^20: every 'a' row survives
    assert((2L to 400L by 2).forall(kept.contains))
    assert((2L to 400L by 2).forall(i => kept(i) == 1048576L))
    // rate 0.5 -> exactly the rows whose draw clears floor(.5*2^20+.5)
    val bIds = (1L to 400L).filter(i => i % 2 != 0 && i % 3 == 0)
    assert(bIds.filter(kept.contains) == bIds.filter(draw(_) < 524288L))
    // 'c' has no target share -> rate 0 by omission, no rows
    assert(kept.keys.forall(i => i % 2 == 0 || i % 3 == 0))
  }

  test("kmeans stats with iters=1 assemble to exactly the IVF fit centroids") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaKmeans = keyed(Similarity.assembleQCentroids(
      Similarity.kmeansFitStats(e, k = 16, iters = 1)))
    val viaIvf = keyed(Similarity.ivfFit(e, nCentroids = 16))
    assert(viaKmeans == viaIvf)
    // the integer centroids sit on the q24 grid: |component| < 2^25 for
    // unit-norm input, so every downstream BIGINT distance is exact
    assert(viaIvf.values.flatten.forall(q => math.abs(q) < (1L << 25)))
    // a second iteration must keep every quantized stat integral and
    // cluster sizes summing to the corpus
    val s2 = Similarity.kmeansFitStats(e, k = 16, iters = 2)
    val perCent = s2.groupBy("cent_id").agg(max("n").as("n"))
      .collect().map(_.getAs[Long]("n")).sum
    assert(perCent == e.count())
  }

  test("quantile filter cuts at the exact sketch threshold, monotone in q") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    // values < 2^7 sit in exact singleton buckets: p25 rank = ceil(.25*100)
    // = 25 -> threshold 25 -> survivors are exactly 25..100
    val kept = graft.ops.Quantile.filterAtQuantile(df, "v", 250000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (25L to 100L).toSet)
    assert(graft.ops.Quantile.filterAtQuantile(df, "v", 1L).count() == 100)
    assert(graft.ops.Quantile.filterAtQuantile(df, "v", 900000L).count() == 11)
  }

  test("global running sum equals the single-partition window; budget cut exact") {
    val df = (1L to 1000L).map(i => (i, (i * 7) % 13 + 1)).toDF("id", "v")
    val got = graft.ops.Indexing
      .globalRunningSum(df, Seq(col("id").asc), "v", "cum")
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(Long.MinValue, 0)
    val want = df.withColumn("cum", sum("v").over(w))
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
    assert(got.toSeq == want.toSeq)
    // budget selection keeps the exact prefix in rank order
    val sel = graft.ops.Curation.selectUnderBudget(
      df.withColumnRenamed("v", "n_tokens").withColumn("rank", col("id")),
      "id", "n_tokens", "rank", budgetTokens = 50L)
    val kept = sel.orderBy(org.apache.spark.sql.functions.desc("rank"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens")))
    assert(kept.nonEmpty && kept.last._2 <= 50L &&
      kept.map(_._1).toSeq == kept.map(_._1).sorted.reverse.toSeq)
  }

  test("lineDedup drops corpus-frequent lines, keeps order, preserves all docs") {
    import graft.ops.Curation
    val corpus = Seq(
      (1L, "cookie banner\nunique alpha\nall rights reserved"),
      (2L, "cookie banner\nunique beta\nall rights reserved"),
      (3L, "unique gamma\ncookie banner"),
      (4L, "cookie banner\nall rights reserved"), // all lines boilerplate
      (5L, "solo document with one line")
    ).toDF("doc_id", "text")
    val out = Curation.lineDedup(corpus, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_lines_kept"), r.getAs[Long]("n_lines_dropped"))).toMap
    assert(out.size == 5) // every doc keeps its row
    assert(out(1L) == (("unique alpha", 3L, 1L, 2L)))
    assert(out(2L) == (("unique beta", 3L, 1L, 2L)))
    assert(out(3L) == (("unique gamma", 2L, 1L, 1L)))
    assert(out(4L) == (("", 2L, 0L, 2L))) // fully-boilerplate doc survives as ''
    assert(out(5L) == (("solo document with one line", 1L, 1L, 0L)))
    // order preservation with an interleaved boilerplate line
    val ord = Curation.lineDedup(Seq(
      (1L, "a\nx\nb\nx\nc"), (2L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(ord(1L) == "a\nb\nc")
    assert(ord(2L) == "")
  }

  test("pageRank: integer ranks replay a hand-rolled reference exactly") {
    import graft.ops.Graph
    // diamond with a back edge: a->b, a->c, b->d, c->d, d->a
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))
      .toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iterations = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank")).toMap
    val adj = Map("a" -> Seq("b", "c"), "b" -> Seq("d"), "c" -> Seq("d"),
      "d" -> Seq("a"))
    val nodes = Seq("a", "b", "c", "d")
    val scale = 1000000000000L
    val base = scale * 15 / 100 / nodes.length
    var r = nodes.map(_ -> scale / nodes.length).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map(v => v -> adj.toSeq.collect {
        case (u, outs) if outs.contains(v) => r(u) / outs.size
      }.sum).toMap
      r = nodes.map(v => v -> (base + 85L * in(v) / 100L)).toMap
    }
    assert(got == r)
    // hub (d: two in-edges) must outrank the spokes
    assert(got("d") > got("b") && got("b") == got("c"))
  }

  test("countMin sketch: mass conserved per row, est >= exact, cells replayable") {
    import graft.ops.Frequency
    val depth = 4; val width = 64
    val data = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma", null.asInstanceOf[String])
    val items = data.toDF("term")
    val sketch = Frequency.countMinSketch(items, "term", depth, width)
    // each sketch row holds the full non-null item mass
    val mass = sketch.groupBy("r").agg(sum("cnt").as("m")).collect()
    assert(mass.length == depth && mass.forall(_.getAs[Long]("m") == 9L))
    // independent replay of the counter matrix from the cell definition
    def cell(r: Int, s: String): Long =
      java.lang.Math.floorMod(Dedup.fnv1a(s"$r:$s"), width.toLong)
    val refCnt: Map[(Int, Long), Long] = data.filter(_ != null)
      .flatMap(s => (0 until depth).map(r => (r, cell(r, s))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = sketch.collect().map(r =>
      (r.getAs[Int]("r"), r.getAs[Long]("cell")) -> r.getAs[Long]("cnt")).toMap
    assert(got == refCnt)
    // estimates: one-sided error, exact value replayed via min over cells
    val queries = Seq("alpha", "beta", "gamma", "absent").toDF("term")
    val est = Frequency.countMinEstimate(sketch, queries, "term", depth, width)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("cm_est")).toMap
    val exact = Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L)
    for ((t, n) <- exact) {
      assert(est(t) >= n, s"$t: est ${est(t)} < exact $n")
      val want = (0 until depth).map(r => refCnt.getOrElse((r, cell(r, t)), 0L)).min
      assert(est(t) == want, s"$t: est ${est(t)} != replay $want")
    }
  }

  test("invertedIndex: paged postings with df/cf, hand-checked") {
    import graft.ops.Indexing
    val corpus = Seq((1L, "a b a"), (2L, "a b"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = Indexing.invertedIndex(corpus, "doc_id", "text", blockSize = 2)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("block")) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"),
          r.getAs[Long]("n_block"), r.getAs[String]("postings")))).toMap
    assert(out.size == 3)
    assert(out(("a", 0L)) == ((3L, 4L, 2L, "1:2,2:1")))
    assert(out(("a", 1L)) == ((3L, 4L, 1L, "3:1"))) // paged at blockSize
    assert(out(("b", 0L)) == ((2L, 2L, 2L, "1:1,2:1")))
    // no block ever exceeds the page size on a larger corpus
    val big = (1L to 300L).map(i => (i, "common word" + (i % 7))).toDF("doc_id", "text")
    val blocks = Indexing.invertedIndex(big, "doc_id", "text", blockSize = 64)
    assert(blocks.agg(max("n_block")).head().getLong(0) <= 64L)
    // "common" df=300 -> ceil(300/64)=5 pages, in order
    assert(blocks.filter(col("term") === "common").count() == 5)
  }

  test("importanceScore: target-like docs rank higher; delta is the pass difference") {
    val corpus = Seq((1L, "x y x y x y"), (2L, "p q p q p q"),
      (3L, "")).toDF("doc_id", "text")
    val target = Seq((10L, "x y x y x y x y")).toDF("doc_id", "text")
    val out = TextAnalysis.importanceScore(corpus, target)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("self_mbits"),
          r.getAs[Long]("target_mbits"), r.getAs[Long]("delta_mbits")))).toMap
    assert(out.size == 3)
    // doc1's bigrams are the target model's whole mass -> cheap under the
    // target, so its delta must beat doc2, whose bigrams the target never saw
    assert(out(1L)._4 > out(2L)._4,
      s"target-like doc must outrank: ${out(1L)} vs ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L, 0L)))
    // delta is exactly the difference of the two explicit surprisal passes
    val self = TextAnalysis.ngramLmSurprisal(corpus)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("avg_mbits")).toMap
    val tgt = TextAnalysis.ngramLmSurprisal(corpus, model = Some(target))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("avg_mbits")).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(out(id)._4 == self(id) - tgt(id))
  }

  test("HLL: register replay, merge-by-max, raw estimate in expected error band") {
    import graft.ops.Frequency
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("k"))
    val full = Frequency.hllSketch(li, "k", p = 8)
    def regs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("register") -> r.getAs[Long]("max_rho")).toMap
    val got = regs(full)
    // independent per-key replay of the register definition: fnv1a +
    // splitmix64 finalizer (63-bit), rho over the 55 post-register bits
    val want = li.distinct().collect().map(_.getString(0)).map { s =>
      val h = Dedup.permute(Dedup.fnv1a(s), 0x9e3779b97f4a7c15L, 0L)
      val w = h >>> 8
      val bl = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
      (h % 256L) -> (55 - bl + 1).toLong
    }.groupBy(_._1).map { case (r, v) => r -> v.map(_._2).max }
    assert(got == want)
    // mergeability: union of arbitrary split halves max-merges to the full sketch
    val h1 = Frequency.hllSketch(li.filter(length(col("k")) % 2 === 0), "k", p = 8)
    val h2 = Frequency.hllSketch(li.filter(length(col("k")) % 2 === 1), "k", p = 8)
    val merged = h1.unionByName(h2).groupBy("register")
      .agg(max("max_rho").as("max_rho"))
    assert(regs(merged) == got)
    // raw estimator: 2^8 registers -> ~1.04/16 = 6.5% stderr; 15% is >2 sigma
    val est = Frequency.hllEstimate(full, p = 8).head()
    val exact = li.distinct().count()
    assert(est.getAs[Long]("m") == 256L)
    val n = est.getAs[Long]("n_est")
    assert(math.abs(n - exact).toDouble / exact < 0.15, s"est $n vs exact $exact")
    // p != 8 must stay sane: at p=4, rho can reach 63-4+1 = 60 > 56, so a
    // fixed K=56 scale would shift negatively (BigInt floors to 0 and the
    // harmonic term vanishes) — K derives from p; the wider-variance
    // 2^4-register estimate still lands within ~3 sigma (1.04/4 ~ 26%)
    val est4 = Frequency.hllEstimate(
      Frequency.hllSketch(li, "k", p = 4), p = 4).head()
    assert(est4.getAs[Long]("m") == 16L)
    val n4 = est4.getAs[Long]("n_est")
    assert(math.abs(n4 - exact).toDouble / exact < 0.8, s"p=4 est $n4 vs $exact")
  }

  test("spanDedup removes duplicated k-gram spans, keeps unique remainder") {
    import graft.ops.Curation
    // docs 1 and 2 share the 5-token span "a b c d e" embedded in
    // otherwise-distinct text; doc 3 repeats a span within itself;
    // doc 4 is shorter than k; doc 5 is entirely one shared span
    val corpus = Seq(
      (1L, "p q a b c d e r s"),
      (2L, "x y z a b c d e w"),
      (3L, "m n o t u m n o t u filler1 filler2"),
      (4L, "tiny doc"),
      (5L, "a b c d e")
    ).toDF("doc_id", "text")
    val out = Curation.spanDedup(corpus, "doc_id", "text", k = 5, minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_dup_windows")))).toMap
    assert(out.size == 5)
    // shared span "a b c d e" is removed from BOTH carriers, rest kept
    assert(out(1L) == (("p q r s", 9L, 4L, 5L, 1L)))
    assert(out(2L) == (("x y z w", 9L, 4L, 5L, 1L)))
    // self-repeat counts toward minCount: both "m n o t u" occurrences go
    assert(out(3L) == (("filler1 filler2", 12L, 2L, 10L, 2L)))
    // shorter than k: no windows, untouched
    assert(out(4L) == (("tiny doc", 2L, 2L, 0L, 0L)))
    // fully-duplicated doc survives as '' (row preserved)
    assert(out(5L) == (("", 5L, 0L, 5L, 1L)))
    // overlapping duplicated windows merge their coverage (no double-drop)
    val ov = Curation.spanDedup(Seq(
      (1L, "a b c d e f keepme1"), (2L, "a b c d e f keepme2")
    ).toDF("doc_id", "text"), "doc_id", "text", k = 5, minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_dup_windows")))).toMap
    // windows [a..e] and [b..f] both duplicated -> covered union a..f
    assert(ov(1L) == (("keepme1", 6L, 2L)))
    assert(ov(2L) == (("keepme2", 6L, 2L)))
  }

  test("applyLinearModel: integer logit replays the hashing-trick sum") {
    val dim = 64
    val weights = Array.tabulate(dim)(j => (j % 7).toLong - 3L)
    val corpus = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.applyLinearModel(corpus, "doc_id", "text", weights, intercept = 5L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("logit"), r.getAs[Long]("label"))).toMap
    def w(tok: String): Long =
      weights(java.lang.Math.floorMod(Dedup.fnv1a(tok), dim.toLong).toInt)
    assert(out(1L) == ((3L, 5L + 2 * w("alpha") + w("beta"), if (5L + 2 * w("alpha") + w("beta") >= 0) 1L else 0L)))
    assert(out(2L) == ((1L, 5L + w(""), if (5L + w("") >= 0) 1L else 0L))) // empty text = one empty token
    assert(out(3L) == ((0L, 5L, 1L))) // null text: intercept only
  }

  test("ngramLmSurprisal: whole-bit add-one bigram surprisal, hand-checked") {
    // corpus bigrams: (a,b) x3 [doc1 twice, doc2 once], (b,a) x1;
    // contexts: a->3, b->1; vocab {a, b, '', x} -> V=4
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, ""),
      (4L, "x"), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmSurprisal(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_bits"),
          r.getAs[Long]("avg_mbits")))).toMap
    // (a,b): num=3+1=4 (3 bits), den=3+4=7 (3 bits) -> 0 bits
    // (b,a): num=1+1=2 (2 bits), den=1+4=5 (3 bits) -> 1 bit
    assert(out(1L) == ((3L, 1L, 333L))) // (a,b),(b,a),(a,b) -> 0+1+0
    assert(out(2L) == ((1L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L))) // one empty token, no bigram
    assert(out(4L) == ((0L, 0L, 0L)))
    assert(out(5L) == ((0L, 0L, 0L))) // null text behaves as empty
    assert(out.size == 5)
  }

  test("stratified sample membership equals the stateless hash rule") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = graft.ops.Sampling
      .stratifiedSample(docs, "doc_id", "lang", Seq("en" -> 2000), defaultBp = 8000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.select(col("doc_id"), col("lang"),
        pmod(xxhash64(col("doc_id")), lit(10000L)).as("b")).collect()
      .filter(r => r.getLong(2) < (if (r.getString(1) == "en") 2000L else 8000L))
      .map(_.getLong(0)).toSet
    assert(kept == want)
    assert(kept.nonEmpty && kept.size < docs.count())
  }
}
