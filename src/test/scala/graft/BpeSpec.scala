package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tokenize

/** BPE trainer/encoder: pinned against the committed Python-reference
  * fixtures (scripts/gen_bpe_fixture.py) and a sequential in-test
  * reference on randomized corpora. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- sequential reference (independent of the ops code paths) ----

  private def seqStats(vocab: Seq[(List[String], Long)])
      : Map[(String, String), Long] =
    vocab.flatMap { case (t, f) =>
      t.zip(t.tail).map(p => p -> f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def seqMerge(toks: List[String], p: (String, String)): List[String] =
    toks match {
      case a :: b :: rest if (a, b) == p => (a + b) :: seqMerge(rest, p)
      case a :: rest => a :: seqMerge(rest, p)
      case Nil => Nil
    }

  private def seqTrain(freqs: Map[String, Long], numMerges: Int,
      minFreq: Long): Seq[(Int, String, String, Long)] = {
    var vocab = freqs.toSeq.sortBy(_._1)
      .map { case (w, f) => (w.toList.map(_.toString), f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var go = true
    while (go && rank < numMerges) {
      val stats = seqStats(vocab.filter(_._1.length > 1))
      if (stats.isEmpty) go = false
      else {
        val ((l, r), f) = stats.minBy { case ((l, r), f) => (-f, l, r) }
        if (f < minFreq) go = false
        else {
          out += ((rank, l, r, f))
          vocab = vocab.map { case (t, fq) => (seqMerge(t, (l, r)), fq) }
          rank += 1
        }
      }
    }
    out.result()
  }

  private def seqEncode(word: String,
      ranks: Map[(String, String), Int]): List[String] = {
    var toks = word.toList.map(_.toString)
    var go = toks.length > 1
    while (go) {
      val present = toks.zip(toks.tail).distinct.filter(ranks.contains)
      if (present.isEmpty) go = false
      else {
        val best = present.minBy(ranks)
        toks = seqMerge(toks, best)
        go = toks.length > 1
      }
    }
    toks
  }

  private def wordFreqsOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  // ---- fixture pins ----

  test("bpeTrain on the sf0.01 corpus reproduces the committed Python-" +
      "reference merge table exactly (rank, pair and frequency)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val got = Tokenize.bpeTrain(docs, "text", numMerges = 24, minFreq = 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("freq")))
    val want = spark.read
      .parquet("src/test/resources/bpe_merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank").toInt, r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("freq")))
    assert(got.toSeq == want.toSeq)
  }

  test("encodeWord reproduces the committed reference tokens for every " +
      "fixture word") {
    val merges = Tokenize.loadMerges(
      spark.read.parquet("src/test/resources/bpe_merges.parquet"))
    val ranks = merges.zipWithIndex.toMap
    val fixture = spark.read
      .parquet("src/test/resources/bpe_word_tokens.parquet")
      .collect()
      .map(r => (r.getAs[String]("word"), r.getAs[String]("tokens")))
    assert(fixture.length >= 31)
    for ((w, toks) <- fixture)
      assert(Tokenize.encodeWord(w, ranks).mkString(" ") == toks,
        s"word '$w'")
  }

  // ---- randomized cross-implementation equivalence ----

  private val rnd = new scala.util.Random(20260813)

  private def randomCorpus(nDocs: Int): Seq[String] = {
    val alphabet = "abcdefg"
    def word() = Seq.fill(rnd.nextInt(7) + 1)(
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val vocabulary = Seq.fill(rnd.nextInt(30) + 5)(word())
    Seq.fill(nDocs)(Seq.fill(rnd.nextInt(40) + 1)(
      vocabulary(rnd.nextInt(vocabulary.size))).mkString(" "))
  }

  test("bpeTrain == sequential reference across 8 random corpora " +
      "(repeated-character words stress the overlap rules)") {
    for (trial <- 1 to 8) {
      val texts = randomCorpus(rnd.nextInt(30) + 5)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nm = rnd.nextInt(20) + 3
      val got = Tokenize.bpeTrain(docs, "text", nm, minFreq = 2)
        .orderBy("rank").collect()
        .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
          r.getAs[String]("right"), r.getAs[Long]("freq"))).toSeq
      val want = seqTrain(wordFreqsOf(texts), nm, minFreq = 2)
      assert(got == want, s"trial $trial (numMerges=$nm):\n$got\nvs\n$want")
    }
  }

  test("bpeEncode == sequential per-word encode on random corpora; " +
      "n_words/n_tokens consistent with the token arrays") {
    for (trial <- 1 to 5) {
      val texts = randomCorpus(rnd.nextInt(25) + 5)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = Tokenize.loadMerges(
        Tokenize.bpeTrain(docs, "text", rnd.nextInt(15) + 2))
      val ranks = merges.zipWithIndex.toMap
      val got = Tokenize.bpeEncode(docs, "doc_id", "text", merges)
        .orderBy("id").collect()
      assert(got.length == texts.length)
      for (row <- got) {
        val text = texts(row.getAs[Long]("id").toInt)
        val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val expect = words.flatMap(w => seqEncode(w, ranks))
        val toks = row.getAs[scala.collection.Seq[String]]("tokens").toSeq
        assert(toks == expect.toSeq, s"trial $trial doc ${row.get(0)}")
        assert(row.getAs[Long]("n_words") == words.length.toLong)
        assert(row.getAs[Long]("n_tokens") == expect.length.toLong)
      }
    }
  }

  test("hybrid execution: forcing the distributed loop (localThreshold=0) " +
      "gives the same merges as the local finish, and as the reference") {
    for (trial <- 1 to 4) {
      val texts = randomCorpus(rnd.nextInt(25) + 5)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nm = rnd.nextInt(14) + 3
      def collectMerges(threshold: Long) =
        Tokenize.bpeTrain(docs, "text", nm, minFreq = 2,
            localThreshold = threshold)
          .orderBy("rank").collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
            r.getAs[String]("right"), r.getAs[Long]("freq"))).toSeq
      val dist = collectMerges(0L)          // never collects: pure Spark loop
      val local = collectMerges(1L << 20)   // collects immediately
      assert(dist == local, s"trial $trial: hybrid paths disagree")
      assert(dist == seqTrain(wordFreqsOf(texts), nm, 2), s"trial $trial")
    }
  }

  test("delta-maintained pair counts == recount-from-scratch, both " +
      "forced distributed, across random corpora (and == the reference)") {
    for (trial <- 1 to 6) {
      val texts = randomCorpus(rnd.nextInt(30) + 5)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nm = rnd.nextInt(14) + 3
      def collectMerges(delta: Boolean) =
        Tokenize.bpeTrain(docs, "text", nm, minFreq = 2,
            localThreshold = 0L, deltaCounts = delta)
          .orderBy("rank").collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
            r.getAs[String]("right"), r.getAs[Long]("freq"))).toSeq
      val viaDelta = collectMerges(true)
      val viaRecount = collectMerges(false)
      assert(viaDelta == viaRecount,
        s"trial $trial: delta and recount paths disagree:\n" +
          s"$viaDelta\nvs\n$viaRecount")
      assert(viaDelta == seqTrain(wordFreqsOf(texts), nm, 2),
        s"trial $trial vs sequential reference")
    }
    // trace hook fires once per distributed merge with affected <= working
    val docs = Seq((1L, "ab ab ab abc abc bc xyz xyz xyz xyz"))
      .toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Double)]
    Tokenize.bpeTrain(docs, "text", 3, minFreq = 1, localThreshold = 0L,
      trace = Some((r, a, w, s) => seen += ((r, a, w, s))))
    assert(seen.map(_._1).toSeq == Seq(0, 1, 2))
    // working set: ab(3) abc(2) bc(1) xyz(4). merge 0 = (a,b) freq 5
    // affects ab+abc; merge 1 = (x,y) freq 4 (lexicographic tie-break
    // over (y,z)) affects xyz; merge 2 = (xy,z) affects xyz
    assert(seen.map(_._2).toSeq == Seq(2L, 1L, 1L),
      s"affected counts wrong: $seen")
  }

  test("semantics edges: greedy overlap merge, pair-count overlaps, " +
      "null/empty text, early stop below minFreq") {
    // "aaaa" under merge (a,a): greedy LTR -> (aa, aa); "aaa" -> (aa, a)
    val ranks = Map(("a", "a") -> 0)
    assert(Tokenize.encodeWord("aaaa", ranks).toSeq == Seq("aa", "aa"))
    assert(Tokenize.encodeWord("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(Tokenize.encodeWord("x", ranks).toSeq == Seq("x"))
    // pairCounts counts overlaps: "aaa" x2 docs -> (a,a) freq 4
    val docs = Seq((1L, "aaa"), (2L, "aaa")).toDF("doc_id", "text")
    val pc = Tokenize.pairCounts(Tokenize.wordFreqs(docs, "text")).collect()
    assert(pc.length == 1 && pc(0).getAs[Long]("freq") == 4L)
    // null text encodes to zero words, zero tokens
    val withNull = Seq((1L, "a b"), (2L, null)).toDF("doc_id", "text")
    val enc = Tokenize.bpeEncode(withNull, "doc_id", "text", Seq.empty)
      .orderBy("id").collect()
    assert(enc(1).getAs[Long]("n_words") == 0L &&
      enc(1).getAs[Long]("n_tokens") == 0L)
    // minFreq stops training: unique words only -> every pair freq 1
    val uniq = Seq((1L, "abc def")).toDF("doc_id", "text")
    assert(Tokenize.bpeTrain(uniq, "text", 10, minFreq = 2).count() == 0)
  }

  // ---- byte-level (GPT-2 scheme) ----

  test("byteMap/byteUnmap: bijective over all 256 bytes; round-trips " +
      "arbitrary unicode incl. non-BMP") {
    assert(Tokenize.byteToUnicode.distinct.length == 256)
    for (b <- 0 until 256)
      assert(Tokenize.unicodeToByte(Tokenize.byteToUnicode(b)) == b.toByte)
    // the space symbol is the GPT-2 'Ġ' (space=0x20 is not directly
    // printable, so it maps into the 256+ block)
    assert(Tokenize.byteMap(" ") == "Ġ")
    val gnarly = Seq("", " ", "héllo wörld", "日本語", "a\tb\nc",
      "emoji 😀 pair", "mixed ASCII + ümlaut + 中文 + 🚀")
    for (s <- gnarly)
      assert(Tokenize.byteUnmap(Tokenize.byteMap(s)) == s, s"round trip '$s'")
  }

  test("pretokenize: GPT-2 pattern semantics (contractions case-" +
      "sensitive, leading-space glue, trailing-whitespace lookahead)") {
    def pt(s: String) = Tokenize.pretokenize(s).toSeq
    assert(pt("Hello world") == Seq("Hello", " world"))
    assert(pt("don't") == Seq("don", "'t"))
    assert(pt("DON'T") == Seq("DON", "'", "T")) // contractions are lowercase
    assert(pt("it's they'll we're") ==
      Seq("it", "'s", " they", "'ll", " we", "'re"))
    // multi-space: \s+(?!\S) leaves ONE space to glue onto the next token
    assert(pt("a   b") == Seq("a", "  ", " b"))
    assert(pt("a  b") == Seq("a", " ", " b"))
    assert(pt("trailing  ") == Seq("trailing", "  "))
    assert(pt("  leading") == Seq(" ", " leading"))
    assert(pt("tab\there") == Seq("tab", "\t", "here"))
    assert(pt("x!!, y") == Seq("x", "!!,", " y"))
    assert(pt("3rd 42nd") == Seq("3", "rd", " 42", "nd"))
    assert(pt("") == Seq.empty)
    assert(pt(" ") == Seq(" "))
    // reassembly is lossless by construction
    val texts = Seq("She said: \"don't!\"  (twice)", "a\t\t b", "x  ")
    for (t <- texts) assert(pt(t).mkString == t, s"lossless '$t'")
  }

  test("bpeTrainBytes on the sf0.01 corpus reproduces the committed " +
      "Python-reference byte-level merge table exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val got = Tokenize.bpeTrainBytes(docs, "text", numMerges = 24,
        minFreq = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("freq")))
    val want = spark.read
      .parquet("src/test/resources/bpe_bytes_merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank").toInt, r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("freq")))
    assert(got.toSeq == want.toSeq)
    // the top merge is the space-glue: 'Ġ' + 's' (corpus words are
    // space-joined, so Ġ-prefixed symbols dominate)
    assert(got.head._2 == "Ġ")
  }

  test("bpeEncodeBytes reproduces the committed reference encodings on " +
      "the gnarly spec corpus (case, punctuation, unicode, non-BMP) and " +
      "round-trips every text losslessly") {
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_spec_merges.parquet"))
    val fixture = spark.read
      .parquet("src/test/resources/bpe_bytes_spec.parquet")
      .orderBy("text_id").collect()
    assert(fixture.length >= 20)
    val docs = fixture.map(r =>
      (r.getAs[Long]("text_id"), r.getAs[String]("text")))
      .toSeq.toDF("text_id", "text")
    val got = Tokenize.bpeEncodeBytes(docs, "text_id", "text", merges)
      .orderBy("id").collect()
    for ((want, g) <- fixture.zip(got)) {
      val text = want.getAs[String]("text")
      assert(g.getAs[Long]("n_pretokens") == want.getAs[Long]("n_pretokens"),
        s"n_pretokens of '$text'")
      assert(g.getAs[Long]("n_tokens") == want.getAs[Long]("n_tokens"),
        s"n_tokens of '$text'")
      val toks = g.getAs[scala.collection.Seq[String]]("tokens")
      assert(toks.mkString(" ") == want.getAs[String]("tokens"),
        s"tokens of '$text'")
      // losslessness: unmapping the concatenated tokens IS the text
      assert(Tokenize.byteUnmap(toks.mkString) == text,
        s"round trip of '$text'")
    }
  }

  test("bpeVocab / bpeEncodeIds: GPT-2 id order (256 byte symbols then " +
      "merges by rank); ids decode back to the byte-level tokens and " +
      "the text, checksum consistent") {
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_spec_merges.parquet"))
    val vocab = Tokenize.bpeVocab(merges)
    assert(vocab.length == 256 + merges.length)
    for (b <- 0 until 256)
      assert(vocab(b) == (Tokenize.byteToUnicode(b).toString, b))
    assert(vocab(256) == (merges.head._1 + merges.head._2, 256))
    val byId = vocab.map(_.swap).toMap
    val fixture = spark.read
      .parquet("src/test/resources/bpe_bytes_spec.parquet")
      .orderBy("text_id").collect()
    val docs = fixture.map(r =>
      (r.getAs[Long]("text_id"), r.getAs[String]("text")))
      .toSeq.toDF("text_id", "text")
    val got = Tokenize.bpeEncodeIds(docs, "text_id", "text", merges)
      .orderBy("id").collect()
    for ((want, g) <- fixture.zip(got)) {
      val text = want.getAs[String]("text")
      val ids = g.getAs[scala.collection.Seq[Int]]("token_ids")
      assert(g.getAs[Long]("n_tokens") == want.getAs[Long]("n_tokens"),
        s"n_tokens of '$text'")
      assert(g.getAs[Long]("ids_sum") == ids.map(_.toLong).sum,
        s"checksum of '$text'")
      // ids decode to the byte-level token strings, and through
      // byteUnmap back to the exact text
      assert(ids.map(byId).mkString(" ") == want.getAs[String]("tokens"),
        s"decoded tokens of '$text'")
      assert(Tokenize.byteUnmap(ids.map(byId).mkString) == text,
        s"round trip of '$text'")
    }
  }

  test("byte-level hybrid == forced-distributed == delta-off, on a " +
      "random cased/punctuated corpus") {
    val words = Seq("The", "quick", "Brown", "fox!", "it's", "42nd",
      "jumps,", "over", "THE", "lazy")
    val texts = Seq.fill(60)(Seq.fill(rnd.nextInt(20) + 1)(
      words(rnd.nextInt(words.size))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("freq"))).toSeq
    val hybrid = table(Tokenize.bpeTrainBytes(docs, "text", 30))
    val dist = table(Tokenize.bpeTrainBytes(docs, "text", 30,
      localThreshold = 0))
    val recount = table(Tokenize.bpeTrainBytes(docs, "text", 30,
      localThreshold = 0, deltaCounts = false))
    assert(hybrid == dist, "hybrid vs forced-distributed")
    assert(dist == recount, "delta vs recount")
    assert(hybrid.nonEmpty)
  }

  test("special tokens: reserved ids after merges, boundary insertion " +
      "matches the Python fixture, decode round-trips losslessly, and " +
      "a literal special inside data encodes as plain bytes") {
    val eot = "<|endoftext|>"
    val merges = Tokenize.loadMerges(spark.read
      .parquet("src/test/resources/bpe_bytes_spec_merges.parquet"))
    // id geometry: specials AFTER every merge id
    val vocab = Tokenize.bpeVocabWithSpecial(merges, Seq(eot))
    assert(vocab.length == 256 + merges.length + 1)
    assert(vocab.last == (eot, 256 + merges.length))
    // collision rejection: a special equal to a vocab string must throw
    intercept[IllegalArgumentException] {
      Tokenize.bpeVocabWithSpecial(merges, Seq("a"))
    }
    val fixture = spark.read
      .parquet("src/test/resources/bpe_bytes_special_spec.parquet")
      .orderBy("text_id").collect()
    val texts = spark.read
      .parquet("src/test/resources/bpe_bytes_spec.parquet")
      .orderBy("text_id").collect()
      .map(r => (r.getAs[Long]("text_id"), r.getAs[String]("text")))
    assert(fixture.length == texts.length)
    val docs = texts.toSeq.toDF("text_id", "text")
    val got = Tokenize.bpeEncodeIds(docs, "text_id", "text", merges,
        specials = Seq(eot), boundary = Some(eot))
      .orderBy("id").collect()
    for (((want, (_, text)), g) <- fixture.zip(texts).zip(got)) {
      val ids = g.getAs[scala.collection.Seq[Int]]("token_ids")
      assert(g.getAs[Long]("n_tokens") == want.getAs[Long]("n_tokens"),
        s"n_tokens of '$text'")
      assert(g.getAs[Long]("ids_sum") == want.getAs[Long]("ids_sum"),
        s"ids_sum of '$text'")
      assert(ids.last.toLong == want.getAs[Long]("last_id"),
        s"boundary id of '$text'")
      // decode drops the boundary and round-trips the text exactly —
      // including the text that SPELLS the special literally (whose
      // body ids must all be ordinary, below the reserved range)
      assert(Tokenize.bpeDecodeIds(ids.toSeq, merges, Seq(eot)) == text,
        s"round trip of '$text'")
      assert(ids.init.forall(_ < 256 + merges.length),
        s"no data-injected special in '$text'")
    }
    // the boundary rides into packing: n_tokens includes the +1
    val plain = Tokenize.bpeEncodeIds(docs, "text_id", "text", merges)
      .orderBy("id").collect()
    for ((p, g) <- plain.zip(got))
      assert(g.getAs[Long]("n_tokens") == p.getAs[Long]("n_tokens") + 1)
  }
}
