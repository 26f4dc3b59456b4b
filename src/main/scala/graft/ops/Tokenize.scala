package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenization — training a subword
  * vocabulary over a corpus and encoding the corpus with it, the two
  * halves of the tokenizer step every LLM training pipeline runs before
  * anything else sees the data.
  *
  * Algorithm: the canonical word-level BPE (Sennrich et al. 2016; the
  * GPT-2 merge discipline). Training iteratively merges the most
  * frequent adjacent token pair; encoding replays the learned merges on
  * each word, lowest rank first. Determinism everywhere: ties on pair
  * frequency break to the lexicographically smallest pair, and a merge
  * rewrites ALL its occurrences greedily left-to-right.
  *
  * Scale shape (100 TB):
  *  - the corpus is touched ONCE, by [[wordFreqs]] — one explode +
  *    map-side-combinable count. Everything after runs on the DISTINCT
  *    WORD working set (Heaps' law: sublinear in corpus size — millions
  *    of rows where the corpus has trillions of tokens), which also
  *    SHRINKS during training as fully-merged words retire.
  *  - pair statistics are DELTA-MAINTAINED across merges (the classic
  *    fast-BPE bookkeeping, distributed): a merge of (l, r) changes the
  *    adjacent-pair multiset ONLY of words that contain that pair, so
  *    each iteration filters the working set to the affected words,
  *    emits their old pairs negative / new pairs positive, and folds
  *    that delta into a persisted running count — per-merge shuffle is
  *    delta-sized (affected words' pairs), not working-set-sized, and
  *    the recount-from-scratch path survives behind `deltaCounts =
  *    false` with a spec pinning exact equality. The argmax stays a
  *    TakeOrdered(1) over the (pair-vocabulary-sized) running counts,
  *    never a full sort. The merge rewrite is a narrow map; lineage is
  *    cut by localCheckpoint every few rounds so iteration r never
  *    replays rounds 0..r-1.
  *  - encoding never shuffles at all: a mapPartitions pass with a
  *    per-partition word -> tokens memo (words repeat massively, so the
  *    merge loop runs once per DISTINCT word per partition, bounded by a
  *    cache cap against adversarial vocabularies).
  *
  * Two pre-tokenization schemes share ALL of that machinery (the
  * trainer takes a prepared (word, freq) frame — [[bpeTrainFreqs]]):
  *
  *  - WORD-LEVEL (the original contract): `lower(text)` split on
  *    `[^a-z0-9]+`, empties dropped — shared with the DuckDB oracles
  *    and the committed fixtures (`src/test/resources/bpe_{merges,
  *    word_tokens}.parquet`, scripts/gen_bpe_fixture.py).
  *  - BYTE-LEVEL (the GPT-2 scheme): case-preserved, whitespace-aware
  *    pre-tokens from the GPT-2 regex semantics (contractions,
  *    optional-leading-space letter/number/punctuation runs, the
  *    trailing-whitespace lookahead — [[pretokenize]] implements the
  *    pattern as an explicit scanner, code-point-correct beyond the
  *    BMP), each pre-token's UTF-8 bytes mapped through the standard
  *    byte-to-printable-unicode table ([[byteMap]]) so every possible
  *    byte is a symbol and encoding is LOSSLESS — [[byteUnmap]] inverts
  *    it exactly. No <unk>, no dropped text, any script. Special-token
  *    handling (<|endoftext|>) remains out of scope. Anchored to the
  *    same independent Python reference (fixtures
  *    `bpe_bytes_{merges,pretoken_tokens}.parquet`).
  */
object Tokenize {

  /** Distinct lowercase words with corpus frequencies — the ONE pass
    * that touches the corpus. (word, freq). */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair frequencies over the initial (per-character)
    * tokenization, weighted by word frequency — training iteration 0's
    * statistics, exposed separately because they are exactly
    * SQL-expressible (the oracle replays them in DuckDB). Overlaps
    * count: "aaa" contributes (a, a) twice. */
  def pairCounts(wordFreqs: DataFrame): DataFrame = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    wordFreqs.as[(String, Long)]
      .flatMap { case (w, f) =>
        (0 until w.length - 1).iterator
          .map(i => (w.substring(i, i + 1), w.substring(i + 1, i + 2), f))
      }
      .toDF("left", "right", "f")
      .groupBy("left", "right").agg(sum("f").as("freq"))
  }

  // ---- byte-level (GPT-2) pre-tokenization ----------------------------

  /** The standard GPT-2 byte-to-printable-unicode table: the 188
    * visually-printable latin-1 bytes map to themselves, the rest
    * (controls, space, DEL, 0xAD...) to 256+k in first-gap order — so a
    * mapped string is one printable char per BYTE and the space-glued
    * "Ġword" tokens fall out naturally. Public-knowledge construction
    * (Radford et al. 2019 tokenizer). */
  private[graft] val byteToUnicode: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (direct(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }
  private[graft] val unicodeToByte: Map[Char, Byte] =
    (0 until 256).map(b => byteToUnicode(b) -> b.toByte).toMap

  /** One printable symbol per UTF-8 byte of `s` — the byte-level symbol
    * space BPE trains and encodes in. Total and injective over all byte
    * strings; [[byteUnmap]] is its exact inverse. */
  private[graft] def byteMap(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToUnicode(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[byteMap]]: mapped symbols back to UTF-8 text — the
    * losslessness witness (spec-pinned round trip). */
  private[graft] def byteUnmap(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = unicodeToByte(s.charAt(i)); i += 1 }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  // GPT-2's \s is UNICODE whitespace: the reference tokenizer compiles
  // its pattern with the Python `regex` module over str, whose \s is the
  // Unicode White_Space property — the Zs/Zl/Zp separator categories
  // (Java's Character.isSpaceChar) plus TAB..CR (0x09-0x0D) and NEL
  // (0x85). NBSP and friends, ubiquitous in HTML-derived corpora, are
  // whitespace here; pinned against a regex-module enumeration and the
  // regex.findall-based fixture generator (gen_bpe_bytes_fixture.py)
  private def isSpaceCp(cp: Int): Boolean =
    cp == ' ' || (cp >= 0x09 && cp <= 0x0d) || cp == 0x85 ||
      Character.isSpaceChar(cp)
  private def isLetterCp(cp: Int): Boolean = Character.isLetter(cp)
  private def isNumCp(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }
  private val contractions = Array("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  /** GPT-2 pre-tokenization — the pattern
    * `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|
    * \s+(?!\S)|\s+` as an explicit code-point scanner (no regex engine
    * disagreement across the Scala side, the Python fixture and the
    * oracle; correct for non-BMP code points where a char-indexed Java
    * regex would split surrogate pairs). Case-preserved; whitespace
    * becomes part of tokens (the leading-space "Ġ" discipline). */
  private[graft] def pretokenize(text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.codePointAt(i)
      var matched = false
      if (c == '\'') {
        var k = 0
        while (!matched && k < contractions.length) {
          val suf = contractions(k)
          if (text.regionMatches(i, suf, 0, suf.length)) {
            out += suf; i += suf.length; matched = true
          }
          k += 1
        }
      }
      if (!matched) {
        // after an optional single literal space, a letter / number /
        // other run claims the span; otherwise whitespace rules apply
        val hasSp = c == ' ' && i + 1 < n
        val j = if (hasSp) i + 1 else i
        val d = if (j < n) text.codePointAt(j) else -1
        if (d >= 0 && isLetterCp(d) && (hasSp || !isSpaceCp(c))) {
          var e = j
          while (e < n && isLetterCp(text.codePointAt(e)))
            e += Character.charCount(text.codePointAt(e))
          out += text.substring(i, e); i = e
        } else if (d >= 0 && isNumCp(d) && (hasSp || !isSpaceCp(c))) {
          var e = j
          while (e < n && isNumCp(text.codePointAt(e)))
            e += Character.charCount(text.codePointAt(e))
          out += text.substring(i, e); i = e
        } else if (d >= 0 && !isSpaceCp(d) && (hasSp || !isSpaceCp(c))) {
          var e = j
          var go = true
          while (go && e < n) {
            val x = text.codePointAt(e)
            if (isSpaceCp(x) || isLetterCp(x) || isNumCp(x)) go = false
            else e += Character.charCount(x)
          }
          out += text.substring(i, e); i = e
        } else {
          // whitespace run: `\s+(?!\S)` keeps the LAST whitespace char
          // for the next token when a non-space follows; a bare `\s+`
          // takes the lone char otherwise
          var e = i
          while (e < n && isSpaceCp(text.codePointAt(e))) e += 1
          if (e < n && e - i > 1) { out += text.substring(i, e - 1); i = e - 1 }
          else { out += text.substring(i, e); i = e }
        }
      }
    }
    out
  }

  /** Distinct byte-level pre-tokens with corpus frequencies, already in
    * the mapped symbol space — the byte-level twin of [[wordFreqs]],
    * same one-pass map-side-combinable shape. */
  def byteWordFreqs(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(coalesce(col(textCol), lit("")).as("t")).as[String]
      .flatMap(t => pretokenize(t).iterator.map(byteMap))
      .toDF("word")
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  /** Adjacent token pairs of one word, in order (overlaps included). */
  private def pairsOf(toks: IndexedSeq[String]): Iterator[(String, String)] =
    (0 until toks.length - 1).iterator.map(i => (toks(i), toks(i + 1)))

  /** Does `toks` contain the adjacent pair (l, r)? The affected-word
    * filter of the delta maintenance — words failing it keep their pair
    * multiset unchanged through a merge of (l, r). */
  private def hasAdjacent(toks: IndexedSeq[String], l: String,
      r: String): Boolean = {
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i) == l && toks(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Merge every occurrence of (l, r) in `toks`, greedy left-to-right —
    * an emitted merge consumes both tokens, so overlaps skip. */
  private[graft] def mergeWord(toks: IndexedSeq[String], l: String,
      r: String): IndexedSeq[String] = {
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Encode one word through the learned ranks: repeatedly rewrite the
    * present pair with the LOWEST rank (all occurrences at once) until
    * no adjacent pair is in the table. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var toks: IndexedSeq[String] =
      (0 until word.length).map(i => word.substring(i, i + 1))
    var more = toks.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var bl: String = null; var br: String = null
      var i = 0
      while (i < toks.length - 1) {
        val rk = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bl = toks(i); br = toks(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) more = false
      else {
        toks = mergeWord(toks, bl, br)
        if (toks.length <= 1) more = false
      }
    }
    toks.toArray
  }

  /** One local training step over an in-memory working set: returns the
    * best pair (same tie-break as the distributed argmax) or None. */
  private def localBest(vocab: Iterable[(IndexedSeq[String], Long)])
      : Option[((String, String), Long)] = {
    val stats = new java.util.HashMap[(String, String), Long]()
    for ((toks, f) <- vocab; i <- 0 until toks.length - 1)
      stats.merge((toks(i), toks(i + 1)), f, java.lang.Long.sum(_, _))
    if (stats.isEmpty) None
    else {
      var best: ((String, String), Long) = null
      val it = stats.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = (e.getKey, e.getValue)
        if (best == null || c._2 > best._2 ||
          (c._2 == best._2 &&
            Ordering[(String, String)].lt(c._1, best._1))) best = c
      }
      Some(best)
    }
  }

  /** Train `numMerges` BPE merges over the corpus. Returns (rank, left,
    * right, freq), rank 0 first. Stops early when the best remaining
    * pair's frequency falls below `minFreq` (or no pair remains).
    *
    * Hybrid execution, same answer every way (spec-pinned): while the
    * distinct-word working set exceeds `localThreshold` rows, each merge
    * runs distributed (delta-maintained pair counts by default — see the
    * object doc — with `deltaCounts = false` keeping the
    * recount-from-scratch formulation); once the shrinking set FITS THE
    * DRIVER it is collected and the remaining merges run locally —
    * per-merge cost drops from a Spark job (~0.1 s of fixed overhead
    * regardless of data) to microseconds, which is what a 50k-merge
    * production vocabulary needs once the tail is small. The collect is
    * bounded by `localThreshold` rows of short token arrays —
    * metadata-sized by construction.
    *
    * @param deltaCounts maintain pair counts by ±delta from the words a
    *        merge actually touches (default) instead of recounting the
    *        working set per merge — same merges, same frequencies,
    *        per-merge shuffle proportional to the CHURN of the pair
    *        multiset rather than its size.
    * @param trace rehearsal/diagnostic hook, called once per DISTRIBUTED
    *        merge with (rank, affectedWords, workingSetWords, seconds);
    *        computing affectedWords costs one extra filter-count job per
    *        merge, so leave it None outside measurement runs. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, localThreshold: Long = 1L << 16,
      deltaCounts: Boolean = true,
      trace: Option[(Int, Long, Long, Double) => Unit] = None): DataFrame =
    bpeTrainFreqs(wordFreqs(docs, textCol), numMerges, minFreq,
      localThreshold, deltaCounts, trace)

  /** BYTE-LEVEL training: GPT-2 pre-tokens ([[pretokenize]]) in the
    * mapped byte-symbol space ([[byteMap]]), through the identical
    * hybrid delta-maintained trainer. Case, whitespace and punctuation
    * all carry signal; the learned merges build "Ġword"-style tokens.
    * Merge table rows are mapped symbols — feed them unchanged to
    * [[bpeEncodeBytes]]. */
  def bpeTrainBytes(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, localThreshold: Long = 1L << 16,
      deltaCounts: Boolean = true,
      trace: Option[(Int, Long, Long, Double) => Unit] = None): DataFrame =
    bpeTrainFreqs(byteWordFreqs(docs, textCol), numMerges, minFreq,
      localThreshold, deltaCounts, trace)

  /** The trainer proper, over a prepared (word, freq) frame whose words
    * are already in the final symbol space — [[bpeTrain]] and
    * [[bpeTrainBytes]] differ only in the frame they pass. See
    * [[bpeTrain]] for the hybrid/delta contract. */
  def bpeTrainFreqs(freqs: DataFrame, numMerges: Int,
      minFreq: Long = 2L, localThreshold: Long = 1L << 16,
      deltaCounts: Boolean = true,
      trace: Option[(Int, Long, Long, Double) => Unit] = None): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = freqs.sparkSession
    import spark.implicits._
    var work: Dataset[(IndexedSeq[String], Long)] =
      freqs.as[(String, Long)]
        .map { case (w, f) =>
          ((0 until w.length).map(i => w.substring(i, i + 1)), f)
        }
        .filter(_._1.length > 1)
        .persist()
    var workCount = work.count()
    // running (left, right, freq) for the delta path — built once from
    // the initial working set, then folded forward by ±deltas; pair-
    // vocabulary-sized (distinct adjacent pairs), far below the working
    // set's token volume
    var counts: DataFrame = null
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = numMerges == 0
    while (!done) {
      if (workCount <= localThreshold) {
        // local finish: the set fits the driver — run the remaining
        // merges in memory with the identical stats/tie-break/rewrite
        var vocab = work.collect().toSeq
        work.unpersist()
        if (counts != null) { counts.unpersist(); counts = null }
        var go = true
        while (go && rank < numMerges) {
          localBest(vocab) match {
            case Some(((l, r), f)) if f >= minFreq =>
              merges += ((rank, l, r, f))
              vocab = vocab
                .map { case (t, fq) => (mergeWord(t, l, r), fq) }
                .filter(_._1.length > 1)
              rank += 1
            case _ => go = false
          }
        }
        done = true
      } else {
        val t0 = System.nanoTime()
        if (deltaCounts && counts == null) {
          counts = work
            .flatMap { case (toks, f) =>
              pairsOf(toks).map(p => (p._1, p._2, f))
            }
            .toDF("left", "right", "f")
            .groupBy("left", "right").agg(sum("f").as("freq"))
            .persist()
          counts.count()
        }
        val stats =
          if (deltaCounts) counts
          else work
            .flatMap { case (toks, f) =>
              pairsOf(toks).map(p => (p._1, p._2, f))
            }
            .toDF("left", "right", "f")
            .groupBy("left", "right").agg(sum("f").as("freq"))
        val top = stats
          .orderBy(desc("freq"), asc("left"), asc("right"))
          .head(1) // TakeOrdered(1): partial top-1 per partition, no sort
        if (top.isEmpty || top(0).getAs[Long]("freq") < minFreq) done = true
        else {
          val l = top(0).getAs[String]("left")
          val r = top(0).getAs[String]("right")
          merges += ((rank, l, r, top(0).getAs[Long]("freq")))
          if (deltaCounts) {
            // only words CONTAINING (l, r) change their pair multiset:
            // emit their old pairs negative, their post-merge pairs
            // positive (a word retiring to one token emits no positives
            // — its pairs simply leave the count), fold into the running
            // total, drop zeroed pairs
            val delta = work
              .filter(w => hasAdjacent(w._1, l, r))
              .flatMap { case (toks, f) =>
                pairsOf(toks).map(p => (p._1, p._2, -f)) ++
                  pairsOf(mergeWord(toks, l, r)).map(p => (p._1, p._2, f))
              }
              .toDF("left", "right", "freq")
            val nc = counts.unionByName(delta)
              .groupBy("left", "right").agg(sum("freq").as("freq"))
              .filter(col("freq") > 0)
            // localCheckpoint EVERY merge: counts is pair-vocabulary-
            // sized (tiny next to the working set), and cutting its
            // lineage per merge keeps the union tower from inflating
            // Catalyst planning time as ranks accumulate
            val matC = nc.localCheckpoint() // eager: forced off the OLD
            counts.unpersist()              // counts/work before release
            counts = matC
          }
          val next = work
            .map { case (toks, f) => (mergeWord(toks, l, r), f) }
            .filter(_._1.length > 1)
          // persist the rewrite; cut lineage periodically so round r never
          // replays rounds 0..r-1 through a tower of map closures
          val mat =
            if ((rank + 1) % 8 == 0) next.localCheckpoint()
            else next.persist()
          val affected = trace.map(_ =>
            work.filter(w => hasAdjacent(w._1, l, r)).count())
          workCount = mat.count()
          work.unpersist()
          work = mat
          trace.foreach(_(rank, affected.get, workCount,
            (System.nanoTime() - t0) / 1e9))
          rank += 1
          if (rank >= numMerges) done = true
        }
      }
    }
    work.unpersist() // no-op when the local path already released it
    if (counts != null) counts.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Ordered (left, right) merge list from a (rank, left, right, ...)
    * frame — the broadcastable form [[bpeEncode]] takes. Metadata-sized
    * by construction. */
  def loadMerges(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Encode a corpus with a learned merge list: (id, n_words, n_tokens,
    * tokens). One narrow mapPartitions pass — no shuffle; the ranks map
    * is a broadcast and each partition memoizes word -> tokens (capped,
    * so an adversarial all-distinct vocabulary cannot hold executor
    * memory hostage). `idCol` must be integral. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], cacheCap: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs
      .select(col(idCol).cast("long").as("id"),
        coalesce(lower(col(textCol)), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = text.split("[^a-z0-9]+").filter(_.nonEmpty)
          var nTok = 0L
          val toks = Array.newBuilder[String]
          var i = 0
          while (i < words.length) {
            val w = words(i)
            var enc = cache.get(w)
            if (enc == null) {
              enc = encodeWord(w, ranks)
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            nTok += enc.length
            toks ++= enc
            i += 1
          }
          (id, words.length.toLong, nTok, toks.result())
        }
      }
      .toDF("id", "n_words", "n_tokens", "tokens")
  }

  /** The byte-level VOCABULARY a merge table induces, in GPT-2 id
    * order: ids 0..255 are the mapped byte symbols (in byte order),
    * id 256+rank is merge `rank`'s concatenation — the integer-id space
    * a training pipeline stores and embeds. Metadata-sized. Two merges
    * CAN produce the same string (("a","bc") and ("ab","c") both yield
    * "abc"); [[bpeEncodeIds]] maps such a string to the LAST id
    * (Scala `toMap` semantics, mirrored by the Python reference's dict
    * build), so the id stream stays deterministic either way. */
  def bpeVocab(merges: Seq[(String, String)]): Seq[(String, Int)] =
    ((0 until 256).map(b => byteToUnicode(b).toString) ++
      merges.map { case (l, r) => l + r }).zipWithIndex

  /** [[bpeVocab]] extended with RESERVED special tokens (the
    * `<|endoftext|>` class): specials take ids 256+|merges|+k, AFTER
    * every merge id, and are NEVER produced by the byte-level encoder —
    * text that happens to contain a special's literal spelling encodes
    * as ordinary bytes (the training-data-safe contract: data cannot
    * inject control tokens; only the pipeline inserts them, via
    * [[bpeEncodeIds]]' `boundary`). Each special's id entry is its RAW
    * string; a special whose raw spelling equals some byte/merge vocab
    * string would shadow that entry in the id map, so such a collision
    * is rejected outright rather than assumed away. */
  def bpeVocabWithSpecial(merges: Seq[(String, String)],
      specials: Seq[String]): Seq[(String, Int)] = {
    require(specials.distinct == specials, "special tokens must be distinct")
    val base = bpeVocab(merges)
    val baseStrings = base.map(_._1).toSet
    specials.foreach(s => require(!baseStrings.contains(s),
      s"special token '$s' collides with a byte/merge vocabulary string"))
    base ++ specials.zipWithIndex.map { case (s, k) =>
      (s, 256 + merges.length + k)
    }
  }

  /** The id→token VOCABULARY TABLE as a frame — the loader-consumable
    * `vocab.json` equivalent of [[bpeVocab]]/[[bpeVocabWithSpecial]]:
    * (id, token, is_special), ids dense from 0 (256 byte symbols,
    * merges by rank, then reserved specials). Metadata-sized; paired
    * with the merge table it is everything an external decoder or an
    * encode-more-data job needs. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      specials: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val base = if (specials.isEmpty) bpeVocab(merges)
      else bpeVocabWithSpecial(merges, specials)
    val nText = 256 + merges.length
    base.map { case (tok, id) => (id, tok, id >= nText) }
      .toDF("id", "token", "is_special")
  }

  /** BYTE-LEVEL encode to INTEGER IDS: (id, n_pretokens, n_tokens,
    * token_ids, ids_sum) — the form a training run actually consumes.
    * Same shuffle-free memoized pass as [[bpeEncodeBytes]]; every
    * symbol has an id by construction (the 256 byte symbols are the
    * base alphabet — no <unk> exists in a byte-level vocabulary).
    * `ids_sum` is the plain sum of the ids, the checksum the oracle
    * replays per pre-token. */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], cacheCap: Int = 1 << 20,
      specials: Seq[String] = Nil,
      boundary: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = if (specials.isEmpty) bpeVocab(merges)
      else bpeVocabWithSpecial(merges, specials)
    val vocabMap = vocab.toMap
    // the boundary id resolves ONCE, on the driver: document-boundary
    // insertion is the PIPELINE's act, never the data's — text spelling
    // a special literally still encodes as plain bytes
    val boundaryId = boundary.map { b =>
      require(specials.contains(b),
        s"boundary token '$b' must be declared in specials")
      vocabMap(b)
    }
    val bcRanks = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val bcIds = spark.sparkContext.broadcast(vocabMap)
    docs
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bcRanks.value
        val ids = bcIds.value
        val cache = new java.util.HashMap[String, Array[Int]]()
        it.map { case (id, text) =>
          val pres = pretokenize(text)
          var sum = 0L
          val out = Array.newBuilder[Int]
          var n = 0L
          var i = 0
          while (i < pres.length) {
            val w = byteMap(pres(i))
            var enc = cache.get(w)
            if (enc == null) {
              enc = encodeWord(w, ranks).map(ids(_))
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            var j = 0
            while (j < enc.length) { sum += enc(j); j += 1 }
            n += enc.length
            out ++= enc
            i += 1
          }
          boundaryId.foreach { eot =>
            out += eot; n += 1; sum += eot
          }
          (id, pres.length.toLong, n, out.result(), sum)
        }
      }
      .toDF("id", "n_pretokens", "n_tokens", "token_ids", "ids_sum")
  }

  /** Decode an id stream from [[bpeEncodeIds]] back to text: special-
    * token ids are DROPPED (they are pipeline markers, not text) and the
    * remaining byte-level vocabulary strings concatenate through
    * [[byteUnmap]] — with a boundary special this inverts the encode
    * exactly (losslessness spec-pinned). Driver-side helper for tests
    * and loaders; the distributed inverse is [[bpeDecodeIdsDf]]. */
  def bpeDecodeIds(tokenIds: Seq[Int], merges: Seq[(String, String)],
      specials: Seq[String] = Nil): String = {
    val vocab = (if (specials.isEmpty) bpeVocab(merges)
      else bpeVocabWithSpecial(merges, specials))
      .map { case (s, i) => i -> s }.toMap
    val specialIds = (256 + merges.length until
      256 + merges.length + specials.length).toSet
    byteUnmap(tokenIds.filterNot(specialIds)
      .map(vocab(_)).mkString)
  }

  /** DISTRIBUTED decode — the mapPartitions twin of [[bpeDecodeIds]],
    * for detok QA and loader debugging over a whole exported corpus:
    * (id, token_ids) rows back to (id, text). The id->string vocabulary
    * is a broadcast ARRAY (dense ids by construction: 0..255 bytes,
    * merges, specials — O(1) lookup, no per-token hashing); special ids
    * decode to NOTHING (pipeline markers, not text), so
    * `bpeDecodeIdsDf(bpeEncodeIds(docs, ..., boundary=...))` returns
    * each document's text exactly (null text encoded as '' — the
    * encoder's own coalesce). One narrow pass, no shuffle; work and
    * output scale with the token stream, like the encode. An id outside
    * the vocabulary throws — decoding with the wrong merge table must
    * fail loudly, not emit garbage text. */
  def bpeDecodeIdsDf(enc: DataFrame, idCol: String, idsCol: String,
      merges: Seq[(String, String)],
      specials: Seq[String] = Nil): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    val vocabArr = (if (specials.isEmpty) bpeVocab(merges)
      else bpeVocabWithSpecial(merges, specials)).map(_._1).toArray
    val nonSpecial = 256 + merges.length // ids below this are text
    val bc = spark.sparkContext.broadcast(vocabArr)
    enc
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(idsCol), typedLit(Array.empty[Int])).as("ids"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val vocab = bc.value
        it.map { case (id, ids) =>
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < ids.length) {
            val t = ids(i)
            if (t < 0 || t >= vocab.length)
              throw new IllegalArgumentException(
                s"token id $t out of vocabulary range [0, ${vocab.length})" +
                  " — wrong merge table or specials list for this corpus")
            if (t < nonSpecial) sb.append(vocab(t))
            i += 1
          }
          (id, byteUnmap(sb.toString))
        }
      }
      .toDF("id", "text")
  }

  /** BYTE-LEVEL encode: (id, n_pretokens, n_tokens, tokens). The same
    * shuffle-free memoized mapPartitions pass as [[bpeEncode]], over
    * GPT-2 pre-tokens in the mapped byte space — tokens are mapped
    * symbols, and concatenating them through [[byteUnmap]] reproduces
    * the input text EXACTLY (spec-pinned): no normalization, no <unk>,
    * no dropped bytes. `idCol` must be integral. */
  def bpeEncodeBytes(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], cacheCap: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val pres = pretokenize(text)
          var nTok = 0L
          val toks = Array.newBuilder[String]
          var i = 0
          while (i < pres.length) {
            val w = byteMap(pres(i))
            var enc = cache.get(w)
            if (enc == null) {
              enc = encodeWord(w, ranks)
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            nTok += enc.length
            toks ++= enc
            i += 1
          }
          (id, pres.length.toLong, nTok, toks.result())
        }
      }
      .toDF("id", "n_pretokens", "n_tokens", "tokens")
  }
}
