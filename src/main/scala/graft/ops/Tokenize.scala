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
  * Scope: this is WORD-LEVEL BPE by declared contract — byte-level
  * pre-tokenization (GPT-2's regex over raw bytes) and special-token
  * handling (<|endoftext|> etc.) are outside it; the distributed
  * machinery (delta-maintained counts, hybrid finish, memoized encode)
  * is tokenization-scheme-agnostic and would carry over unchanged.
  *
  * Pre-tokenization contract (shared with the DuckDB oracles and the
  * committed fixtures): `lower(text)` split on `[^a-z0-9]+`, empties
  * dropped. Cross-checked against an independent Python reference
  * implementation via `src/test/resources/bpe_{merges,word_tokens}
  * .parquet` (scripts/gen_bpe_fixture.py).
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
      trace: Option[(Int, Long, Long, Double) => Unit] = None): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    var work: Dataset[(IndexedSeq[String], Long)] =
      wordFreqs(docs, textCol).as[(String, Long)]
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
}
