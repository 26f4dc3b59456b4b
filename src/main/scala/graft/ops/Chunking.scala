package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus chunking + sequence packing — the two shaping operations every
  * LLM training-data pipeline runs between curation and tokenization.
  *
  * Both are pure Catalyst expression pipelines (no UDF): chunking is a
  * per-row `sequence` + `explode` + `substring` (embarrassingly parallel,
  * no shuffle); packing is a keyed running sum (one shuffle on the pack
  * key). At 100 TB chunking scales with the scan, and packing's window is
  * PARTITIONED (per source/shard) — a global ordering would serialize on
  * one task, so the API requires a pack key.
  */
object Chunking {

  /** One emitted row of [[fixedSequences]]' per-partition sweep. */
  private[graft] final case class FixedSeq(shard: Long, seq_id: Long,
      n_tokens: Long, n_docs: Long, first_doc: Long, last_doc: Long,
      token_ids: Array[Int], ids_sum: Long, complete: Boolean,
      n_pad: Long)

  /** Fixed-size character chunks with overlap. Chunk k (0-based) covers
    * `[k*stride, k*stride + size)` of the text where
    * `stride = size - overlap`; chunks are emitted while their start is
    * inside the text, so the final chunk may be short. Empty/null text
    * yields no chunks. Output: (id, chunk_idx, chunk_text).
    */
  def chunkChars(docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // number of chunks: 1 + floor((len-1)/stride) for len > 0
    val len = length(col(textCol))
    docs
      .where(col(textCol).isNotNull && len > 0)
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), ((len - 1) / stride).cast("int"))).as("chunk_idx"),
        col(textCol))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        substring(col(textCol), col("chunk_idx") * stride + 1, lit(size)).as("chunk_text"))
  }

  /** Greedy contiguous sequence packing: within each `packKey` partition,
    * documents are taken in `orderCols` order and assigned to bins by the
    * running token count — a document opens a new bin when the PREVIOUS
    * cumulative count has reached the next capacity boundary
    * (`bin = floor(prev_cumsum / capacity)`). Bins are contiguous runs;
    * a document straddling a boundary stays in the earlier bin (the
    * standard pack-then-truncate shape for context-window filling).
    * Output: one row per doc — `orderCols` all carry through, so a
    * caller ordering by (hash, id) gets the id back WITHOUT a join —
    * with its bin assignment and offset.
    *
    * `orderCols` must be a total order (include the document id as the
    * final tiebreak when the leading key is a hash): two ids colliding
    * on a 64-bit hash are a near-certainty at 10^10 documents, and an
    * under-specified order would leave their bin assignment
    * plan-dependent. */
  def packBins(docs: DataFrame, packKey: String, orderCols: Seq[String],
      tokenCountCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(packKey).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("__prev", col("__cum") - col(tokenCountCol))
      .select(col(packKey) +: orderCols.map(col) :+ col(tokenCountCol) :+
        // integer division: `/` on longs is double division in Spark SQL
        expr(s"__prev DIV $capacity").as("bin_id") :+
        col("__prev").as("bin_offset_tokens"): _*)
  }

  /** Single order-column form of [[packBins]] — sound only when
    * `orderCol` is already unique within each pack key (e.g. a document
    * id); hash orderings must use the multi-column form with the id as
    * tiebreak. */
  def packBins(docs: DataFrame, packKey: String, orderCol: String,
      tokenCountCol: String, capacity: Long): DataFrame =
    packBins(docs, packKey, Seq(orderCol), tokenCountCol, capacity)

  /** FIXED-LENGTH training sequences — the terminal step a real loader
    * consumes: within each shard, concatenate the documents' token-id
    * streams in `orderCol` order and cut EXACT `seqLen`-token rows,
    * documents splitting across sequence boundaries (the standard
    * pretraining "pack everything, cut every 2048" discipline — which
    * is why the export inserts `<|endoftext|>` boundaries first:
    * sequences need them to mark where documents end). The trailing
    * partial sequence of each shard is emitted with `complete = false`
    * so the caller chooses drop-or-pad — and `padTokenId` IS the pad
    * choice: when set, the trailing partial is right-padded with that
    * id to exactly `seqLen` tokens (the standard loader contract:
    * every row the same length; GPT-2 practice pads with the
    * `<|endoftext|>` id itself). The padded row keeps
    * `complete = false` and reports the pad count in `n_pad`;
    * `n_tokens` and `ids_sum` describe the EMITTED array, pads
    * included, so the checksum still replays from the row alone.
    *
    * Output: (shard, seq_id, n_tokens, n_docs, first_doc, last_doc,
    * token_ids, ids_sum, complete, n_pad) — seq_id is the 0-based
    * sequence index within the shard; n_docs counts the documents
    * CONTRIBUTING at least one token; first_doc/last_doc are their
    * `idCol` values in stream order; n_pad is 0 everywhere except a
    * padded trailing partial.
    *
    * Scale: ONE hash exchange on the shard key + a per-partition sorted
    * sweep (mapPartitions — genuinely per-partition imperative state:
    * the carry buffer between documents; a (shard, seq)-keyed groupBy
    * would shuffle the full token stream a second time). Multiple
    * shards hashing into one partition are handled by the (shard,
    * order) sort + a carry reset on shard change. Each emitted row
    * holds seqLen ints — bounded regardless of document length. The
    * result is a pure function of (rows, orderCol) — partitioning
    * cannot perturb it (spec-pinned across partitionings). */
  def fixedSequences(enc: DataFrame, shardCol: String, orderCol: String,
      idCol: String, idsCol: String, seqLen: Int,
      padTokenId: Option[Int] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = enc.sparkSession
    import spark.implicits._
    enc
      .select(col(shardCol).cast("long").as("shard"),
        col(orderCol).cast("long").as("ord"),
        col(idCol).cast("long").as("doc"),
        coalesce(col(idsCol),
          typedLit(Array.empty[Int])).as("ids"))
      .repartition(col("shard"))
      // idCol as the final sort key: orderCol ties (hash collisions)
      // would otherwise leave the stream order plan-dependent
      .sortWithinPartitions(col("shard"), col("ord"), col("doc"))
      .as[(Long, Long, Long, Array[Int])]
      .mapPartitions { it =>
        // LAZY sweep: memory is one seqLen buffer + the pending-output
        // queue of the current input row (never a shard's worth) — a
        // 12.5 TB shard streams through a constant-size carry
        new Iterator[FixedSeq] {
          private val pending = scala.collection.mutable.Queue.empty[FixedSeq]
          private var shard = Long.MinValue
          private var seqId = 0L
          private var buf = new ArrayBuffer[Int](seqLen)
          private var docs = ArrayBuffer.empty[Long]
          private var drained = false
          private def flush(complete: Boolean): Unit = {
            if (buf.nonEmpty) {
              var nPad = 0L
              if (!complete) padTokenId.foreach { pad =>
                nPad = (seqLen - buf.length).toLong
                while (buf.length < seqLen) buf += pad
              }
              val arr = buf.toArray
              pending += FixedSeq(shard, seqId, arr.length.toLong,
                docs.length.toLong, docs.head, docs.last, arr,
                arr.map(_.toLong).sum, complete, nPad)
              seqId += 1
            }
            buf = new ArrayBuffer[Int](seqLen)
            docs = ArrayBuffer.empty[Long]
          }
          private def advance(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (s, _, doc, ids) = it.next()
              if (s != shard) {
                if (shard != Long.MinValue) flush(complete = false)
                shard = s; seqId = 0L
              }
              if (ids.nonEmpty) {
                var i = 0
                var counted = false
                while (i < ids.length) {
                  if (!counted) { docs += doc; counted = true }
                  buf += ids(i)
                  if (buf.length == seqLen) {
                    flush(complete = true); counted = false
                  }
                  i += 1
                }
              }
            }
            if (pending.isEmpty && !it.hasNext && !drained) {
              drained = true
              if (shard != Long.MinValue) flush(complete = false)
            }
          }
          override def hasNext: Boolean = { advance(); pending.nonEmpty }
          override def next(): FixedSeq = { advance(); pending.dequeue() }
        }
      }
      .toDF("shard", "seq_id", "n_tokens", "n_docs", "first_doc",
        "last_doc", "token_ids", "ids_sum", "complete", "n_pad")
  }

  /** GLOBAL SAMPLE SHUFFLE of fixed-length sequences — the step after
    * [[fixedSequences]] a training loader actually wants: the cut rows
    * sit in STREAM order (consecutive rows are consecutive documents —
    * highly correlated samples), so reassign each sequence to one of
    * `nOut` output shards by hashing its identity and position it
    * within the shard by the same hash. The permutation is a pure
    * function of (shardCol, seqIdCol) — stable under reruns,
    * partitioning and engines (the [[graft.ops.Sampling.shuffleShards]]
    * discipline over the composite sequence identity, packed
    * injectively into one BIGINT: `shard * 2^40 + seq_id`; 2^40
    * sequences/shard = 2^51 tokens at seqLen 2048, beyond any real
    * shard, and shard ids stay below 2^23).
    *
    * Output adds (out_shard, pos); rows leave sorted by (out_shard,
    * pos) with the repartition BEFORE the position window, so the whole
    * shuffle is ONE exchange and a write partitioned by `out_shard`
    * streams each shard in pos order.
    *
    * `seed` selects an EPOCH: training consumes the corpus once per
    * epoch in a FRESH permutation, so the hashed key is the identity
    * shifted by `seed * phi64` (the odd golden-ratio constant — a
    * bijection of the key space per seed, so injectivity is preserved,
    * and the xxhash avalanche decorrelates the per-epoch orders).
    * `seed = 0` is the identity shift — the base permutation. Each
    * epoch read costs the same ONE exchange as the base shuffle (the
    * permutation is global, data must move); an epoch over a stored
    * corpus is `shuffleSequences(store, ..., seed = epoch)` and the
    * loader consumes (out_shard, pos) in lexicographic order —
    * [[epochResume]] restarts mid-epoch from a (shard, pos) cursor. */
  def shuffleSequences(seqs: DataFrame, shardCol: String,
      seqIdCol: String, nOut: Int, seed: Long = 0L): DataFrame = {
    require(nOut > 0, "nOut must be positive")
    val w = Window.partitionBy(col("out_shard"))
      .orderBy(col("__h"), col("__seq_key"))
    seqs
      .withColumn("__seq_key",
        col(shardCol).cast("long") * lit(1L << 40) +
          col(seqIdCol).cast("long"))
      // wrapping long add (non-ANSI): unsigned (key + seed*phi) mod 2^64
      .withColumn("__h",
        xxhash64(col("__seq_key") + lit(seed * GoldenGamma)))
      .withColumn("out_shard", pmod(col("__h"), lit(nOut.toLong)))
      .repartition(nOut, col("out_shard"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .sortWithinPartitions(col("out_shard"), col("pos"))
      .drop("__h", "__seq_key")
  }

  /** 2^64 / phi rounded to odd — the Weyl-sequence increment; odd, so
    * `key + seed * GoldenGamma` is a bijection of Z/2^64 per seed. */
  private[graft] val GoldenGamma: Long = 0x9E3779B97F4A7C15L

  /** Per-domain repeat rates for a WEIGHTED EPOCH — the upsampling twin
    * of [[Curation.mixtureWeights]]: training mixtures REPEAT scarce
    * domains (the GPT-3 practice — high-quality sources see several
    * epochs while the bulk web crawl sees less than one), so given
    * target shares and a desired epoch size in sequences, each domain's
    * rate is `share * epochSequences / n_seqs` — above 1 where the
    * domain must repeat, below 1 where it downsamples. Output: (domain,
    * n_seqs, share, rate), one row per target domain present in the
    * corpus; feed it to [[epochMixture]].
    *
    * Scale: one domains-sized aggregate over a single corpus scan; the
    * share table is broadcast. */
  def epochRates(seqs: DataFrame, domainCol: String,
      targetShares: Seq[(String, Double)],
      epochSequences: Long): DataFrame = {
    require(targetShares.nonEmpty, "need at least one target share")
    require(targetShares.forall(_._2 > 0), "shares must be positive")
    require(math.abs(targetShares.map(_._2).sum - 1.0) < 1e-9,
      s"shares must sum to 1, got ${targetShares.map(_._2).sum}")
    require(epochSequences > 0, "epochSequences must be positive")
    val spark = seqs.sparkSession
    import spark.implicits._
    val shares = targetShares.toDF("domain", "share")
    seqs.select(col(domainCol).as("domain"))
      .join(broadcast(shares), Seq("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_seqs"), first("share").as("share"))
      .select(col("domain"), col("n_seqs"), col("share"),
        (col("share") * lit(epochSequences) / col("n_seqs").cast("double"))
          .as("rate"))
  }

  /** WEIGHTED EPOCH over a sequence store — [[shuffleSequences]] with
    * per-domain repeat rates: each sequence emits `floor(rate)` copies
    * plus one more iff its selection hash falls under the fractional
    * part (on the q20 grid — the [[Curation.applyMixture]] draw
    * discipline, but per-epoch: the selection hash is seeded, so WHICH
    * rows carry the fractional extra changes every epoch while each
    * domain's expected share holds). Every copy takes its own
    * (out_shard, pos) from the hash of the copy-packed identity
    * `(shard * 2^40 + seq_id) * 64 + copy` — injective while
    * `shard < 2^17` and rates stay below 64 (both raise_error-guarded:
    * a violation would silently collide positions). Domains absent from
    * `weights` are implicitly rate-0, and `weights` must hold ONE row
    * per domain (inner join — the [[Curation.mixtureWeights]] /
    * [[epochRates]] output contract; a duplicated domain row would fan
    * the join out). Output adds (copy, out_shard, pos);
    * [[epochResume]] applies unchanged.
    *
    * Scale: the weights table is domains-sized (broadcast), the draw
    * and the copy explode are per-row expressions (output volume is the
    * requested epoch size — the data you asked for, not overhead), and
    * the position rank is the same ONE exchange as the base shuffle. */
  def epochMixture(seqs: DataFrame, domainCol: String, shardCol: String,
      seqIdCol: String, weights: DataFrame, nOut: Int,
      seed: Long = 0L): DataFrame = {
    require(nOut > 0, "nOut must be positive")
    val shift = lit(seed * GoldenGamma)
    val q20 = lit(1L << 20)
    val w = weights.select(col("domain").as("__dom"),
      floor(col("rate").cast("double") * lit(1048576.0) + lit(0.5))
        .cast("long").as("__rate_q20"))
    val wv = Window.partitionBy(col("out_shard"))
      .orderBy(col("__h"), col("__ckey"))
    seqs
      .join(broadcast(w), seqs(domainCol) === col("__dom"))
      .withColumn("__seq_key",
        when(col(shardCol).cast("long").between(0L, (1L << 17) - 1),
          col(shardCol).cast("long") * lit(1L << 40) +
            col(seqIdCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("epochMixture: shard out of [0, 2^17): "),
            col(shardCol).cast("string")))))
      .withColumn("__q", when(col("__rate_q20") < lit(64L << 20),
          col("__rate_q20"))
        .otherwise(raise_error(concat(
          lit("epochMixture: rate must stay below 64, got q20="),
          col("__rate_q20").cast("string")))))
      // the seeded Bernoulli: fractional extra on the q20 grid
      .withColumn("__n", shiftright(col("__q"), 20) +
        when(pmod(xxhash64(col("__seq_key") + shift), q20) <
          col("__q") % q20, 1L).otherwise(0L))
      // a 0-copy row (downsampled domain, draw missed) leaves the epoch;
      // Spark's `sequence` refuses an empty range, so filter first
      .filter(col("__n") > 0L)
      .withColumn("copy",
        explode(sequence(lit(0L), col("__n") - 1L, lit(1L))))
      .withColumn("__ckey", col("__seq_key") * lit(64L) + col("copy"))
      .withColumn("__h", xxhash64(col("__ckey") + shift))
      .withColumn("out_shard", pmod(col("__h"), lit(nOut.toLong)))
      .repartition(nOut, col("out_shard"))
      .withColumn("pos", row_number().over(wv).cast("long") - 1L)
      .sortWithinPartitions(col("out_shard"), col("pos"))
      .drop("__dom", "__rate_q20", "__q", "__n", "__seq_key", "__ckey",
        "__h")
  }

  /** Restart an epoch read mid-way: keep the rows of a
    * [[shuffleSequences]] order at or after the `(fromShard, fromPos)`
    * cursor in the (out_shard, pos) lexicographic consumption order. A
    * loader that died after consuming (s, p) resumes with cursor
    * (s, p + 1) — pure filter, no shuffle; under a store partitioned by
    * `out_shard` the `out_shard > fromShard` disjunct prunes whole
    * partitions at the scan. */
  def epochResume(ordered: DataFrame, fromShard: Long,
      fromPos: Long): DataFrame =
    ordered.filter(col("out_shard") > fromShard ||
      (col("out_shard") === fromShard && col("pos") >= fromPos))
}
