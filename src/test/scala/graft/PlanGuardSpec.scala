package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties the engine relies on
  * must be visible in the physical plan, not assumed. */
class PlanGuardSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString()

  test("date-range filter is pushed to the parquet scan") {
    val p = plan("v_date_filter")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan(o_orderdate") || p.contains("GreaterThan(O_ORDERDATE")),
      s"date predicate not pushed:\n$p")
  }

  test("validation reads only key + check columns (column pruning)") {
    val p = plan("v_diff_numeric")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"scan not pruned to 2 columns:\n$p")
    assert(!p.toLowerCase.contains("o_orderpriority"), "unused column read")
  }

  test("q1 aggregation is map-side partial (two HashAggregate stages)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("dimension joins in q5 broadcast rather than shuffle both sides") {
    val p = plan("q5_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("ANN top-k uses rank pushdown (WindowGroupLimit)") {
    val p = plan("t_ann_topk")
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed into window:\n$p")
  }

  test("PQ search: broadcast LUT equi-join, top-k pushdown, no cartesian") {
    val p = plan("t_ann_pq")
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed into window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"LUT join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("inverted index: block aggregation reuses the term partitioning") {
    // the posting-block groupBy(term, block) must NOT add an exchange
    // beyond the window's hash(term) — hash(term) satisfies the
    // (term, block) clustering; paging bounds every group at blockSize
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Indexing.invertedIndex(docs, "doc_id", "text", 64)
      .queryExecution.executedPlan.toString
    // the claim: no exchange keyed on the block column anywhere — the
    // block aggregation must consume the window's hash(term) layout as-is
    assert(!p.linesIterator.exists(ln =>
        ln.contains("Exchange hashpartitioning") && ln.contains("block#")),
      s"block agg re-shuffled on (term, block):\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("chunking is shuffle-free; packing shuffles exactly once on the key") {
    // pin the OPERATORS (the queries add a final orderBy exchange for
    // deterministic oracle output — that one is presentation, not shape)
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val chunk = graft.ops.Chunking.chunkChars(docs, "doc_id", "text", 256, 32)
      .queryExecution.executedPlan.toString
    assert(!chunk.contains("Exchange"),
      s"chunking must not shuffle (per-row explode):\n$chunk")
    val keyed = docs.select(col("source"), col("doc_id"),
      graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val pack = graft.ops.Chunking.packBins(keyed, "source", "doc_id", "n_tokens", 2048L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(pack).size == 1,
      s"packing must shuffle exactly once (keyed window):\n$pack")
    assert(pack.contains("hashpartitioning(source"),
      s"packing shuffle must be on the pack key:\n$pack")
  }

  test("packed export: order columns carry through the pack window — " +
      "NO join anywhere, one shard-keyed exchange") {
    // the (h, id) multi-order packBins returns the id with the bin
    // assignment, so the old join-back-on-hash (a second corpus-sized
    // shuffle + collision fan-out) must be GONE from the plan
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("h", xxhash64(col("doc_id")))
      .withColumn("shard", pmod(col("h"), lit(8L)))
    val p = graft.ops.Chunking.packBins(docs, "shard",
        Seq("h", "doc_id"), "n_tokens", 2048L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"pack must not join the id back:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"pack must shuffle exactly once (the shard-keyed window):\n$p")
    assert(p.contains("hashpartitioning(shard"),
      s"the one exchange must be on the pack key:\n$p")
  }

  test("sequence shuffle: exactly two exchanges end-to-end (the cut's " +
      "shard key + the permutation's out_shard key), no join") {
    // fixedSequences repartitions on the stream shard; shuffleSequences
    // repartitions BEFORE its position window so the window consumes
    // that layout — nothing else may shuffle
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val enc = (0L until 200L)
      .map(i => (i % 4, i, i, Array.fill(32)((i % 97).toInt)))
      .toDF("shard", "ord", "doc", "ids")
    val p = graft.ops.Chunking.shuffleSequences(
        graft.ops.Chunking.fixedSequences(enc, "shard", "ord", "doc",
          "ids", 64),
        "shard", "seq_id", 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"shuffle must not join:\n$p")
    assert("Exchange".r.findAllIn(p).size == 2,
      s"expected exactly 2 exchanges (cut + permutation):\n$p")
  }

  test("weighted epoch: the domains-sized weights join broadcasts and " +
      "the mixture moves data exactly once (the out_shard permutation)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val seqs = (0L until 200L)
      .map(i => (i % 4, i / 4, if (i % 2 == 0) "a" else "b"))
      .toDF("shard", "seq_id", "domain")
    val rates = Seq(("a", 1.5), ("b", 0.5)).toDF("domain", "rate")
    val p = graft.ops.Chunking.epochMixture(seqs, "domain", "shard",
        "seq_id", rates, 8, seed = 1L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"weights must broadcast, never shuffle the store:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no store-sized join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one data exchange (out_shard):\n$p")
    assert(p.contains("hashpartitioning(out_shard"),
      s"the one exchange must be the permutation key:\n$p")
  }

  test("partition pruning: a filter on the partition column prunes files") {
    // at 100 TB the first line of defense is never opening the file: a
    // hive-partitioned layout + partition-column predicate must show up
    // as PartitionFilters (metadata-only), not as a data filter
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("ppwrite").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.partitionBy("lang").mode("overwrite").parquet(base)
    val q = spark.read.parquet(base).filter(col("lang") === "en")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"partition predicate must prune at metadata level:\n$p")
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(!scanned.contains("lang=es") || scanned.contains("..."),
      "non-matching partitions should not be listed in the scan")
    // and the pruned read returns exactly the partition's rows
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("bm25: term dictionary broadcasts; both windows share one doc_id exchange") {
    val p = plan("t_keyterms")
    assert(p.contains("BroadcastHashJoin"),
      s"df dictionary must broadcast, not shuffle the corpus on term:\n$p")
    // exactly one exchange partitions by doc_id alone — the dl-sum window
    // and the rank window must reuse it rather than shuffle twice
    val docIdExchanges = "hashpartitioning\\(doc_id#\\d+L?, \\d+\\)"
      .r.findAllIn(p).size
    assert(docIdExchanges == 1,
      s"expected one doc_id-only exchange shared by both windows, got $docIdExchanges:\n$p")
  }

  test("global row numbering has no single-partition stage") {
    val p = plan("t_rownum")
    assert(!p.contains("SinglePartition"),
      s"row numbering must not funnel rows through one task:\n$p")
    assert(!p.contains("Window "), s"no global window expected:\n$p")
  }

  test("interval join is an equi-join, never nested-loop or cartesian") {
    val p = plan("q_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucket expansion must produce an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"no hash/merge equi-join found:\n$p")
  }

  test("contamination joins the benchmark set via broadcast") {
    val p = plan("t_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast, not shuffle the corpus:\n$p")
  }

  test("IVF fit is distributive: no member-sized collect_list, partial sums") {
    // the fit's per-(cell, dim) mean must aggregate with sum/count (bounded
    // per-group state), never sort_array(collect_list(<members>)) — the
    // shape that OOMs when a cell is corpus/nCentroids at 100 TB. The only
    // remaining collect_list is the per-centroid vector assembly, bounded
    // by the embedding DIMENSION, not the cell size.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ops.Similarity.ivfFit(e).queryExecution.executedPlan.toString
    assert(!p.contains("sort_array(collect_list"),
      s"fit must not materialize cell members per (cell, dim):\n$p")
    assert(p.contains("sum("), s"fit mean must be a distributive sum:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"fit sum must have a map-side partial stage:\n$p")
    // the k-means generalization must keep the same shape in its FINAL
    // stats stage (the one whose plan is user-visible): integer partial
    // sums, no member-sized collect — every earlier iteration was already
    // collapsed to broadcast centroid literals by the fit-then-broadcast
    // materialization, so nothing upstream can hide an unbounded collect
    val k = graft.ops.Similarity.kmeansFitStats(e, k = 8, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!k.contains("collect_list"),
      s"kmeans stats must never materialize members:\n$k")
    assert(k.contains("sum(") && "HashAggregate".r.findAllIn(k).size >= 2,
      s"kmeans stats must be distributive partial sums:\n$k")
  }

  test("embedding near-dups: pair generation joins vectors back by id (equi-join)") {
    val p = plan("t_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed near-dup must stay an equi-join:\n$p")
  }

  test("bucket-pair generation: no unbounded membership collect; shared exchange") {
    // the two-regime shape (small buckets collected bounded-by-cap,
    // over-cap buckets projected as star pairs) must (a) never aggregate a
    // bucket's full membership — no collect_set (the mask/bhs collects are
    // bounded at 16 rows per id, the pair collect at cap members) —
    // and (b) share the pass-1 occupancy exchange between the star branch
    // and the per-doc mask aggregation: the final adaptive plan must read
    // the band-keyed exchange through a ReusedExchange, which is also the
    // proof the (possibly uncached) signature explode below it ran once
    import spark.implicits._
    val docs = (1L to 300L)
      .map(i => (i, s"shared boilerplate prefix tokens ${i % 7} tail " * 4))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashCandidates(
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text"), maxBucket = 8)
    pairs.collect() // finalize the adaptive plan
    val p = pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("collect_set"),
      s"bucket membership must never be collected into agg state:\n$p")
    assert("ReusedExchange \\[[^\\]]*\\], Exchange hashpartitioning\\(band"
      .r.findAllIn(p).nonEmpty,
      s"star branch must reuse the band-keyed pass-1 exchange (not recompute signatures):\n$p")
  }

  test("skew demo: both variants sort-merge; salted joins on (k, salt)") {
    // the regime where skew bites is a non-broadcastable dim: both plans
    // must be SortMergeJoin (no BroadcastHashJoin smuggling the problem
    // away), and the salted plan's join keys must include the salt column
    // so the hot key is split across reducers
    val naive = plan("q_skew_naive")
    assert(naive.contains("SortMergeJoin") && !naive.contains("BroadcastHashJoin"),
      s"naive variant must stay sort-merge:\n$naive")
    val salted = plan("q_skew_salted")
    assert(salted.contains("SortMergeJoin") && !salted.contains("BroadcastHashJoin"),
      s"salted variant must stay sort-merge:\n$salted")
    assert(salted.contains("__salt"),
      s"salted join keys must include the salt:\n$salted")
  }

  /** Set confs for the duration of `body`, restoring prior values after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-join: rescues the bare join, declines when the agg reuses " +
      "the join partitioning (the regime manual salting covers)") {
    import org.apache.spark.sql.functions._
    // same shape as the q_skew_* demo: 90% of the fact lands on key 0, the
    // dim is merge-hinted (the non-broadcastable regime where skew bites)
    // .repartition(8): AQE splits a skewed reduce partition at MAPPER-BLOCK
    // granularity — the sf0.001 file scans as a single mapper, whose one
    // block is unsplittable. Real-scale inputs have thousands of mappers;
    // 8 stands in for that here.
    val fact = spark.read.parquet(s"$dir/lineitem.parquet").selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN CAST(0 AS BIGINT) ELSE l_suppkey % 100 END AS k",
      "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents").repartition(8)
    val dim = spark.range(6400).selectExpr("id % 100 AS k", "id DIV 100 AS variant")
    // thresholds scaled down to the sf0.001 fixture so the hot partition
    // (~5.4k of 6k rows) registers as skewed under AQE's exact
    // MapOutputStatistics — deterministic, not a timing heuristic
    val aqeConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    withConf(aqeConfs: _*) {
      // regime 1: join output consumed as-is — AQE splits the skewed
      // partition at runtime (SortMergeJoin(skew=true)); no salting needed
      val bare = fact.join(dim.hint("merge"), Seq("k"))
      bare.collect()
      val bp = bare.queryExecution.executedPlan.toString
      assert(bp.contains("skew=true"),
        s"AQE should split the skewed partition of a bare SMJ:\n$bp")

      // regime 2: the join feeds an aggregation on the join key, which
      // reuses the join's hash partitioning — splitting the skewed
      // partition would break that guarantee and cost an extra shuffle,
      // so AQE declines. THIS is the regime Skew.saltedJoin exists for:
      // the salt splits the hot key in the first shuffle and only the
      // already-reduced partials are re-shuffled on k.
      // sum(cents), not count(1): column pruning would otherwise drop the
      // payload and the all-equal hot-key column compresses below the
      // skew threshold — detection, not the decline, would be what's
      // exercised
      val agged = fact.join(dim.hint("merge"), Seq("k"))
        .groupBy("k").agg(sum(col("cents")).as("s"))
      agged.collect()
      val ap = agged.queryExecution.executedPlan.toString
      assert(ap.contains("SortMergeJoin") && !ap.contains("skew=true"),
        s"AQE must decline the split when the agg reuses join partitioning:\n$ap")
    }

    // regime 3: forceOptimizeSkewedJoin overrides the decline, at the cost
    // of the extra shuffle — of the post-fanout join OUTPUT, the largest
    // intermediate, which is exactly what salting avoids
    withConf(aqeConfs :+
        ("spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"): _*) {
      val forced = fact.join(dim.hint("merge"), Seq("k"))
        .groupBy("k").agg(sum(col("cents")).as("s"))
      forced.collect()
      val fp = forced.queryExecution.executedPlan.toString
      assert(fp.contains("skew=true"),
        s"forceOptimizeSkewedJoin should split despite the downstream agg:\n$fp")
    }
  }

  test("corpusDrift scans the corpus ONCE: all four consumers of the " +
      "(slice, term) count frame reuse one exchange") {
    // the scaladoc's "ONE corpus scan" claim as a measured pin: ct/ns/nc
    // re-aggregate st rather than re-deriving from the raw tokens, and
    // the explicit isnotnull(slice) keeps the four subtrees canonically
    // identical (the joins would otherwise infer different per-branch
    // filters — the summaryFast nullable-id lesson). AQE stage reuse is
    // runtime-only, so the pin reads the final executed plan.
    val df = graft.ops.TextAnalysis.corpusDrift(
      spark.read.parquet(s"$dir/documents.parquet"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    val reused = p.linesIterator.count(_.contains("ReusedExchange"))
    assert(scans == 1, s"corpus must be scanned exactly once, got $scans:\n$p")
    assert(reused == 3,
      s"ct/ns/nc must all reuse st's exchange (3 ReusedExchange), got $reused:\n$p")
  }

  test("summaryFast shuffles both sides through ONE exchange (tagged union)") {
    // both sides are tagged and unioned BEFORE the repartition(id), and
    // hashpartitioning(id) satisfies the (id, v) grouping and the per-id
    // totals, so the whole single-pass summary must show exactly ONE
    // keyed data exchange; the only other exchange is the single-row
    // final aggregate's
    import org.apache.spark.sql.functions.col
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    def keyed(pred: String) = l.filter(pred).select(
      graft.functions.compositeKey(Seq("l_orderkey", "l_linenumber")).as("id"),
      col("l_extendedprice").as("check"))
    val df = graft.core.Validator.summaryFast(
      keyed("l_orderkey % 97 != 0"), keyed("l_orderkey % 89 != 0"),
      graft.core.CompareMode.Numeric)
    df.collect() // AQE: reuse is only visible in the final executed plan
    // executedPlan.toString appends the pre-AQE "Initial Plan" section —
    // assert on the final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val real = p.linesIterator.filter(ln =>
      ln.contains("Exchange hashpartitioning") && !ln.contains("ReusedExchange")).size
    assert(real == 1,
      s"expected exactly 1 physical keyed exchange (both sides ride the tagged union), got $real:\n$p")
    assert(!p.linesIterator.exists(ln =>
      ln.contains("Exchange hashpartitioning") && ln.contains("ENSURE_REQUIREMENTS")),
      s"no mid-plan re-exchange should survive — id partitioning must propagate:\n$p")
  }

  test("summaryFast keeps ONE keyed exchange on NULLABLE ids (parquet " +
      "inputs) in both exact and fuzzy modes") {
    // the dupkey rehearsal regression class: the fuzzy pair join infers
    // isnotnull(id) into ITS copies of the grouped union; were the
    // totals copy to lack that filter on a nullable id (every parquet
    // read) the subtrees would stop matching, exchange reuse would
    // never fire, and the union would be scanned and shuffled three
    // times. keyedSide()'s explicit isnotnull filter pins the match —
    // as does the single `side` tag column (two indicator columns would
    // prune differently per consumer below the exchange). This test is
    // the nullable-input twin of the compositeKey pin above.
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("pg_sfn").toString
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    def keyed(pred: String) = l.filter(pred).select(
      graft.functions.compositeKey(Seq("l_orderkey", "l_linenumber")).as("id"),
      col("l_extendedprice").cast("string").as("check"))
    keyed("l_orderkey % 97 != 0").write.parquet(s"$d/f")
    keyed("l_orderkey % 89 != 0").write.parquet(s"$d/s")
    // both nullable-input kinds that regressed: parquet scans AND
    // checkpointed RDD scans (the rehearsal legs' shape)
    val inputs = Seq(
      "parquet" -> (spark.read.parquet(s"$d/f"), spark.read.parquet(s"$d/s")),
      "checkpoint" -> (keyed("l_orderkey % 97 != 0").localCheckpoint(true),
        keyed("l_orderkey % 89 != 0").localCheckpoint(true)))
    for ((kind, (f, s)) <- inputs;
        mode <- Seq[graft.core.CompareMode](
          graft.core.CompareMode.Numeric, graft.core.CompareMode.Fuzzy(0.9))) {
      val df = graft.core.Validator.summaryFast(f, s, mode)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val real = p.linesIterator.filter(ln =>
        ln.contains("Exchange hashpartitioning") && !ln.contains("ReusedExchange")).size
      assert(real == 1,
        s"$kind/$mode: expected 1 keyed exchange, got $real:\n$p")
    }
  }

  test("summaryMulti holds ONE id-keyed exchange regardless of k (fuzzy " +
      "columns included, nullable parquet inputs)") {
    // the multi-column contract: k columns must NOT mean k scans or k
    // id-shuffles. The union rides one repartition(id) (rows shuffled
    // un-exploded, all k values side by side); the only other keyed
    // exchange is the k-row per-column rollup on pos, which moves
    // ~numPartitions x k rows after partial aggregation. Fuzzy legs
    // consume the same exchange through reuse (single side tag +
    // explicit isnotnull — the summaryFast lesson).
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("pg_smx").toString
    val o = spark.read.parquet(s"$dir/orders.parquet")
    o.filter("o_orderkey % 97 != 0").selectExpr("CAST(o_orderkey AS STRING) AS id",
      "o_totalprice", "o_orderdate", "o_orderstatus", "o_orderpriority")
      .write.parquet(s"$d/f")
    o.filter("o_orderkey % 89 != 0").selectExpr("CAST(o_orderkey AS STRING) AS id",
      "o_totalprice", "o_orderdate", "o_orderstatus", "o_orderpriority")
      .write.parquet(s"$d/s")
    val f = spark.read.parquet(s"$d/f")
    val sec = spark.read.parquet(s"$d/s")
    for (k <- Seq(2, 4)) {
      val checks = Seq(
        ("o_totalprice", graft.core.CompareMode.Numeric),
        ("o_orderdate", graft.core.CompareMode.Date),
        ("o_orderstatus", graft.core.CompareMode.Fuzzy(1.0)),
        ("o_orderpriority", graft.core.CompareMode.Fuzzy(0.9))).take(k)
      val df = graft.core.Validator.summaryMulti(f, sec, checks)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val idKeyed = p.linesIterator.filter(ln =>
        ln.contains("Exchange hashpartitioning(id#") &&
          !ln.contains("ReusedExchange")).size
      assert(idKeyed == 1,
        s"k=$k: expected 1 id-keyed exchange, got $idKeyed:\n$p")
      val scans = p.linesIterator.count(ln => ln.contains("FileScan parquet") &&
        !ln.contains("IsNull(id)"))
      assert(scans <= 2, s"k=$k: inputs scanned more than once each:\n$p")
    }
  }

  test("diffMulti runs ONE join for k columns (each side scanned once)") {
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val f = o.filter("o_orderkey % 97 != 0").selectExpr(
      "CAST(o_orderkey AS STRING) AS id", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val sec = o.filter("o_orderkey % 89 != 0").selectExpr(
      "CAST(o_orderkey AS STRING) AS id", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val df = graft.core.Validator.diffMulti(f, sec, Seq(
      ("o_totalprice", graft.core.CompareMode.Numeric),
      ("o_orderdate", graft.core.CompareMode.Date),
      ("o_orderpriority", graft.core.CompareMode.Fuzzy(0.9))))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joins = p.linesIterator.count(ln =>
      ln.contains("SortMergeJoin") || ln.contains("ShuffledHashJoin") ||
        ln.contains("BroadcastHashJoin"))
    assert(joins == 1, s"k columns must share one inner join, got $joins:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"each side must be scanned exactly once, got $scans:\n$p")
  }

  test("budget selection's global running sum has no single-partition stage") {
    val p = plan("t_budget_select")
    // strip the presentation orderBy tail: assert on the operator instead
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val op = graft.ops.Curation
      .selectUnderBudget(docs, "doc_id", "n_tokens", "n_chars", 1000L)
      .queryExecution.executedPlan.toString
    assert(!op.contains("Exchange SinglePartition"),
      s"global running sum must not funnel through one task:\n$op")
    // the range shuffle lives inside the localCheckpoint; what the final
    // plan must show is the running-sum window keyed by the partition id
    // (a keyed hash exchange), never a global (empty-partition) window
    assert(op.contains("windowspecdefinition(__pid"),
      s"running-sum window must be keyed by __pid:\n$op")
    assert(op.contains("Exchange hashpartitioning(__pid"),
      s"expected the balanced pid-keyed exchange:\n$op")
    assert(p.nonEmpty) // query itself resolves and plans
  }

  test("per-domain cap prunes via WindowGroupLimit; stratified sample never shuffles") {
    val p = plan("t_source_cap")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=cap filter not pushed into the window (map-side prune lost):\n$p")
    // the sampling OPERATOR is a pure scan-side filter — zero exchanges
    // (the query's orderBy is presentation for the oracle, pinned apart)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val samp = graft.ops.Sampling.stratifiedSample(docs, "doc_id", "lang",
        Seq("en" -> 2000), defaultBp = 8000)
      .queryExecution.executedPlan.toString
    assert(!samp.contains("Exchange"),
      s"stratified sample must be shuffle-free:\n$samp")
  }

  test("line dedup: frequent-line probe broadcasts; no cartesian") {
    // the frequent-line set is small by construction (<= lines/minCount),
    // so AQE must convert the anti-join to a broadcast probe — the
    // exploded corpus is never shuffled on line content
    // crafted corpus with BOTH surviving and dropped lines — an all-
    // dropped corpus lets AQE collapse the reassembly join to a null
    // projection and the pin would assert nothing
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"unique line $i\ncookie banner"))
      .toDF("doc_id", "text")
    val out = graft.ops.Curation.lineDedup(docs, "doc_id", "text", minCount = 2)
    out.collect() // AQE: join strategy is only visible in the final plan
    val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"frequent-line anti-join must broadcast the small build side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no unkeyed join anywhere in line dedup:\n$p")
  }

  test("span dedup: keyed probe and regroup only; no cartesian, no unkeyed join") {
    import spark.implicits._
    // shared span in two docs plus unique remainders — both the
    // duplicated-window probe and the reassembly join must stay keyed
    val docs = (1 to 100).map(i =>
      (i.toLong, s"shared span tokens w1 w2 w3 unique$i tail$i")).toDF("doc_id", "text")
    val out = graft.ops.Curation.spanDedup(docs, "doc_id", "text", k = 5, minCount = 2)
    out.collect()
    val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span dedup must never plan an unkeyed join:\n$p")
    assert(p.contains("LeftSemi"),
      s"duplicated-window probe must be the keyed semi-join:\n$p")
  }

  test("semantic dedup: centroid assignment broadcasts, no cartesian anywhere") {
    val p = plan("t_semantic_dedup")
    // the corpus x centroids argmax is a deliberate k-row broadcast
    // nested-loop; a CartesianProduct would mean the corpus got crossed
    // with something non-broadcast (the C(n,2) disaster this operator's
    // bounded bucketing exists to prevent)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment must broadcast the k centroids:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"semantic dedup must never plan a cartesian:\n$p")
  }

  test("CosineSim emits its fused loop inside whole-stage codegen (no fallback eval)") {
    import org.apache.spark.sql.functions._
    // range -> project is a WholeStageCodegen span; if CosineSim were a
    // CodegenFallback the generated Java would call the expression's
    // interpreted eval through `references` instead of inlining the loop
    val df = spark.range(8).select(
      graft.functions.cosineSimilarity(
        array(lit(1.0f), col("id").cast("float")),
        array(lit(2.0f), lit(1.0f))).as("cos"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("Found 1 WholeStageCodegen subtrees"),
      s"projection not codegen'd:\n$gen")
    assert(gen.contains(".getFloat(") && gen.contains(".numElements()"),
      s"fused primitive loop not inlined in generated code:\n$gen")
    assert(!gen.contains("CodegenFallback"),
      s"cosine fell back to interpreted eval:\n$gen")
    // and the generated loop computes the right thing
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(1) - (2.0 + 1.0) /
      (math.sqrt(2.0) * math.sqrt(5.0))) < 1e-12)
  }
}
