package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis.normalized

/** Corpus-curation operators a training-data pipeline runs before
  * training: benchmark decontamination and PII redaction.
  *
  * Scale shapes: decontamination is shingle-explode + a BROADCAST join
  * against the (small) benchmark shingle set — the corpus is scanned once
  * and never shuffled on content; redaction is a pure per-row expression
  * chain (regexp_extract_all / regexp_replace), codegen'd in the scan.
  */
object Curation {

  /** Benchmark contamination check (the n-gram-overlap decontamination
    * shape): for every document, how many of its distinct word `n`-gram
    * shingles also occur in the benchmark corpus. `bench` and `docs` both
    * carry (idCol, textCol); benchmark shingles are deduped and broadcast.
    * Documents with no shingles (empty text) produce no row. Output:
    * (id, n_shingles, n_shared, contaminated 0/1). */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val shingleUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long] else Dedup.shingleHashes(text, n)
    }
    def shingles(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(array_distinct(shingleUdf(normalized(col(textCol))))).as("sh"))
    val benchSet = shingles(bench).select("sh").distinct()
      .withColumn("__hit", lit(1L))
    shingles(docs)
      .join(broadcast(benchSet), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .withColumn("contaminated",
        when(col("n_shared") > 0, 1L).otherwise(0L))
  }

  /** Per-domain document cap — the "no single domain dominates the
    * corpus" rebalancing step of web-crawl curation: keep at most `cap`
    * documents per domain, picking deterministically by `orderCol`
    * (ascending; unique => stable under reruns). Output adds
    * `domain_rank` (1-based within the domain).
    *
    * Scale: one shuffle on the domain key. The rank filter is rewritten
    * by Catalyst into a WindowGroupLimit (pinned in PlanGuardSpec), so
    * each MAP task pre-prunes to its local top-`cap` per domain before
    * the exchange — a mega-domain with 10^8 pages ships cap rows per
    * upstream partition, not 10^8 rows, and the post-shuffle sort is
    * over the pruned stream. */
  def perDomainCap(docs: DataFrame, domainCol: String, orderCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(orderCol))
    docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }

  /** Incremental ingest dedup: rows of `batch` whose `fpCol` fingerprint
    * does not already occur in `corpus`. EXACT — the Bloom filter is a
    * pre-filter only, never the decision:
    *
    *  - rows the filter rules out ("definitely not in corpus" — Bloom
    *    filters have no false negatives) pass WITHOUT touching the join;
    *  - only "maybe present" rows (true duplicates + ~fpp false
    *    positives) go through the exact left-anti join for confirmation.
    *
    * Scale: the daily-batch side of the anti-join shrinks from |batch| to
    * |true dups| + fpp·|batch| — for a typical ingest where most rows are
    * new, that is the difference between shuffling the whole batch and
    * shuffling almost nothing. The filter itself is one corpus scan
    * aggregated to ~1.2 bytes/item at fpp=1% (sized by
    * `expectedCorpusRows`); at 10^10+ corpus rows, build it over the
    * recent-partition slice most dups come from (or raise fpp) — the
    * confirm join keeps the result exact for ANY filter quality, so
    * sizing is purely a throughput knob. */
  def incrementalNew(batch: DataFrame, corpus: DataFrame, fpCol: String,
      expectedCorpusRows: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = corpus.stat.bloomFilter(fpCol, expectedCorpusRows, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf { (s: String) => s != null && bc.value.mightContainString(s) }
    val definitelyNew = batch.filter(!mightContain(col(fpCol)))
    val confirmed = batch.filter(mightContain(col(fpCol)))
      .join(corpus.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(confirmed)
  }

  /** Token-budget corpus selection — "take the best documents until the
    * training budget is spent": rows ranked by (`rankCol` DESC, `idCol`)
    * are kept while the INCLUSIVE running total of `tokensCol` stays
    * within `budgetTokens`. Built on
    * [[Indexing.globalRunningSum]], so the global cumulative sum has no
    * single-partition stage — the selection scales to any corpus size.
    * Appends `cum_tokens`. */
  def selectUnderBudget(docs: DataFrame, idCol: String, tokensCol: String,
      rankCol: String, budgetTokens: Long): DataFrame =
    Indexing.globalRunningSum(docs,
        Seq(col(rankCol).desc, col(idCol).asc), tokensCol, "cum_tokens")
      .filter(col("cum_tokens") <= budgetTokens)

  /** RE2-compatible patterns (identical semantics in Java regex), so an
    * external engine can replay the redaction byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: count and mask email addresses and IPv4 literals.
    * Pure expression chain — no UDF, stays in whole-stage codegen.
    * Output adds (n_emails, n_ips, redactedCol). */
  def redactPii(docs: DataFrame, textCol: String,
      redactedCol: String = "redacted"): DataFrame =
    docs
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn(redactedCol,
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"))
}
