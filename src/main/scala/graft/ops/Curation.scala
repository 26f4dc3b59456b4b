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
