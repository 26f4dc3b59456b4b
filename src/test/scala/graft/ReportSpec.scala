package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CompareMode, Validator}
import graft.report.ReportWriter

/** Report assembly (V4/V5) + golden-parity reproduction of the reference's
  * only output artifact
  * (`output/result/output_oracle_postgres_MODEL_result.csv_differing_values.csv`):
  * ids 84 (`CTS-VS` vs `CTS-V`) and 94 (`Ssierraa` vs `Sierra`) flagged at
  * threshold=1 despite fuzzy mode. */
class ReportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def goldenFrames = {
    // "oracle" side: 2 rows; "postgres" side: those keys + extras
    val oracleDf = Seq(("84", "CTS-VS"), ("94", "Ssierraa")).toDF("id", "check")
    val postgresDf = Seq(("84", "CTS-V"), ("94", "Sierra"), ("7", "Civic"),
      ("12", "Accord")).toDF("id", "check")
    (oracleDf, postgresDf)
  }

  test("golden artifact reproduction: threshold=1 flags both rows") {
    val (ora, pg) = goldenFrames
    val out = Validator.validate(ora, pg, CompareMode.Fuzzy(1.0),
      firstName = "oracle", secondName = "postgres", checkName = "MODEL")
    val diffs = out.differing.orderBy("id").collect()
    assert(diffs.map(_.getString(0)).toSeq == Seq("84", "94"))
    assert(out.differing.columns.toSeq == Seq("id", "MODEL_oracle", "MODEL_postgres"))
    assert(diffs.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("CTS-VS", "CTS-V"), ("Ssierraa", "Sierra")))
    // at threshold 0.9 the 0.909 pair passes, the 0.857 pair is flagged
    val fuzzy = Validator.validate(ora, pg, CompareMode.Fuzzy(0.9))
    assert(fuzzy.differing.select("id").as[String].collect().toSeq == Seq("94"))
  }

  test("padded summary zips three independent result sets with null padding") {
    val (ora, pg) = goldenFrames
    val out = Validator.validate(ora, pg, CompareMode.Fuzzy(1.0))
    val padded = ReportWriter.paddedSummary(out).collect()
    // max(missing1=2, missing2=0, diffs=2) rows
    assert(padded.length == 2)
    assert(padded.forall(_.length == 3))
    val m1 = padded.map(_.getString(0)).filter(_ != null).sorted
    assert(m1.toSeq == Seq("12", "7"))
    assert(padded.map(_.getString(1)).forall(_ == null)) // no missing_in_second
    assert(padded.map(_.getString(2)).forall(s => s != null && s.startsWith("{")))
  }

  test("compat CSV writer uses the reference naming convention") {
    val (ora, pg) = goldenFrames
    val out = Validator.validate(ora, pg, CompareMode.Fuzzy(1.0),
      firstName = "oracle", secondName = "postgres", checkName = "MODEL")
    val dir = Files.createTempDirectory("report").toString
    ReportWriter.writeCompat(out, dir, "oracle", "postgres", "MODEL")
    val base = new java.io.File(s"$dir/output_oracle_postgres_MODEL_result.csv")
    val diffs = new java.io.File(s"$dir/output_oracle_postgres_MODEL_result.csv_differing_values.csv")
    assert(base.isDirectory && base.listFiles().exists(_.getName.endsWith(".csv")))
    assert(diffs.isDirectory && diffs.listFiles().exists(_.getName.endsWith(".csv")))
    val diffCsv = diffs.listFiles().filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(diffCsv).getLines().toSeq
    assert(lines.head == "id,MODEL_oracle,MODEL_postgres")
    assert(lines.tail.toSet == Set("84,CTS-VS,CTS-V", "94,Ssierraa,Sierra"))
  }

  test("differing-values CSV matches the reference golden artifact byte for byte") {
    // the reference's ONLY recorded output artifact, reproduced from the
    // synthesized 2-row input: header, naming, row order, line endings,
    // trailing newline — the whole file, not just the parsed content
    val golden = java.nio.file.Paths.get("/root/reference/output/result",
      "output_oracle_postgres_MODEL_result.csv_differing_values.csv")
    assume(Files.exists(golden), "reference golden artifact not present")
    val (ora, pg) = goldenFrames
    val out = Validator.validate(ora, pg, CompareMode.Fuzzy(1.0),
      firstName = "oracle", secondName = "postgres", checkName = "MODEL")
    val dir = Files.createTempDirectory("golden").toString
    ReportWriter.writeCompat(out, dir, "oracle", "postgres", "MODEL")
    val produced = new java.io.File(
      s"$dir/output_oracle_postgres_MODEL_result.csv_differing_values.csv")
      .listFiles().filter(_.getName.endsWith(".csv")).head
    val gotBytes = Files.readAllBytes(produced.toPath)
    val wantBytes = Files.readAllBytes(golden)
    assert(java.util.Arrays.equals(gotBytes, wantBytes),
      s"byte mismatch:\n--- got ---\n${new String(gotBytes)}" +
        s"--- want ---\n${new String(wantBytes)}")
  }

  test("tidy writer emits three datasets") {
    val (ora, pg) = goldenFrames
    val out = Validator.validate(ora, pg, CompareMode.Fuzzy(1.0))
    val dir = Files.createTempDirectory("tidy").toString
    ReportWriter.writeTidy(out, dir)
    for (n <- Seq("missing_in_first", "missing_in_second", "differing_values"))
      assert(spark.read.parquet(s"$dir/$n").count() >= 0)
  }

  test("partitioned writer: one dir per key, bounded file sizes, lossless") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 600)
      .select(col("id"), (col("id") % 3).cast("string").as("part"))
    val dir = Files.createTempDirectory("pwrite").toString
    ReportWriter.writePartitioned(df, dir, Seq("part"), maxRecordsPerFile = 50L)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq == Seq("part=0", "part=1", "part=2"))
    for (d <- dirs) {
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      // 200 rows per partition at <=50 rows/file -> at least 4 files,
      // none above the cap
      assert(files.length >= 4, s"$d: ${files.length} files")
      for (f <- files)
        assert(spark.read.parquet(f.getAbsolutePath).count() <= 50L)
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 600)
    assert(back.select(sum("id")).head.getLong(0) == (0L until 600L).sum)
    // salted variant: the hot partition is written by multiple tasks
    val dir2 = Files.createTempDirectory("pwrite2").toString
    ReportWriter.writePartitioned(df, dir2, Seq("part"),
      maxRecordsPerFile = 1000L, tasksPerPartition = 3)
    assert(spark.read.parquet(dir2).count() == 600)
  }
}
