package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CompareMode, Validator}
import graft.functions.compositeKey

/** Truth-table and invariant tests for the core diff kernels
  * (SURVEY §2.4 V2/V3/F1, §2.3 J1-J3). */
class ValidatorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keyed(rows: Seq[(String, String)]) =
    rows.toDF("id", "check")

  test("anti-joins partition the key universe") {
    val f = keyed(Seq("1" -> "a", "2" -> "b", "3" -> "c"))
    val s = keyed(Seq("2" -> "b", "3" -> "x", "4" -> "d"))
    val out = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
    assert(out.missingInFirst.as[String].collect().sorted.toSeq == Seq("4"))
    assert(out.missingInSecond.as[String].collect().sorted.toSeq == Seq("1"))
    assert(out.differing.select("id").as[String].collect().toSeq == Seq("3"))
  }

  test("numeric truth table: both-null equal, one-null differs, 13 == 13.0, garbage coerces to null") {
    val f = keyed(Seq("1" -> "13", "2" -> null, "3" -> null, "4" -> "7", "5" -> "xx", "6" -> "1e3"))
    val s = keyed(Seq("1" -> "13.0", "2" -> null, "3" -> "9", "4" -> "8", "5" -> "yy", "6" -> "1000"))
    val out = Validator.validate(f, s, CompareMode.Numeric)
    // 1: 13 == 13.0; 2: both null equal; 3: one-null differs; 4: differs;
    // 5: both coerce to null -> equal; 6: 1e3 == 1000
    assert(out.differing.select("id").as[String].collect().sorted.toSeq == Seq("3", "4"))
  }

  test("date truth table") {
    val f = keyed(Seq("1" -> "2024-01-01 00:00:00", "2" -> null, "3" -> "2024-01-01 00:00:00", "4" -> "bogus"))
    val s = keyed(Seq("1" -> "2024-01-01 00:00:00", "2" -> null, "3" -> "2024-01-02 00:00:00", "4" -> "bogus"))
    val out = Validator.validate(f, s, CompareMode.Date)
    assert(out.differing.select("id").as[String].collect().sorted.toSeq == Seq("3"))
  }

  test("fuzzy threshold < 1 uses difflib ratio with null semantics") {
    val f = keyed(Seq("1" -> "CTS-VS", "2" -> "Ssierraa", "3" -> null, "4" -> null, "5" -> "same"))
    val s = keyed(Seq("1" -> "CTS-V", "2" -> "Sierra", "3" -> "x", "4" -> null, "5" -> "same"))
    // ratios: 0.909, 0.857; threshold 0.9 keeps only pairs below it + one-null
    val out = Validator.validate(f, s, CompareMode.Fuzzy(0.9))
    assert(out.differing.select("id").as[String].collect().sorted.toSeq == Seq("2", "3"))
    // threshold 1.0 = exact equality fast path: golden artifact rows differ
    val exact = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
    assert(exact.differing.select("id").as[String].collect().sorted.toSeq == Seq("1", "2", "3"))
  }

  test("duplicate ids keep many-to-many join multiplicity (pandas merge parity)") {
    val f = keyed(Seq("1" -> "a", "1" -> "b"))
    val s = keyed(Seq("1" -> "c", "1" -> "d"))
    val out = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
    assert(out.differing.count() == 4) // 2x2 cartesian per key
  }

  test("composite key: null -> '0', joined with underscore") {
    val df = Seq((Some(1), "A"), (None, "B")).toDF("k1", "k2")
    val keys = df.select(compositeKey(Seq("k1", "k2")).as("id"))
      .as[String].collect().sorted.toSeq
    assert(keys == Seq("0_B", "1_A"))
  }

  test("reconcile merges with status labels and resolution strategies") {
    import graft.core.Validator.Resolution
    val f = keyed(Seq("1" -> "a", "2" -> "b", "3" -> null))
    val s = keyed(Seq("2" -> "x", "3" -> null, "4" -> "d"))
    val rows = Validator.reconcile(f, s).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("1") == (("a", "only_first")))
    assert(rows("2") == (("b", "conflict"))) // prefer first
    assert(rows("3") == ((null, "match")))   // both-null is a match
    assert(rows("4") == (("d", "only_second")))
    val second = Validator.reconcile(f, s, Resolution.PreferSecond).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(second("2") == "x")
    val nulls = Validator.reconcile(f, s, Resolution.NullOnConflict).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(nulls("2").isEmpty)
  }

  test("summaryFast equals multi-action summary incl. duplicate keys and nulls") {
    val f = keyed(Seq("1" -> "10", "1" -> "20", "2" -> null, "3" -> "30", "5" -> "x"))
    val s = keyed(Seq("1" -> "10", "1" -> "99", "2" -> null, "4" -> "40", "5" -> "y"))
    for (mode <- Seq[CompareMode](CompareMode.Numeric, CompareMode.Fuzzy(1.0))) {
      val slow = Validator.summary(f, s, Validator.validate(f, s, mode)).collect()(0)
      val fast = Validator.summaryFast(f, s, mode).collect()(0)
      for (c <- Seq("n_first", "n_second", "missing_in_first", "missing_in_second",
          "n_differing", "n_matched"))
        assert(fast.getAs[Long](c) == slow.getAs[Long](c),
          s"$mode/$c: fast=${fast.getAs[Long](c)} slow=${slow.getAs[Long](c)}")
    }
    // empty input edge
    val empty = keyed(Seq.empty[(String, String)])
    val z = Validator.summaryFast(empty, empty, CompareMode.Numeric).collect()(0)
    assert((0 until 6).forall(i => z.getLong(i) == 0L))
  }

  test("fuzzy summaryFast equals multi-action summary and runs as ONE action") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // duplicate keys (m-by-n multiplicity), one-null / both-null values,
    // ratios straddling the 0.9 threshold (CTS-VS vs CTS-V = 10/11 ≈ .909
    // passes; Ssierraa vs Sierra ≈ .857 fails)
    val f = keyed(Seq("1" -> "CTS-VS", "1" -> "Ssierraa", "2" -> null,
      "3" -> null, "4" -> "only_f", "5" -> "same", "5" -> "same"))
    val s = keyed(Seq("1" -> "CTS-V", "2" -> null, "3" -> "x",
      "5" -> "same", "5" -> "samey", "6" -> "only_s"))
    val mode = CompareMode.Fuzzy(0.9)

    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        if (qe.analyzed.schema.fieldNames.contains("n_differing"))
          actions.incrementAndGet()
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val fast = try {
      val row = Validator.summaryFast(f, s, mode).collect()(0)
      // any action summaryFast ran has posted its (async) execution event
      // by the time collect() returned; draining the listener bus makes
      // the count deterministic — no lingers, no late-event races
      org.apache.spark.graft.SparkTestAccess
        .waitUntilListenerBusEmpty(spark.sparkContext)
      assert(actions.get() == 1,
        s"single-pass fuzzy summary must run as ONE action, saw ${actions.get()}")
      row
    } finally spark.listenerManager.unregister(listener)

    val slow = Validator.summary(f, s, Validator.validate(f, s, mode)).collect()(0)
    for (c <- Seq("n_first", "n_second", "missing_in_first",
        "missing_in_second", "n_differing", "n_matched"))
      assert(fast.getAs[Long](c) == slow.getAs[Long](c),
        s"$c: fast=${fast.getAs[Long](c)} slow=${slow.getAs[Long](c)}")
  }

  test("bucket checksums localize differences to the right buckets") {
    import org.apache.spark.sql.functions._
    val f = (1 to 1000).map(i => (i.toString, i.toDouble)).toDF("id", "check")
    // second side: value changed for id=7, row missing for id=900
    val s = (1 to 1000).filter(_ != 900)
      .map(i => (i.toString, if (i == 7) i + 0.5 else i.toDouble)).toDF("id", "check")
    val bucket = pmod(col("id").cast("long"), lit(10L))
    val bad = Validator.differingBuckets(f, s, bucket)
      .select("bucket").as[Long].collect().toSet
    assert(bad == Set(7L % 10, 900L % 10))
  }

  test("summary counts are consistent") {
    val f = keyed(Seq("1" -> "a", "2" -> "b", "3" -> "c"))
    val s = keyed(Seq("2" -> "b", "3" -> "x", "4" -> "d"))
    val out = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
    val row: Row = Validator.summary(f, s, out).collect()(0)
    assert(row.getAs[Long]("n_first") == 3)
    assert(row.getAs[Long]("n_second") == 3)
    assert(row.getAs[Long]("missing_in_first") == 1)
    assert(row.getAs[Long]("missing_in_second") == 1)
    assert(row.getAs[Long]("n_differing") == 1)
    assert(row.getAs[Long]("n_matched") == 2)
  }
  test("V1 key divergence pinned: null component -> \"0\", wholly-null key stays null (vs pandas \"nan\")") {
    // The reference stringifies keys with pandas astype(str)
    // (running_validation.py:219-220), which renders missing values as the
    // LITERAL string "nan" — so two rows with missing keys JOIN each other.
    // Our engine diverges deliberately (documented in README):
    //  - a null COMPONENT of a composite key becomes "0" (the reference's
    //    own SQL-side COALESCE(...,'0'), running_validation.py:471-476)
    //  - a WHOLLY-null key stays SQL null: it never equals another null in
    //    a join, so such rows surface in the anti-joins ("missing"), never
    //    in the inner-join diff.
    import org.apache.spark.sql.functions.col
    val comp = Seq((Option(1L), Option("A")), (None: Option[Long], Option("B")),
        (None: Option[Long], None: Option[String]))
      .toDF("k1", "k2")
      .select(compositeKey(Seq("k1", "k2")).as("id")).as[String].collect().toSeq
    assert(comp == Seq("1_A", "0_B", "0_0"),
      "null components must render as \"0\", never as \"nan\"")

    // wholly-null id on BOTH sides with equal check values: pandas would
    // match them ("nan" == "nan"); we emit each as missing on its side
    val f = Seq((null: String, "same"), ("1", "a")).toDF("id", "check")
    val s = Seq((null: String, "same"), ("1", "a")).toDF("id", "check")
    val out = Validator.validate(f, s, CompareMode.Fuzzy(1.0))
    assert(out.differing.count() == 0)
    assert(out.missingInFirst.filter(col("id").isNull).count() == 1,
      "null-key row of second must surface as missing_in_first, not join")
    assert(out.missingInSecond.filter(col("id").isNull).count() == 1,
      "null-key row of first must surface as missing_in_second, not join")
  }
  test("schemaDiff catches retyped, dropped, and added columns from metadata") {
    val a = Seq((1L, 1.5, "x")).toDF("id", "price", "only_a")
    val b = Seq(("1", 2.5, true)).toDF("id", "price", "only_b")
      .selectExpr("id", "CAST(price AS STRING) AS price", "only_b")
    val got = Validator.schemaDiff(a, b).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[String]("status")).toMap
    assert(got == Map("id" -> "type_mismatch", "price" -> "type_mismatch",
      "only_a" -> "only_first", "only_b" -> "only_second"))
    val same = Validator.schemaDiff(a, a).collect()
    assert(same.forall(_.getAs[String]("status") == "match"))
  }
}
