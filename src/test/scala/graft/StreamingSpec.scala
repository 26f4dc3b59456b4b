package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  test("streaming table diff equals the batch full-outer diff under " +
      "multi-batch out-of-order replay (complete mode)") {
    import spark.implicits._
    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    // two sides with missing keys on each and perturbed values; written
    // as 3-file directories consumed one file per trigger, so keys and
    // values arrive across micro-batches in arbitrary (ts-disordered)
    // interleavings — the late-data replay the distributive state must
    // absorb
    val obsB = e.filter(col("event_id") % 11 =!= 0)
      .select(col("event_id"), col("value"))
    val refB = e.filter(col("event_id") % 13 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, col("value") + 1.0)
          .otherwise(col("value")).as("value"))
    val d = java.nio.file.Files.createTempDirectory("stdiff").toString
    obsB.repartition(3).write.parquet(s"$d/obs")
    refB.repartition(3).write.parquet(s"$d/ref")
    def streamOf(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)
    val got = StreamingOps.withShufflePartitions(spark, 4) {
      StreamingOps.runToMemory(
        StreamingOps.streamingTableDiff(
          streamOf(s"$d/obs"), streamOf(s"$d/ref"), "event_id", "value"),
        "stdiff_eq", OutputMode.Complete())
    }.select("id", "kind", "observed", "expected")
    // presence via flags, not value nullness: a key present only in obs
    // with a NULL observed value is missing_in_reference, which a
    // value-null test would mislabel as missing_in_stream
    val batch = obsB.select(col("event_id").as("id"), col("value").as("observed"))
      .withColumn("in_o", lit(1))
      .join(refB.select(col("event_id").as("id"), col("value").as("expected"))
        .withColumn("in_r", lit(1)), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("in_r").isNull, "missing_in_reference")
          .when(col("in_o").isNull, "missing_in_stream")
          .when(!(col("observed") <=> col("expected")), "differing").as("kind"),
        col("observed"), col("expected"))
      .filter(col("kind").isNotNull)
    assert(got.count() > 0)
    assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
  }

  test("multi-column streaming table diff equals per-column single-column " +
      "diffs under multi-batch out-of-order replay (complete mode)") {
    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val obsB = e.filter(col("event_id") % 11 =!= 0)
      .select(col("event_id"),
        col("value").cast("string").as("v1"),
        col("event_type").as("v2"))
    val refB = e.filter(col("event_id") % 13 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, col("value") + 1.0)
          .otherwise(col("value")).cast("string").as("v1"),
        when(col("event_id") % 5 === 0, concat(col("event_type"), lit("X")))
          .otherwise(col("event_type")).as("v2"))
    val d = java.nio.file.Files.createTempDirectory("stdiffm").toString
    obsB.repartition(3).write.parquet(s"$d/obs")
    refB.repartition(3).write.parquet(s"$d/ref")
    def streamOf(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)
    val got = StreamingOps.withShufflePartitions(spark, 4) {
      StreamingOps.runToMemory(
        StreamingOps.streamingTableDiffMulti(
          streamOf(s"$d/obs"), streamOf(s"$d/ref"), "event_id",
          Seq("v1", "v2")),
        "stdiffm_eq", OutputMode.Complete())
    }.collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    // per-column single-column runs over the SAME inputs, long-formatted
    val singles = Seq("v1", "v2").flatMap { c =>
      StreamingOps.withShufflePartitions(spark, 4) {
        StreamingOps.runToMemory(
          StreamingOps.streamingTableDiff(
            streamOf(s"$d/obs"), streamOf(s"$d/ref"), "event_id", c),
          s"stdiffm_s_$c", OutputMode.Complete())
      }.collect().map(r => (r.get(0).toString, c, r.getString(1),
        Option(r.get(2)).map(_.toString).orNull,
        Option(r.get(3)).map(_.toString).orNull))
    }.toSet
    assert(got.nonEmpty)
    assert(got == singles,
      s"multi minus singles: ${(got -- singles).take(5)}; " +
        s"singles minus multi: ${(singles -- got).take(5)}")
  }

  test("bounded streaming table diff: differing emitted on arrival incl. " +
      "within-watermark late data, missing keys emitted and EVICTED when " +
      "the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)
    val obs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val ref = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val diff = StreamingOps.streamingTableDiffBounded(
      obs.toDF().toDF("id", "ts", "value"),
      ref.toDF().toDF("id", "ts", "value"),
      "id", "value", "ts", horizon = "1 hour", watermark = "30 minutes")
    val q = diff.writeStream.format("memory").queryName("stdiff_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 @ ~t100: key 1 matched-equal (never emits), key 2
      // differing, key 3 observed-only, key 4 expected-only, and key 5's
      // reference waiting for its late observation
      obs.addData((1L, ts(100), 5.0), (2L, ts(100), 5.0), (3L, ts(100), 7.0))
      ref.addData((1L, ts(101), 5.0), (2L, ts(100), 6.0), (4L, ts(100), 8.0),
        (5L, ts(100), 9.0))
      q.processAllAvailable()
      // batch 2: key 5's observation arrives LATE (t80 < max seen t101)
      // but inside the 30-minute watermark -> still joined and scored
      obs.addData((5L, ts(80), 9.5))
      q.processAllAvailable()
      // batch 3: a far-future matched pair pushes the watermark past
      // every horizon -> keys 3 and 4 finalize as missing; the sentinel
      // itself is equal on both sides and must not emit
      obs.addData((999L, ts(1000), 1.0))
      ref.addData((999L, ts(1000), 1.0))
      q.processAllAvailable()
      val rows = spark.table("stdiff_bounded")
        .select("id", "kind").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(rows == Set(
        2L -> "differing",
        5L -> "differing",
        3L -> "missing_in_reference",
        4L -> "missing_in_stream"), s"got $rows")
    } finally q.stop()
  }

  test("windowed counts match the batch equivalent") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
    val got = StreamingOps.runToMemory(
      StreamingOps.windowedCounts(stream, "1 hour", "10 minutes"),
      "win_test", OutputMode.Complete())
    val batch = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("value_cents"))
    val g = got.orderBy("window_start", "event_type").collect().toSeq
    val b = batch.orderBy("window_start", "event_type").collect().toSeq
    assert(g.nonEmpty && g == b)
  }

  test("streaming dedup removes duplicate event ids") {
    val raw = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath)).limit(100)
    val dupDir = java.nio.file.Files.createTempDirectory("dups").toString
    raw.union(raw).coalesce(1).write.mode("overwrite").parquet(dupDir)
    val stream = StreamingOps.readEvents(spark, dupDir)
    val got = StreamingOps.runToMemory(
      StreamingOps.dedupedEvents(stream), "dedup_test", OutputMode.Append())
    assert(got.count() == 100)
  }

  test("streaming validate flags mismatches against a static reference") {
    val events = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath)).limit(50)
    val dir = java.nio.file.Files.createTempDirectory("sv").toString
    events.write.mode("overwrite").parquet(dir)
    // reference: same rows but value+1 on even event_ids
    val ref = events.select(col("event_id"),
      when(col("event_id") % 2 === 0, col("value") + 1).otherwise(col("value")).as("value"))
    val stream = StreamingOps.readEvents(spark, dir)
    val got = StreamingOps.runToMemory(
      StreamingOps.streamingValidate(stream, ref), "sval_test", OutputMode.Append())
    val expected = events.filter(col("event_id") % 2 === 0).count()
    assert(got.count() == expected)
  }

  test("streaming HDR sketch equals the batch sketch exactly") {
    val cents = expr("CAST(ROUND(value*100) AS BIGINT)")
    val stream = StreamingOps.readEvents(spark, eventsPath)
      .select(col("event_type"), cents.as("cents"))
    val got = StreamingOps.runToMemory(
        StreamingOps.streamingSketch(stream, Seq("event_type"), "cents", m = 7),
        "ssk_test", OutputMode.Complete())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = graft.ops.Quantile.sketch(
        StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
          .select(col("event_type"), cents.as("cents")),
        Seq("event_type"), "cents", m = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("streaming HLL registers equal the batch sketch exactly") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
      .select(col("event_id").cast("string").as("k"))
    val got = StreamingOps.runToMemory(
      StreamingOps.streamingHll(stream, "k", p = 8),
      "shll_test", OutputMode.Complete())
    val batch = graft.ops.Frequency.hllSketch(
      StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
        .select(col("event_id").cast("string").as("k")), "k", p = 8)
    def regs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("register") -> r.getAs[Long]("max_rho")).toMap
    val g = regs(got)
    assert(g.nonEmpty && g == regs(batch))
  }

  test("streaming count-min equals the batch sketch; state bounded at depth*width") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
      .select(col("event_id").cast("string").as("k"))
    val sk = StreamingOps.streamingCountMin(stream, "k", depth = 4, width = 256)
    val q = StreamingOps.withShufflePartitions(spark, 8) {
      val qq = sk.writeStream.format("memory").queryName("scm_test")
        .outputMode(OutputMode.Complete()).start()
      try qq.processAllAvailable() finally qq.stop()
      qq
    }
    // zero state growth: the aggregation state can never exceed the
    // sketch geometry, no matter the stream volume or distinct keys
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st(0).numRowsTotal <= 4L * 256,
      s"count-min state must stay sketch-sized: ${q.lastProgress}")
    val batch = graft.ops.Frequency.countMinSketch(
      StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
        .select(col("event_id").cast("string").as("k")), "k", 4, 256)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getAs[Long]("cell")) -> r.getAs[Long]("cnt")).toMap
    val g = cells(spark.table("scm_test"))
    assert(g.nonEmpty && g == cells(batch))
    // mass conservation: every depth row holds every occurrence once
    val n = spark.read.parquet(eventsPath).count()
    (0 until 4).foreach { r =>
      assert(g.collect { case ((`r`, _), c) => c }.sum == n)
    }
  }

  test("stream-static ingest dedup is stateless and equals the batch anti-join") {
    val statics = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val fp = md5(concat_ws("|", col("user_id"), col("event_type"),
      expr("CAST(ROUND(value*100) AS BIGINT) div 1000")).cast("binary"))
    val corpus = statics.filter(col("event_id") % 2 === 0).select(fp.as("fp"))
    val stream = StreamingOps.readEvents(spark, eventsPath)
      .filter(col("event_id") % 2 === 1).withColumn("fp", fp)
    val out = StreamingOps.streamStaticNew(stream, corpus, "fp")
    val q = out.writeStream.format("memory").queryName("ssn_test")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    // stateless: the completed run reports NO state store operators —
    // nothing can accumulate across micro-batches
    assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
      s"stream-static anti-join must not create state: ${q.lastProgress}")
    val got = spark.table("ssn_test").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = statics.filter(col("event_id") % 2 === 1).withColumn("fp", fp)
      .join(corpus.distinct(), Seq("fp"), "left_anti")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("stateful sessions accumulate across multiple micro-batches") {
    // split events into 4 files, force one file per trigger: state must
    // carry across batches for totals to match the batch aggregate
    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val dir = java.nio.file.Files.createTempDirectory("multibatch").toString
    e.repartition(4).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // idleMinutes = None: the accumulate-forever variant — this test pins
    // exact cross-batch accumulation, which an eviction mid-run would reset
    val sessions = StreamingOps.userSessions(
      StreamingOps.normalizeEventTs(stream), idleMinutes = None)
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("multibatch_sess").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    // Update mode emits one row per user per batch; keep the final state:
    // max n_events per user equals the batch count
    val got = spark.table("multibatch_sess")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
  }

  test("session windows with event-time timeout match batch gaps-and-islands") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
    val got = StreamingOps.runToMemory(
      StreamingOps.sessionWindows(stream, gapMinutes = 30).toDF(),
      "sesswin_test", OutputMode.Append())

    // batch oracle: gaps-and-islands with the same 30-min gap
    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")
    val batch = e
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("sid", sum("new_sess").over(byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("total_cents"))
      .drop("sid")

    val gotRows = got.select("user_id", "session_start", "session_end", "n_events", "total_cents")
    // streaming emits only sessions whose timeout passed the final
    // watermark; every emitted session must match a batch session exactly,
    // and most sessions should have been emitted
    assert(gotRows.except(batch).count() == 0, "streaming emitted a session batch doesn't have")
    val nb = batch.count()
    val ng = gotRows.count()
    assert(ng > 0.5 * nb, s"too few sessions closed: $ng of $nb")
  }

  test("stream-stream interval join matches the batch range join") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
    val purchases = stream.filter(col("event_type") === "purchase")
    val views = stream.filter(col("event_type") === "view")
    val got = StreamingOps.runToMemory(
      StreamingOps.streamStreamIntervalJoin(purchases, views, "user_id", "1 hour"),
      "ssj_test", OutputMode.Append())

    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val bp = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts").as("l_ts"), col("event_id").as("l_event_id"))
    val bv = e.filter(col("event_type") === "view")
      .select(col("user_id").as("rk"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
    val batch = bp.join(bv,
        col("k") === col("rk") && col("r_ts") <= col("l_ts") &&
          col("r_ts") >= col("l_ts") - expr("INTERVAL 1 hour"))
      .select(col("k").as("user_id"), col("l_event_id"), col("l_ts"),
        col("r_event_id"), col("r_ts"), col("r_value"))
    assert(got.count() > 0)
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
  }

  test("windowed counts run on the RocksDB state store (large-state path)") {
    // heap state stores bound streaming state by executor memory; RocksDB
    // is the 100 TB configuration — verify the pipeline runs on it
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StreamingOps.readEvents(spark, eventsPath)
      val got = StreamingOps.runToMemory(
        StreamingOps.windowedCounts(stream, "1 hour", "10 minutes"),
        "rocks_test", OutputMode.Complete())
      val batch = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("value_cents"))
      assert(got.orderBy("window_start", "event_type").collect().toSeq ==
        batch.orderBy("window_start", "event_type").collect().toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateful user sessions equal batch per-user aggregates") {
    val stream = StreamingOps.readEvents(spark, eventsPath)
    val updates = StreamingOps.runToMemory(
      StreamingOps.userSessions(stream).toDF(), "sess_test", OutputMode.Update())
    // Update mode emits one row per user per batch, plus an idempotent
    // final re-emission when idle timeout evicts the state — reduce to the
    // final row per FRAGMENT (epoch_us), then sum fragments per user; this
    // is the documented exact reconstruction for any batch/eviction pattern
    val got = updates.groupBy("user_id", "epoch_us")
      .agg(max("n_events").as("n_events"),
        expr("max_by(total_cents, n_events)").as("total_cents"),
        min("first_ts").as("first_ts"),
        expr("max_by(last_ts, n_events)").as("last_ts"))
      .groupBy("user_id")
      .agg(sum("n_events").as("n_events"), sum("total_cents").as("total_cents"),
        min("first_ts").as("first_ts"), max("last_ts").as("last_ts"))
    val batch = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath)).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("total_cents"),
        min("ts").as("first_ts"), max("ts").as("last_ts"))
    val g = got.orderBy("user_id").collect().toSeq
    val b = batch.orderBy("user_id").collect().toSeq
    assert(g.size == b.size && g == b)
  }

  test("user sessions state is evicted after the idle timeout passes the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)
    val src = MemoryStream[StreamingOps.EventRow]
    val sessions = StreamingOps.userSessions(
      src.toDF(), watermark = "10 minutes", idleMinutes = Some(60))
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("evict_test").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: two user-1 events (offset from the epoch — a ts equal to
      // the initial watermark value 0 is filtered as late data)
      src.addData(StreamingOps.EventRow(1L, ts(100), 1L, "view", 1.0, "{}"),
        StreamingOps.EventRow(2L, ts(105), 1L, "view", 1.0, "{}"))
      q.processAllAvailable()
      // batch 2: a far-future user-2 event pushes the watermark past
      // user 1's idle horizon (105 + 60 min) -> user 1's state must time
      // out (final row re-emitted) and be REMOVED from the store
      src.addData(StreamingOps.EventRow(3L, ts(600), 2L, "view", 1.0, "{}"))
      q.processAllAvailable()
      // batch 3: user 1 returns; with state evicted the count restarts at 1
      src.addData(StreamingOps.EventRow(4L, ts(601), 1L, "view", 1.0, "{}"))
      q.processAllAvailable()
      val u1 = spark.table("evict_test").filter(col("user_id") === 1L)
        .select("n_events").as[Long].collect().toSeq
      assert(u1.contains(2L), s"pre-eviction updates missing: $u1")
      assert(u1.count(_ == 2L) == 2,
        s"timeout must re-emit the final row exactly once: $u1")
      assert(u1.last == 1L,
        s"post-eviction event must start a FRESH session (state removed): $u1")
      // the fragment contract: the two user-1 state generations carry
      // DISTINCT epochs, and the documented max_by-per-epoch-then-sum
      // reduction reconstructs the exact batch totals across the eviction
      val u1Rows = spark.table("evict_test").filter(col("user_id") === 1L)
      assert(u1Rows.select("epoch_us").distinct().count() == 2,
        "return after eviction must open a new fragment epoch")
      val rebuilt = u1Rows.groupBy("epoch_us")
        .agg(max("n_events").as("n"), expr("max_by(total_cents, n_events)").as("c"))
        .agg(sum("n"), sum("c")).collect()(0)
      assert(rebuilt.getLong(0) == 3L && rebuilt.getLong(1) == 300L,
        s"fragment sum must equal batch totals, got $rebuilt")
    } finally q.stop()
  }

  // reference implementation of the integer TVD the drift op and its
  // oracle both compute — an independent third copy for the spec
  private def tvdExpected(counts: Map[String, Long], ref: Map[String, Long])
      : (Long, Long, String, Long) = {
    val n = BigInt(counts.values.sum)
    val r = BigInt(ref.values.sum)
    var sumAbs = BigInt(0); var topD = BigInt(-1); var topT: String = null
    (counts.keySet ++ ref.keySet).toSeq.sorted.foreach { t =>
      val d = (BigInt(counts.getOrElse(t, 0L)) * r -
        n * BigInt(ref.getOrElse(t, 0L))).abs
      sumAbs += d
      if (d > topD) { topD = d; topT = t }
    }
    (n.toLong, (sumAbs * 1000000 / (n * r * 2)).toLong, topT,
      (topD * 1000000 / (n * r)).toLong)
  }

  test("streamingDrift equals the batch TVD per window under multi-batch " +
      "ts-disordered replay; final update row is selectable by max") {
    import spark.implicits._
    val e = StreamingOps.normalizeEventTs(spark.read.parquet(eventsPath))
    val reference = e.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = java.nio.file.Files.createTempDirectory("sdrift").toString
    // 4 files consumed one per trigger: every window's counts arrive
    // split across micro-batches in arbitrary event-time order
    e.repartition(4).write.parquet(s"$d/ev")
    def streamOf(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)
    val got = StreamingOps.withShufflePartitions(spark, 4) {
      StreamingOps.runToMemory(
        // watermark = None: the replay below re-delivers the whole month
        // across 4 unordered batches, so any finite watermark would
        // evict mid-replay — this asserts the distributive-exactness
        // contract, which is watermark-free by design
        StreamingOps.streamingDrift(streamOf(s"$d/ev"), reference,
          windowMinutes = 60, watermark = None).toDF(),
        "sdrift_eq", OutputMode.Update())
    }
      .groupBy("window_start")
      .agg(max(struct(col("n_events"), col("tvd_ppm"), col("top_term"),
        col("top_dev_ppm"))).as("f"))
      .select(col("window_start"), col("f.n_events"), col("f.tvd_ppm"),
        col("f.top_term"), col("f.top_dev_ppm"))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toMap
    val windows = e
      .select(window(col("ts"), "60 minutes").getField("start").as("ws"),
        col("event_type"))
      .groupBy("ws", "event_type").count().collect()
      .groupBy(_.getTimestamp(0))
      .map { case (ws, rows) =>
        ws -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    assert(windows.nonEmpty && got.keySet == windows.keySet)
    windows.foreach { case (ws, counts) =>
      val (n, tvd, top, topDev) = tvdExpected(counts, reference)
      assert(got(ws) == ((n, tvd, top, topDev)),
        s"window $ws: got ${got(ws)}, expected ($n,$tvd,$top,$topDev)")
    }
  }

  test("streamingDrift per-window state is EVICTED once the watermark " +
      "passes two window lengths: a revisit starts from scratch instead " +
      "of continuing the evicted counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)
    val src = MemoryStream[(java.sql.Timestamp, String)]
    val drift = StreamingOps.streamingDrift(
      src.toDF().toDF("ts", "event_type"),
      reference = Map("a" -> 1L, "b" -> 1L),
      windowMinutes = 60, watermark = Some("10 minutes"))
    val q = drift.toDF().writeStream.format("memory").queryName("sdrift_ev")
      .outputMode(OutputMode.Update()).start()
    try {
      // window [0,60): two 'a' events -> TVD vs the uniform {a,b}
      // reference = 1/2; the null-typed event is DROPPED (the documented
      // contract — it must neither crash the query nor count)
      src.addData((ts(1), "a"), (ts(2), "a"),
        (ts(2), null.asInstanceOf[String]))
      q.processAllAvailable()
      // far-future event pushes the watermark (t=400-10) past the
      // window-0 timeout (start + 2*60 = t=120) -> state evicted
      src.addData((ts(400), "b"))
      q.processAllAvailable()
      // a revisit of window 0 must NOT resume the evicted counts: either
      // the row is dropped as late (watermark) or it restarts at
      // n_events = 1 — both prove the store no longer holds window 0
      src.addData((ts(3), "a"))
      q.processAllAvailable()
      val w0 = spark.table("sdrift_ev")
        .filter(col("window_start") === ts(0)).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(w0.contains((2L, 500000L)),
        s"pre-eviction window-0 row missing: ${w0.toSeq}")
      assert(!w0.exists(_._1 == 3L),
        s"evicted window 0 must not continue to n=3: ${w0.toSeq}")
    } finally q.stop()
  }
}
