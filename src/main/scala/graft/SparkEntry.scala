package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{CompareMode, Validator}
import graft.ops.{AsOf, Dedup, Multimodal, Similarity, Temporal, TextAnalysis}
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the pipeline extensions) is exposed
  * as a named query over the driver's parquet test tables, with — where the
  * semantics are ANSI-SQL-expressible — an equivalent DuckDB oracle query
  * in [[oracleSql]]. Query results are deterministically ordered and use
  * exact integer aggregates (cent-scaled) so Spark and DuckDB hash-match
  * bit-for-bit.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") StreamingOps.normalizeEventTs(df) else df
  }

  /** Identifier-safe tag of a data directory. Stored-index names embed
    * it so the warm (sf0.001), verify (sf0.01) and bench (sf0.1) passes
    * keep SEPARATE persisted artifacts: each name's content stamp then
    * hits across runs and JVMs (the index builders skip the re-fit),
    * instead of the passes thrashing one shared name whose stamp never
    * matches the previous caller's data. */
  private def dirTag(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
    // the sanitized tag can alias distinct dirs (/sf0.1 vs /sf0_1); a raw-
    // path hash suffix keeps their stored-index names (and stamps) apart
    // so alternating callers never thrash one shared artifact
    s"${tag}_${java.lang.Long.toHexString(dir.hashCode & 0xffffffffL)}"
  }

  /** The two sides of the validation workload, derived deterministically
    * from `orders` (the reference compares two live databases; here the
    * "second database" is a filtered + perturbed view so both engines can
    * reconstruct it): db1 drops keys %97==0, db2 drops %89==0 and perturbs
    * value/date/priority columns on other residue classes, including NULL
    * injections to exercise the one-null/both-null truth tables (SURVEY
    * §2.4 V2/V3/F1). */
  private def ordersPair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders")
    val db1 = o.filter("o_orderkey % 97 != 0").selectExpr(
      "CAST(o_orderkey AS STRING) AS id",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val db2 = o.filter("o_orderkey % 89 != 0").selectExpr(
      "CAST(o_orderkey AS STRING) AS id",
      "CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0 " +
        "WHEN o_orderkey % 41 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice",
      "CASE WHEN o_orderkey % 37 = 0 THEN o_orderdate + INTERVAL 1 DAY " +
        "WHEN o_orderkey % 43 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate",
      "CASE WHEN o_orderkey % 29 = 0 THEN CONCAT(o_orderpriority, 'X') " +
        "WHEN o_orderkey % 47 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority")
    (db1, db2)
  }

  private val pairCte =
    """WITH db1 AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |         o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |), db2 AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |    CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0
      |         WHEN o_orderkey % 41 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 37 = 0 THEN o_orderdate + INTERVAL 1 DAY
      |         WHEN o_orderkey % 43 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
      |    CASE WHEN o_orderkey % 29 = 0 THEN o_orderpriority || 'X'
      |         WHEN o_orderkey % 47 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 89 <> 0
      |)""".stripMargin

  private def keyedPair(s: SparkSession, dir: String, check: String) = {
    val (db1, db2) = ordersPair(s, dir)
    (db1.select(col("id"), col(check).as("check")),
      db2.select(col(check).as("check"), col("id")))
  }

  /** Skew-demo inputs: a fact table with a deliberately hot key (~90% of
    * lineitem maps to k=0) and a dim with 64 variants per key, so the hot
    * key's join output fans out 64x — heavy enough that one naive reducer
    * task visibly dominates the wall clock at sf0.1. */
  private def skewSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val fact = t(s, dir, "lineitem").selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN CAST(0 AS BIGINT) ELSE l_suppkey % 100 END AS k",
      "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents")
    val dim = s.range(6400).selectExpr("id % 100 AS k", "id DIV 100 AS variant")
    (fact, dim)
  }

  /** Augmented documents corpus for near-dup demos: originals plus a
    * perturbed copy of doc_id < 20 (every 7th word dropped, id + 100000)
    * so the LSH operators have true near-duplicates to find. */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val perturbed = d.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      array_join(
        filter(split(col("text"), " "),
          (w, i) => i % 7 =!= 3),
        " ").as("text"))
    d.unionByName(perturbed)
  }

  /** Flagship: the single-pass validation summary (same workload as the
    * `v_summary` query, to which this delegates) on sf=0.001; driver
    * smoke-checks rows>0 (the summary always has exactly 1 row). */
  def entry(spark: SparkSession): DataFrame =
    queries("v_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- validation core (reference parity; SURVEY §2.3-2.4) ------------
    "v_missing_first" -> ((s, dir) => {
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      Validator.validate(f, sec, CompareMode.Numeric).missingInFirst.orderBy("id")
    }),
    "v_missing_second" -> ((s, dir) => {
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      Validator.validate(f, sec, CompareMode.Numeric).missingInSecond.orderBy("id")
    }),
    "v_diff_numeric" -> ((s, dir) => {
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      Validator.validate(f, sec, CompareMode.Numeric).differing.orderBy("id")
    }),
    "v_diff_numeric_coerce" -> ((s, dir) => {
      // string-typed inputs with unparseable garbage: pandas to_numeric
      // errors='coerce' parity via try_cast (SURVEY §2.4 V2)
      val o = t(s, dir, "orders")
      val mk = (filterMod: Int, perturb: Boolean) => {
        val base = o.filter(s"o_orderkey % $filterMod != 0")
        val v =
          if (!perturb)
            "CASE WHEN o_orderkey % 53 = 0 THEN 'oops' " +
              "ELSE CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS STRING) END AS check"
          else
            "CASE WHEN o_orderkey % 53 = 0 THEN 'oops' " +
              "WHEN o_orderkey % 41 = 0 THEN NULL " +
              "WHEN o_orderkey % 31 = 0 THEN CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) + 100 AS STRING) " +
              "ELSE CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS STRING) END AS check"
        base.selectExpr("CAST(o_orderkey AS STRING) AS id", v)
      }
      Validator.validate(mk(97, false), mk(89, true), CompareMode.Numeric).differing.orderBy("id")
    }),
    "v_diff_date" -> ((s, dir) => {
      val (f, sec) = keyedPair(s, dir, "o_orderdate")
      Validator.validate(f, sec, CompareMode.Date).differing
        .select(col("id"),
          date_format(col("check_first"), "yyyy-MM-dd HH:mm:ss").as("check_first"),
          date_format(col("check_second"), "yyyy-MM-dd HH:mm:ss").as("check_second"))
        .orderBy("id")
    }),
    "v_diff_string_exact" -> ((s, dir) => {
      val (f, sec) = keyedPair(s, dir, "o_orderpriority")
      Validator.validate(f, sec, CompareMode.Fuzzy(1.0)).differing.orderBy("id")
    }),
    "v_diff_string_fuzzy" -> ((s, dir) => {
      // threshold 0.9: appended-char perturbations score ~0.94 and pass;
      // only the one-null rows are flagged (difflib ratio, SURVEY §2.4 F1)
      val (f, sec) = keyedPair(s, dir, "o_orderpriority")
      Validator.validate(f, sec, CompareMode.Fuzzy(0.9)).differing.orderBy("id")
    }),
    "v_summary" -> ((s, dir) => {
      // single-pass summary (one job) — semantics pinned equal to the
      // multi-action summary() by ValidatorSpec
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      Validator.summaryFast(f, sec, CompareMode.Numeric)
    }),
    "v_summary_fuzzy" -> ((s, dir) => {
      // the distinct-pair fuzzy path of summaryFast (threshold < 1 is not
      // an equivalence relation, so equal pairs are scored by the difflib
      // ratio once per distinct value pair, weighted by multiplicity) —
      // oracle replays the row-level semantic definition over the CPython
      // fixture, which the pair algebra must reproduce exactly
      val (f, sec) = keyedPair(s, dir, "o_orderpriority")
      Validator.summaryFast(f, sec, CompareMode.Fuzzy(0.9))
    }),
    "v_incremental_summary" -> ((s, dir) => {
      // digest-pruned re-validation: seed the per-bucket state from a
      // PRIOR snapshot (a restated low-orderkey batch: ids < 600 carry
      // doubled prices and every 3rd of them is absent — id-LOCALIZED
      // churn, the regime incremental validation exists for), then
      // validate the current pair through the state. Only the restated
      // ids' buckets re-enter the keyed shuffle (dirty buckets <= changed
      // ids; nBuckets = 4096 >> the ~150 changed ids at every SF); the
      // result must be bit-equal to summaryFast on the CURRENT inputs —
      // the oracle is v_summary's full-join SQL, which never sees the
      // state. Re-runs converge: a second invocation finds the final
      // state and answers all-clean from stored terms.
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incval_${dirTag(dir)}"
      val restated = col("id").cast("long") < 600
      val prior1 = f
        .withColumn("check",
          when(restated, col("check") * 2).otherwise(col("check")))
        .filter(!(restated && col("id").cast("long") % 3 === 0))
      val prior2 = sec
        .withColumn("check",
          when(restated, col("check") + 7).otherwise(col("check")))
      graft.core.IncrementalValidation.summaryIncremental(
        prior1, prior2, CompareMode.Numeric, stateDir, nBuckets = 4096)
      graft.core.IncrementalValidation.summaryIncremental(
        f, sec, CompareMode.Numeric, stateDir, nBuckets = 4096)
    }),
    "v_date_filter" -> ((s, dir) => {
      // P3: date-range predicate, exclusive on BOTH ends (reference
      // `running_validation.py:495-496`); pushed to the parquet scan
      val o = t(s, dir, "orders")
      Validator.dateFiltered(o, "o_orderdate", "1996-01-01 00:00:00", "1996-03-01 00:00:00")
        .select(col("o_orderkey").as("id"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_date"))
        .orderBy("id")
    }),
    "v_sorted_ids" -> ((s, dir) => {
      // O1: global string sort of VARCHAR ids ("10" < "2") — reference
      // sorts both frames this way before validating
      t(s, dir, "orders").select(col("o_orderkey").cast("string").as("id"))
        .orderBy("id")
    }),
    "v_composite_key" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(graft.functions.compositeKeyCols(Seq(
          when(col("o_custkey") % 53 === 0, lit(null)).otherwise(col("o_custkey")),
          col("o_orderstatus"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n"))
        .orderBy("id")
    }),

    "v_schema_diff" -> ((s, dir) => {
      // schema drift detection: second side drops a column, adds one, and
      // retypes another — caught from metadata alone, before any shuffle
      val o = t(s, dir, "orders")
      val db1 = o.selectExpr("CAST(o_orderkey AS STRING) AS id",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val db2 = o.selectExpr("CAST(o_orderkey AS STRING) AS id",
        "CAST(o_totalprice AS STRING) AS o_totalprice", // retyped
        "o_orderdate", "o_custkey")          // priority dropped, custkey added
      Validator.schemaDiff(db1, db2).orderBy("column_name")
    }),

    "v_lineitem_validate" -> ((s, dir) => {
      // full validation at lineitem scale with a true composite key
      // (l_orderkey, l_linenumber) — the throughput-bearing workload
      val l = t(s, dir, "lineitem")
      val mkKeyed = (df: DataFrame) => df.select(
        graft.functions.compositeKey(Seq("l_orderkey", "l_linenumber")).as("id"),
        col("l_extendedprice").as("check"))
      val db1 = mkKeyed(l.filter("l_orderkey % 97 != 0"))
      val db2 = mkKeyed(l.filter("l_orderkey % 89 != 0")
        .withColumn("l_extendedprice",
          expr("CASE WHEN l_orderkey % 31 = 0 THEN l_extendedprice + 1.0 " +
            "WHEN l_orderkey % 41 = 0 THEN NULL ELSE l_extendedprice END")))
      Validator.summaryFast(db1, db2, CompareMode.Numeric)
    }),
    "v_reconcile" -> ((s, dir) => {
      // diff -> corrected table: prefer first's value on conflict, keep
      // and label one-sided rows
      val (f, sec) = keyedPair(s, dir, "o_orderpriority")
      Validator.reconcile(f, sec).orderBy("id")
    }),
    "v_bucket_diff" -> ((s, dir) => {
      // merkle-style pre-filter: find WHICH buckets differ before any
      // row-level shuffle (cross-engine bucket fn: key mod 64)
      val (f, sec) = keyedPair(s, dir, "o_totalprice")
      Validator.differingBuckets(f, sec,
          pmod(col("id").cast("long"), lit(64L)))
        .orderBy("bucket")
    }),
    "v_multi_validate" -> ((s, dir) => {
      // whole-row validation: k columns, k modes, ONE pass and ONE keyed
      // shuffle (k single-column runs would scan both sides k times)
      val (db1, db2) = ordersPair(s, dir)
      Validator.summaryMulti(db1, db2, Seq(
          ("o_totalprice", CompareMode.Numeric),
          ("o_orderdate", CompareMode.Date),
          ("o_orderpriority", CompareMode.Fuzzy(0.9))))
        .orderBy("column_name")
    }),
    "v_incremental_diff" -> ((s, dir) => {
      // the incrementally-MAINTAINED row-level report: missing ids both
      // ways + differing pairs stored bucket-partitioned, dirty buckets'
      // partitions rewritten per run (here seeded from the same restated
      // prior as v_incremental_summary). totalprice rides as
      // DECIMAL(18,2) for engine-portable strings (v_multi_diff
      // precedent). Oracle = the full three-frame SQL over the CURRENT
      // inputs — the stored report it answers from is invisible to it
      val (f0, sec0) = keyedPair(s, dir, "o_totalprice")
      val dec = (df: DataFrame) => df.withColumn("check",
        col("check").cast("decimal(18,2)"))
      val f = dec(f0); val sec = dec(sec0)
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_increp_${dirTag(dir)}"
      // a smaller restated batch than the summary queries' (ids < 30 —
      // orderkeys are DENSE in the synthetic data, so that is ~29
      // orders): with 256 report buckets the dirty fraction must stay
      // under the fallback limit for the re-run to exercise the
      // partition-pruned path rather than a full rebuild
      val restated = col("id").cast("long") < 30
      val prior2 = sec
        .withColumn("check",
          when(restated, col("check") + 7).otherwise(col("check")))
        .filter(!(restated && col("id").cast("long") % 3 === 0))
      // 256 buckets, not the summary queries' 4096: the report table's
      // DIRECTORY count equals the bucket count, and a report is tiny
      // next to its inputs — thousands of near-empty partition dirs
      // would cost more in listing/footer overhead than the recompute
      // granularity buys (measured: 4096 dirs made this query 32 s)
      graft.core.IncrementalValidation.reportIncremental(
        f, prior2, CompareMode.Numeric, stateDir, nBuckets = 256)
      graft.core.IncrementalValidation.reportIncremental(
          f, sec, CompareMode.Numeric, stateDir, nBuckets = 256)
        ._1.orderBy("kind", "id")
    }),
    "v_multi_incremental" -> ((s, dir) => {
      // the multi-column twin of v_incremental_summary: whole-row digests
      // over all three check columns, per-(bucket, column) stored terms,
      // the same restated-batch seeding (ids < 600 perturbed on the
      // second side's price, a third of them absent) — and the oracle is
      // v_multi_validate's full per-column SQL over the CURRENT inputs,
      // which never sees the state. Re-runs converge to all-clean.
      val (db1, db2) = ordersPair(s, dir)
      val checks = Seq(
        ("o_totalprice", CompareMode.Numeric),
        ("o_orderdate", CompareMode.Date),
        ("o_orderpriority", CompareMode.Fuzzy(0.9)))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incvalm_${dirTag(dir)}"
      val restated = col("id").cast("long") < 600
      val prior2 = db2
        .withColumn("o_totalprice",
          when(restated, col("o_totalprice") + 7).otherwise(col("o_totalprice")))
        .filter(!(restated && col("id").cast("long") % 3 === 0))
      graft.core.IncrementalValidation.summaryMultiIncremental(
        db1, prior2, checks, stateDir, nBuckets = 4096)
      graft.core.IncrementalValidation.summaryMultiIncremental(
          db1, db2, checks, stateDir, nBuckets = 4096)
        .orderBy("column_name")
    }),
    "v_multi_incremental_diff" -> ((s, dir) => {
      // the incrementally-maintained MULTI-COLUMN row-level report:
      // diffMulti's long frame stored bucket-partitioned, dirtiness per
      // bucket decided by the whole-row digest (one witness for all k
      // columns), churned buckets' partitions rewritten per run. Seeded
      // from a v_incremental_diff-style restated prior (ids < 30
      // perturbed on the second side's price, every 3rd absent); the
      // oracle is v_multi_diff's per-column SQL over the CURRENT inputs
      // — the stored report it answers from is invisible to it.
      // 256 buckets for the same directory-count economics as
      // v_incremental_diff
      val (db1, db2) = ordersPair(s, dir)
      val dec = (df: DataFrame) => df.withColumn("o_totalprice",
        col("o_totalprice").cast("decimal(18,2)"))
      val f = dec(db1); val sec = dec(db2)
      val checks = Seq(
        ("o_totalprice", CompareMode.Numeric),
        ("o_orderdate", CompareMode.Date),
        ("o_orderpriority", CompareMode.Fuzzy(0.9)))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_increpm_${dirTag(dir)}"
      val restated = col("id").cast("long") < 30
      val prior2 = sec
        .withColumn("o_totalprice",
          when(restated, col("o_totalprice") + 7)
            .otherwise(col("o_totalprice")))
        .filter(!(restated && col("id").cast("long") % 3 === 0))
      graft.core.IncrementalValidation.reportIncrementalMulti(
        f, prior2, checks, stateDir, nBuckets = 256)
      graft.core.IncrementalValidation.reportIncrementalMulti(
          f, sec, checks, stateDir, nBuckets = 256)
        ._1.orderBy("column_name", "id")
    }),
    "v_multi_diff" -> ((s, dir) => {
      // the tidy per-column differing pairs behind v_multi_validate's
      // counts — k columns from ONE inner join on id. totalprice rides
      // as DECIMAL(18,2) so its string form is engine-portable (Java
      // double->string shortest-repr corners differ from DuckDB's);
      // the Numeric mode re-parses it identically either way
      val (db1, db2) = ordersPair(s, dir)
      val dec = (df: DataFrame) => df.withColumn("o_totalprice",
        col("o_totalprice").cast("decimal(18,2)"))
      Validator.diffMulti(dec(db1), dec(db2), Seq(
          ("o_totalprice", CompareMode.Numeric),
          ("o_orderdate", CompareMode.Date),
          ("o_orderpriority", CompareMode.Fuzzy(0.9))))
        .orderBy("column_name", "id")
    }),
    "v_profile" -> ((s, dir) => {
      // column profiling: the cheap pre-diff validation step. exact=true
      // takes the two-level pre-agg distinct path (no countDistinct
      // Expand — see Profiler scaladoc) and matches the DuckDB oracle's
      // exact COUNT(DISTINCT)
      graft.core.Profiler.profile(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
          exact = true)
        .orderBy("column_name")
    }),

    // --- analytics surface (aggregates / joins / windows / set ops) -----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("long").as("sum_qty"),
          sum(expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)")).as("sum_base_cents"),
          sum(expr("CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)")).as("sum_disc_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_top10" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum(expr("CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)")).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("o_orderkey"))
        .limit(10)
    }),
    "q5_join" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      broadcast(r).join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum(expr("CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)")).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("n_name"))
    }),
    "q_analytics" -> ((s, dir) => {
      // full analytic-function surface over one keyed window: lag/lead,
      // ntile, percent_rank, cume_dist. percent_rank and cume_dist are
      // rational (rank arithmetic / one double division) so ppm-floors
      // replay exactly in any engine
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").as("cents"))
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          lag("cents", 1).over(w).as("prev_cents"),
          lead("cents", 1).over(w).as("next_cents"),
          ntile(4).over(w).cast("long").as("quartile"),
          floor(percent_rank().over(w) * 1000000).cast("long").as("pct_rank_ppm"),
          floor(cume_dist().over(w) * 1000000).cast("long").as("cume_ppm"))
        .orderBy("o_orderkey")
    }),
    "q_window_top3" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    }),
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),
    "q_semi" -> ((s, dir) => {
      // left-semi join (EXISTS): customers with at least one open order
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), expr("CAST(ROUND(value*100) AS BIGINT)").as("cents"))
        .groupBy("event_type")
        .agg(expr("percentile(cents, 0.5)").as("p50"),
          expr("percentile(cents, 0.9)").as("p90"))
        .orderBy("event_type")
    }),
    "t_token_hist" -> ((s, dir) => {
      // corpus token histogram: explode + count (the wordcount shape)
      t(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("token"))
        .limit(50)
    }),
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).as("total_cents"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),
    "q_pivot" -> ((s, dir) => {
      // pivot: per-cohort event counts, one column per event type
      t(s, dir, "events")
        .withColumn("cohort", col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("cohort")
    }),
    "q_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS (the general form of rollup/cube): one agg
      // pass producing per-status totals, per-priority totals, and the
      // grand total
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              |  SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS total_cents
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),
    "q_window_range" -> ((s, dir) => {
      // time-RANGE window: per event, the exact cent-sum of same-type
      // events in the preceding hour (micros-precision range frame)
      val e = t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"),
          expr("CAST(ROUND(value*100) AS BIGINT)").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("tus")
        .rangeBetween(-3600000000L, 0L)
      e.select(col("event_id"), col("event_type"),
          sum("cents").over(w).as("hour_cents"))
        .orderBy("event_id")
    }),
    "q_intersect" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey").as("key"))
        .intersect(t(s, dir, "customer").select(col("c_custkey").as("key")))
        .orderBy("key")
    }),
    "q_except" -> ((s, dir) => {
      // customers with no orders: EXCEPT over key sets (≙ the reference's
      // bidirectional anti-join semantics, SURVEY §2.6)
      t(s, dir, "customer").select(col("c_custkey").as("key"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("key")))
        .orderBy("key")
    }),

    "q_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("value_cents"))
        .orderBy("hour", "event_type")
    }),
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    "q_sessions" -> ((s, dir) => {
      // gaps-and-islands sessionization: new session when gap > 30 min;
      // two windows (lag, running sum) + one aggregation
      val e = t(s, dir, "events")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val sess = e
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("value_cents"))
        .orderBy("user_id", "session_id")
    }),
    "q_interval_join" -> ((s, dir) => {
      // validity-interval join via bucket expansion (ops/Temporal.scala):
      // every customer carries quarterly tier intervals over 1992-1998;
      // each order joins the interval containing its order date through a
      // plain equi-join on (custkey, 30-day bucket) — never a
      // BroadcastNestedLoopJoin (plan pinned)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("custkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01"))).as("day"))
      val intervals = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .withColumn("q_start", explode(expr(
          "sequence(to_date('1992-01-01'), to_date('1998-10-01'), interval 3 months)")))
        .select(col("custkey"), col("q_start"),
          ((year(col("q_start")) - 1992) * 4 +
            expr("(month(q_start) - 1) div 3")).as("q_idx"),
          datediff(col("q_start"), to_date(lit("1970-01-01"))).as("start_day"),
          datediff(add_months(col("q_start"), 3), to_date(lit("1970-01-01"))).as("end_day"))
        .withColumn("tier",
          concat(lit("tier_"), ((col("custkey") + col("q_idx")) % 5).cast("string")))
      Temporal.intervalJoin(o, intervals, Seq("custkey"),
          posCol = "day", startCol = "start_day", endCol = "end_day",
          bucketSize = 30L, payload = Seq("q_start" -> "q_start", "tier" -> "tier"))
        .select(col("o_orderkey"), col("custkey"), col("day"),
          date_format(col("q_start"), "yyyy-MM-dd").as("quarter_start"), col("tier"))
        .orderBy("o_orderkey")
    }),

    "q_asof" -> ((s, dir) => {
      // as-of join: each purchase enriched with the user's most recent
      // prior view (union+window, single shuffle — see ops/AsOf.scala)
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinBackward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("ts" -> "view_ts", "value" -> "view_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
          expr("CAST(ROUND(view_value*100) AS BIGINT)").as("view_value_cents"))
        .orderBy("event_id")
    }),

    // --- Structured Streaming (batch-equivalent oracles) ----------------
    "s_windowed_counts" -> ((s, dir) => {
      // real streaming execution: readStream -> watermark -> tumbling
      // window agg -> memory sink, run to completion on available data
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
      val agg = StreamingOps.windowedCounts(stream, "1 hour", "10 minutes")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(agg, s"win_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("value_cents"))
        .orderBy("window_start", "event_type")
    }),
    "s_quantile_sketch" -> ((s, dir) => {
      // streaming HDR sketch: the distributive bucket histogram built
      // incrementally over the stream equals the batch sketch exactly
      // (state bounded at ~64*2^m rows per key forever)
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"), expr("CAST(ROUND(value*100) AS BIGINT)").as("cents"))
      val sk = StreamingOps.streamingSketch(stream, Seq("event_type"), "cents", m = 7)
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(sk, s"ssk_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .orderBy("event_type", "bucket")
    }),
    "s_hll" -> ((s, dir) => {
      // streaming HLL: registers maintained as groupBy-max over the event
      // stream — state bounded at 2^8 rows forever; complete-mode output
      // equals the batch sketch, which is what the oracle replays
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .select(col("event_id").cast("string").as("k"))
      val sk = StreamingOps.streamingHll(stream, "k", p = 8)
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(sk, s"shll_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .orderBy("register")
    }),
    "s_countmin" -> ((s, dir) => {
      // streaming count-min: the 4x256 counter matrix maintained as a
      // running groupBy-count over the event stream — state bounded at
      // depth*width rows forever (spec-asserted); complete-mode output
      // equals the batch sketch, which is what the oracle replays
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .select(col("event_id").cast("string").as("k"))
      val sk = StreamingOps.streamingCountMin(stream, "k", depth = 4, width = 256)
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(sk, s"scm_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .select(col("r").cast("long").as("r"), col("cell"), col("cnt"))
        .orderBy("r", "cell")
    }),
    "s_user_sessions" -> ((s, dir) => {
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
      val sessions = StreamingOps.userSessions(stream)
      // Update mode emits one row per user per micro-batch; reduce to the
      // final state per FRAGMENT (n_events is monotone within a fragment,
      // epoch_us identifies it), then sum fragments — exact for any number
      // of micro-batches, including users returning after idle eviction
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(sessions.toDF(), s"sess_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Update())
      }
        .groupBy("user_id", "epoch_us")
        .agg(max("n_events").as("n_events"),
          expr("max_by(total_cents, n_events)").as("total_cents"),
          min("first_ts").as("first_ts"),
          expr("max_by(last_ts, n_events)").as("last_ts"))
        .groupBy("user_id")
        .agg(sum("n_events").as("n_events"),
          sum("total_cents").as("total_cents"),
          min("first_ts").as("first_ts"),
          max("last_ts").as("last_ts"))
        .select(col("user_id"), col("n_events"), col("total_cents"),
          date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"),
          date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
        .orderBy("user_id")
    }),

    "s_validate" -> ((s, dir) => {
      // continuous validation: the stream checked against a static
      // expected-values table (deterministically perturbed), mismatches
      // emitted as they arrive — the reference's diff as a streaming op
      val staticEvents = StreamingOps.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val ref = staticEvents.select(col("event_id"),
        when(col("event_id") % 5 === 0, col("value") + 1.0)
          .otherwise(col("value")).as("value"))
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(
          StreamingOps.streamingValidate(stream, ref),
          s"sval_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .select(col("id"),
          expr("CAST(ROUND(check_observed*100) AS BIGINT)").as("observed_cents"),
          expr("CAST(ROUND(check_expected*100) AS BIGINT)").as("expected_cents"))
        .orderBy("id")
    }),
    "s_interval_join" -> ((s, dir) => {
      // stream-stream interval join (watermarked state on both sides);
      // small stream -> few state partitions
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
      val joined = StreamingOps.streamStreamIntervalJoin(
        stream.filter(col("event_type") === "purchase"),
        stream.filter(col("event_type") === "view"),
        "user_id", "1 hour")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(joined, s"ssj_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .select(col("user_id"), col("l_event_id"),
          date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("l_ts"),
          col("r_event_id"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("r_ts"),
          expr("CAST(ROUND(r_value*100) AS BIGINT)").as("r_value_cents"))
        .orderBy("l_event_id", "r_event_id")
    }),

    "s_dedup" -> ((s, dir) => {
      // streaming exact dedup: every 10th event is injected into the
      // stream TWICE; dropDuplicatesWithinWatermark collapses the copies,
      // so the result equals the distinct source — which is the oracle.
      // State is keyed by event_id and evicted at the watermark horizon
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
      val withDups = stream.withColumn("copy",
          explode(when(col("event_id") % 10 === 0, array(lit(1), lit(2)))
            .otherwise(array(lit(1)))))
        .drop("copy")
      val deduped = StreamingOps.dedupedEvents(withDups, "10 minutes")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(deduped, s"sdd_${System.nanoTime()}")
      }
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("CAST(ROUND(value*100) AS BIGINT)").as("value_cents"))
        .orderBy("event_id")
    }),
    "s_incremental_dedup" -> ((s, dir) => {
      // stream-static anti-join ingest: odd-id events stream in; any
      // whose content fingerprint (user, type, value-band) already occurs
      // among the even-id corpus is dropped on arrival. Stateless — no
      // state store, no watermark (see StreamingOps.streamStaticNew).
      // Fingerprint fields are null-coalesced (concat_ws would silently
      // SKIP a null field, misaligning the separators vs the oracle's
      // '||', which nullifies) and the band uses FLOOR(x/1000.0) — one
      // definition in both engines, unlike `div` (truncates toward zero)
      // vs DuckDB `//` (floors) on negative cents
      val fp = md5(concat_ws("|",
        coalesce(col("user_id").cast("string"), lit("")),
        coalesce(col("event_type").cast("string"), lit("")),
        coalesce(expr(
          "CAST(CAST(FLOOR(CAST(ROUND(value*100) AS BIGINT) / 1000.0) AS BIGINT) AS STRING)"),
          lit(""))).cast("binary"))
      val statics = StreamingOps.normalizeEventTs(
        s.read.parquet(s"$dir/events.parquet"))
      val corpus = statics.filter(col("event_id") % 2 === 0).select(fp.as("fp"))
      val stream = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_id") % 2 === 1).withColumn("fp", fp)
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(
          StreamingOps.streamStaticNew(stream, corpus, "fp"),
          s"sid_${System.nanoTime()}")
      }
        .select(col("event_id"), col("fp"))
        .orderBy("event_id")
    }),
    "s_incremental_vocab" -> ((s, dir) => {
      // CONTINUOUS materialized aggregate: the document stream folds
      // into the IncrementalAgg vocabulary store via foreachBatch (one
      // batch-id-partitioned idempotent append per micro-batch — the
      // ARRIVAL-priced twin of t_incremental_vocab's churn pricing).
      // Fresh store per run: the append surface is cumulative by
      // design, so a rerun must not double-fold the same corpus. Oracle
      // = the same full word-count SQL; the store is invisible to it
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_svocab_${System.nanoTime()}"
      val stream = StreamingOps.readEvents(s, s"$dir/documents.parquet")
      val q = StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.maintainVocab(stream, stateDir)
      }
      try q.processAllAvailable() finally q.stop()
      graft.ops.IncrementalAgg.vocabFromStore(s, stateDir).orderBy("term")
    }),
    "s_ann_pq" -> ((s, dir) => {
      // CONTINUOUS ANN-index maintenance: frozen codebooks bootstrap-fit
      // on the corpus (exactly what the oracle re-derives), then the
      // embedding stream's arrivals encode against them and their codes
      // append batch-partitioned (the arrival-priced twin of
      // t_ann_pq_incremental's churn pricing); the stored state answers
      // the same ADC search. Fresh store per run (cumulative surface)
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_spq_${System.nanoTime()}"
      val e = t(s, dir, "embeddings")
      graft.ops.Similarity.pqBooksWrite(e, stateDir, m = 4, ksub = 16)
      val stream = StreamingOps.readEvents(s, s"$dir/embeddings.parquet")
      val q = StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.maintainPqIndex(stream, stateDir, m = 4)
      }
      try q.processAllAvailable() finally q.stop()
      graft.ops.Similarity.pqSearchIncremental(s, stateDir,
          e.filter(col("vec_id") < 10), k = 5, m = 4)
        .select(col("query_id"), col("corpus_id"), col("adist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "s_index_search" -> ((s, dir) => {
      // CONTINUOUS index maintenance: the document stream folds into an
      // append-only posting store (per-batch (term, doc, tf) partials +
      // doc-count sentinels — the ARRIVAL-priced twin of
      // t_index_search_incremental's churn pricing), and the SAME
      // whole-bit TF-IDF retrieval answers from the store. Fresh store
      // per run (the append surface is cumulative). Oracle = the
      // t_index_search replay — the store shape is invisible to it
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_sindex_${System.nanoTime()}"
      val stream = StreamingOps.readEvents(s, s"$dir/documents.parquet")
      val q = StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.maintainIndex(stream, stateDir)
      }
      try q.processAllAvailable() finally q.stop()
      graft.ops.Indexing.searchIndexIncremental(s, stateDir,
        terms = Seq("scan", "merge", "window"), k = 20)
    }),
    "s_minhash_pairs" -> ((s, dir) => {
      // CONTINUOUS near-dup signature maintenance: the (near-dup
      // augmented) document stream folds into an append-only MinHash
      // signature store — per-batch (id, h, sigv) facts, the
      // ARRIVAL-priced twin of t_minhash_incremental's churn pricing —
      // and the SAME store-sized LSH candidate chain answers from it.
      // Fresh store per run (the append surface is cumulative). The
      // near-dup derivation (perturbed copies of doc_id < 20) runs
      // INSIDE the stream, so arrivals carry originals and their
      // near-dups alike. Oracle = the t_minhash_pairs replay — the
      // store shape is invisible to it
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_smh_${System.nanoTime()}"
      val stream = StreamingOps.readEvents(s, s"$dir/documents.parquet")
        .select("doc_id", "text")
      val perturbed = stream.filter(col("doc_id") < 20).select(
        (col("doc_id") + 100000).as("doc_id"),
        array_join(
          filter(split(col("text"), " "), (w, i) => i % 7 =!= 3),
          " ").as("text"))
      val q = StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.maintainSignatures(stream.unionByName(perturbed),
          stateDir)
      }
      try q.processAllAvailable() finally q.stop()
      val sigs = Dedup.signaturesFromStore(s, stateDir).localCheckpoint(true)
      Dedup.minhashCandidates(sigs)
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.sigJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    "s_table_diff" -> ((s, dir) => {
      // continuous TABLE DIFF: the full missing/differing truth table of
      // the batch validate() as a streaming op — an observed event stream
      // diffed against a (perturbed, key-filtered) reference stream,
      // emitting missing_in_reference / missing_in_stream / differing per
      // key. Complete-mode output equals the batch full-outer diff at
      // every point in time (distributive counts + maxes — see
      // StreamingOps.streamingTableDiff), which the oracle replays
      val obs = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_id") % 97 =!= 0)
      val ref = StreamingOps.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_id") % 89 =!= 0)
        .select(col("event_id"),
          when(col("event_id") % 7 === 0, col("value") + 1.0)
            .otherwise(col("value")).as("value"))
      val diff = StreamingOps.streamingTableDiff(obs, ref, "event_id", "value")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(diff, s"stdiff_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .select(col("id"), col("kind"),
          expr("CAST(ROUND(observed*100) AS BIGINT)").as("observed_cents"),
          expr("CAST(ROUND(expected*100) AS BIGINT)").as("expected_cents"))
        .orderBy("id")
    }),

    "s_table_diff_multi" -> ((s, dir) => {
      // the multi-column twin: value (in portable integer cents) and
      // event_type diffed against a perturbed reference in ONE stateful
      // aggregation; long-format per-column output, complete mode ==
      // batch per-column full-outer diff (distributive counts + maxes)
      val base = (pred: String) => StreamingOps.readEvents(s, s"$dir/events.parquet")
        .filter(expr(pred))
        .select(col("event_id"),
          expr("CAST(ROUND(value*100) AS BIGINT)").as("cents"),
          col("event_type"))
      val obs = base("event_id % 97 != 0")
        .select(col("event_id"), col("cents").cast("string").as("value"),
          col("event_type"))
      val ref = base("event_id % 89 != 0")
        .select(col("event_id"),
          (col("cents") + when(col("event_id") % 7 === 0, 100L).otherwise(0L))
            .cast("string").as("value"),
          when(col("event_id") % 11 === 0, concat(col("event_type"), lit("X")))
            .otherwise(col("event_type")).as("event_type"))
      val diff = StreamingOps.streamingTableDiffMulti(obs, ref,
        "event_id", Seq("event_type", "value"))
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(diff, s"stdiffm_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }.orderBy("id", "column_name")
    }),

    "s_drift" -> ((s, dir) => {
      // continuous distribution-drift monitoring: per hourly window, the
      // exact-integer total-variation distance of the window's event_type
      // mix from the whole table's distribution (computed batch-side and
      // handed to the stream as the static reference), plus the
      // argmax-deviation type. Update-mode emissions grow monotonically
      // in n_events, so max(struct(..)) per window IS the final answer
      val reference = s.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type").isNotNull) // op contract: non-null terms
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ev = StreamingOps.readEvents(s, s"$dir/events.parquet")
      val drift = StreamingOps.streamingDrift(ev, reference,
        windowMinutes = 60, watermark = Some("10 minutes"))
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(drift.toDF(), s"drift_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Update())
      }
        .groupBy("window_start")
        .agg(max(struct(col("n_events"), col("tvd_ppm"), col("top_term"),
          col("top_dev_ppm"))).as("f"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("f.n_events").as("n_events"), col("f.tvd_ppm").as("tvd_ppm"),
          col("f.top_term").as("top_term"),
          col("f.top_dev_ppm").as("top_dev_ppm"))
        .orderBy("window_start")
    }),

    // --- training-data pipeline extensions ------------------------------
    // --- skew mitigation demo (same semantics, two physical shapes) -----
    // fact side: half of lineitem lands on hot key 0; dim: 8 rows per key
    // so the hot key's join output fans out 8x. Both variants force a
    // sort-merge join (the "dim too big to broadcast" regime where skew
    // actually bites — a broadcast join has no skew problem by
    // construction); the salted variant splits hot-key rows across 16
    // reducers via Skew.saltedJoin. Identical results, one oracle.
    "q_skew_naive" -> ((s, dir) => {
      val (fact, dim) = skewSides(s, dir)
      fact.join(dim.hint("merge"), Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("cents") * (col("variant") + 1)).as("weighted_cents"))
        .orderBy("k")
    }),
    "q_skew_salted" -> ((s, dir) => {
      val (fact, dim) = skewSides(s, dir)
      graft.ops.Skew.saltedJoin(fact, dim.hint("merge"), "k", factor = 16)
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("cents") * (col("variant") + 1)).as("weighted_cents"))
        .orderBy("k")
    }),

    "t_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", Seq("text"))
        .select(md5(col("text").cast("binary")).as("text_hash"),
          col("keep_id"), col("n_copies"))
        .orderBy("keep_id")
    }),
    "t_text_stats" -> ((s, dir) => {
      TextAnalysis.stats(t(s, dir, "documents")).orderBy("doc_id")
    }),
    "t_quality" -> ((s, dir) => {
      // scores emitted integer-scaled (basis points / ppm) so the DuckDB
      // oracle — which replays the identical double arithmetic — hashes
      // bit-for-bit
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          floor(TextAnalysis.qualityScore(col("text")) * 10000 + lit(0.5)).cast("long").as("quality_bp"),
          TextAnalysis.tokenEstimate(col("text")).as("token_estimate"),
          floor(TextAnalysis.stopwordRatio(col("text")) * 1000000 + lit(0.5)).cast("long").as("stopword_ppm"))
        .orderBy("doc_id")
    }),
    "t_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),
    "t_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp_md5"),
          TextAnalysis.rollingHash64(TextAnalysis.normalized(col("text"))).as("fp_roll"))
        .orderBy("doc_id")
    }),
    "t_minhash_pairs" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      // signatures are consumed THREE times (banding + both pair-joins):
      // eagerly materialize once via localCheckpoint — unlike persist()
      // the blocks are managed (freed on GC), so nothing leaks across the
      // driver's query sweep; at cluster scale: write signatures to a table
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint(true)
      val cands = Dedup.minhashCandidates(sigs)
      cands
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.sigJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    "t_minhash_incremental" -> ((s, dir) => {
      // CHURN-PRICED stored MinHash signatures (Dedup.minhashIncremental):
      // the signature table lives as per-document-bucket (id, h, sigv)
      // facts; a churned corpus re-shingles only its dirty buckets —
      // completing the stored-state trio (text index, PQ codes, now
      // near-dup signatures). Seeded from a restated prior corpus,
      // maintained to the CURRENT near-dup corpus, then the SAME LSH
      // candidate chain answers from the store alone. Identical output
      // to t_minhash_pairs means the same oracle (state invisible)
      val docs = docsWithNearDups(s, dir)
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incmh_${dirTag(dir)}"
      val restated = col("doc_id") < 30
      val prior = docs
        .withColumn("text", when(restated,
          concat(coalesce(col("text"), lit("")), lit(" restated prior")))
          .otherwise(col("text")))
        .filter(!(restated && col("doc_id") % 3 === 0))
      Dedup.minhashIncremental(prior, stateDir, nBuckets = 256)
      Dedup.minhashIncremental(docs, stateDir, nBuckets = 256)
      val sigs = Dedup.signaturesFromStore(s, stateDir).localCheckpoint(true)
      Dedup.minhashCandidates(sigs)
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.sigJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    "t_seen_incremental" -> ((s, dir) => {
      // PERSISTENT SEEN-SET ingest dedup (Curation.seenAppend): three
      // deterministic batches of a duplicate-injected corpus fold into
      // one store; the store accumulates exactly the FIRST occurrence
      // of each fingerprint (earliest batch, min doc_id within it) —
      // the +900000 copies land in their original's batch (within-batch
      // dedup), the +500000 copies in a LATER batch (history dedup).
      // Compaction interleaves after batch 1 and a replay of batch 0
      // after its fold is fenced to a no-op. Fresh store per run (the
      // surface is cumulative). The oracle replays the first-occurrence
      // rule from the deterministic batch assignment (doc_id % 3)
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_seen_${System.nanoTime()}"
      val d = t(s, dir, "documents").select("doc_id", "text")
      val all = d
        .unionByName(d.filter(col("doc_id") < 25).select(
          (col("doc_id") + 500000).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") < 10).select(
          (col("doc_id") + 900000).as("doc_id"), col("text")))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      for (k <- 0L to 2L) {
        graft.ops.Curation.seenAppend(
          all.filter(pmod(col("doc_id"), lit(3L)) === k), k, stateDir,
          "fp", "doc_id")
        if (k == 1L) graft.ops.Curation.compactSeenStore(s, stateDir)
      }
      graft.ops.Curation.seenAppend(
        all.filter(pmod(col("doc_id"), lit(3L)) === 0L), 0L, stateDir,
        "fp", "doc_id")
      graft.ops.Curation.seenRows(s, stateDir)
        .select("doc_id", "fp").orderBy("doc_id")
    }),
    "t_minhash_group_sig" -> ((s, dir) => {
      // distributive MinHashAgg: per-source corpus signature from exploded
      // shingles (map-side partial agg; shuffle carries 64 longs per
      // group). Emitted component-wise (source, hash_idx, sig_value) so
      // the DuckDB oracle can replay every signature component exactly
      val shingleUdf = udf { (text: String) => Dedup.shingleHashes(text, 3) }
      t(s, dir, "documents")
        .select(col("source"),
          explode(shingleUdf(TextAnalysis.normalized(col("text")))).as("sh"))
        .groupBy("source")
        .agg(graft.functions.MinHashAgg.minhashAgg(col("sh")).as("sig"))
        .select(col("source"), posexplode(col("sig")).as(Seq("hash_idx", "sig_value")))
        .orderBy("source", "hash_idx")
    }),
    "t_dedup_groups" -> ((s, dir) => {
      // full near-dup pipeline finisher: LSH candidates -> connected
      // components -> one keep-representative per duplicate group
      val docs = docsWithNearDups(s, dir)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      // large-star/small-star: O(log^2 n) rounds regardless of how long
      // cross-band bucket chains get (label propagation needs O(diameter));
      // measured ~25% faster here and result-identical (equivalence spec)
      Dedup.connectedComponentsStar(Dedup.minhashCandidates(sigs))
        .groupBy("component").agg(count(lit(1)).as("group_size"))
        .orderBy("component")
    }),
    "t_dedup_keep" -> ((s, dir) => {
      // end-to-end dedup finisher: LSH candidates -> connected components
      // -> keep the longest doc per duplicate group (ties to min id);
      // docs in no candidate pair survive as their own singleton group
      val docs = docsWithNearDups(s, dir)
        .withColumn("score", length(col("text")).cast("long"))
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val labels = Dedup.connectedComponentsStar(Dedup.minhashCandidates(sigs))
      Dedup.keepBest(docs.select("doc_id", "score"), labels, "doc_id", "score")
        .select(col("component"), col("doc_id").as("keep_id"), col("score"))
        .orderBy("component")
    }),
    "t_simhash_pairs" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      Dedup.simhashCandidates(Dedup.simhashes(docs, "doc_id", "text"))
        .orderBy("id_a", "id_b")
    }),
    "t_ngram_jaccard" -> ((s, dir) => {
      // exact n-gram Jaccard verification over LSH candidates
      val docs = docsWithNearDups(s, dir)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      Dedup.minhashCandidates(sigs)
        .join(docs.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.ngramJaccardUdf(col("text_a"), col("text_b"), lit(3)).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    "t_ann_topk" -> ((s, dir) => {
      // ranks computed on full-precision cosine; the emitted score is
      // ppm-scaled for cross-engine hash parity with the brute-force
      // DuckDB oracle (ranking is deterministic: ties broken by corpus_id)
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("corpus_id"),
          floor(col("cosine") * 1000000 + lit(0.5)).cast("long").as("cosine_ppm"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_lsh" -> ((s, dir) => {
      // ranks on full-precision cosine; emitted ppm-scaled for cross-engine
      // hash parity (the oracle replays the hyperplane signatures exactly)
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10), k = 5, bits = 8)
        .select(col("query_id"), col("corpus_id"),
          floor(col("cosine") * 1000000 + lit(0.5)).cast("long").as("cosine_ppm"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_ivf" -> ((s, dir) => {
      // ranks on full-precision cosine; ppm-scaled output. The trained
      // centroids use an order-deterministic mean (see Similarity.ivfTopK)
      // so the oracle can replay the whole index exactly
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), k = 5,
          nCentroids = 16, nprobe = 3)
        .select(col("query_id"), col("corpus_id"),
          floor(col("cosine") * 1000000 + lit(0.5)).cast("long").as("cosine_ppm"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_pq" -> ((s, dir) => {
      // product-quantization ADC search: 4 subspaces x 16 codewords over
      // the 64-dim embeddings. Integer END-TO-END: components q24-quantize
      // BEFORE any arithmetic, LUT cells are exact-BIGINT squared-L2 sums
      // of products, adist their BIGINT sum — no double fold exists for an
      // engine version to diverge on; the oracle replays fit, encode, LUT
      // and sum in the same exact integers
      val e = t(s, dir, "embeddings")
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10), k = 5,
          m = 4, ksub = 16)
        .select(col("query_id"), col("corpus_id"), col("adist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_pq_indexed" -> ((s, dir) => {
      // the fit-once/search-many contract end-to-end: pqIndexWrite
      // persists the integer codebooks + id-bucketed code table as
      // tables, then pqSearchIndexed answers from the stored artifact
      // ONLY — the search plan contains no raw-embedding corpus scan
      // (pinned in OpsSpec). Output is byte-identical to t_ann_pq: same
      // trained index, searched from disk instead of in-flight frames
      val e = t(s, dir, "embeddings")
      val idx = s"pq_verify_idx_${dirTag(dir)}"
      graft.ops.Similarity.pqIndexWrite(e, idx,
        m = 4, ksub = 16, numBuckets = 8)
      graft.ops.Similarity.pqSearchIndexed(s, idx,
          e.filter(col("vec_id") < 10), k = 5, m = 4)
        .select(col("query_id"), col("corpus_id"), col("adist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_pq_incremental" -> ((s, dir) => {
      // CHURN-PRICED stored PQ index (Similarity.pqIndexIncremental):
      // where t_ann_pq_indexed's stamp-guarded artifact rebuilds
      // WHOLESALE on any churn, this state stores per-document codes as
      // per-bucket partials and re-prices each run by the churn. The
      // query seeds books + codes on the CURRENT corpus, churns a
      // bounded id slice (re-vectored + deleted) and maintains, then
      // maintains BACK to the current corpus — two digest-pruned
      // surgeries with the codebooks frozen throughout — and answers
      // the same ADC search from the stored state. Oracle = the same
      // fit+encode+LUT replay as t_ann_pq (state invisible; books were
      // fit on the current corpus, which the oracle re-derives)
      val e = t(s, dir, "embeddings")
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incpq_${dirTag(dir)}"
      graft.ops.Similarity.pqIndexIncremental(e, stateDir,
        m = 4, ksub = 16, nBuckets = 256)
      val churned = e
        .withColumn("embedding",
          when(col("vec_id") % 31 === 3,
            expr("transform(embedding, x -> float(-x))"))
            .otherwise(col("embedding")))
        .filter(col("vec_id") % 43 =!= 11)
      graft.ops.Similarity.pqIndexIncremental(churned, stateDir,
        m = 4, ksub = 16, nBuckets = 256, dirtyFractionLimit = 1.0)
      graft.ops.Similarity.pqIndexIncremental(e, stateDir,
        m = 4, ksub = 16, nBuckets = 256, dirtyFractionLimit = 1.0)
      graft.ops.Similarity.pqSearchIncremental(s, stateDir,
          e.filter(col("vec_id") < 10), k = 5, m = 4)
        .select(col("query_id"), col("corpus_id"), col("adist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_ann_pq_rerank" -> ((s, dir) => {
      // two-stage PQ retrieval THROUGH THE STORED INDEX: pqIndexWrite
      // persists the m=8/ksub=32 codebooks + code table once, the ADC
      // 200-candidate shortlist answers from the stored artifact
      // (pqSearchIndexed — the fit subtree executes exactly once, at
      // write time, instead of re-deriving per downstream consumer), and
      // the exact top-5 re-rank touches 200 vectors per query instead of
      // the corpus. Recall recovers from ~0.17 (ADC-only) to ~0.96.
      // Output is byte-identical to the in-flight pqTopKRerank — same
      // trained index, searched from disk
      val e = t(s, dir, "embeddings")
      val idx = s"pq_rerank_idx_${dirTag(dir)}"
      graft.ops.Similarity.pqIndexWrite(e, idx,
        m = 8, ksub = 32, numBuckets = 8)
      val short = graft.ops.Similarity.pqSearchIndexed(s, idx,
        e.filter(col("vec_id") < 10), k = 200, m = 8)
      Similarity.pqRerank(e, e.filter(col("vec_id") < 10), short, k = 5)
        .select(col("query_id"), col("corpus_id"),
          floor(col("cosine") * 1000000 + lit(0.5)).cast("long").as("cosine_ppm"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "t_embed_neardup" -> ((s, dir) => {
      // synthetic embeddings have no natural near-dups (max pairwise
      // cosine ~0.51) — inject perturbed copies of vec_id < 10 (first
      // component scaled 1.05, id + 100000) so the operator has true
      // positives to find
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val perturbed = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * 1.05f).otherwise(x)).as("embedding"))
      Similarity.embeddingNearDups(e.unionByName(perturbed),
          threshold = 0.95, bits = 8)
        .select(col("id_a"), col("id_b"),
          floor(col("cosine") * 1000000 + lit(0.5)).cast("long").as("cosine_ppm"))
        .orderBy("id_a", "id_b")
    }),
    "t_image_neardup" -> ((s, dir) => {
      // image near-dup: dHash over the REAL decoded 8x8 pixels, bucketed
      // by the hash-agnostic SimHash block trick. Injected true
      // positives: byte-identical re-uploads (ids +100000, distance 0)
      // and one-pixel edits (ids +200000, char 11 replaced -> <= 2 bits
      // flip, both in block 0, so blocks 1-3 still collide)
      val d = t(s, dir, "documents").select("doc_id", "text")
      val base = d.filter(col("doc_id") < 10)
      val copies = base.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val nudged = base.select((col("doc_id") + 200000).as("doc_id"),
        expr("concat(substring(text, 1, 10), 'Q', substring(text, 12))").as("text"))
      val media = Multimodal.asMediaImages(
        d.unionByName(copies).unionByName(nudged), "doc_id", "text")
      Dedup.simhashCandidates(Multimodal.imageDHash(media), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),
    "t_audio_neardup" -> ((s, dir) => {
      // audio near-dup: energy-contour fingerprint over REAL decoded PCM
      // (integer frame energies), bucketed by the hash-agnostic SimHash
      // block trick. Injected true positives: re-encoded copies (ids
      // +100000, distance 0) and one-sample edits (ids +200000 — only one
      // frame's energy moves, flipping at most its two adjacent
      // comparisons)
      val d = t(s, dir, "documents").select("doc_id", "text")
      val base = d.filter(col("doc_id") < 10)
      val copies = base.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val nudged = base.select((col("doc_id") + 200000).as("doc_id"),
        expr("concat(substring(text, 1, 10), 'Q', substring(text, 12))").as("text"))
      val media = Multimodal.asMediaAudio(
        d.unionByName(copies).unionByName(nudged), "doc_id", "text")
      Dedup.simhashCandidates(Multimodal.audioEnergyHash(media), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),
    "t_vector_stats" -> ((s, dir) => {
      Similarity.vectorStats(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("dim"),
          floor(col("sq_sum") * 1000000 + lit(0.5)).cast("long").as("sq_sum_ppm"),
          floor(col("l2_norm") * 1000000 + lit(0.5)).cast("long").as("l2_ppm"))
        .orderBy("vec_id")
    }),
    "t_media_features" -> ((s, dir) => {
      // REAL image pipeline: deterministic 8x8 grayscale BMP per document
      // -> javax.imageio decode -> true pixel brightness/sharpness. The
      // oracle recomputes both from the text's char codes (the closed form
      // of the generated pixels; BMP is lossless)
      val media = Multimodal.asMediaImages(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("decoded_w"), col("decoded_h"),
          floor(col("brightness") * 1000000 + lit(0.5)).cast("long").as("brightness_ppm"),
          floor(col("sharpness") * 1000000 + lit(0.5)).cast("long").as("sharpness_ppm"))
        .orderBy("media_id")
    }),
    "t_media_resize" -> ((s, dir) => {
      // REAL resize: 8x8 BMP decode -> box-average 4x4 resample -> BMP
      // re-encode -> re-decode -> true pixel features; the oracle
      // recomputes the downsampled pixels in closed form from the text
      val media = Multimodal.asMediaImages(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(Multimodal.resize(media, 4, 4).toDF()).toDF()
        .select(col("media_id"), col("decoded_w"), col("decoded_h"),
          floor(col("brightness") * 1000000 + lit(0.5)).cast("long").as("brightness_ppm"),
          floor(col("sharpness") * 1000000 + lit(0.5)).cast("long").as("sharpness_ppm"))
        .orderBy("media_id")
    }),
    "t_contamination" -> ((s, dir) => {
      // benchmark decontamination: distinct word-8-gram overlap of every
      // document against the "benchmark" set (doc_id < 5), benchmark
      // shingles broadcast — the corpus scans once, no content shuffle
      val d = t(s, dir, "documents")
      graft.ops.Curation.contamination(d, d.filter(col("doc_id") < 5),
          "doc_id", "text", n = 8)
        .orderBy("id")
    }),
    "t_redact" -> ((s, dir) => {
      // PII redaction: deterministic emails/IPs injected into every 7th
      // doc so the masking has real work; md5 pins the redacted bytes
      val d = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact: user"),
            col("doc_id").cast("string"), lit("@example.com or 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".1")))
          .otherwise(col("text")))
      graft.ops.Curation.redactPii(d, "text2")
        .select(col("doc_id"), col("n_emails"), col("n_ips"),
          md5(col("redacted").cast("binary")).as("redacted_md5"))
        .orderBy("doc_id")
    }),
    "t_split" -> ((s, dir) => {
      // deterministic train/val/test assignment (90/5/5) by hashed doc id;
      // the oracle replays Spark's xxhash64 (XXH64 of the 8-byte long,
      // seed 42) exactly in HUGEINT arithmetic
      graft.ops.Sampling.assignSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 9000, "val" -> 500, "test" -> 500))
        .select(col("doc_id"), col("split_bucket"), col("split"))
        .orderBy("doc_id")
    }),
    "t_split_safe" -> ((s, dir) => {
      // LEAKAGE-SAFE split: near-dup groups (LSH candidates -> connected
      // components) are assigned to train/val/test as a UNIT, so a
      // training document's near-duplicates can never land in the eval
      // split; singletons hash their own id and agree with t_split.
      // The oracle replays the full chain — minhash bands, the
      // min-id component closure, and Spark's xxhash64 of the group key
      val docs = docsWithNearDups(s, dir)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val labels = Dedup.connectedComponentsStar(Dedup.minhashCandidates(sigs))
      graft.ops.Sampling.assignSplitByGroup(docs, "doc_id", labels,
          Seq("train" -> 9000, "val" -> 500, "test" -> 500))
        .select(col("doc_id"), col("split_group"), col("split_bucket"),
          col("split"))
        .orderBy("doc_id")
    }),
    "t_corpus_drift" -> ((s, dir) => {
      // distribution-shift monitoring: per-source total-variation
      // distance from the corpus-wide token distribution, exact rational
      // DECIMAL arithmetic (no logarithm), plus the argmax-deviation
      // term — the "which snapshot drifted, and on what" report
      TextAnalysis.corpusDrift(t(s, dir, "documents"))
        .orderBy("source")
    }),
    "t_corpus_drift_union" -> ((s, dir) => {
      // the bounded-vocab variant: top_term nominated over the UNION of
      // slice and corpus vocabularies (streaming-twin semantics); same
      // exact-rational tvd_ppm as t_corpus_drift
      TextAnalysis.corpusDrift(t(s, dir, "documents"), topOverUnion = true)
        .orderBy("source")
    }),
    "t_gopher" -> ((s, dir) => {
      // the published Gopher quality rule set (Rae et al. 2021 A1.1) as
      // per-rule boolean columns + the conjunction — every ratio test
      // cross-multiplied into integer arithmetic (engine-exact, no
      // float thresholds), one scan, zero shuffles
      TextAnalysis.gopherRules(t(s, dir, "documents")).orderBy("doc_id")
    }),
    "t_corpus_freq" -> ((s, dir) => {
      // log-free perplexity proxy: per-doc integer sum of corpus-wide
      // token occurrence counts — rare-token-heavy (noisy) docs score low
      TextAnalysis.corpusFreqScore(t(s, dir, "documents"))
        .orderBy("doc_id")
    }),
    "t_shards" -> ((s, dir) => {
      // deterministic global shuffle + shard assignment (the training-
      // export step): shard = hashed id mod 8, position = within-shard
      // rank of the full hash — one shard-keyed exchange plus per-shard
      // sorts, never a global sort; reading shards in (shard, pos)
      // order is a reproducible pseudorandom permutation of the corpus.
      // The oracle replays Spark's xxhash64 in HUGEINT arithmetic
      graft.ops.Sampling.shuffleShards(
          t(s, dir, "documents").select("doc_id"), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),
    "t_bpe_pairs" -> ((s, dir) => {
      // BPE training iteration 0's statistics: adjacent character-pair
      // frequencies over the per-character tokenization, weighted by
      // distinct-word corpus frequency (overlaps count — "aaa" yields
      // (a,a) twice). The one training stage that is SQL-expressible, so
      // the oracle replays it; the full iterative trainer is pinned
      // against the committed Python-reference fixture in BpeSpec
      val wf = graft.ops.Tokenize.wordFreqs(t(s, dir, "documents"), "text")
      graft.ops.Tokenize.pairCounts(wf)
        .select(col("left").as("pair_left"), col("right").as("pair_right"),
          col("freq"))
        .orderBy(desc("freq"), asc("pair_left"), asc("pair_right"))
    }),
    "t_bpe_encode" -> ((s, dir) => {
      // subword tokenization of the corpus with the COMMITTED merge table
      // (trained by the independent Python reference implementation,
      // scripts/gen_bpe_fixture.py): one shuffle-free mapPartitions pass
      // with a per-partition word->tokens memo. The oracle re-derives
      // per-doc token counts by joining DuckDB-exploded words against the
      // reference encoder's word->n_tokens fixture — any divergence in
      // pre-tokenization, merge order or greedy-rewrite semantics
      // surfaces as a hash mismatch
      val merges = graft.ops.Tokenize.loadMerges(
        s.read.parquet(s"$repoRoot/src/test/resources/bpe_merges.parquet"))
      graft.ops.Tokenize.bpeEncode(t(s, dir, "documents"), "doc_id", "text",
          merges)
        .select(col("id").as("doc_id"), col("n_words"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    "t_bpe_bytes" -> ((s, dir) => {
      // BYTE-LEVEL (GPT-2 scheme) subword tokenization with the
      // COMMITTED byte-level merge table (trained by the independent
      // Python reference, scripts/gen_bpe_bytes_fixture.py):
      // case-preserved, whitespace-glued "Ġword" tokens, LOSSLESS by
      // construction (byteUnmap of the concatenated tokens is the
      // text — spec-pinned). Same shuffle-free memoized mapPartitions
      // shape as t_bpe_encode. The oracle re-derives per-doc counts by
      // extracting pre-tokens in DuckDB (on this single-spaced
      // lowercase-ASCII corpus ' ?[a-z]+' IS the GPT-2 pattern's
      // behavior; the full pattern's edges are fixture-pinned in
      // BpeSpec) and joining the reference encoder's
      // pretoken -> n_tokens fixture
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      graft.ops.Tokenize.bpeEncodeBytes(t(s, dir, "documents"), "doc_id",
          "text", merges)
        .select(col("id").as("doc_id"), col("n_pretokens"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    "t_bpe_ids" -> ((s, dir) => {
      // byte-level encode to INTEGER token ids (GPT-2 vocabulary order:
      // the 256 byte symbols, then merges by rank) — the representation
      // a training run actually embeds; no <unk> exists by construction.
      // The oracle replays per-doc (token count, id checksum) through
      // the reference fixture's per-pretoken ids
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"), "doc_id",
          "text", merges)
        .select(col("id").as("doc_id"), col("n_tokens"), col("ids_sum"))
        .orderBy("doc_id")
    }),
    "t_oov_rate" -> ((s, dir) => {
      // out-of-vocabulary rate per doc against the corpus's own top-20
      // terms (deterministic: count desc, term asc): vocab is a
      // metadata-sized top-K broadcast, coverage is one scan — no
      // data-sized shuffle; exact integer ppm
      graft.ops.TextAnalysis.vocabCoverage(t(s, dir, "documents"),
          vocabSize = 20)
        .orderBy("doc_id")
    }),
    "t_incremental_vocab" -> ((s, dir) => {
      // churn-priced MATERIALIZED AGGREGATE (IncrementalAgg): the corpus
      // vocabulary stored as per-bucket partials, seeded from a restated
      // prior corpus (docs < 30 re-texted, a third of them absent), then
      // maintained to the CURRENT corpus — only the restated ids'
      // buckets re-aggregate; clean buckets' partitions stand untouched.
      // Oracle = the full word-count SQL over current documents, which
      // never sees the state. doc_ids are dense, so the churn stays a
      // bounded bucket set at every SF (~30 of 256)
      val docs = t(s, dir, "documents")
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incvocab_${dirTag(dir)}"
      val restated = col("doc_id") < 30
      val prior = docs
        .withColumn("text", when(restated,
          concat(coalesce(col("text"), lit("")), lit(" restated prior")))
          .otherwise(col("text")))
        .filter(!(restated && col("doc_id") % 3 === 0))
      graft.ops.IncrementalAgg.vocab(prior, stateDir, nBuckets = 256)
      graft.ops.IncrementalAgg.vocab(docs, stateDir, nBuckets = 256)
        ._1.orderBy("term")
    }),
    "t_incremental_bigrams" -> ((s, dir) => {
      // the churn-priced BIGRAM MODEL TABLE (the ngramLmSurprisal /
      // DSIR count-table workload — the aggregate where incremental
      // maintenance actually pays, rehearsal-measured 1.94x at 50x):
      // same restated-prior seeding as t_incremental_vocab, oracle =
      // the full bigram-count SQL over current documents
      val docs = t(s, dir, "documents")
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incbigram_${dirTag(dir)}"
      val restated = col("doc_id") < 30
      val prior = docs
        .withColumn("text", when(restated,
          concat(coalesce(col("text"), lit("")), lit(" restated prior")))
          .otherwise(col("text")))
        .filter(!(restated && col("doc_id") % 3 === 0))
      graft.ops.IncrementalAgg.bigrams(prior, stateDir, nBuckets = 256)
      graft.ops.IncrementalAgg.bigrams(docs, stateDir, nBuckets = 256)
        ._1.orderBy("w1", "w2")
    }),
    "t_ngram_lm" -> ((s, dir) => {
      // bigram-LM surprisal (the CCNet corpus-LM quality-score shape):
      // add-one-smoothed p(w2|w1) from the corpus's own bigram counts,
      // surprisal in whole bits via integer bit-length — no float, no
      // log, so the oracle replays the trained model exactly
      TextAnalysis.ngramLmSurprisal(t(s, dir, "documents"))
        .orderBy("doc_id")
    }),
    "t_dsir" -> ((s, dir) => {
      // DSIR-shaped importance score: whole-bit surprisal under the
      // corpus's own bigram model minus surprisal under the English-
      // target model (documents lang='en'), milli-bits per bigram —
      // positive = more target-like; both models integer, so the oracle
      // replays the full double-model pipeline exactly
      val d = t(s, dir, "documents")
      TextAnalysis.importanceScore(d, d.filter(col("lang") === "en"))
        .orderBy("doc_id")
    }),
    "t_line_dedup" -> ((s, dir) => {
      // CCNet/RefinedWeb-style line-level boilerplate removal. The test
      // corpus is single-line word soup, so lines are materialized
      // deterministically as 12-token spans first; any line occurring
      // >= 2 times corpus-wide (the exact-dup documents' spans) is then
      // dropped from EVERY document, and documents reassemble in span
      // order — docs whose every line is boilerplate keep their row with
      // clean_text = ''
      val lined = t(s, dir, "documents").selectExpr("doc_id",
        """array_join(transform(
          |  sequence(0, (size(split(text, ' ')) + 11) div 12 - 1),
          |  i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' ')),
          | '\n') AS text""".stripMargin)
      graft.ops.Curation.lineDedup(lined, "doc_id", "text", minCount = 2)
        .orderBy("doc_id")
    }),
    "t_pagerank" -> ((s, dir) => {
      // integer-arithmetic PageRank over the symmetrized customer-supplier
      // trade graph (distinct pairs via orders x lineitem), 3 Pregel-style
      // iterations — every division is a floor of non-negative BIGINTs, so
      // ranks are bit-identical under any partitioning or engine; top-50
      // hubs, ties broken by node id
      // node ids ride as INTEGERS through the iterations (customer 2k,
      // supplier 2k+1 — disjoint by parity) and decode to the public
      // "c<id>"/"s<id>" strings only at the output: integer keys hash
      // and shuffle ~2x leaner than strings across the 3 Pregel rounds
      // (measured 6.7 -> 5.4 s at sf0.1; ranks are a pure function of
      // the graph, so the result is bit-identical)
      val cs = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
      graft.ops.Graph.pageRank(edges, "a", "b", iterations = 3)
        .select(
          when(col("node") % 2 === 0, concat(lit("c"), expr("node div 2")))
            .otherwise(concat(lit("s"), expr("(node - 1) div 2"))).as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(50)
    }),
    "t_countmin" -> ((s, dir) => {
      // count-min sketch heavy hitters (Cormode-Muthukrishnan): 4x1024
      // integer counter matrix over token frequencies, point-estimated on
      // the exact top-20 tokens — one-sided error (cm_est >= exact_n
      // always, equal absent collisions); the fixed-size sketch is the
      // 100 TB answer when the distinct-key domain is too large to count
      val toks = t(s, dir, "documents").select(
        explode(split(TextAnalysis.normalized(col("text")), " ")).as("term"))
      val sketch = graft.ops.Frequency.countMinSketch(toks, "term",
        depth = 4, width = 1024)
      val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_n"))
      val top = exact.orderBy(col("exact_n").desc, col("term")).limit(20)
      graft.ops.Frequency.countMinEstimate(sketch, top, "term",
          depth = 4, width = 1024)
        .join(top, Seq("term"))
        .select(col("term"), col("exact_n"), col("cm_est"))
        .orderBy("term")
    }),
    "t_inverted_index" -> ((s, dir) => {
      // sharded inverted-index build: per-term df/cf + posting lists in
      // doc order, paged into 64-entry blocks so no aggregation group
      // ever exceeds the page size (common word-soup terms span multiple
      // blocks at every SF, exercising the paging)
      graft.ops.Indexing.invertedIndex(t(s, dir, "documents"),
          "doc_id", "text", blockSize = 64)
        .orderBy("term", "block")
    }),
    "t_hll" -> ((s, dir) => {
      // HyperLogLog register sketch (2^8 registers) of the distinct
      // lineitem line keys — register = low 8 hash bits, rank = integer
      // bit-length of the rest; mergeable by register-wise max, fully
      // integer, so the oracle replays every register exactly
      val li = t(s, dir, "lineitem").select(
        concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("k"))
      graft.ops.Frequency.hllSketch(li, "k", p = 8)
        .orderBy("register")
    }),
    "t_hll_est" -> ((s, dir) => {
      // the raw HLL estimate off that sketch, evaluated in exact rational
      // arithmetic (driver-side big integers over the <=256 collected
      // registers) — n_exact alongside shows the ~6.5% expected error
      val li = t(s, dir, "lineitem").select(
        concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("k"))
      val est = graft.ops.Frequency.hllEstimate(
        graft.ops.Frequency.hllSketch(li, "k", p = 8), p = 8)
      est.crossJoin(li.agg(count_distinct(col("k")).as("n_exact")))
        .select(col("m"), col("n_used"), col("n_est"), col("n_exact"))
    }),
    "t_span_dedup" -> ((s, dir) => {
      // exact-substring (duplicate 5-gram span) removal, Lee et al. 2022
      // style, over the near-dup corpus: perturbed copies (every 7th word
      // dropped) share 5-token runs with their originals BETWEEN the
      // perturbation points, so coverage is partial — plus the word
      // soup's organic repeated 5-grams; every duplicated span vanishes
      // from every document it occurs in
      graft.ops.Curation.spanDedup(docsWithNearDups(s, dir), "doc_id",
          "text", k = 5, minCount = 2)
        .orderBy("doc_id")
    }),
    "t_linear_score" -> ((s, dir) => {
      // hashing-trick quality-classifier inference (fastText-style):
      // 4096-bucket integer weight table (deterministic fixture weights
      // w[j] = (splitmix64(j) & 15) - 8 standing in for trained ones —
      // power-of-two moduli keep the signed/unsigned replay exact),
      // logit = sum of token-bucket weights over normalized tokens;
      // zero-shuffle narrow scoring pass
      def smix(x0: Long): Long = {
        var x = x0 + 0x9e3779b97f4a7c15L
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
        x ^ (x >>> 31)
      }
      val weights = Array.tabulate(4096)(j => (smix(j.toLong) & 15L) - 8L)
      TextAnalysis.applyLinearModel(t(s, dir, "documents"), "doc_id", "text",
          weights)
        .orderBy("id")
    }),
    "t_budget_select" -> ((s, dir) => {
      // token-budget corpus selection: longest docs first (n_chars desc,
      // doc_id tiebreak) while the inclusive running token total stays
      // under budget; the global cumulative sum is the scalable
      // range-partition + offsets decomposition (no SinglePartition —
      // plan pinned)
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Curation.selectUnderBudget(d, "doc_id", "n_tokens",
          "n_chars", budgetTokens = 15000L)
        .orderBy("doc_id")
    }),
    "t_linkage" -> ((s, dir) => {
      // record linkage: dirty nation names (underscore stripped) matched
      // back to the clean table — last-character blocking (keyed
      // equi-join, never all-pairs), codegen difflib-ratio verify at
      // 0.85, best match per dirty record (ties to min right id)
      val clean = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"))
      val dirty = clean.select((col("id") + 1000L).as("id"),
        regexp_replace(col("name"), "_", "").as("name"))
      graft.ops.Linkage.bestMatch(dirty, clean, "id", "name",
          n => substring(n, -1, 1), threshold = 0.85)
        .select(col("left_id"), col("left_name"), col("right_id"), col("right_name"),
          floor(col("ratio") * 1000000 + lit(0.5)).cast("long").as("ratio_ppm"))
        .orderBy("left_id")
    }),
    "t_quality_filter" -> ((s, dir) => {
      // corpus-relative curation: keep docs at/above the corpus p25 by
      // length — threshold from the HDR sketch (same deterministic
      // bucket replay as t_quantiles), broadcast onto a scan-side filter
      graft.ops.Quantile.filterAtQuantile(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "n_chars", qPpm = 250000L)
        .orderBy("doc_id")
    }),
    "t_stratified" -> ((s, dir) => {
      // language rebalancing: keep 20% of the dominant 'en' stratum, 80%
      // of every other language — same stateless xxhash64 rule (and the
      // same HUGEINT oracle replay) as t_split
      graft.ops.Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id",
          "lang", Seq("en" -> 2000), defaultBp = 8000)
        .select(col("doc_id"), col("lang"), col("sample_bucket"))
        .orderBy("doc_id")
    }),
    "t_source_cap" -> ((s, dir) => {
      // per-domain cap: at most 10 docs per source, deterministic by
      // doc_id; the rank filter compiles to WindowGroupLimit so map tasks
      // pre-prune before the shuffle (plan pinned)
      graft.ops.Curation.perDomainCap(t(s, dir, "documents"), "source",
          "doc_id", cap = 10)
        .select(col("source"), col("doc_id"),
          col("domain_rank").cast("long").as("domain_rank"))
        .orderBy("source", "doc_id")
    }),
    "t_incremental_dedup" -> ((s, dir) => {
      // incremental ingest dedup: corpus = even docs; the new batch = odd
      // docs + a re-crawl of the corpus (ids offset) that must be dropped.
      // The bloom pre-filter is exactness-preserving (confirm anti-join),
      // so the oracle is the plain anti-join — any fpp gives this result
      val d = t(s, dir, "documents").select(col("doc_id"),
        md5(col("text").cast("binary")).as("fp"))
      val corpus = d.filter(col("doc_id") % 2 === 0)
      val recrawl = corpus.select((col("doc_id") + 100000).as("doc_id"), col("fp"))
      val batch = d.filter(col("doc_id") % 2 === 1).unionByName(recrawl)
      graft.ops.Curation.incrementalNew(batch, corpus, "fp",
          expectedCorpusRows = 10000)
        .select("doc_id", "fp")
        .orderBy("doc_id")
    }),
    "t_kmeans" -> ((s, dir) => {
      // two Lloyd iterations, k=8, over the embeddings corpus; integer
      // end-to-end (q24 components, exact-BIGINT squared-L2 argmin,
      // half-up integer centroid means) and emits the trained model's
      // integer stats — no double fold exists anywhere in the fit for an
      // engine version to flip, which is what re-greens the twice-red
      // driver row
      graft.ops.Similarity.kmeansFitStats(t(s, dir, "embeddings"),
          k = 8, iters = 2)
        .select(col("cent_id"), col("pos").cast("long").as("pos"),
          col("ssum"), col("n"))
        .orderBy("cent_id", "pos")
    }),
    "t_semantic_dedup" -> ((s, dir) => {
      // SemDeDup over the embeddings corpus + injected near-dup twins
      // (vec_id < 10, component 0 scaled 1.05, id + 100000 — the
      // t_embed_neardup construction): k-means-cluster with the
      // replayable Lloyd fit, then the paper's keep-lowest-index rule at
      // cosine 0.95 within clusters. The twins must drop; the oracle
      // replays fit, final assignment and the full within-cluster pair
      // scan exactly (maxCluster above any real cluster size at every
      // SF, so both sides are in the exact all-pairs regime)
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val perturbed = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * 1.05f).otherwise(x)).as("embedding"))
      graft.ops.Similarity.semanticDedup(e.unionByName(perturbed),
          threshold = 0.95, k = 8, iters = 2, maxCluster = 4096)
        .orderBy("vec_id")
    }),
    "t_mixture" -> ((s, dir) => {
      // static mixture re-weighting: per-language sampling rates that hit
      // a 50/12.5/12.5/12.5/12.5 target without upsampling; the rate is a
      // computed double ratio, so it ships ppm-floored per ORACLES.md
      val d = t(s, dir, "documents").select(col("lang"),
        TextAnalysis.tokenEstimate(col("text")).as("toks"))
      graft.ops.Curation.mixtureWeights(d, "lang", "toks",
          Seq("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
            "fr" -> 0.125, "zh" -> 0.125))
        .select(col("domain"), col("domain_tokens"),
          floor(col("rate") * 1000000 + lit(0.5)).cast("long").as("rate_ppm"))
        .orderBy("domain")
    }),
    "t_mixture_apply" -> ((s, dir) => {
      // materializing the t_mixture rates: per-row deterministic
      // Bernoulli draw — keep iff floorMod(fnv1a(doc_id), 2^20) <
      // floor(rate * 2^20 + 0.5); the kept set is a pure function of
      // the ids (power-of-two modulus = unsigned-replay parity)
      val d = t(s, dir, "documents")
      val weights = graft.ops.Curation.mixtureWeights(
        d.select(col("lang"), TextAnalysis.tokenEstimate(col("text")).as("toks")),
        "lang", "toks", Seq("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
          "fr" -> 0.125, "zh" -> 0.125))
      graft.ops.Curation.applyMixture(d.select("doc_id", "lang"),
          "lang", "doc_id", weights)
        .select(col("doc_id"), col("lang"), col("rate_q20"))
        .orderBy("doc_id")
    }),
    "t_chunks" -> ((s, dir) => {
      // corpus chunking for training: 256-char chunks, 32-char overlap
      // (stride 224); md5 per chunk so the oracle checks the exact bytes
      graft.ops.Chunking.chunkChars(t(s, dir, "documents"), "doc_id", "text",
          size = 256, overlap = 32)
        .select(col("id"), col("chunk_idx"),
          length(col("chunk_text")).cast("long").as("n_chars"),
          md5(col("chunk_text").cast("binary")).as("chunk_md5"))
        .orderBy("id", "chunk_idx")
    }),
    "t_pack" -> ((s, dir) => {
      // greedy contiguous sequence packing into 2048-token bins, keyed by
      // source (the partitioned-window shape that scales; a global pack
      // would serialize on one task)
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Chunking.packBins(d, "source", "doc_id", "n_tokens", capacity = 2048L)
        .orderBy("source", "doc_id")
    }),
    "t_pipeline_packed" -> ((s, dir) => {
      // the DECLARATIVE pipeline surface itself under the driver gate:
      // a pipeline: config (source -> byte-BPE tokenize -> 8-shard
      // 2048-token pack) built exactly as the YAML loader would and
      // executed by PipelineJob — its packed frame must equal
      // t_export_packed's, so the same oracle replays every stage. The
      // config-as-API layer adds zero semantics of its own; this row
      // proves it
      val outDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_pipeline_${dirTag(dir)}"
      val cfg = graft.config.PipelineConfig(
        source = graft.config.SourceSpec("parquet",
          path = Some(s"$dir/documents.parquet")),
        idColumn = "doc_id", textColumn = "text",
        tokenize = Some(graft.config.TokenizeSpec(scheme = "bytes",
          mergesPath = Some(
            s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))),
        export = Some(graft.config.ExportSpec(shards = 8,
          packCapacity = 2048L, outputDirectory = outDir)))
      graft.core.PipelineJob.run(s, cfg)._2
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("bin_id"), col("bin_offset_tokens"))
        .orderBy("doc_id")
    }),
    "t_pipeline_sequences" -> ((s, dir) => {
      // the declarative pipeline's LOADER-FINAL output under the gate:
      // a pipeline: config with boundary-tokened byte-BPE tokenize +
      // sequence_length export must emit exactly the t_sequences frame
      // (same merges, same <|endoftext|> boundary, same 8-shard hash
      // assignment, same 2048 cut) — the YAML surface can now declare
      // the specials/boundary the sequences contract requires
      val outDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_pipeline_seq_${dirTag(dir)}"
      val cfg = graft.config.PipelineConfig(
        source = graft.config.SourceSpec("parquet",
          path = Some(s"$dir/documents.parquet")),
        idColumn = "doc_id", textColumn = "text",
        tokenize = Some(graft.config.TokenizeSpec(scheme = "bytes",
          mergesPath = Some(
            s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"),
          specials = Seq("<|endoftext|>"),
          boundary = Some("<|endoftext|>"))),
        export = Some(graft.config.ExportSpec(shards = 8,
          packCapacity = 2048L, outputDirectory = outDir,
          sequenceLength = 2048)))
      graft.core.PipelineJob.run(s, cfg)
      s.read.parquet(s"$outDir/sequences")
        .select(col("shard").cast("long").as("shard"), col("seq_id"),
          col("n_tokens"), col("n_docs"), col("first_doc"),
          col("last_doc"), col("complete").cast("long").as("complete"))
        .orderBy("shard", "seq_id")
    }),
    "t_bpe_ids_special" -> ((s, dir) => {
      // byte-level encode WITH a document-boundary special token:
      // <|endoftext|> holds the reserved id 256 + |merges| (= 280 for
      // the 24-merge corpus table), is appended by the PIPELINE after
      // each document (never parsed out of data), and rides the token
      // count and checksum. Oracle = the t_bpe_ids replay plus the
      // boundary constants
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("ids_sum"))
        .orderBy("doc_id")
    }),
    "t_bpe_decode" -> ((s, dir) => {
      // DISTRIBUTED round trip: encode with <|endoftext|> boundaries,
      // decode with the mapPartitions twin — specials drop, byte-level
      // vocabulary strings unmap, and every document's text returns
      // EXACTLY (the oracle is the identity: md5 of the original text;
      // null text encodes as '' — the encoder's own coalesce). The
      // detok-QA pass a loader debugger runs over an exported corpus
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
      graft.ops.Tokenize.bpeDecodeIdsDf(enc, "id", "token_ids", merges,
          specials = Seq("<|endoftext|>"))
        .select(col("id").as("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "t_sequences" -> ((s, dir) => {
      // FIXED-LENGTH sequence construction — the terminal loader step:
      // byte-BPE encode with <|endoftext|> boundaries, hash-shard into
      // 8 streams, concatenate each shard's id stream in hash order and
      // cut exact 2048-token rows (docs split across boundaries; each
      // shard's trailing partial row flagged incomplete). One shard
      // exchange + a lazy per-partition sweep — the token stream never
      // shuffles a second time. The oracle replays every boundary from
      // per-doc token counts alone (sequence cuts are pure cumsum
      // arithmetic); the token ARRAYS are spec-pinned against a
      // reference sweep instead (a mid-pretoken cut has no SQL replay)
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      graft.ops.Chunking.fixedSequences(enc, "shard", "h", "doc_id",
          "token_ids", 2048)
        .select(col("shard"), col("seq_id"), col("n_tokens"),
          col("n_docs"), col("first_doc"), col("last_doc"),
          col("complete").cast("long").as("complete"))
        .orderBy("shard", "seq_id")
    }),
    "t_sequences_padded" -> ((s, dir) => {
      // t_sequences WITH the pad policy: each shard's trailing partial
      // right-pads with the <|endoftext|> id (280 = 256 + 24 corpus
      // merges — GPT-2 practice pads with the eot token) to exactly
      // 2048, keeps complete = false, and reports the pad count. The
      // oracle replays n_tokens/n_pad from the same cumsum arithmetic
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      graft.ops.Chunking.fixedSequences(enc, "shard", "h", "doc_id",
          "token_ids", 2048, padTokenId = Some(280))
        .select(col("shard"), col("seq_id"), col("n_tokens"),
          col("n_docs"), col("first_doc"), col("last_doc"),
          col("complete").cast("long").as("complete"), col("n_pad"))
        .orderBy("shard", "seq_id")
    }),
    "t_sequences_incremental" -> ((s, dir) => {
      // CONTINUOUS LOADER FEED: fixed-length sequences cut
      // INCREMENTALLY over arriving batches — each batch's token
      // streams concatenate onto the stored per-shard carry, complete
      // rows append to the store, the new tail becomes the carry. The
      // feed is exercised with three deterministic batches
      // (doc_id % 3 in order); the store must then hold exactly the
      // complete sequences a single cut over the concatenated stream
      // emits (seq_id continuous across batches), which the oracle
      // replays with the batch key prefixed to the stream order
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_seqfeed_${System.nanoTime()}"
      val docs = t(s, dir, "documents")
      for (b <- 0L to 2L) {
        val enc = graft.ops.Tokenize.bpeEncodeIds(
            docs.filter(pmod(col("doc_id"), lit(3L)) === b),
            "doc_id", "text", merges,
            specials = Seq("<|endoftext|>"),
            boundary = Some("<|endoftext|>"))
          .select(col("id").as("doc_id"), col("token_ids"))
          .withColumn("h", xxhash64(col("doc_id")))
          .withColumn("shard", pmod(col("h"), lit(8L)))
        graft.ops.SequenceFeed.sequencesAppend(enc, b, stateDir,
          "shard", "h", "doc_id", "token_ids", 2048)
      }
      graft.ops.SequenceFeed.sequencesFromStore(s, stateDir)
        .select(col("shard"), col("seq_id"), col("n_tokens"),
          col("n_docs"), col("first_doc"), col("last_doc"))
        .orderBy("shard", "seq_id")
    }),
    "t_feed_audit" -> ((s, dir) => {
      // STORE FSCK — the auditor re-derives the feed discipline's
      // invariants from the stored rows alone (dense per-shard seq_ids,
      // length == seqLen == |token_ids|, recomputed checksum == stored
      // ids_sum) so an operator can verify a store without trusting its
      // writer. Healthy by construction here: the oracle replays the
      // per-shard row counts from the stream replay and pins every
      // violation counter at zero
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_feedaudit_${System.nanoTime()}"
      val docs = t(s, dir, "documents")
      for (b <- 0L to 2L) {
        val enc = graft.ops.Tokenize.bpeEncodeIds(
            docs.filter(pmod(col("doc_id"), lit(3L)) === b),
            "doc_id", "text", merges,
            specials = Seq("<|endoftext|>"),
            boundary = Some("<|endoftext|>"))
          .select(col("id").as("doc_id"), col("token_ids"))
          .withColumn("h", xxhash64(col("doc_id")))
          .withColumn("shard", pmod(col("h"), lit(8L)))
        graft.ops.SequenceFeed.sequencesAppend(enc, b, stateDir,
          "shard", "h", "doc_id", "token_ids", 2048)
      }
      graft.ops.SequenceFeed.auditStore(s, stateDir, 2048)
    }),
    "t_feed_snapshot" -> ((s, dir) => {
      // PUBLISHED TRAINING SNAPSHOT — a frozen row set over the live
      // feed: per-shard seq_id high-water marks taken from the carry
      // (metadata-priced publish; the row set is identity-keyed, so it
      // survives appends AND compaction). The feed gets three batches;
      // the snapshot publishes after batch 1; batch 2 lands and the
      // store compacts (batch partitions fold into the base) — the
      // snapshot read must still return EXACTLY the complete sequences
      // cut from batches 0-1, which the oracle replays from the
      // doc_id % 3 <= 1 slice in batch-prefixed stream order
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_feedsnap_${System.nanoTime()}"
      val docs = t(s, dir, "documents")
      var snap = -1L
      for (b <- 0L to 2L) {
        val enc = graft.ops.Tokenize.bpeEncodeIds(
            docs.filter(pmod(col("doc_id"), lit(3L)) === b),
            "doc_id", "text", merges,
            specials = Seq("<|endoftext|>"),
            boundary = Some("<|endoftext|>"))
          .select(col("id").as("doc_id"), col("token_ids"))
          .withColumn("h", xxhash64(col("doc_id")))
          .withColumn("shard", pmod(col("h"), lit(8L)))
        graft.ops.SequenceFeed.sequencesAppend(enc, b, stateDir,
          "shard", "h", "doc_id", "token_ids", 2048)
        if (b == 1L)
          snap = graft.ops.SequenceFeed.publishSnapshot(s, stateDir)
      }
      graft.ops.SequenceFeed.compactFeedStore(s, stateDir)
      graft.ops.SequenceFeed.readSnapshot(s, stateDir, snap)
        .select(col("shard"), col("seq_id"), col("n_tokens"),
          col("n_docs"), col("first_doc"), col("last_doc"))
        .orderBy("shard", "seq_id")
    }),
    "t_curated_feed" -> ((s, dir) => {
      // CONTINUOUS CURATED LOADER FEED (ops/CuratedFeed.scala): the
      // full curation chain — word-count quality gate, PII masking,
      // persistent first-occurrence dedup, boundary-tokened byte-BPE
      // encode, incremental fixed-length cut — composed PER BATCH over
      // three deterministic batches (doc_id % 3, in order) of a
      // duplicate-injected corpus. The sequence store must then hold
      // exactly what the one-shot composition over the concatenated
      // curated stream emits; the oracle replays every stage (filter
      // bounds, redaction regexes, first-occurrence rule, fixture
      // token counts, HUGEINT xxhash64 shards, batch-prefixed cut)
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_curfeed_${System.nanoTime()}"
      val d = t(s, dir, "documents").select("doc_id", "text")
      val all = d
        .unionByName(d.filter(col("doc_id") < 25).select(
          (col("doc_id") + 500000).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") < 10).select(
          (col("doc_id") + 900000).as("doc_id"), col("text")))
      for (b <- 0L to 2L)
        graft.ops.CuratedFeed.curatedAppend(
          all.filter(pmod(col("doc_id"), lit(3L)) === b), b, stateDir,
          merges, seqLen = 2048, nShards = 8,
          minWords = 20, maxWords = 80)
      graft.ops.CuratedFeed.sequences(s, stateDir)
        .select(col("shard"), col("seq_id"), col("n_tokens"),
          col("n_docs"), col("first_doc"), col("last_doc"))
        .orderBy("shard", "seq_id")
    }),
    "t_sequences_shuffled" -> ((s, dir) => {
      // GLOBAL SAMPLE SHUFFLE — the step after the cut a loader wants:
      // fixed sequences sit in stream order (consecutive rows are
      // consecutive documents), so each sequence reassigns to one of 16
      // output shards by hashing its identity (shard * 2^40 + seq_id,
      // injective) and takes its within-shard position from the same
      // hash. Deterministic permutation, one exchange; the oracle
      // replays the identity hash and the rank
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      val cut = graft.ops.Chunking.fixedSequences(enc, "shard", "h",
        "doc_id", "token_ids", 2048)
      graft.ops.Chunking.shuffleSequences(cut, "shard", "seq_id", 16)
        .select(col("shard"), col("seq_id"), col("out_shard"), col("pos"))
        .orderBy("shard", "seq_id")
    }),
    "t_epoch_order" -> ((s, dir) => {
      // PER-EPOCH SAMPLE ORDER — training consumes the corpus once per
      // epoch in a fresh global permutation: shuffleSequences(seed =
      // epoch) shifts the hashed identity by epoch * phi64 (a bijection
      // per epoch; the avalanche decorrelates orders across epochs)
      // before the same one-exchange hash/rank. The oracle replays the
      // shifted key in HUGEINT mod-2^64 arithmetic through the xxhash64
      // CTE chain and ranks within shards
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      val cut = graft.ops.Chunking.fixedSequences(enc, "shard", "h",
        "doc_id", "token_ids", 2048)
      graft.ops.Chunking.shuffleSequences(cut, "shard", "seq_id", 16,
          seed = 7L)
        .select(col("shard"), col("seq_id"), col("out_shard"), col("pos"))
        .orderBy("shard", "seq_id")
    }),
    "t_epoch_resume" -> ((s, dir) => {
      // RESUMABLE EPOCH CURSOR — a loader that died mid-epoch restarts
      // from its (out_shard, pos) cursor: epochResume keeps the rows at
      // or after the cursor in consumption order, a pure filter over
      // the ranked epoch (partition-pruning under an out_shard
      // partitioned store). Output ordered as the loader consumes it
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      val cut = graft.ops.Chunking.fixedSequences(enc, "shard", "h",
        "doc_id", "token_ids", 2048)
      val epoch = graft.ops.Chunking.shuffleSequences(cut, "shard",
        "seq_id", 16, seed = 7L)
      graft.ops.Chunking.epochResume(epoch, fromShard = 5L, fromPos = 3L)
        .select(col("out_shard"), col("pos"), col("shard"), col("seq_id"))
        .orderBy("out_shard", "pos")
    }),
    "t_epoch_mixture" -> ((s, dir) => {
      // WEIGHTED EPOCH — per-domain repeat rates over the sequence
      // store (the GPT-3 mixture practice: scarce domains repeat,
      // rate > 1; the bulk downsamples, rate < 1): epochRates turns
      // target shares + an epoch size into rates, epochMixture emits
      // floor(rate) copies per sequence plus a seeded q20-grid
      // fractional extra, every copy taking its own (out_shard, pos)
      // from the copy-packed identity hash. The oracle replays rates in
      // the same double arithmetic, the Bernoulli and position hashes
      // through two prefixed xxhash64 chains, and the per-row
      // generate_series repeat
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("token_ids"))
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      val cut = graft.ops.Chunking.fixedSequences(enc, "shard", "h",
        "doc_id", "token_ids", 2048)
      val seqs = cut.withColumn("domain",
        concat(lit("d"), pmod(col("first_doc"), lit(3L)).cast("string")))
      val rates = graft.ops.Chunking.epochRates(seqs, "domain",
        Seq("d0" -> 0.5, "d1" -> 0.3, "d2" -> 0.2),
        epochSequences = seqs.count())
      graft.ops.Chunking.epochMixture(seqs, "domain", "shard", "seq_id",
          rates, nOut = 16, seed = 3L)
        .select(col("shard"), col("seq_id"), col("copy"), col("domain"),
          col("out_shard"), col("pos"))
        .orderBy("out_shard", "pos")
    }),
    "t_export_packed_eot" -> ((s, dir) => {
      // the packed pretraining export WITH boundary tokens: every
      // document's stream ends in <|endoftext|> and the packer counts
      // it — the form a real training loader consumes (it needs the
      // boundary to reset context). Same two-shuffle plan as
      // t_export_packed; n_tokens is simply one larger per document
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges,
          specials = Seq("<|endoftext|>"), boundary = Some("<|endoftext|>"))
        .select(col("id").as("doc_id"), col("n_tokens"))
      val sharded = enc
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      // (h, doc_id) order: the id tiebreak keeps a 64-bit hash collision
      // (near-certain at 10^10 docs) deterministic, and carrying the id
      // through the pack window removes the join back entirely
      graft.ops.Chunking.packBins(sharded, "shard", Seq("h", "doc_id"),
          "n_tokens", 2048L)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("bin_id"), col("bin_offset_tokens"))
        .orderBy("doc_id")
    }),
    "t_export_packed" -> ((s, dir) => {
      // the END-TO-END pretraining export, composed from this round's
      // pieces: byte-level BPE token counts (t_bpe_ids' encoder) →
      // deterministic hash shuffle into 8 shards (t_shards' assignment)
      // → greedy contiguous packing into 2048-token sequences within
      // each shard in hash (i.e. shuffled) order. One narrow encode
      // pass + one shard-keyed exchange + a per-shard window: the whole
      // export costs two shuffles at any corpus size. The oracle
      // replays every stage (reference fixture token counts, HUGEINT
      // xxhash64, window cumsum)
      val merges = graft.ops.Tokenize.loadMerges(s.read.parquet(
        s"$repoRoot/src/test/resources/bpe_bytes_merges.parquet"))
      val enc = graft.ops.Tokenize.bpeEncodeIds(t(s, dir, "documents"),
          "doc_id", "text", merges)
        .select(col("id").as("doc_id"), col("n_tokens"))
      val sharded = enc
        .withColumn("h", xxhash64(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      // (h, doc_id) order: the id tiebreak keeps a 64-bit hash collision
      // (near-certain at 10^10 docs) deterministic, and carrying the id
      // through the pack window removes the join back entirely
      graft.ops.Chunking.packBins(sharded, "shard", Seq("h", "doc_id"),
          "n_tokens", 2048L)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("bin_id"), col("bin_offset_tokens"))
        .orderBy("doc_id")
    }),
    "t_quantiles" -> ((s, dir) => {
      // HDR-style quantile sketch (ops/Quantile.scala): exact bit-math
      // buckets (no libm), distributive groupBy sketch, integer rank
      // selection — every value replays exactly in DuckDB. m=7 -> the
      // reported bound is within 2^-7 (0.8%) of the true quantile
      val cents = t(s, dir, "events")
        .select(col("event_type"), expr("CAST(ROUND(value*100) AS BIGINT)").as("cents"))
      val sk = graft.ops.Quantile.sketch(cents, Seq("event_type"), "cents", m = 7)
      graft.ops.Quantile.quantiles(sk, Seq("event_type"),
          Seq("p50" -> 500000L, "p90" -> 900000L, "p99" -> 990000L,
            "p999" -> 999000L), m = 7)
        .select(col("event_type"), col("q_label"), col("rank"),
          col("bucket"), col("q_value"))
        .orderBy("event_type", "q_label")
    }),
    "t_rownum" -> ((s, dir) => {
      // gap-free global row numbers with NO single-partition stage (plan
      // pinned): range partition + monotonic id + broadcast prefix offsets
      graft.ops.Indexing.globalRowNumber(
          t(s, dir, "documents").select("doc_id", "source"), Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "t_repetition" -> ((s, dir) => {
      // Gopher-style repetition signals, word-n-gram adapted; all-integer
      // ppm arithmetic so DuckDB replays every value exactly. Every 11th
      // doc gets a deterministic repeated phrase appended so the dup-5/8/
      // 10-gram detectors have real positives in this synthetic corpus
      val d = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 11 === 0,
          concat(col("text"), expr("repeat(' badger mushroom snake', 8)")))
          .otherwise(col("text")))
      TextAnalysis.repetition(d, textCol = "text2").orderBy("doc_id")
    }),
    "t_keyterms" -> ((s, dir) => {
      // BM25 top-3 terms per doc with a rational (log-free) idf: pure
      // IEEE +,-,*,/ replays bit-for-bit in any engine; term dictionary
      // broadcast, both windows share the doc_id partitioning
      TextAnalysis.bm25KeyTerms(t(s, dir, "documents"), topK = 3)
        .orderBy("doc_id", "rank")
    }),
    "t_audio_features" -> ((s, dir) => {
      // REAL audio pipeline: deterministic unsigned-8-bit PCM WAV per
      // document -> javax.sound.sampled decode -> true RMS + zero
      // crossings. The oracle recomputes both from the text's char codes
      // (the closed form of the generated samples; WAV PCM is lossless)
      val media = Multimodal.asMediaAudio(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractAudioFeatures(media).toDF()
        .select(col("media_id"), col("n_samples"),
          floor(col("rms") * 1000000 + lit(0.5)).cast("long").as("rms_ppm"),
          col("zero_crossings"))
        .orderBy("media_id")
    }),
    "t_audio_frames" -> ((s, dir) => {
      // windowed audio analysis over REAL decoded PCM: 64-sample frames
      // (4 per 256-sample doc), per-frame RMS + zero crossings
      val media = Multimodal.asMediaAudio(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.audioFrames(media, frameSize = 64, hop = 64).toDF()
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_samples").cast("long").as("n_samples"),
          floor(col("rms") * 1000000 + lit(0.5)).cast("long").as("rms_ppm"),
          col("zero_crossings"))
        .orderBy("media_id", "frame_idx")
    }),
    "t_frame_sample" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "video")
      Multimodal.sampleFrames(media).toDF()
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
          sum(col("frame_checksum")).as("checksum_sum"))
        .orderBy("media_id")
    }),
    "q_funnel" -> ((s, dir) => {
      // ordered conversion funnel view -> click -> purchase: a user
      // reaches a stage only via an event STRICTLY AFTER their entry to
      // the previous stage (first-touch semantics). Three keyed min-ts
      // aggregates chained by equi-joins on user_id — each stage's frame
      // is user-cardinality, so the joins broadcast at any corpus size
      val e = t(s, dir, "events").select("user_id", "event_type", "ts")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      def stage(df: DataFrame, ord: Long, name: String) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(ord).as("stage"), lit(name).as("step"), col("users"))
      stage(v, 1, "view").union(stage(c, 2, "click"))
        .union(stage(p, 3, "purchase")).orderBy("stage")
    }),
    "q_retention" -> ((s, dir) => {
      // weekly cohort retention: cohort = Monday of the user's first
      // event week; one row per (cohort, week offset) with distinct
      // active users. first-touch frame is user-cardinality; offsets are
      // exact integer day-diffs div 7 (week-truncated dates differ by
      // multiples of 7)
      val e = t(s, dir, "events").select("user_id", "ts")
      val first = e.groupBy("user_id").agg(min("ts").as("first_ts"))
      e.join(first, "user_id")
        .select(col("user_id"),
          // dates travel as strings (the v_diff_date convention: parquet
          // DATE and DuckDB DATE reach pandas as different dtypes)
          date_format(date_trunc("week", col("first_ts")), "yyyy-MM-dd").as("cohort"),
          expr("datediff(CAST(date_trunc('week', ts) AS DATE), " +
            "CAST(date_trunc('week', first_ts) AS DATE)) div 7")
            .cast("long").as("week_offset"))
        .distinct()
        .groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort", "week_offset")
    }),
    "q_scd_intervals" -> ((s, dir) => {
      // event-sourced state intervals (SCD-2 construction): collapse each
      // user's consecutive runs of the same event_type into validity
      // intervals [from, to) — gaps-and-islands with a lead() for the
      // exclusive upper bound (NULL = current). Total order (ts,
      // event_id) makes runs deterministic under any partitioning
      val e = t(s, dir, "events").select("user_id", "event_id", "event_type", "ts")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val seg = e
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("seg", sum("chg").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = seg.groupBy("user_id", "seg")
        .agg(min(col("event_type")).as("state"),
          min(unix_micros(col("ts"))).as("from_us"),
          count(lit(1)).as("n_events"))
      iv.withColumn("to_us", lead(col("from_us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("seg")))
        .select("user_id", "seg", "state", "from_us", "to_us", "n_events")
        .orderBy("user_id", "seg")
    }),
    "t_zorder" -> ((s, dir) => {
      // Morton (Z-order) clustering vs a single-key layout, judged by the
      // zone maps a scan planner would skip files with: bucket lineitem
      // 64 ways by (a) top-6 bits of interleave(l_partkey, l_suppkey) and
      // (b) l_orderkey hash (what a default shuffle gives), then emit
      // per-bucket min/max of BOTH keys. Under (a) both spans narrow to
      // ~1/8 of their domains; under (b) every bucket spans everything —
      // the whole case for ZORDER at 100 TB, in one query
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey").as("x"), col("l_suppkey").as("y"))
      // interleave width sized FROM THE KEY DOMAIN (bit length of the
      // max key, one driver-side agg) — a hard-coded bits=15 would
      // raise_error past sf ~0.17 when l_partkey outgrows 15 bits; the
      // oracle derives the identical width via length(bin(max)) and a
      // static 31-bit unroll (wider interleaves only prepend zero terms)
      val z = graft.ops.Layout.zBucketAdaptive(li, col("x"), col("y"),
        log2Buckets = 6)
      val zm = graft.ops.Layout.zoneMaps(z, "zbucket", col("x"), col("y"))
        .withColumn("layout", lit("zorder"))
      val h = li.withColumn("hbucket", pmod(col("l_orderkey"), lit(64L)))
      val hm = graft.ops.Layout.zoneMaps(h, "hbucket", col("x"), col("y"))
        .withColumn("layout", lit("hash"))
      zm.unionByName(hm)
        .select("layout", "bucket", "cnt", "min_x", "max_x", "min_y", "max_y")
        .orderBy("layout", "bucket")
    }),
    "t_triangles" -> ((s, dir) => {
      // per-node triangle counts over the part co-occurrence graph (parts
      // bought together in an order; every 4th part key to keep the demo
      // graph sparse), by degree-ordered orientation — top 50 hubs
      val li = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      // integer part keys through the wedge joins, "p<id>" decode at the
      // output (the t_pagerank discipline: graph iterations on integer
      // keys, the public string ids only on the final 50 rows)
      val pairs = li.as("a").join(li.as("b"), "o")
        .filter(col("a.p") < col("b.p"))
        .select(col("a.p").cast("long").as("pa"),
          col("b.p").cast("long").as("pb"))
      graft.ops.Graph.triangleCounts(pairs, "pa", "pb")
        .select(concat(lit("p"), col("node")).as("node"), col("triangles"))
        .orderBy(col("triangles").desc, col("node")).limit(50)
    }),
    "t_setsim_join" -> ((s, dir) => {
      // EXACT Jaccard >= 2/5 similarity join on 3-gram shingle sets via
      // prefix filtering (rarest-first global shingle order; only prefix
      // shingles generate candidates) — lossless, so the oracle is the
      // brute-force all-pairs answer; overlap/union sizes are exact
      // integers. Shingles, not raw tokens: the word-soup corpus's token
      // SETS are near-identical across documents (measured: >79k of
      // 135k pairs clear 0.6 on tokens — quadratic output), while 3-gram
      // sets isolate the 20 injected near-dup pairs + true repeats
      graft.ops.SetSim.jaccardJoin(docsWithNearDups(s, dir),
          "doc_id", "text", tn = 2, td = 5, shingleW = 3)
        .orderBy("id_a", "id_b")
    }),
    "t_hll_group" -> ((s, dir) => {
      // per-language approximate distinct-token counts: one 2^8-register
      // HLL per language in a single keyed aggregate, estimates evaluated
      // DISTRIBUTED in DECIMAL(38,0) (no driver collect — groups may be
      // corpus-cardinality); exact counts alongside to show the error
      val toks = t(s, dir, "documents").select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val sk = graft.ops.Frequency.hllSketchGrouped(toks, "tok", "lang", p = 8)
      val est = graft.ops.Frequency.hllEstimateGrouped(sk, "lang", p = 8)
      val exact = toks.groupBy("lang")
        .agg(count_distinct(col("tok")).as("n_exact"))
      est.join(exact, "lang")
        .select("lang", "n_used", "n_est", "n_exact").orderBy("lang")
    }),
    "t_allocate" -> ((s, dir) => {
      // largest-remainder apportionment of a 997-example budget across
      // event types, proportional to row counts — exact integer quota
      // sampling; allocations sum to the budget by construction
      graft.ops.Sampling.largestRemainderAllocate(
          t(s, dir, "events"), "event_type", budget = 997L)
        .orderBy("event_type")
    }),
    "t_weighted_sample" -> ((s, dir) => {
      // systematic PPS sampling: draw exactly 500 examples proportional
      // to document length (n_chars) — a regular grid over the id-ordered
      // cumulative-weight line, multiplicity for heavyweight rows; pure
      // integer ceiling division (DECIMAL(38,0)), no RNG, no doubles
      graft.ops.Sampling.systematicSample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 500L)
        .select(col("doc_id"), col("n_chars"), col("cum_lo"), col("cum_hi"),
          col("picks"))
        .orderBy("doc_id")
    }),
    "q_cdc_merge" -> ((s, dir) => {
      // lakehouse MERGE: apply an upsert/delete change stream to a base
      // snapshot, latest change per key wins. Base = customer balances;
      // stream = orders as balance updates keyed by customer (finalized
      // orders delete the key), sequenced by (order date, order key) —
      // one window over base ∪ changes, no join, one keyed exchange
      val base = t(s, dir, "customer").select(
        col("c_custkey").as("cust"),
        expr("CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)").as("bal_cents"),
        col("c_mktsegment").as("seg"))
      val changes = t(s, dir, "orders").select(
        col("o_custkey").as("cust"),
        (expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
          .cast("long") * lit(10000000000L) + col("o_orderkey")).as("seq"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
        expr("CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)").as("bal_cents"),
        col("o_orderpriority").as("seg"))
      graft.ops.ChangeData.cdcMerge(base, changes, Seq("cust"), "seq", "op")
        .orderBy("cust")
    }),
    "t_pmi" -> ((s, dir) => {
      // collocation mining by association lift (the log-free monotone
      // form of PMI): top 50 adjacent-token pairs by c(xy)*N/(c(x)*c(y)),
      // exact DECIMAL(38,0) integer arithmetic, min count 5
      graft.ops.TextAnalysis.collocations(
        t(s, dir, "documents"), minCount = 5, topK = 50)
    }),
    "t_edit_join" -> ((s, dir) => {
      // typo-tolerant entity matching: all part-name pairs within
      // Levenshtein distance 2 by the lossless PASS-JOIN segment filter
      // (candidates via d+1-segment pigeonhole equi-join; membership
      // decided by exact integer edit distance). Every-10th-part subset
      // keeps the brute-force oracle tractable at sf0.1
      val parts = t(s, dir, "part").filter(col("p_partkey") % 10 === 0)
      graft.ops.EditJoin.editJoin(parts, "p_partkey", "p_name", d = 2)
        .orderBy("id_a", "id_b")
    }),
    "t_rand_proj" -> ((s, dir) => {
      // Johnson-Lindenstrauss compression: 64-dim float embeddings ->
      // 16 BIGINT coordinates via a deterministic +-1 matrix over
      // q24-quantized components — the compress-before-index step;
      // pure projection, zero shuffles, both engines inline the same
      // splitmix64-derived sign constants
      graft.ops.Similarity.randomProjection(
          t(s, dir, "embeddings"), dim = 64, outDim = 16)
        .orderBy("vec_id")
    }),
    "t_index_search" -> ((s, dir) => {
      // ranked retrieval from the stored inverted index: whole-bit
      // TF-IDF (bitlen(N div df) * bitlen(tf), integer end-to-end),
      // only the query terms' posting blocks are scanned
      val docs = t(s, dir, "documents")
      val idx = graft.ops.Indexing.invertedIndex(docs, "doc_id", "text")
      graft.ops.Indexing.searchIndex(idx, nDocs = docs.count(),
        terms = Seq("scan", "merge", "window"), k = 20)
    }),
    "t_index_search_stored" -> ((s, dir) => {
      // the SAME retrieval answered from the PERSISTED term-bucketed
      // index (indexWrite + searchIndexStored): the search plan scans
      // hash(term)-pruned buckets of the stored posting table — never
      // the documents corpus (pinned in PlanGuardSpec) — and byte-
      // identical output means the same oracle as t_index_search
      val docs = t(s, dir, "documents")
      val idx = s"text_verify_idx_${dirTag(dir)}"
      graft.ops.Indexing.indexWrite(docs, idx)
      graft.ops.Indexing.searchIndexStored(s, idx,
        terms = Seq("scan", "merge", "window"), k = 20)
    }),
    "t_index_search_incremental" -> ((s, dir) => {
      // CHURN-PRICED stored text index (Indexing.indexIncremental):
      // the posting store lives as per-document-bucket (term, doc, tf)
      // partials + per-bucket doc-count sentinels; a churned corpus
      // re-tokenizes only its dirty buckets (t_index_search_stored's
      // stamp-guarded artifact would rebuild wholesale). Seeded from a
      // restated prior corpus, maintained to the CURRENT one, then the
      // same whole-bit TF-IDF retrieval answers from the store alone —
      // df and nDocs derive store-sized at read. Identical output to
      // t_index_search means the same oracle
      val docs = t(s, dir, "documents")
      val stateDir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_incidx_${dirTag(dir)}"
      val restated = col("doc_id") < 30
      val prior = docs
        .withColumn("text", when(restated,
          concat(coalesce(col("text"), lit("")), lit(" restated prior")))
          .otherwise(col("text")))
        .filter(!(restated && col("doc_id") % 3 === 0))
      graft.ops.Indexing.indexIncremental(prior, stateDir, nBuckets = 256)
      graft.ops.Indexing.indexIncremental(docs, stateDir, nBuckets = 256)
      graft.ops.Indexing.searchIndexIncremental(s, stateDir,
        terms = Seq("scan", "merge", "window"), k = 20)
    }),
    "t_kcore" -> ((s, dir) => {
      // 2-core of the repeat-co-purchase graph (parts co-occurring in
      // >= 2 distinct orders): iterated degree peeling with a FIXED 12
      // peels on both engines, so the output is a pure function of the
      // graph even where the peel hasn't hit its fixpoint. k = 2 keeps
      // the core non-degenerate at every SF (the graph SPARSIFIES as SF
      // grows: more orders, same per-order part fan-out — at sf0.1 the
      // 3-core is empty while the 2-core converges to a 3-node frontier)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"), "o")
        .filter(col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2)
        .select(col("pa").cast("long").as("pa"),
          col("pb").cast("long").as("pb"))
      // integer part keys through the 12 peel rounds, "p<id>" decode at
      // the output (the t_pagerank discipline)
      graft.ops.Graph.kCore(pairs, "pa", "pb", k = 2, rounds = 12)
        .select(concat(lit("p"), col("node")).as("node"), col("deg"))
        .orderBy("node")
    }),
    "t_heavy_hitters" -> ((s, dir) => {
      // exact heavy hitters (bigrams covering >= 1/800 of the stream)
      // via per-partition Misra-Gries candidate nomination + exact
      // verification — no distinct-key-sized shuffle; the oracle is the
      // plain exact answer because the candidate set is a proven superset
      val bg = t(s, dir, "documents")
        .select(split(trim(col("text")), "\\s+").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts)-2), i -> concat(ts[i], ' ', ts[i+1]))"))
          .as("k"))
      graft.ops.Frequency.heavyHitters(bg, "k", divisor = 800L)
        .orderBy("key")
    }),
    "q_skyline" -> ((s, dir) => {
      // price-recency Pareto frontier of orders: no other order is both
      // pricier and more recent (ties survive only as exact duplicates).
      // Local skyline per partition (lossless by dominance transitivity)
      // + one final sweep over candidates — integer comparisons only
      val o = t(s, dir, "orders").select(col("o_orderkey").as("id"),
        expr("CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)").as("cents"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)")
          .as("dday"))
      graft.ops.Skyline.skyline2D(o, "id", "cents", "dday").orderBy("id")
    }),
    "q_skyline_3d" -> ((s, dir) => {
      // d-dimensional frontier (SFS sweeps): the "best customers" Pareto
      // set over (order count, lifetime spend in cents, recency) — no
      // other customer is >= on all three and > on one. Spend sums the
      // per-order floor'd cents (one IEEE multiply+add+floor per order,
      // then exact integer sums — no fold)
      val c = t(s, dir, "orders").groupBy(col("o_custkey").as("id"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)"))
            .as("cents"),
          max(expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)"))
            .as("last_day"))
      graft.ops.Skyline.skylineND(c, "id",
        Seq("n_orders", "cents", "last_day")).orderBy("id")
    }),
    "q_skyline_4d" -> ((s, dir) => {
      // the 4-D frontier: q_skyline_3d's criteria plus customer TENURE
      // (earliest first order, maximized as the negated first-order
      // day) — exercises the general d-dimensional sweep and the
      // declarative NOT EXISTS oracle at full dimensionality, where
      // frontiers grow and the fan-in-bounded candidate reduction earns
      // its keep
      val day = "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)"
      val c = t(s, dir, "orders").groupBy(col("o_custkey").as("id"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)"))
            .as("cents"),
          max(expr(day)).as("last_day"),
          (-min(expr(day))).as("neg_first_day"))
      graft.ops.Skyline.skylineND(c, "id",
        Seq("n_orders", "cents", "last_day", "neg_first_day")).orderBy("id")
    }),
    "t_ann_rp" -> ((s, dir) => {
      // two-stage JL retrieval: 100-candidate shortlist in the 16-long
      // projected space (randomProjection's compressed artifact), exact
      // integer squared-L2 top-5 over the shortlist only — the
      // codebook-free compress-then-search twin of t_ann_pq_rerank
      val e = t(s, dir, "embeddings")
      graft.ops.Similarity.rpTopK(e, e.filter(col("vec_id") < 10), k = 5,
          dim = 64, outDim = 16, shortlist = 100)
        .orderBy("query_id", "rank")
    }),
    "s_cdc_merge" -> ((s, dir) => {
      // continuously-maintained CDC snapshot: base customers + order
      // change stream as two file streams, per-key latest-wins winner as
      // a running max_by — state is one row per live key forever;
      // complete-mode output equals the batch q_cdc_merge (the oracle
      // replays the identical SQL)
      val baseS = StreamingOps.readEvents(s, s"$dir/customer.parquet")
        .select(col("c_custkey").as("cust"),
          lit(Long.MinValue).as("seq"), lit("I").as("op"),
          expr("CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)").as("bal_cents"),
          col("c_mktsegment").as("seg"))
      val chS = StreamingOps.readEvents(s, s"$dir/orders.parquet")
        .select(col("o_custkey").as("cust"),
          (expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
            .cast("long") * lit(10000000000L) + col("o_orderkey")).as("seq"),
          when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
          expr("CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)").as("bal_cents"),
          col("o_orderpriority").as("seg"))
      val merged = StreamingOps.streamingCdcMerge(
        baseS.unionByName(chS), Seq("cust"), "seq", "op")
      StreamingOps.withShufflePartitions(s, 8) {
        StreamingOps.runToMemory(merged, s"scdc_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .orderBy("cust")
    })
  )

  // ===== HUGEINT-replay builders for the LSH-family oracles ================
  //
  // The minhash / simhash / ngram / connected-components / frame-sample
  // oracles below replay the engine's 64-bit hash pipelines in DuckDB
  // int128 ("HUGEINT") arithmetic mod 2^64 — the technique the
  // t_fingerprint oracle established. One caveat int128 adds: a product of
  // two ~2^64 factors overflows int128, so the splitmix finalizer
  // multiplications are decomposed into 32-bit halves (every intermediate
  // stays < 2^65); the FNV prime (~2^40) is safe to multiply directly.
  private val P64 = "CAST(18446744073709551616 AS HUGEINT)" // 2^64
  private val P63 = "CAST(9223372036854775808 AS HUGEINT)"  // 2^63
  private val LMAX = "CAST(9223372036854775807 AS HUGEINT)" // Long.MaxValue
  private val FNV_OFF = "CAST(14695981039346656037 AS HUGEINT)" // 0xcbf29ce484222325
  private val WS = "\\s+"

  /** FNV-1a over the characters of a string expression, unsigned mod 2^64
    * — replays Dedup.fnv1a (`unicode(c) == charAt` for the ASCII corpus). */
  private def fnvSql(expr: String): String =
    s"list_reduce(list_prepend($FNV_OFF, " +
      s"list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS HUGEINT))), " +
      s"(acc, c) -> (xor(acc, c) * 1099511628211) % $P64)"

  /** (x * const) mod 2^64 via 32-bit halves of the constant. */
  private def mulModSql(x: String, hi: Long, lo: Long): String =
    s"((((($x) % 4294967296) * $hi + (($x) // 4294967296) * $lo) % 4294967296)" +
      s" * 4294967296 + (($x) % 4294967296) * $lo) % " + P64

  /** Signed-64 view of an unsigned HUGEINT value (two's complement). */
  private def signedSql(u: String): String =
    s"CAST(CASE WHEN ($u) >= $P63 THEN ($u) - $P64 ELSE ($u) END AS BIGINT)"

  /** HLL register/rank replay at p = 8: fnv1a + the splitmix64 FINALIZER
    * (Dedup.permute with the golden-ratio key, b = 0 — Frequency
    * .hllSketch's finalized 63-bit hash; raw fnv1a's high bits are too
    * non-uniform for rho, see the hllSketch scaladoc). Emits a CTE chain
    * `fh/ht2/ht3/hrr`; `hrr` has (carry..., register, rho). `carry` is a
    * comma-SUFFIXED projection threaded through every stage ("" or e.g.
    * "lang, "). */
  private def hllRegCtes(carry: String, keyExpr: String, from: String): String =
    s"""fh AS (
       |  SELECT ${carry}xor(${fnvSql(keyExpr)},
       |    CAST(11400714819323198485 AS HUGEINT)) AS t1
       |  FROM $from
       |), ht2 AS (
       |  SELECT ${carry}${mulModSql("xor(t1, t1 // 1073741824)", 3210233709L, 484763065L)} AS t2 FROM fh
       |), ht3 AS (
       |  SELECT ${carry}${mulModSql("xor(t2, t2 // 134217728)", 2496678331L, 321982955L)} AS t3 FROM ht2
       |), hrr AS (
       |  SELECT ${carry}CAST(hp % 256 AS BIGINT) AS register,
       |    CAST(55 - (CASE WHEN hp // 256 = 0 THEN 0
       |      ELSE length(bin(hp // 256)) END) + 1 AS BIGINT) AS rho
       |  FROM (SELECT ${carry}xor(t3, t3 // 2147483648) % $P63 AS hp FROM ht3) q
       |)""".stripMargin

  /** The 64 deterministic (a, b) permutation parameters — the same
    * splitmix-derived constants as Dedup.mixParams / MinHashAgg. */
  private lazy val paramsValues: String =
    (0 until 64).map { i =>
      val (a, b) = Dedup.mixParams(i)
      s"($i, CAST($a AS HUGEINT), CAST($b AS HUGEINT))"
    }.mkString(",\n    ")

  /** The docsWithNearDups corpus, replayed: originals plus perturbed
    * copies of doc_id < 20 (every 7th word dropped, id + 100000).
    * DuckDB list lambdas index 1-based where Spark's filter is 0-based. */
  private val corpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |    array_to_string(list_filter(string_split(text, ' '), (w, i) -> (i-1) % 7 <> 3), ' ') AS text
      |  FROM documents WHERE doc_id < 20
      |)""".stripMargin

  /** Shingle -> FNV hash -> splitmix permutation pipeline keyed by `key`:
    * CTEs norm/tok/shingle_str/shingle/params/perm, replaying
    * Dedup.shingleHashes (word 3-grams of normalized text, each shingle
    * with a trailing space; <3 tokens degenerates to the whole text) and
    * Dedup.permute ((x^a)+b then the splitmix64 finalizer, & Long.Max). */
  private def shinglePermCtes(key: String, from: String): String =
    s"""norm AS (
       |  SELECT $key, TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')) AS s FROM $from
       |), tok AS (
       |  SELECT $key, s, string_split(s, ' ') AS toks FROM norm
       |), shingle_str AS (
       |  SELECT $key, unnest(CASE
       |    WHEN s = '' THEN CAST([] AS VARCHAR[])
       |    WHEN len(toks) < 3 THEN [s]
       |    ELSE [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' FOR i IN range(1, len(toks) - 1)]
       |  END) AS sh FROM tok
       |), shingle AS (
       |  SELECT $key, ${fnvSql("sh")} AS h FROM shingle_str
       |), params(i, a, b) AS (VALUES
       |    $paramsValues
       |), perm AS (
       |  SELECT $key, i, xor(t3, t3 // 2147483648) % $P63 AS p
       |  FROM (SELECT $key, i, ${mulModSql("xor(t2, t2 // 134217728)", 2496678331L, 321982955L)} AS t3
       |    FROM (SELECT $key, i, ${mulModSql("xor(t1, t1 // 1073741824)", 3210233709L, 484763065L)} AS t2
       |      FROM (SELECT s.$key, p.i, (xor(s.h, p.a) + p.b) % $P64 AS t1
       |            FROM shingle s CROSS JOIN params p) q1) q2) q3
       |)""".stripMargin

  /** The t_minhash_pairs oracle, shared by every surface that emits the
    * LSH candidate pair set with estimated jaccard >= 0.5 — the direct
    * batch chain and both stored-signature lifecycles. */
  private lazy val minhashPairsSql: String =
    s"""WITH $minhashCtes
       |SELECT id_a, id_b, est_jaccard FROM (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_filter(range(1, 65), i -> sa.arr[CAST(i AS INTEGER)] = sb.arr[CAST(i AS INTEGER)])) AS DOUBLE) / 64 AS est_jaccard
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b) j
       |WHERE est_jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** Full minhash LSH replay up to candidate pairs: signatures (empty docs
    * get all-Long.Max), 16 bands x 4 rows FNV band hashes over the 8
    * little-endian bytes of each component, size-capped buckets with the
    * star fallback (Dedup.minhashCandidates). */
  private lazy val minhashCtes: String =
    s"""$corpusCte, ${shinglePermCtes("doc_id", "corpus")}, sigc AS (
       |  SELECT doc_id, i, MIN(p) AS c FROM perm GROUP BY doc_id, i
       |), sig AS (
       |  SELECT n.doc_id, list(coalesce(sc.c, $LMAX) ORDER BY p.i) AS arr
       |  FROM norm n CROSS JOIN params p
       |  LEFT JOIN sigc sc ON sc.doc_id = n.doc_id AND sc.i = p.i
       |  GROUP BY n.doc_id
       |), band AS (
       |  SELECT doc_id, b,
       |    list_reduce(list_prepend(xor($FNV_OFF, CAST(b AS HUGEINT)),
       |      flatten([[ (arr[CAST(4*b + j + 1 AS INTEGER)] // (CAST(1 AS HUGEINT) << CAST(8*k AS INTEGER))) % 256
       |                 FOR k IN range(0, 8)] FOR j IN range(0, 4)])),
       |      (acc, v) -> (xor(acc, CAST(v AS HUGEINT)) * 1099511628211) % $P64) AS bh
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bs
       |), bucketed AS (
       |  SELECT b, bh, doc_id AS id,
       |    COUNT(*) OVER (PARTITION BY b, bh) AS bsz,
       |    MIN(doc_id) OVER (PARTITION BY b, bh) AS bmin
       |  FROM band
       |), cand AS (
       |  SELECT x.id AS id_a, y.id AS id_b
       |  FROM bucketed x JOIN bucketed y ON x.b = y.b AND x.bh = y.bh AND x.id < y.id
       |  WHERE x.bsz <= 64
       |  UNION
       |  SELECT bmin AS id_a, id AS id_b FROM bucketed WHERE bsz > 64 AND id <> bmin
       |)""".stripMargin

  /** Replays Similarity.planeSign for planes [0, nplanes) x dims [0, 64):
    * x0 = p*1000003 + d + 0x9e3779b97f4a7c15, splitmix finalizer, parity
    * of bit 0 -> +-1.0; collected into one ordered sign list per plane. */
  private def signsCtes(nplanes: Int): String =
    s"""signs AS (
       |  SELECT p, d,
       |    CASE WHEN xor(t3, t3 // 2147483648) % 2 = 0 THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(-1.0 AS DOUBLE) END AS sgn
       |  FROM (SELECT p, d, ${mulModSql("xor(t2, t2 // 134217728)", 2496678331L, 321982955L)} AS t3
       |    FROM (SELECT p, d, ${mulModSql("xor(t1, t1 // 1073741824)", 3210233709L, 484763065L)} AS t2
       |      FROM (SELECT p, d,
       |              (CAST(11400714819323198485 AS HUGEINT) + p*1000003 + d) % $P64 AS t1
       |            FROM (SELECT unnest(range(0, $nplanes)) AS p) ps
       |            CROSS JOIN (SELECT unnest(range(0, 64)) AS d) ds) q1) q2) q3
       |), signlists AS (
       |  SELECT p, list(sgn ORDER BY d) AS sl FROM signs GROUP BY p
       |)""".stripMargin

  /** Hyperplane dot replayed with Scala's exact accumulation order:
    * sequential double sum seeded at 0.0 (list_reduce is ordered; a SUM()
    * aggregate would not be). The +-1.0 products are exact sign flips. */
  private def sigDotSql(vec: String, sl: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST(($vec)[i] AS DOUBLE) * ($sl)[i] FOR i IN range(1, len($vec) + 1)]), " +
      "(acc, x) -> acc + x)"

  /** Per-component q24 quantization of an embedding list — the DuckDB
    * mirror of `graft.functions.q24Vec`: one IEEE multiply+add+floor per
    * element (no fold), bit-identical in any engine version. Entry point
    * of the integer distance discipline on the oracle side. */
  private def qvecSql(v: String): String =
    s"list_transform(CAST($v AS DOUBLE[]), x -> CAST(FLOOR(x * 16777216.0 + 0.5) AS BIGINT))"

  /** Exact integer squared-L2 between two BIGINT q24 lists — mirror of
    * `graft.functions.intSqDist`. Associative integer sums: no
    * accumulation-order or engine-version sensitivity exists. */
  private def isqSql(a: String, b: String): String =
    s"CAST(list_sum([(($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i])" +
      s" FOR i IN range(1, len($a) + 1)]) AS BIGINT)"

  /** Exact integer dot product of two BIGINT q24 lists — mirror of
    * `graft.functions.intDot`. */
  private def idotSql(a: String, b: String): String =
    s"CAST(list_sum([(($a)[i]) * (($b)[i])" +
      s" FOR i IN range(1, len($a) + 1)]) AS BIGINT)"

  /** HUGEINT mirror of `graft.functions.intCosRankKey` — the engine-exact
    * descending-cosine rank key (sign-aware floor(cos^2 * 10^12) of the
    * exact rational dot^2 / (na*nb), three base-10^4 long-division limbs,
    * every step exact integral arithmetic). Input: a CTE `$src` carrying
    * columns `dot`, `na`, `nb` (BIGINT intDot values) plus the carried
    * columns `$carry`; emits chained CTEs ending in `${p}key($carry,
    * cos_key)`. All division numerators are non-negative and d > 0, so
    * DuckDB `//` (floor) == Spark IntegralDivide (truncate) — exact
    * agreement by construction; zero vectors yield NULL (both engines
    * order DESC with NULLS LAST). Budget: n0 <= 2^108, *10^4 < 2^122,
    * inside HUGEINT. */
  private def cosKeyCtes(p: String, src: String, carry: String): String =
    s"""${p}k0 AS (
       |  SELECT $carry, dot,
       |    CAST(dot AS HUGEINT) * dot AS n0,
       |    NULLIF(CAST(na AS HUGEINT) * nb, 0) AS d
       |  FROM $src
       |), ${p}k1 AS (
       |  SELECT $carry, dot, d,
       |    (n0 * 10000) // d AS q1, (n0 * 10000) % d AS r1
       |  FROM ${p}k0
       |), ${p}k2 AS (
       |  SELECT $carry, dot, d, q1,
       |    (r1 * 10000) // d AS q2, (r1 * 10000) % d AS r2
       |  FROM ${p}k1
       |), ${p}key AS (
       |  SELECT $carry,
       |    CASE WHEN dot < 0
       |      THEN -((q1 * 10000 + q2) * 10000 + (r2 * 10000) // d)
       |      ELSE (q1 * 10000 + q2) * 10000 + (r2 * 10000) // d END AS cos_key
       |  FROM ${p}k2
       |)""".stripMargin

  /** Half-up integer mean of (ssum, n) on the q24 grid — mirror of
    * `Similarity.qMean`: subtracting the positive remainder makes the
    * numerator an exact multiple of 2n, so `//` is exact under any
    * integral-divide semantics. Emits a BIGINT expression over columns
    * named `ssum` and `n`. */
  private val qmeanSql: String =
    "CAST((2*ssum + n - ((2*ssum + n) % (2*n) + 2*n) % (2*n)) // (2*n) AS BIGINT)"

  /** Exact integer `cosine >= tn/td` test — mirror of
    * `graft.functions.intCosineGte`: for tn,td > 0, `dot/sqrt(na*nb) >=
    * tn/td <=> dot >= 0 AND dot^2*td^2 >= tn^2*na*nb`, cross-multiplied
    * in HUGEINT (q24 unit vectors keep every term under 2^117). */
  private def intCosGteSql(d: String, na: String, nb: String,
      tn: Int, td: Int): String =
    s"(($d) >= 0 AND ($na) > 0 AND ($nb) > 0" +
      s" AND CAST($d AS HUGEINT) * ($d) * ${td.toLong * td}" +
      s" >= ${tn.toLong * tn} * CAST($na AS HUGEINT) * ($nb))"

  /** The quantized one-iteration Lloyd fit as a WITH-body fragment:
    * `$qe(id, qv)` -> seeds (deterministic sample, LIMIT `$k`) -> integer
    * squared-L2 argmin assignment -> distributive integer component sums
    * -> half-up integer means. Emits CTEs `${p}seeds`, `${p}a1`,
    * `${p}c1`, `${p}s1`, and `${p}cents(cent_id, qc)` — the trained
    * centroids ON the q24 grid, no float anywhere. */
  private def qLloydCtes(p: String, qe: String, id: String, k: Int): String =
    s"""${p}seeds AS (
       |  SELECT $id AS cent_id, qv AS qc FROM $qe
       |  WHERE $id % 7 = 0 ORDER BY $id LIMIT $k
       |), ${p}a1 AS (
       |  SELECT e.$id AS vid, e.qv, s.cent_id, ${isqSql("e.qv", "s.qc")} AS d
       |  FROM $qe e CROSS JOIN ${p}seeds s
       |), ${p}c1 AS (
       |  SELECT cent_id, vid, qv FROM (
       |    SELECT cent_id, vid, qv,
       |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cent_id) AS r
       |    FROM ${p}a1) t WHERE r = 1
       |), ${p}s1 AS (
       |  SELECT cent_id, pos, CAST(SUM(val) AS BIGINT) AS ssum, COUNT(*) AS n
       |  FROM (SELECT cent_id, unnest(qv) AS val,
       |          generate_subscripts(qv, 1) - 1 AS pos FROM ${p}c1) u
       |  GROUP BY cent_id, pos
       |), ${p}cents AS (
       |  SELECT cent_id, list(qm ORDER BY pos) AS qc
       |  FROM (SELECT cent_id, pos, $qmeanSql AS qm FROM ${p}s1) q
       |  GROUP BY cent_id
       |)""".stripMargin

  /** The full trained-PQ-index replay as a WITH-body prefix — integer
    * end-to-end: per-subspace seed sample on q24-quantized subvectors,
    * one Lloyd refinement with exact-BIGINT squared-L2 assignment and
    * half-up integer codeword means, re-assignment (= the code table),
    * and the query LUT (queries = vec_id < 10). No double ever feeds an
    * argmin or a LUT cell, so the index replays bit-for-bit on ANY
    * engine version. Ends at CTEs `codes(corpus_id, sub, code)` and
    * `lut(query_id, sub, code, qd)`; callers append the search tail. */
  private def pqIndexCtes(m: Int, sd: Int, ksub: Int): String =
    s"""subs AS (
       |  SELECT unnest(generate_series(0, ${m - 1})) AS sub
       |), qemb AS (
       |  SELECT vec_id, ${qvecSql("embedding")} AS qv FROM embeddings
       |), csv AS (
       |  SELECT e.vec_id, s.sub,
       |    list_slice(e.qv, s.sub*$sd + 1, s.sub*$sd + $sd) AS qsv
       |  FROM qemb e CROSS JOIN subs s
       |), seeds AS (
       |  SELECT vec_id AS cent_id, qv FROM qemb
       |  WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT $ksub
       |), ssv AS (
       |  SELECT d.cent_id, s.sub,
       |    list_slice(d.qv, s.sub*$sd + 1, s.sub*$sd + $sd) AS qcsv
       |  FROM seeds d CROSS JOIN subs s
       |), a1 AS (
       |  SELECT c.vec_id, c.sub, c.qsv, v.cent_id,
       |    ${isqSql("c.qsv", "v.qcsv")} AS dd
       |  FROM csv c JOIN ssv v ON c.sub = v.sub
       |), b1 AS (
       |  SELECT sub, cent_id, qsv FROM (
       |    SELECT sub, cent_id, qsv,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dd, cent_id) AS r
       |    FROM a1) t WHERE r = 1
       |), st AS (
       |  SELECT sub, cent_id, pos, CAST(SUM(val) AS BIGINT) AS ssum, COUNT(*) AS n
       |  FROM (SELECT sub, cent_id, unnest(qsv) AS val,
       |          generate_subscripts(qsv, 1) - 1 AS pos FROM b1) u
       |  GROUP BY sub, cent_id, pos
       |), books AS (
       |  SELECT sub, cent_id, list(qm ORDER BY pos) AS qcsv
       |  FROM (SELECT sub, cent_id, pos, $qmeanSql AS qm FROM st) q
       |  GROUP BY sub, cent_id
       |), a2 AS (
       |  SELECT c.vec_id, c.sub, b.cent_id,
       |    ${isqSql("c.qsv", "b.qcsv")} AS dd
       |  FROM csv c JOIN books b ON c.sub = b.sub
       |), codes AS (
       |  SELECT vec_id AS corpus_id, sub, cent_id AS code FROM (
       |    SELECT vec_id, sub, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dd, cent_id) AS r
       |    FROM a2) t WHERE r = 1
       |), lut AS (
       |  SELECT c.vec_id AS query_id, c.sub, b.cent_id AS code,
       |    ${isqSql("c.qsv", "b.qcsv")} AS qd
       |  FROM csv c JOIN books b ON c.sub = b.sub
       |  WHERE c.vec_id < 10
       |)""".stripMargin

  /** The complete ADC search query over [[pqIndexCtes]] — shared by the
    * in-flight (`t_ann_pq`) and stored-index (`t_ann_pq_indexed`) rows,
    * which produce identical output by construction. The output `adist`
    * is cast to BIGINT: DuckDB types `SUM(BIGINT)` as HUGEINT and newer
    * engine versions changed how HUGEINT result columns materialize to
    * pandas, flipping a formatting-sensitive hash while values stay
    * integer-exact (adist < 2^57 by the q24 budget, so the cast is
    * lossless). Oracle OUTPUT projections must never leave HUGEINT /
    * DECIMAL columns — linted by `scripts/check_oracle.py`. */
  private def pqAdcQuerySql(m: Int, sd: Int, ksub: Int): String =
    s"""WITH ${pqIndexCtes(m, sd, ksub)}, ad AS (
       |  SELECT l.query_id, c.corpus_id, SUM(l.qd) AS adist
       |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
       |  WHERE c.corpus_id <> l.query_id
       |  GROUP BY l.query_id, c.corpus_id
       |), ranked AS (
       |  SELECT query_id, corpus_id, adist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist, corpus_id) AS BIGINT) AS rank
       |  FROM ad
       |)
       |SELECT query_id, corpus_id, CAST(adist AS BIGINT) AS adist, rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Whole-bit TF-IDF retrieval replay over the raw corpus — shared by
    * the in-flight (`t_index_search`) and stored-bucketed-index
    * (`t_index_search_stored`) rows, which produce identical output by
    * construction. */
  /** The packed-pretraining-export replay (fixture token counts →
    * HUGEINT xxhash64 shards → per-shard packing cumsum) — shared by
    * `t_export_packed` and the declarative `t_pipeline_packed`, which
    * must emit the identical frame by contract. */
  private def exportPackedSql: String =
    s"""WITH ${xxhash64Ctes("doc_id", "documents")},
       |pres AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
       |  FROM documents
       |), tok AS (
       |  SELECT d.doc_id, COALESCE(s.n_tokens, 0) AS n_tokens FROM
       |  documents d LEFT JOIN (
       |    SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
       |    FROM pres
       |    JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
       |      USING (pretoken)
       |    GROUP BY doc_id) s USING (doc_id)
       |), d AS (
       |  SELECT t.doc_id, x.h, ((x.h % 8) + 8) % 8 AS shard, t.n_tokens
       |  FROM tok t JOIN xxh x USING (doc_id)
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - n_tokens AS prev
       |  FROM d
       |)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       |  CAST(prev // 2048 AS BIGINT) AS bin_id,
       |  CAST(prev AS BIGINT) AS bin_offset_tokens
       |FROM c ORDER BY doc_id""".stripMargin

  /** Fixed-length sequence boundaries replayed from per-doc token
    * counts alone: doc spans [off, off+n) vs sequence spans
    * [k*2048, (k+1)*2048) — overlap join; stream order is (h, doc_id)
    * with off strictly increasing (every doc carries >= 1 token, the
    * boundary), so arg_min/arg_max on off are unambiguous. Shared by
    * `t_sequences` and the declarative `t_pipeline_sequences` (identical
    * frame by contract); `padded = true` is the pad-policy twin — every
    * emitted row reports 2048 tokens (trailing partials right-pad) plus
    * its pad count. */
  /** The WITH chain deriving each shard's sequence boundaries (CTE
    * `seqs`: one row per (shard, total, k)) — shared by
    * [[sequencesSql]], the shuffled-permutation replay and the
    * incremental-feed replay. `orderExtra` prepends columns to the
    * stream order (the feed concatenates batches in arrival order, so
    * its replay orders by the batch key first). */
  private def sequencesCtes(orderExtra: String = "",
      from: String = "documents"): String =
    s"""${xxhash64Ctes("doc_id", from)},
       |pres AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
       |  FROM $from
       |), tok AS (
       |  SELECT d.doc_id, COALESCE(s.n_tokens, 0) + 1 AS n_tokens FROM
       |  $from d LEFT JOIN (
       |    SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
       |    FROM pres
       |    JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
       |      USING (pretoken)
       |    GROUP BY doc_id) s USING (doc_id)
       |), d AS (
       |  SELECT t.doc_id, x.h, ((x.h % 8) + 8) % 8 AS shard,
       |    t.n_tokens,
       |    SUM(t.n_tokens) OVER (PARTITION BY ((x.h % 8) + 8) % 8
       |      ORDER BY ${orderExtra}x.h, t.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - t.n_tokens AS off
       |  FROM tok t JOIN xxh x USING (doc_id)
       |), totals AS (
       |  SELECT shard, SUM(n_tokens) AS total FROM d GROUP BY shard
       |), seqs AS (
       |  SELECT shard, total,
       |    unnest(generate_series(CAST(0 AS BIGINT),
       |      CAST((total - 1) // 2048 AS BIGINT))) AS k
       |  FROM totals WHERE total > 0
       |)""".stripMargin

  private def sequencesSql(padded: Boolean): String = {
    val nTok =
      if (padded) "CAST(2048 AS BIGINT) AS n_tokens"
      else "CAST(LEAST(s.total, (s.k + 1) * 2048) - s.k * 2048 AS BIGINT)" +
        " AS n_tokens"
    val pad =
      if (padded)
        ",\n  CAST((s.k + 1) * 2048 - LEAST(s.total, (s.k + 1) * 2048)" +
          " AS BIGINT) AS n_pad"
      else ""
    s"""WITH ${sequencesCtes()}
       |SELECT s.shard, CAST(s.k AS BIGINT) AS seq_id,
       |  $nTok,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  arg_min(d.doc_id, d.off) AS first_doc,
       |  arg_max(d.doc_id, d.off) AS last_doc,
       |  CAST(LEAST(s.total, (s.k + 1) * 2048) - s.k * 2048 = 2048
       |    AS BIGINT) AS complete$pad
       |FROM seqs s JOIN d
       |  ON d.shard = s.shard
       | AND d.off < (s.k + 1) * 2048 AND d.off + d.n_tokens > s.k * 2048
       |GROUP BY s.shard, s.k, s.total
       |ORDER BY s.shard, seq_id""".stripMargin
  }

  /** The shuffled-sample permutation replayed end-to-end: the sequence
    * identity packs into one BIGINT (shard * 2^40 + seq_id), a SECOND
    * xxhash64 replay (prefixed CTEs) derives the output shard and the
    * within-shard position is the rank by (hash, key). */
  private def sequencesShuffledSql: String =
    s"""WITH ${sequencesCtes()},
       |sk AS (
       |  SELECT shard, CAST(k AS BIGINT) AS seq_id,
       |    CAST(shard * 1099511627776 + k AS BIGINT) AS skey
       |  FROM seqs
       |),
       |${xxhash64Ctes("skey", "sk", "s")}
       |SELECT k2.shard, k2.seq_id,
       |  ((x.h % 16) + 16) % 16 AS out_shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY ((x.h % 16) + 16) % 16
       |    ORDER BY x.h, k2.skey) - 1 AS BIGINT) AS pos
       |FROM sk k2 JOIN sxxh x USING (skey)
       |ORDER BY k2.shard, k2.seq_id""".stripMargin

  /** Epoch-7 permutation replay: the hashed key is the identity SHIFTED
    * by `7 * GoldenGamma` (unsigned, mod 2^64 — the shift constant is
    * reduced in exact BigInt arithmetic here, so the SQL carries the
    * plain residue); rank tiebreak stays on the UNSHIFTED identity,
    * exactly as the Spark window orders. */
  /** Unsigned residue of `seed * GoldenGamma` mod 2^64 — the epoch key
    * shift, reduced in exact BigInt arithmetic for the SQL replay. */
  private def epochShiftConst(seed: Long): BigInt = {
    val two64 = BigInt(1) << 64
    val gamma = (BigInt(graft.ops.Chunking.GoldenGamma) + two64) mod two64
    (BigInt(seed) * gamma) mod two64
  }

  private def epochOrderedCtes: String = {
    val c = epochShiftConst(7L)
    s"""${sequencesCtes()},
       |sk AS (
       |  SELECT shard, CAST(k AS BIGINT) AS seq_id,
       |    CAST(shard * 1099511627776 + k AS BIGINT) AS skey,
       |    (CAST(shard AS HUGEINT) * 1099511627776 + k + $c)
       |      % 18446744073709551616 AS ekey
       |  FROM seqs
       |),
       |${xxhash64Ctes("ekey", "sk", "e")},
       |eord AS (
       |  SELECT k2.shard, k2.seq_id,
       |    ((x.h % 16) + 16) % 16 AS out_shard,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY ((x.h % 16) + 16) % 16
       |      ORDER BY x.h, k2.skey) - 1 AS BIGINT) AS pos
       |  FROM sk k2 JOIN exxh x USING (ekey)
       |)""".stripMargin
  }

  private def epochOrderSql: String =
    s"""WITH $epochOrderedCtes
       |SELECT shard, seq_id, out_shard, pos FROM eord
       |ORDER BY shard, seq_id""".stripMargin

  private def epochResumeSql: String =
    s"""WITH $epochOrderedCtes
       |SELECT out_shard, pos, shard, seq_id FROM eord
       |WHERE out_shard > 5 OR (out_shard = 5 AND pos >= 3)
       |ORDER BY out_shard, pos""".stripMargin

  /** The weighted-epoch replay: per-sequence domains and counts → the
    * same double-arithmetic rates as [[graft.ops.Chunking.epochRates]],
    * the q20 Bernoulli through one hash chain, per-row
    * `generate_series` repeats, and positions through a second chain
    * over the copy-packed identity — all key arithmetic in HUGEINT
    * mod 2^64. */
  private def epochMixtureSql: String = {
    val c = epochShiftConst(3L)
    s"""WITH ${sequencesCtes()},
       |sq AS (
       |  SELECT s.shard, CAST(s.k AS BIGINT) AS seq_id,
       |    arg_min(d.doc_id, d.off) AS first_doc
       |  FROM seqs s JOIN d ON d.shard = s.shard
       |    AND d.off < (s.k + 1) * 2048 AND d.off + d.n_tokens > s.k * 2048
       |  GROUP BY s.shard, s.k
       |),
       |dom AS (
       |  SELECT shard, seq_id,
       |    'd' || CAST(first_doc % 3 AS VARCHAR) AS domain,
       |    CAST(shard * 1099511627776 + seq_id AS BIGINT) AS skey
       |  FROM sq
       |),
       |shr(domain, share) AS (
       |  VALUES ('d0', CAST(0.5 AS DOUBLE)), ('d1', CAST(0.3 AS DOUBLE)),
       |         ('d2', CAST(0.2 AS DOUBLE))
       |),
       |tot AS (SELECT COUNT(*) AS n FROM dom),
       |rates AS (
       |  SELECT a.domain,
       |    CAST(FLOOR(a.share * t.n / CAST(a.n_seqs AS DOUBLE)
       |      * 1048576.0 + 0.5) AS BIGINT) AS rate_q20
       |  FROM (SELECT d2.domain, COUNT(*) AS n_seqs,
       |          ANY_VALUE(s.share) AS share
       |        FROM dom d2 JOIN shr s USING (domain) GROUP BY d2.domain) a
       |  CROSS JOIN tot t
       |),
       |sel AS (
       |  SELECT d2.shard, d2.seq_id, d2.domain, d2.skey, r.rate_q20,
       |    (CAST(d2.skey AS HUGEINT) + $c) % 18446744073709551616 AS mkey
       |  FROM dom d2 JOIN rates r USING (domain)
       |),
       |${xxhash64Ctes("mkey", "sel", "m")},
       |cop AS (
       |  SELECT s2.shard, s2.seq_id, s2.domain, s2.skey,
       |    unnest(generate_series(CAST(0 AS BIGINT),
       |      CAST(s2.rate_q20 // 1048576
       |        + CASE WHEN ((x.h % 1048576) + 1048576) % 1048576
       |            < s2.rate_q20 % 1048576 THEN 1 ELSE 0 END
       |        - 1 AS BIGINT))) AS copy
       |  FROM sel s2 JOIN mxxh x USING (mkey)
       |),
       |ck AS (
       |  SELECT shard, seq_id, domain, copy, skey,
       |    (CAST(skey AS HUGEINT) * 64 + copy + $c)
       |      % 18446744073709551616 AS pkey
       |  FROM cop
       |),
       |${xxhash64Ctes("pkey", "ck", "p")}
       |SELECT k2.shard, k2.seq_id, k2.copy, k2.domain,
       |  ((x.h % 16) + 16) % 16 AS out_shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY ((x.h % 16) + 16) % 16
       |    ORDER BY x.h, k2.skey * 64 + k2.copy) - 1 AS BIGINT) AS pos
       |FROM ck k2 JOIN pxxh x USING (pkey)
       |ORDER BY out_shard, pos""".stripMargin
  }

  /** The incremental feed replayed: batches arrive as doc_id % 3 in
    * order, so the per-shard stream is the concatenation ordered by
    * (batch, h, doc_id); the store holds COMPLETE sequences only (the
    * trailing partial lives in the carry), so k ranges over the full
    * multiples of 2048. */
  private def sequencesIncrementalSql: String =
    s"""WITH ${sequencesCtes("t.doc_id % 3, ")},
       |ck AS (
       |  SELECT shard, total,
       |    unnest(generate_series(CAST(0 AS BIGINT),
       |      CAST(total // 2048 - 1 AS BIGINT))) AS k
       |  FROM totals WHERE total >= 2048
       |)
       |SELECT c.shard, CAST(c.k AS BIGINT) AS seq_id,
       |  CAST(2048 AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  arg_min(d.doc_id, d.off) AS first_doc,
       |  arg_max(d.doc_id, d.off) AS last_doc
       |FROM ck c JOIN d
       |  ON d.shard = c.shard
       | AND d.off < (c.k + 1) * 2048 AND d.off + d.n_tokens > c.k * 2048
       |GROUP BY c.shard, c.k
       |ORDER BY c.shard, seq_id""".stripMargin

  /** The snapshot replayed: high-water marks published after batch 1
    * freeze exactly the complete sequences the first two batches cut —
    * the same batch-prefixed stream replay as
    * [[sequencesIncrementalSql]] restricted to the doc_id % 3 <= 1
    * slice (batch 2's arrivals and the compaction that followed are
    * invisible to the snapshot by construction). */
  private def feedSnapshotSql: String =
    s"""WITH docs01 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <= 1
       |),
       |${sequencesCtes("t.doc_id % 3, ", from = "docs01")},
       |ck AS (
       |  SELECT shard, total,
       |    unnest(generate_series(CAST(0 AS BIGINT),
       |      CAST(total // 2048 - 1 AS BIGINT))) AS k
       |  FROM totals WHERE total >= 2048
       |)
       |SELECT c.shard, CAST(c.k AS BIGINT) AS seq_id,
       |  CAST(2048 AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  arg_min(d.doc_id, d.off) AS first_doc,
       |  arg_max(d.doc_id, d.off) AS last_doc
       |FROM ck c JOIN d
       |  ON d.shard = c.shard
       | AND d.off < (c.k + 1) * 2048 AND d.off + d.n_tokens > c.k * 2048
       |GROUP BY c.shard, c.k
       |ORDER BY c.shard, seq_id""".stripMargin

  /** The curated feed replayed end-to-end: the duplicate-injected corpus
    * filters on normalized word count, masks PII (a no-op on this
    * corpus, replayed anyway), keeps the first occurrence of each
    * masked-text fingerprint across (batch = doc_id % 3, doc_id), and
    * the survivors cut exactly like the incremental feed — token counts
    * from the pretoken fixture (+1 boundary), xxhash64 shards, offsets
    * cumulative in (batch, h, doc_id) order, complete rows only. */
  private def curatedFeedSql: String =
    s"""WITH seen_all AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id < 25
       |  UNION ALL
       |  SELECT doc_id + 900000 AS doc_id, text FROM documents WHERE doc_id < 10
       |), qual AS (
       |  SELECT doc_id, text FROM seen_all
       |  WHERE len(string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' '))
       |    BETWEEN 20 AND 80
       |), red AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(text, '${graft.ops.Curation.EmailRe}', '<EMAIL>', 'g'),
       |      '${graft.ops.Curation.Ipv4Re}', '<IP>', 'g') AS text
       |  FROM qual
       |), keyed AS (
       |  SELECT doc_id, doc_id % 3 AS b, text,
       |    md5(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g'))) AS fp
       |  FROM red
       |), surv AS (
       |  SELECT doc_id, b, text FROM (
       |    SELECT doc_id, b, text,
       |      ROW_NUMBER() OVER (PARTITION BY fp ORDER BY b, doc_id) AS rn
       |    FROM keyed) WHERE rn = 1
       |), ${xxhash64Ctes("doc_id", "surv")},
       |pres AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
       |  FROM surv
       |), tok AS (
       |  SELECT v.doc_id, v.b, COALESCE(s.n_tokens, 0) + 1 AS n_tokens FROM
       |  surv v LEFT JOIN (
       |    SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
       |    FROM pres
       |    JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
       |      USING (pretoken)
       |    GROUP BY doc_id) s USING (doc_id)
       |), d AS (
       |  SELECT t.doc_id, x.h, ((x.h % 8) + 8) % 8 AS shard,
       |    t.n_tokens,
       |    SUM(t.n_tokens) OVER (PARTITION BY ((x.h % 8) + 8) % 8
       |      ORDER BY t.b, x.h, t.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - t.n_tokens AS off
       |  FROM tok t JOIN xxh x USING (doc_id)
       |), totals AS (
       |  SELECT shard, SUM(n_tokens) AS total FROM d GROUP BY shard
       |), ck AS (
       |  SELECT shard, total,
       |    unnest(generate_series(CAST(0 AS BIGINT),
       |      CAST(total // 2048 - 1 AS BIGINT))) AS k
       |  FROM totals WHERE total >= 2048
       |)
       |SELECT c.shard, CAST(c.k AS BIGINT) AS seq_id,
       |  CAST(2048 AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  arg_min(d.doc_id, d.off) AS first_doc,
       |  arg_max(d.doc_id, d.off) AS last_doc
       |FROM ck c JOIN d
       |  ON d.shard = c.shard
       | AND d.off < (c.k + 1) * 2048 AND d.off + d.n_tokens > c.k * 2048
       |GROUP BY c.shard, c.k
       |ORDER BY c.shard, seq_id""".stripMargin

  private def indexSearchSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN ('scan', 'merge', 'window') GROUP BY doc_id, term
       |), dfx AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE term IN ('scan', 'merge', 'window') GROUP BY term
       |), n AS (
       |  SELECT count(*) AS nd FROM documents
       |), sc AS (
       |  SELECT tf.doc_id, count(*) AS n_terms,
       |    SUM(length(bin(nd // df)) * length(bin(tf.tf))) AS score
       |  FROM tf JOIN dfx USING (term) CROSS JOIN n
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, n_terms, CAST(score AS BIGINT) AS score
       |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"

  /** rotl64 replayed in HUGEINT: the shifted-out high bits land in the low
    * bits; the two parts are disjoint so OR == ADD. */
  private def rotlSql(x: String, r: Int): String = {
    val loMod = BigInt(1) << (64 - r)
    val mul = BigInt(1) << r
    s"((($x) % $loMod) * $mul + ($x) // $loMod)"
  }

  /** Spark `xxhash64` of a BIGINT column (XXH64.hashLong, seed 42),
    * replayed stage by stage over CTEs; `in` names the id column. P1/P2/P4
    * multiplies use 32-bit-half decomposition (both factors ~2^64); the
    * P3 multiply fits int128 directly (P3 < 2^61). `prefix` renames the
    * internal CTEs (and the final `{prefix}xxh`) so two hash replays can
    * coexist in one query. */
  private def xxhash64Ctes(in: String, from: String,
      prefix: String = ""): String =
    s"""${prefix}x1 AS (SELECT $in, ${mulModSql(s"CAST($in AS HUGEINT)", 3266489917L, 668265295L)} AS k1a FROM $from),
       |${prefix}x2 AS (SELECT $in, ${rotlSql("k1a", 31)} AS k1b FROM ${prefix}x1),
       |${prefix}x3 AS (SELECT $in, ${mulModSql("k1b", 2654435761L, 2246822535L)} AS k1c FROM ${prefix}x2),
       |${prefix}x4 AS (SELECT $in, xor(CAST(2870177450012600311 AS HUGEINT), k1c) AS h1 FROM ${prefix}x3),
       |${prefix}x5 AS (SELECT $in, (${mulModSql(rotlSql("h1", 27), 2654435761L, 2246822535L)} + 9650029242287828579) % $P64 AS h2 FROM ${prefix}x4),
       |${prefix}x6 AS (SELECT $in, xor(h2, h2 // 8589934592) AS f1 FROM ${prefix}x5),
       |${prefix}x7 AS (SELECT $in, ${mulModSql("f1", 3266489917L, 668265295L)} AS f2 FROM ${prefix}x6),
       |${prefix}x8 AS (SELECT $in, xor(f2, f2 // 536870912) AS f3 FROM ${prefix}x7),
       |${prefix}x9 AS (SELECT $in, (f3 * 1609587929392839161) % $P64 AS f4 FROM ${prefix}x8),
       |${prefix}xxh AS (SELECT $in, ${signedSql("xor(f4, f4 // 4294967296)")} AS h FROM ${prefix}x9)""".stripMargin

  /** Root of this checkout, for the two committed CPython-difflib fixture
    * parquets referenced by oracle SQL. Resolution order: explicit
    * `-Dgraft.repo.root=...` / `GRAFT_REPO_ROOT`, then the working
    * directory if it looks like a checkout (has `src/test/resources`),
    * then the canonical driver path — so oracle replay works from any
    * checkout location without breaking the driver's fixed layout. */
  private lazy val repoRoot: String =
    sys.props.get("graft.repo.root")
      .orElse(sys.env.get("GRAFT_REPO_ROOT"))
      .getOrElse {
        val cwd = new java.io.File(".").getCanonicalPath
        if (new java.io.File(cwd, "src/test/resources").isDirectory) cwd
        else "/root/repo"
      }

  /** One oracle, two physical variants: the salted join must be
    * result-identical to the naive plan. */
  private val skewOracle =
    """WITH fact AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_suppkey % 100 END AS k,
      |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem
      |), dim AS (
      |  SELECT id % 100 AS k, id // 100 AS variant FROM range(0, 6400) t(id)
      |)
      |SELECT f.k, COUNT(*) AS n,
      |  CAST(SUM(f.cents * (d.variant + 1)) AS BIGINT) AS weighted_cents
      |FROM fact f JOIN dim d ON f.k = d.k
      |GROUP BY f.k ORDER BY f.k""".stripMargin

  /** CDC merge replay, shared by q_cdc_merge (batch window) and
    * s_cdc_merge (streaming max_by — definitionally the same winner). */
  private val cdcMergeSql: String =
    """WITH base AS (
      |  SELECT c_custkey AS cust,
      |    CAST(-9223372036854775807 - 1 AS BIGINT) AS seq, 'I' AS op,
      |    CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal_cents,
      |    c_mktsegment AS seg
      |  FROM customer
      |), ch AS (
      |  SELECT o_custkey AS cust,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      * 10000000000 + o_orderkey AS seq,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS bal_cents,
      |    o_orderpriority AS seg
      |  FROM orders
      |), allr AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM ch
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY cust
      |    ORDER BY seq DESC, op DESC, bal_cents DESC) AS rk
      |  FROM allr
      |)
      |SELECT cust, bal_cents, seg FROM r
      |WHERE rk = 1 AND op <> 'D' ORDER BY cust""".stripMargin

  /** Unrolled k-core peeling replay: both engines run EXACTLY `rounds`
    * peels (fixed-round contract — agreement does not require the peel
    * to have converged), each round one degree aggregate + one keep
    * filter + one edge restriction. Machine-generated CTE chain; every
    * CTE is MATERIALIZED — inlining would expand e_{r} into e_{r-1}
    * three times (once directly, twice through the IN subqueries), i.e.
    * 3^rounds parquet scans ("too many open files" long before any
    * result). */
  private def kCoreSql(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e0 AS MATERIALIZED (
        |  SELECT 'p' || CAST(a.p AS VARCHAR) AS u,
        |         'p' || CAST(b.p AS VARCHAR) AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)""".stripMargin
    for (r <- 0 until rounds) {
      b ++= s""",
        |d$r AS MATERIALIZED (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e$r UNION ALL SELECT v FROM e$r
        |  ) GROUP BY node
        |), n$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $k),
        |e${r + 1} AS MATERIALIZED (
        |  SELECT u, v FROM e$r
        |  WHERE u IN (SELECT node FROM n$r) AND v IN (SELECT node FROM n$r)
        |)""".stripMargin
    }
    b ++= s"""
        |SELECT node, count(*) AS deg FROM (
        |  SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds
        |) GROUP BY node ORDER BY node""".stripMargin
    b.toString
  }

  /** DuckDB-runnable ANSI equivalents (driver's correctness oracle).
    * Omitted for ops whose semantics aren't SQL-expressible (difflib ratio,
    * LSH, UDF hashes) — the driver records a weaker rows-only check there. */
  /** The per-column differing-pairs SQL over the current inputs —
    * shared by the v_multi_diff oracle and (as an identity oracle) by
    * v_multi_incremental_diff, whose stored per-bucket report it never
    * sees. */
  private lazy val multiDiffSql: String =
    s"""$pairCte
       |SELECT * FROM (
       |  SELECT db1.id, 'o_orderdate' AS column_name,
       |    strftime(db1.o_orderdate, '%Y-%m-%d %H:%M:%S') AS check_first,
       |    strftime(db2.o_orderdate, '%Y-%m-%d %H:%M:%S') AS check_second
       |  FROM db1 JOIN db2 ON db1.id = db2.id
       |  WHERE db1.o_orderdate IS DISTINCT FROM db2.o_orderdate
       |  UNION ALL
       |  SELECT db1.id, 'o_orderpriority', db1.o_orderpriority, db2.o_orderpriority
       |  FROM db1 JOIN db2 ON db1.id = db2.id
       |    LEFT JOIN read_parquet('$repoRoot/src/test/resources/difflib_ratios.parquet') r
       |      ON db1.o_orderpriority = r.a AND db2.o_orderpriority = r.b
       |  WHERE CASE
       |    WHEN db1.o_orderpriority IS NULL AND db2.o_orderpriority IS NULL THEN FALSE
       |    WHEN db1.o_orderpriority IS NULL OR db2.o_orderpriority IS NULL THEN TRUE
       |    ELSE r.ratio < CAST(0.9 AS DOUBLE) END
       |  UNION ALL
       |  SELECT db1.id, 'o_totalprice',
       |    CAST(CAST(db1.o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
       |    CAST(CAST(db2.o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
       |  FROM db1 JOIN db2 ON db1.id = db2.id
       |  WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice
       |) ORDER BY column_name, id""".stripMargin

  /** The per-column six-metric SQL over the current inputs — shared by
    * the v_multi_validate oracle and (as an identity oracle) by
    * v_multi_incremental, whose stored state it never sees. */
  private lazy val multiValidateSql: String =
    s"""$pairCte
         |SELECT 'o_orderdate' AS column_name,
         |  (SELECT COUNT(*) FROM db1) AS n_first,
         |  (SELECT COUNT(*) FROM db2) AS n_second,
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS missing_in_first,
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)) AS missing_in_second,
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     WHERE db1.o_orderdate IS DISTINCT FROM db2.o_orderdate) AS n_differing,
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS n_matched
         |UNION ALL
         |SELECT 'o_orderpriority',
         |  (SELECT COUNT(*) FROM db1),
         |  (SELECT COUNT(*) FROM db2),
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)),
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)),
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     LEFT JOIN read_parquet('$repoRoot/src/test/resources/difflib_ratios.parquet') r
         |       ON db1.o_orderpriority = r.a AND db2.o_orderpriority = r.b
         |     WHERE CASE
         |       WHEN db1.o_orderpriority IS NULL AND db2.o_orderpriority IS NULL THEN FALSE
         |       WHEN db1.o_orderpriority IS NULL OR db2.o_orderpriority IS NULL THEN TRUE
         |       ELSE r.ratio < CAST(0.9 AS DOUBLE) END),
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id))
         |UNION ALL
         |SELECT 'o_totalprice',
         |  (SELECT COUNT(*) FROM db1),
         |  (SELECT COUNT(*) FROM db2),
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)),
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)),
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice),
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id))
         |ORDER BY column_name""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "v_missing_first" ->
      s"""$pairCte
         |SELECT db2.id FROM db2
         |WHERE NOT EXISTS (SELECT 1 FROM db1 WHERE db1.id = db2.id)
         |ORDER BY id""".stripMargin,
    "v_missing_second" ->
      s"""$pairCte
         |SELECT db1.id FROM db1
         |WHERE NOT EXISTS (SELECT 1 FROM db2 WHERE db2.id = db1.id)
         |ORDER BY id""".stripMargin,
    "v_diff_numeric" ->
      s"""$pairCte
         |SELECT db1.id, db1.o_totalprice AS check_first, db2.o_totalprice AS check_second
         |FROM db1 JOIN db2 ON db1.id = db2.id
         |WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice
         |ORDER BY 1""".stripMargin,
    "v_diff_numeric_coerce" ->
      """WITH s1 AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |    CASE WHEN o_orderkey % 53 = 0 THEN 'oops'
        |         ELSE CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR) END AS v
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |), s2 AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |    CASE WHEN o_orderkey % 53 = 0 THEN 'oops'
        |         WHEN o_orderkey % 41 = 0 THEN NULL
        |         WHEN o_orderkey % 31 = 0 THEN CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) + 100 AS VARCHAR)
        |         ELSE CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR) END AS v
        |  FROM orders WHERE o_orderkey % 89 <> 0
        |)
        |SELECT s1.id, s1.v AS check_first, s2.v AS check_second
        |FROM s1 JOIN s2 ON s1.id = s2.id
        |WHERE TRY_CAST(s1.v AS DOUBLE) IS DISTINCT FROM TRY_CAST(s2.v AS DOUBLE)
        |ORDER BY 1""".stripMargin,
    "v_diff_date" ->
      s"""$pairCte
         |SELECT db1.id,
         |  strftime(db1.o_orderdate, '%Y-%m-%d %H:%M:%S') AS check_first,
         |  strftime(db2.o_orderdate, '%Y-%m-%d %H:%M:%S') AS check_second
         |FROM db1 JOIN db2 ON db1.id = db2.id
         |WHERE db1.o_orderdate IS DISTINCT FROM db2.o_orderdate
         |ORDER BY 1""".stripMargin,
    "v_diff_string_exact" ->
      s"""$pairCte
         |SELECT db1.id, db1.o_orderpriority AS check_first, db2.o_orderpriority AS check_second
         |FROM db1 JOIN db2 ON db1.id = db2.id
         |WHERE db1.o_orderpriority IS DISTINCT FROM db2.o_orderpriority
         |ORDER BY 1""".stripMargin,
    "v_summary" ->
      s"""$pairCte
         |SELECT
         |  (SELECT COUNT(*) FROM db1) AS n_first,
         |  (SELECT COUNT(*) FROM db2) AS n_second,
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS missing_in_first,
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)) AS missing_in_second,
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice) AS n_differing,
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS n_matched""".stripMargin,
    // incremental-summary oracle: the FULL six-metric computation over the
    // CURRENT inputs — deliberately identical to v_summary's SQL. The
    // oracle never sees the stored per-bucket state or the prior
    // snapshot; if digest pruning carried a stale or wrong term forward,
    // this comparison catches it
    "v_incremental_summary" ->
      s"""$pairCte
         |SELECT
         |  (SELECT COUNT(*) FROM db1) AS n_first,
         |  (SELECT COUNT(*) FROM db2) AS n_second,
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS missing_in_first,
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)) AS missing_in_second,
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice) AS n_differing,
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS n_matched""".stripMargin,
    // fuzzy-summary oracle: the same six metrics, with "differing" decided
    // by the CPython-difflib fixture ratio at threshold 0.9 (both-null ->
    // equal, one-null -> differ — the F1 truth table). This is the
    // row-level ground truth the distinct-pair algebra inside summaryFast
    // must reproduce
    "v_summary_fuzzy" ->
      s"""$pairCte
         |SELECT
         |  (SELECT COUNT(*) FROM db1) AS n_first,
         |  (SELECT COUNT(*) FROM db2) AS n_second,
         |  (SELECT COUNT(*) FROM db2 WHERE NOT EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS missing_in_first,
         |  (SELECT COUNT(*) FROM db1 WHERE NOT EXISTS
         |     (SELECT 1 FROM db2 WHERE db2.id = db1.id)) AS missing_in_second,
         |  (SELECT COUNT(*) FROM db1 JOIN db2 ON db1.id = db2.id
         |     LEFT JOIN read_parquet('$repoRoot/src/test/resources/difflib_ratios.parquet') r
         |       ON db1.o_orderpriority = r.a AND db2.o_orderpriority = r.b
         |     WHERE CASE
         |       WHEN db1.o_orderpriority IS NULL AND db2.o_orderpriority IS NULL THEN FALSE
         |       WHEN db1.o_orderpriority IS NULL OR db2.o_orderpriority IS NULL THEN TRUE
         |       ELSE r.ratio < CAST(0.9 AS DOUBLE) END) AS n_differing,
         |  (SELECT COUNT(*) FROM db2 WHERE EXISTS
         |     (SELECT 1 FROM db1 WHERE db1.id = db2.id)) AS n_matched""".stripMargin,
    "v_multi_validate" -> multiValidateSql,
    // identity oracle for the multi-column INCREMENTAL path: the exact
    // same per-column SQL over the current inputs — the stored state and
    // the prior snapshot are invisible to it, so a stale carried term or
    // a missed dirty bucket is a value mismatch
    "v_multi_incremental" -> multiValidateSql,
    // identity oracle for the incrementally-maintained ROW-LEVEL report:
    // the full three-frame computation over the current inputs; a stale
    // or torn report partition is a row/hash mismatch
    "v_incremental_diff" ->
      s"""$pairCte
         |SELECT * FROM (
         |  SELECT 'missing_in_first' AS kind, db2.id,
         |    CAST(NULL AS VARCHAR) AS check_first,
         |    CAST(NULL AS VARCHAR) AS check_second
         |  FROM db2 WHERE NOT EXISTS
         |    (SELECT 1 FROM db1 WHERE db1.id = db2.id)
         |  UNION ALL
         |  SELECT 'missing_in_second', db1.id, NULL, NULL
         |  FROM db1 WHERE NOT EXISTS
         |    (SELECT 1 FROM db2 WHERE db2.id = db1.id)
         |  UNION ALL
         |  SELECT 'differing', db1.id,
         |    CAST(CAST(db1.o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
         |    CAST(CAST(db2.o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
         |  FROM db1 JOIN db2 ON db1.id = db2.id
         |  WHERE db1.o_totalprice IS DISTINCT FROM db2.o_totalprice
         |)
         |ORDER BY kind, id""".stripMargin,
    "v_multi_diff" -> multiDiffSql,
    // identity oracle for the multi-column incrementally-maintained
    // row-level report: the exact per-column diff SQL over the CURRENT
    // inputs — the stored per-bucket report and the prior snapshot are
    // invisible to it, so a stale carried partition or a missed dirty
    // bucket is a row/hash mismatch
    "v_multi_incremental_diff" -> multiDiffSql,
    "v_date_filter" ->
      """SELECT o_orderkey AS id,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date
        |FROM orders
        |WHERE o_orderdate > TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
        |ORDER BY id""".stripMargin,
    "v_sorted_ids" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id FROM orders ORDER BY id""",
    "v_composite_key" ->
      """SELECT concat_ws('_',
        |    coalesce(CAST(CASE WHEN o_custkey % 53 = 0 THEN NULL ELSE o_custkey END AS VARCHAR), '0'),
        |    coalesce(CAST(o_orderstatus AS VARCHAR), '0')) AS id,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "v_lineitem_validate" ->
      """WITH k1 AS (
        |  SELECT concat_ws('_', coalesce(CAST(l_orderkey AS VARCHAR),'0'),
        |      coalesce(CAST(l_linenumber AS VARCHAR),'0')) AS id,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_orderkey % 97 <> 0
        |), k2 AS (
        |  SELECT concat_ws('_', coalesce(CAST(l_orderkey AS VARCHAR),'0'),
        |      coalesce(CAST(l_linenumber AS VARCHAR),'0')) AS id,
        |    CASE WHEN l_orderkey % 31 = 0 THEN l_extendedprice + 1.0
        |         WHEN l_orderkey % 41 = 0 THEN NULL ELSE l_extendedprice END AS v
        |  FROM lineitem WHERE l_orderkey % 89 <> 0
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM k1) AS n_first,
        |  (SELECT COUNT(*) FROM k2) AS n_second,
        |  (SELECT COUNT(*) FROM k2 WHERE NOT EXISTS
        |     (SELECT 1 FROM k1 WHERE k1.id = k2.id)) AS missing_in_first,
        |  (SELECT COUNT(*) FROM k1 WHERE NOT EXISTS
        |     (SELECT 1 FROM k2 WHERE k2.id = k1.id)) AS missing_in_second,
        |  (SELECT COUNT(*) FROM k1 JOIN k2 ON k1.id = k2.id
        |     WHERE k1.v IS DISTINCT FROM k2.v) AS n_differing,
        |  (SELECT COUNT(*) FROM k2 WHERE EXISTS
        |     (SELECT 1 FROM k1 WHERE k1.id = k2.id)) AS n_matched""".stripMargin,
    // schema-drift oracle: DESCRIBE both constructed sides, normalize
    // DuckDB type names to Spark simpleString, full-outer join on column
    "v_schema_diff" ->
      """WITH d1 AS (
        |  SELECT column_name, CASE column_type
        |      WHEN 'BIGINT' THEN 'bigint' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
        |      ELSE lower(column_type) END AS t
        |  FROM (DESCRIBE SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |        o_totalprice, o_orderdate, o_orderpriority FROM orders)
        |), d2 AS (
        |  SELECT column_name, CASE column_type
        |      WHEN 'BIGINT' THEN 'bigint' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
        |      ELSE lower(column_type) END AS t
        |  FROM (DESCRIBE SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |        CAST(o_totalprice AS VARCHAR) AS o_totalprice,
        |        o_orderdate, o_custkey FROM orders)
        |)
        |SELECT COALESCE(d1.column_name, d2.column_name) AS column_name,
        |  d1.t AS type_first, d2.t AS type_second,
        |  CASE WHEN d1.t IS NOT NULL AND d2.t IS NOT NULL AND d1.t = d2.t THEN 'match'
        |       WHEN d1.t IS NOT NULL AND d2.t IS NOT NULL THEN 'type_mismatch'
        |       WHEN d1.t IS NOT NULL THEN 'only_first'
        |       ELSE 'only_second' END AS status
        |FROM d1 FULL OUTER JOIN d2 ON d1.column_name = d2.column_name
        |ORDER BY column_name""".stripMargin,

    "v_reconcile" ->
      s"""$pairCte
         |SELECT COALESCE(db1.id, db2.id) AS id,
         |  CASE WHEN db1.id IS NULL THEN db2.o_orderpriority
         |       WHEN db2.id IS NULL THEN db1.o_orderpriority
         |       ELSE db1.o_orderpriority END AS "check",
         |  CASE WHEN db1.id IS NULL THEN 'only_second'
         |       WHEN db2.id IS NULL THEN 'only_first'
         |       WHEN db1.o_orderpriority IS NOT DISTINCT FROM db2.o_orderpriority THEN 'match'
         |       ELSE 'conflict' END AS status
         |FROM db1 FULL OUTER JOIN db2 ON db1.id = db2.id
         |ORDER BY 1""".stripMargin,
    "v_bucket_diff" ->
      s"""$pairCte, ca AS (
         |  SELECT CAST(id AS BIGINT) % 64 AS bucket, COUNT(*) AS n_first,
         |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents_first
         |  FROM db1 GROUP BY 1
         |), cb AS (
         |  SELECT CAST(id AS BIGINT) % 64 AS bucket, COUNT(*) AS n_second,
         |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents_second
         |  FROM db2 GROUP BY 1
         |)
         |SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
         |  n_first, cents_first, n_second, cents_second
         |FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
         |WHERE n_first IS DISTINCT FROM n_second
         |   OR cents_first IS DISTINCT FROM cents_second
         |ORDER BY bucket""".stripMargin,
    "v_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_val, CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*),
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*),
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |    CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*),
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
        |    CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
        |) p ORDER BY column_name""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top10" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue_cents DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    // percent_rank = (rank-1)/(count-1), cume_dist = peers/count — both a
    // single IEEE double division of exact integers in both engines, so
    // the ppm floor is bit-for-bit
    "q_analytics" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
        |  lag(CAST(ROUND(o_totalprice*100) AS BIGINT), 1) OVER w AS prev_cents,
        |  lead(CAST(ROUND(o_totalprice*100) AS BIGINT), 1) OVER w AS next_cents,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(FLOOR(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm,
        |  CAST(FLOOR(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_ppm
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.5) AS p50,
        |  quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.9) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "t_token_hist" ->
      """SELECT t AS token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS t
        |  FROM documents) u
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
        |    PARTITION BY event_type ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents
        |FROM events ORDER BY event_id""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey AS key FROM orders
        |INTERSECT
        |SELECT c_custkey AS key FROM customer
        |ORDER BY key""".stripMargin,
    "q_except" ->
      """SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey AS key FROM orders
        |ORDER BY key""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessions" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), s2 AS (
        |  SELECT user_id, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // interval-join oracle: the brute-force BETWEEN join DuckDB is happy
    // to run at this scale — exactly what the bucket expansion avoids
    "q_interval_join" ->
      """WITH q AS (
        |  SELECT CAST(unnest(generate_series(DATE '1992-01-01', DATE '1998-10-01',
        |         INTERVAL 3 MONTH)) AS DATE) AS q_start
        |), qi AS (
        |  SELECT q_start,
        |    (year(q_start) - 1992) * 4 + (month(q_start) - 1) // 3 AS q_idx,
        |    datediff('day', DATE '1970-01-01', q_start) AS start_day,
        |    datediff('day', DATE '1970-01-01', CAST(q_start + INTERVAL 3 MONTH AS DATE)) AS end_day
        |  FROM q
        |), iv AS (
        |  SELECT c_custkey AS custkey, q_start, start_day, end_day,
        |    'tier_' || CAST((c_custkey + q_idx) % 5 AS VARCHAR) AS tier
        |  FROM customer, qi
        |), f AS (
        |  SELECT o_orderkey, o_custkey AS custkey,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
        |  FROM orders
        |)
        |SELECT f.o_orderkey, f.custkey, CAST(f.day AS INTEGER) AS day,
        |  strftime(iv.q_start, '%Y-%m-%d') AS quarter_start, iv.tier
        |FROM f JOIN iv ON iv.custkey = f.custkey
        |  AND f.day >= iv.start_day AND f.day < iv.end_day
        |ORDER BY f.o_orderkey""".stripMargin,

    "q_asof" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        |  CAST(ROUND(v.value*100) AS BIGINT) AS view_value_cents
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "s_windowed_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s_user_sessions" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s_validate" ->
      """SELECT event_id AS id,
        |  CAST(ROUND(value*100) AS BIGINT) AS observed_cents,
        |  CAST(ROUND((value+1)*100) AS BIGINT) AS expected_cents
        |FROM events WHERE event_id % 5 = 0
        |ORDER BY id""".stripMargin,
    "s_interval_join" ->
      """SELECT p.user_id, p.event_id AS l_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS l_ts,
        |  v.event_id AS r_event_id,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS r_ts,
        |  CAST(ROUND(v.value*100) AS BIGINT) AS r_value_cents
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY l_event_id, r_event_id""".stripMargin,
    // dedup collapses the injected duplicate copies exactly -> the
    // distinct source (event_id is unique in the generated table)
    "s_dedup" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |FROM events ORDER BY event_id""".stripMargin,
    // streaming-sketch replay: the batch bucket histogram — streaming
    // equals batch because the sketch is distributive by construction
    "s_quantile_sketch" ->
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events
        |), b AS (
        |  SELECT event_type,
        |    CASE WHEN cents <= 0 THEN 0
        |         WHEN length(bin(cents)) - 1 < 7 THEN cents
        |         ELSE (length(bin(cents)) - 1 - 7 + 1) * 128
        |              + ((cents >> (length(bin(cents)) - 1 - 7)) - 128)
        |    END AS bucket
        |  FROM v
        |)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM b GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,

    // stream-static ingest dedup replay: the plain anti-join (the
    // streaming execution is stateless, so batch == stream by design)
    "s_incremental_dedup" ->
      """WITH e AS (
        |  SELECT event_id,
        |    md5(coalesce(CAST(user_id AS VARCHAR), '') || '|' ||
        |        coalesce(event_type, '') || '|' ||
        |        coalesce(CAST(CAST(FLOOR(CAST(ROUND(value*100) AS BIGINT) / 1000.0)
        |          AS BIGINT) AS VARCHAR), '')) AS fp
        |  FROM events),
        |corpus AS (SELECT DISTINCT fp FROM e WHERE event_id % 2 = 0),
        |batch AS (SELECT event_id, fp FROM e WHERE event_id % 2 = 1)
        |SELECT event_id, fp FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
        |ORDER BY event_id""".stripMargin,
    // streaming-vocab replay: the stream folds the whole corpus into the
    // store, so the answer is the same full word count over documents
    // as t_incremental_vocab's — arrival-priced vs churn-priced, one
    // identity
    "s_incremental_vocab" ->
      """SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
        |    AS w
        |  FROM documents) t
        |WHERE w <> ''
        |GROUP BY w ORDER BY term""".stripMargin,
    // streaming table diff replay: the batch full-outer diff — streaming
    // equals batch because the per-key state is distributive counts+maxes
    "s_table_diff" ->
      """WITH e AS (
        |  SELECT event_id AS id, max(value) AS observed
        |  FROM events WHERE event_id % 97 <> 0 GROUP BY 1
        |), r AS (
        |  SELECT event_id AS id,
        |    max(CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END)
        |      AS expected
        |  FROM events WHERE event_id % 89 <> 0 GROUP BY 1
        |)
        |SELECT COALESCE(e.id, r.id) AS id,
        |  CASE WHEN r.id IS NULL THEN 'missing_in_reference'
        |       WHEN e.id IS NULL THEN 'missing_in_stream'
        |       ELSE 'differing' END AS kind,
        |  CAST(ROUND(observed*100) AS BIGINT) AS observed_cents,
        |  CAST(ROUND(expected*100) AS BIGINT) AS expected_cents
        |FROM e FULL OUTER JOIN r ON e.id = r.id
        |WHERE r.id IS NULL OR e.id IS NULL
        |   OR observed IS DISTINCT FROM expected
        |ORDER BY id""".stripMargin,
    "s_table_diff_multi" ->
      """WITH e AS (
        |  SELECT event_id AS id,
        |    max(CAST(CAST(ROUND(value*100) AS BIGINT) AS VARCHAR)) AS v_value,
        |    max(event_type) AS v_type
        |  FROM events WHERE event_id % 97 <> 0 GROUP BY 1
        |), r AS (
        |  SELECT event_id AS id,
        |    max(CAST(CAST(ROUND(value*100) AS BIGINT)
        |      + CASE WHEN event_id % 7 = 0 THEN 100 ELSE 0 END AS VARCHAR))
        |      AS v_value,
        |    max(CASE WHEN event_id % 11 = 0 THEN event_type || 'X'
        |             ELSE event_type END) AS v_type
        |  FROM events WHERE event_id % 89 <> 0 GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT COALESCE(e.id, r.id) AS id, 'event_type' AS column_name,
        |    CASE WHEN r.id IS NULL THEN 'missing_in_reference'
        |         WHEN e.id IS NULL THEN 'missing_in_stream'
        |         WHEN e.v_type IS DISTINCT FROM r.v_type THEN 'differing'
        |    END AS kind,
        |    e.v_type AS observed, r.v_type AS expected
        |  FROM e FULL OUTER JOIN r ON e.id = r.id
        |  UNION ALL
        |  SELECT COALESCE(e.id, r.id), 'value',
        |    CASE WHEN r.id IS NULL THEN 'missing_in_reference'
        |         WHEN e.id IS NULL THEN 'missing_in_stream'
        |         WHEN e.v_value IS DISTINCT FROM r.v_value THEN 'differing'
        |    END,
        |    e.v_value, r.v_value
        |  FROM e FULL OUTER JOIN r ON e.id = r.id
        |) WHERE kind IS NOT NULL
        |ORDER BY id, column_name""".stripMargin,
    // streaming drift replay: hourly event_type counts vs the whole
    // table's distribution, TVD in HUGEINT over the union of window and
    // reference terms (the reference here IS the full vocabulary, so the
    // window-only side is empty by construction); top term = argmax
    // deviation, ties by term ASC — identical integer math to the stream
    "s_drift" ->
      """WITH ref AS (
        |  SELECT event_type AS term, COUNT(*) AS rc FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1
        |), rt AS (SELECT SUM(rc) AS rtot FROM ref),
        |wc AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type AS term,
        |    COUNT(*) AS c
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), nw AS (SELECT ws, SUM(c) AS n FROM wc GROUP BY 1),
        |dev AS (
        |  SELECT nw.ws, r.term,
        |    ABS(CAST(COALESCE(wc.c, 0) AS HUGEINT) * rt.rtot
        |      - CAST(nw.n AS HUGEINT) * r.rc) AS absd
        |  FROM nw CROSS JOIN ref r CROSS JOIN rt
        |  LEFT JOIN wc ON wc.ws = nw.ws AND wc.term = r.term
        |), agg AS (
        |  SELECT ws, SUM(absd) AS sumabs FROM dev GROUP BY 1
        |), top AS (
        |  SELECT ws, term, absd, ROW_NUMBER() OVER (PARTITION BY ws
        |    ORDER BY absd DESC, term ASC) AS rn
        |  FROM dev
        |)
        |SELECT strftime(a.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(nw.n AS BIGINT) AS n_events,
        |  CAST((a.sumabs * 1000000)
        |    // (2 * CAST(nw.n AS HUGEINT) * rt.rtot) AS BIGINT) AS tvd_ppm,
        |  tp.term AS top_term,
        |  CAST((tp.absd * 1000000)
        |    // (CAST(nw.n AS HUGEINT) * rt.rtot) AS BIGINT) AS top_dev_ppm
        |FROM agg a JOIN nw ON nw.ws = a.ws CROSS JOIN rt
        |JOIN top tp ON tp.ws = a.ws AND tp.rn = 1
        |ORDER BY window_start""".stripMargin,
    "t_dedup_exact" ->
      """SELECT md5(text) AS text_hash,
        |  CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "t_text_stats" ->
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |  CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
        |  md5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // independent DuckDB reimplementation of the double arithmetic in
    // TextAnalysis.qualityScore/tokenEstimate/stopwordRatio; all literals
    // cast to DOUBLE (DuckDB parses bare 0.3 as DECIMAL) and the expression
    // tree shaped identically so the IEEE results agree bit-for-bit before
    // integer scaling
    "t_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(LENGTH(text) AS DOUBLE) AS n,
        |    CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS DOUBLE) AS toks,
        |    CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE) AS digits,
        |    CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS puncts,
        |    CAST(len(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
        |      t -> t IN ('the','a','an','of','to','in','and','is','it','that','for','on','with','as','was','at','by'))) AS DOUBLE) AS stops,
        |    CAST(len(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS DOUBLE) AS lowtoks,
        |    CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]', 0)) AS BIGINT) AS token_estimate
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id, token_estimate,
        |    CASE WHEN n >= CAST(50 AS DOUBLE) AND n <= CAST(20000 AS DOUBLE) THEN CAST(1.0 AS DOUBLE)
        |         WHEN n > 0 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS len_score,
        |    CASE WHEN (CASE WHEN toks > 0 THEN n / toks ELSE CAST(0.0 AS DOUBLE) END) >= CAST(2.5 AS DOUBLE)
        |          AND (CASE WHEN toks > 0 THEN n / toks ELSE CAST(0.0 AS DOUBLE) END) <= CAST(12.0 AS DOUBLE)
        |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.3 AS DOUBLE) END AS tok_len_score,
        |    CASE WHEN puncts / greatest(n, CAST(1.0 AS DOUBLE)) < CAST(0.2 AS DOUBLE)
        |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.2 AS DOUBLE) END AS punct_score,
        |    CASE WHEN digits / greatest(n, CAST(1.0 AS DOUBLE)) < CAST(0.3 AS DOUBLE)
        |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.3 AS DOUBLE) END AS digit_score,
        |    CASE WHEN (CASE WHEN lowtoks > 0 THEN stops / lowtoks ELSE CAST(0.0 AS DOUBLE) END) > CAST(0.01 AS DOUBLE)
        |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.6 AS DOUBLE) END AS stop_score,
        |    CASE WHEN lowtoks > 0 THEN stops / lowtoks ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio
        |  FROM q
        |)
        |SELECT doc_id,
        |  CAST(FLOOR((len_score * CAST(0.3 AS DOUBLE) + tok_len_score * CAST(0.2 AS DOUBLE)
        |    + punct_score * CAST(0.2 AS DOUBLE) + digit_score * CAST(0.15 AS DOUBLE)
        |    + stop_score * CAST(0.15 AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS quality_bp,
        |  token_estimate,
        |  CAST(FLOOR(stop_ratio * 1000000 + 0.5) AS BIGINT) AS stopword_ppm
        |FROM sc ORDER BY doc_id""".stripMargin,
    // rolling Karp-Rabin hash replayed in DuckDB: HUGEINT (int128)
    // arithmetic mod 2^64 == Java Long wraparound (unicode(c) == charAt
    // for BMP text; the corpus is ASCII), then mapped back to signed
    "t_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS s
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, s,
        |    CASE WHEN s = '' THEN CAST(1125899906842597 AS HUGEINT)
        |      ELSE list_reduce(
        |        list_prepend(CAST(1125899906842597 AS HUGEINT),
        |          list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |        (acc, c) -> (31 * acc + c) % CAST(18446744073709551616 AS HUGEINT)) END AS hu
        |  FROM norm
        |)
        |SELECT doc_id, md5(s) AS fp_md5,
        |  CAST(CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
        |       THEN hu - CAST(18446744073709551616 AS HUGEINT) ELSE hu END AS BIGINT) AS fp_roll
        |FROM h ORDER BY doc_id""".stripMargin,
    // language-ID heuristic replayed in SQL: script detection by codepoint
    // ranges (Java Character.UnicodeBlock equivalents), then stopword-
    // profile voting with alphabetical tie-break (matches the sorted
    // iteration in TextAnalysis.langId)
    "t_lang_id" ->
      """WITH b AS (
        |  SELECT doc_id, TRIM(text) = '' OR text IS NULL AS blank,
        |    length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS letters,
        |    length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}\x{3040}-\x{309F}\x{30A0}-\x{30FF}\x{AC00}-\x{D7A3}]', '', 'g')) AS cjk,
        |    length(regexp_replace(text, '[^\x{0400}-\x{04FF}]', '', 'g')) AS cyr,
        |    length(regexp_replace(text, '[^\x{0600}-\x{06FF}]', '', 'g')) AS ar,
        |    regexp_split_to_array(LOWER(text), '\s+') AS toks
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, blank, letters, cjk, cyr, ar,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','nicht','von','sie','ist','des','sich','mit','dem','ein','eine','zu'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','it','that','for','was','with','on','as','are','this'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','del','se','las','por','un','una','con','para'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','les','de','des','et','est','un','une','du','que','pour','dans','qui','sur'))) AS s_fr,
        |    len(list_filter(toks, t -> t IN ('il','di','che','la','e','per','un','del','con','non','una','sono','della','le','si'))) AS s_it,
        |    len(list_filter(toks, t -> t IN ('de','que','e','do','da','em','um','para','com','uma','os','no','na','por','mais'))) AS s_pt
        |  FROM b
        |)
        |SELECT doc_id,
        |  CASE WHEN blank THEN 'und'
        |       WHEN letters > 0 AND CAST(cjk AS DOUBLE) / letters > CAST(0.3 AS DOUBLE) THEN 'zh'
        |       WHEN letters > 0 AND CAST(cyr AS DOUBLE) / letters > CAST(0.3 AS DOUBLE) THEN 'ru'
        |       WHEN letters > 0 AND CAST(ar AS DOUBLE) / letters > CAST(0.3 AS DOUBLE) THEN 'ar'
        |       WHEN greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) = 0 THEN 'und'
        |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) THEN 'es'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) THEN 'fr'
        |       WHEN s_it = greatest(s_de, s_en, s_es, s_fr, s_it, s_pt) THEN 'it'
        |       ELSE 'pt' END AS lang_pred
        |FROM v ORDER BY doc_id""".stripMargin,
    "t_vector_stats" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(FLOOR(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') * 1000000 + 0.5) AS BIGINT) AS sq_sum_ppm,
        |  CAST(FLOOR(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * 1000000 + 0.5) AS BIGINT) AS l2_ppm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // exact brute-force oracle for the brute-force ANN query: same cosine
    // formula as CosineSim (dot / (sqrt(na)*sqrt(nb)) over doubles), same
    // deterministic tie-break (corpus_id)
    // ranking by the engine-exact integer cosine key (cosKeyCtes mirror
    // of intCosRankKey); the double cosine survives as a ppm DISPLAY
    // column only — no fold feeds any ORDER BY (closes the last Class 2b
    // verified-by-measurement ranking dependence)
    "t_ann_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
        |    ${qvecSql("embedding")} AS qq
        |  FROM embeddings WHERE vec_id < 10
        |), c AS (
        |  SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv,
        |    ${qvecSql("embedding")} AS qc
        |  FROM embeddings
        |), s AS (
        |  SELECT query_id, corpus_id,
        |    list_dot_product(qv, cv) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine,
        |    ${idotSql("qq", "qc")} AS dot,
        |    ${idotSql("qq", "qq")} AS na,
        |    ${idotSql("qc", "qc")} AS nb
        |  FROM q CROSS JOIN c WHERE corpus_id <> query_id
        |), ${cosKeyCtes("t", "s", "query_id, corpus_id, cosine")}, r AS (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos_key DESC NULLS LAST, corpus_id) AS BIGINT) AS rank
        |  FROM tkey
        |)
        |SELECT query_id, corpus_id,
        |  CAST(FLOOR(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_ppm, rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the decoded-pixel oracle: the 8x8 BMP pixels are charAt(i % len)&0xFF
    // by construction, so brightness (mean/255) and sharpness (mean
    // |horizontal gradient|/255) have closed forms over the text — if the
    // ImageIO encode+decode round-trip did anything lossy this mismatches
    "t_media_features" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(text) = 0
        |         THEN list_transform(range(0, 64), i -> 0)
        |         ELSE [unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256
        |               FOR i IN range(0, 64)]
        |    END AS p
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(list_aggregate(p, 'sum') AS DOUBLE) AS gray_sum,
        |    CAST(list_aggregate([abs(p[i] - p[i-1]) FOR i IN range(2, 65) IF (i - 1) % 8 != 0],
        |      'sum') AS DOUBLE) AS diff_sum
        |  FROM px
        |)
        |SELECT doc_id AS media_id,
        |  CAST(8 AS INTEGER) AS decoded_w, CAST(8 AS INTEGER) AS decoded_h,
        |  CAST(FLOOR(gray_sum / 64 / CAST(255.0 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS brightness_ppm,
        |  CAST(FLOOR(diff_sum / 56 / CAST(255.0 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sharpness_ppm
        |FROM f ORDER BY media_id""".stripMargin,
    // difflib ratio is not SQL-expressible, but the comparison IS oracle-
    // checkable through a precomputed CPython-difflib fixture keyed by the
    // (categorical) value pair — valid at any SF because the priority
    // domain is fixed. Null semantics per the reference: both-null match,
    // one-null differs (ratio -1).
    "v_diff_string_fuzzy" ->
      s"""$pairCte
         |SELECT db1.id, db1.o_orderpriority AS check_first, db2.o_orderpriority AS check_second
         |FROM db1 JOIN db2 ON db1.id = db2.id
         |LEFT JOIN read_parquet('$repoRoot/src/test/resources/difflib_ratios.parquet') r
         |  ON db1.o_orderpriority = r.a AND db2.o_orderpriority = r.b
         |WHERE CASE
         |  WHEN db1.o_orderpriority IS NULL AND db2.o_orderpriority IS NULL THEN FALSE
         |  WHEN db1.o_orderpriority IS NULL OR db2.o_orderpriority IS NULL THEN TRUE
         |  ELSE r.ratio < CAST(0.9 AS DOUBLE) END
         |ORDER BY 1""".stripMargin,

    "q_skew_naive" -> skewOracle,
    "q_skew_salted" -> skewOracle,

    // full LSH replay: signatures, banding, capped buckets, candidate
    // pairs, then estimated jaccard = agreeing components / 64
    "t_minhash_pairs" -> minhashPairsSql,
    // the stored-signature surfaces emit the identical pair set — the
    // churn-priced store (seeded from a restated prior corpus, then
    // maintained to the current one) and the arrival-priced append
    // store are both invisible to the oracle
    "t_minhash_incremental" -> minhashPairsSql,
    "s_minhash_pairs" -> minhashPairsSql,

    // persistent seen-set: survivors are the first occurrence of each
    // md5-of-normalized-text fingerprint — earliest batch (doc_id % 3),
    // min doc_id within it; the store lifecycle (batch folds, one
    // compaction, one fenced replay) is invisible to the rule
    "t_seen_incremental" ->
      """WITH seen_all AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id, text FROM documents WHERE doc_id < 10
        |), keyed AS (
        |  SELECT doc_id, doc_id % 3 AS b,
        |    md5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fp
        |  FROM seen_all
        |), ranked AS (
        |  SELECT doc_id, fp,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY b, doc_id) AS rn
        |  FROM keyed
        |)
        |SELECT doc_id, fp FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // exact word-3-gram jaccard over the LSH candidates: shingle-hash SETS
    // of the RAW text (Dedup.ngramJaccard shingles unnormalized input;
    // rtrim emulates Java split(" ") dropping trailing empties)
    "t_ngram_jaccard" ->
      s"""WITH $minhashCtes, rtok AS (
         |  SELECT doc_id, text, string_split(rtrim(text, ' '), ' ') AS toks FROM corpus
         |), rshingle_str AS (
         |  SELECT doc_id, unnest(CASE
         |    WHEN len(toks) < 3 THEN (CASE WHEN text = '' THEN CAST([] AS VARCHAR[]) ELSE [text] END)
         |    ELSE [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' FOR i IN range(1, len(toks) - 1)]
         |  END) AS sh FROM rtok
         |), rsets AS (
         |  SELECT doc_id, list_distinct(list(${fnvSql("sh")})) AS hs FROM rshingle_str GROUP BY doc_id
         |), rsets_full AS (
         |  SELECT n.doc_id, coalesce(r.hs, CAST([] AS HUGEINT[])) AS hs
         |  FROM norm n LEFT JOIN rsets r ON r.doc_id = n.doc_id
         |)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT c.id_a, c.id_b,
         |    CASE WHEN len(a.hs) = 0 AND len(b.hs) = 0 THEN CAST(1.0 AS DOUBLE)
         |         WHEN len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) = 0 THEN CAST(1.0 AS DOUBLE)
         |         ELSE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
         |              / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) END AS jaccard
         |  FROM cand c JOIN rsets_full a ON a.doc_id = c.id_a JOIN rsets_full b ON b.doc_id = c.id_b) j
         |WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // connected components over the LSH candidate pairs as a recursive
    // transitive closure: each node labeled with the min reachable id —
    // exactly Dedup.connectedComponents' fixpoint
    "t_dedup_groups" ->
      s"""WITH RECURSIVE $minhashCtes, nodes AS (
         |  SELECT DISTINCT id FROM (SELECT id_a AS id FROM cand UNION ALL SELECT id_b FROM cand) u
         |), cedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM cand UNION SELECT id_b, id_a FROM cand
         |), reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.r FROM reach r JOIN cedges e ON e.src = r.id
         |), comp AS (
         |  SELECT id, MIN(r) AS component FROM reach GROUP BY id
         |)
         |SELECT component, COUNT(*) AS group_size FROM comp
         |GROUP BY component ORDER BY component""".stripMargin,

    // dedup finisher replay: the t_dedup_groups closure + keep the
    // highest-score (longest) member per component; unpaired docs are
    // singleton groups via the left-join coalesce
    "t_dedup_keep" ->
      s"""WITH RECURSIVE $minhashCtes, nodes AS (
         |  SELECT DISTINCT id FROM (SELECT id_a AS id FROM cand UNION ALL SELECT id_b FROM cand) u
         |), cedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM cand UNION SELECT id_b, id_a FROM cand
         |), reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.r FROM reach r JOIN cedges e ON e.src = r.id
         |), comp AS (
         |  SELECT id, MIN(r) AS component FROM reach GROUP BY id
         |), scored AS (
         |  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS score FROM corpus
         |), lab AS (
         |  SELECT s.doc_id, COALESCE(c.component, s.doc_id) AS component, s.score
         |  FROM scored s LEFT JOIN comp c ON c.id = s.doc_id
         |)
         |SELECT component, doc_id AS keep_id, score FROM (
         |  SELECT lab.*, ROW_NUMBER() OVER (
         |    PARTITION BY component ORDER BY score DESC, doc_id) AS r FROM lab) t
         |WHERE r = 1 ORDER BY component""".stripMargin,

    // per-source MinHashAgg signature, component-wise: min over every
    // permuted shingle hash of the source's documents
    "t_minhash_group_sig" ->
      s"""WITH ${shinglePermCtes("source", "documents")}
         |SELECT source, CAST(i AS INTEGER) AS hash_idx, CAST(MIN(p) AS BIGINT) AS sig_value
         |FROM perm GROUP BY source, i ORDER BY source, hash_idx""".stripMargin,

    // simhash replay: per-token FNV, 64 weighted bit votes, 4x16-bit block
    // buckets (capped w/ star fallback), hamming via bit_count over the
    // signed two's-complement views
    "t_simhash_pairs" ->
      s"""WITH $corpusCte, norm AS (
         |  SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')) AS s FROM corpus
         |), stok AS (
         |  SELECT doc_id, unnest(string_split(s, ' ')) AS tok FROM norm
         |), tokh AS (
         |  SELECT doc_id, ${fnvSql("tok")} AS h FROM stok
         |), bitw AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN (h // (CAST(1 AS HUGEINT) << CAST(b AS INTEGER))) % 2 = 1 THEN 1 ELSE -1 END) AS w
         |  FROM tokh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bs
         |  GROUP BY doc_id, b
         |), sim AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN w > 0 THEN (CAST(1 AS HUGEINT) << CAST(b AS INTEGER)) ELSE CAST(0 AS HUGEINT) END) AS sim_u
         |  FROM bitw GROUP BY doc_id
         |), sblock AS (
         |  SELECT doc_id, sim_u, bi, (sim_u // (CAST(1 AS HUGEINT) << CAST(16*bi AS INTEGER))) % 65536 AS bval
         |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS bi) bs
         |), sbucketed AS (
         |  SELECT bi, bval, doc_id AS id, sim_u,
         |    COUNT(*) OVER (PARTITION BY bi, bval) AS bsz,
         |    MIN(doc_id) OVER (PARTITION BY bi, bval) AS bmin
         |  FROM sblock
         |), spairs AS (
         |  SELECT x.id AS id_a, y.id AS id_b, x.sim_u AS ua, y.sim_u AS ub
         |  FROM sbucketed x JOIN sbucketed y ON x.bi = y.bi AND x.bval = y.bval AND x.id < y.id
         |  WHERE x.bsz <= 256
         |  UNION
         |  SELECT m.id, o.id, m.sim_u, o.sim_u
         |  FROM sbucketed o JOIN sbucketed m ON m.bi = o.bi AND m.bval = o.bval AND m.id = o.bmin
         |  WHERE o.bsz > 256 AND o.id <> o.bmin
         |)
         |SELECT id_a, id_b, CAST(MIN(hamming) AS INTEGER) AS hamming FROM (
         |  SELECT id_a, id_b, bit_count(xor(${signedSql("ua")}, ${signedSql("ub")})) AS hamming
         |  FROM spairs) p
         |WHERE hamming <= 3
         |GROUP BY id_a, id_b
         |ORDER BY id_a, id_b""".stripMargin,

    // image near-dup replay: closed-form pixels (BMP is lossless, the
    // generated grid is char codes mod 256), wrap-around dHash bits in
    // HUGEINT, then the same block-trick bucketing as t_simhash_pairs
    "t_image_neardup" ->
      s"""WITH icorpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10
         |  UNION ALL
         |  SELECT doc_id + 200000,
         |    substring(text, 1, 10) || 'Q' || substring(text, 12)
         |  FROM documents WHERE doc_id < 10
         |), px AS (
         |  SELECT doc_id,
         |    CASE WHEN text IS NULL OR length(text) = 0
         |         THEN list_transform(range(0, 64), i -> 0)
         |         ELSE [unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256
         |               FOR i IN range(0, 64)]
         |    END AS p
         |  FROM icorpus
         |), rc AS (
         |  SELECT a.r, b.c FROM (SELECT unnest(range(0, 8)) AS r) a
         |  CROSS JOIN (SELECT unnest(range(0, 8)) AS c) b
         |), dh AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN p[CAST(r*8+c AS INTEGER) + 1] > p[CAST(r*8+((c+1)%8) AS INTEGER) + 1]
         |         THEN (CAST(1 AS HUGEINT) << CAST(r*8+c AS INTEGER)) ELSE CAST(0 AS HUGEINT) END) AS dh_u
         |  FROM px CROSS JOIN rc GROUP BY doc_id
         |), sblock AS (
         |  SELECT doc_id, dh_u, bi, (dh_u // (CAST(1 AS HUGEINT) << CAST(16*bi AS INTEGER))) % 65536 AS bval
         |  FROM dh CROSS JOIN (SELECT unnest(range(0, 4)) AS bi) bs
         |), sbucketed AS (
         |  SELECT bi, bval, doc_id AS id, dh_u,
         |    COUNT(*) OVER (PARTITION BY bi, bval) AS bsz,
         |    MIN(doc_id) OVER (PARTITION BY bi, bval) AS bmin
         |  FROM sblock
         |), spairs AS (
         |  SELECT x.id AS id_a, y.id AS id_b, x.dh_u AS ua, y.dh_u AS ub
         |  FROM sbucketed x JOIN sbucketed y ON x.bi = y.bi AND x.bval = y.bval AND x.id < y.id
         |  WHERE x.bsz <= 256
         |  UNION
         |  SELECT m.id, o.id, m.dh_u, o.dh_u
         |  FROM sbucketed o JOIN sbucketed m ON m.bi = o.bi AND m.bval = o.bval AND m.id = o.bmin
         |  WHERE o.bsz > 256 AND o.id <> o.bmin
         |)
         |SELECT id_a, id_b, CAST(MIN(hamming) AS INTEGER) AS hamming FROM (
         |  SELECT id_a, id_b, bit_count(xor(${signedSql("ua")}, ${signedSql("ub")})) AS hamming
         |  FROM spairs) p
         |WHERE hamming <= 3
         |GROUP BY id_a, id_b
         |ORDER BY id_a, id_b""".stripMargin,

    // audio near-dup replay: 256 samples = char codes mod 256 (WAV PCM is
    // lossless), 64 integer frame energies, wrap-around sign bits, then
    // the same block-trick bucketing as t_simhash_pairs
    "t_audio_neardup" ->
      s"""WITH acorpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10
         |  UNION ALL
         |  SELECT doc_id + 200000,
         |    substring(text, 1, 10) || 'Q' || substring(text, 12)
         |  FROM documents WHERE doc_id < 10
         |), samples AS (
         |  SELECT doc_id, i,
         |    CASE WHEN text IS NULL OR length(text) = 0 THEN -128
         |         ELSE unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256 - 128
         |    END AS k
         |  FROM acorpus CROSS JOIN (SELECT unnest(range(0, 256)) AS i) ii
         |), frames AS (
         |  SELECT doc_id, i // 4 AS f, SUM(k * k) AS e FROM samples GROUP BY 1, 2
         |), ah AS (
         |  SELECT a.doc_id,
         |    SUM(CASE WHEN a.e > b.e THEN (CAST(1 AS HUGEINT) << CAST(a.f AS INTEGER))
         |             ELSE CAST(0 AS HUGEINT) END) AS ah_u
         |  FROM frames a JOIN frames b
         |    ON a.doc_id = b.doc_id AND b.f = (a.f + 1) % 64
         |  GROUP BY a.doc_id
         |), sblock AS (
         |  SELECT doc_id, ah_u, bi, (ah_u // (CAST(1 AS HUGEINT) << CAST(16*bi AS INTEGER))) % 65536 AS bval
         |  FROM ah CROSS JOIN (SELECT unnest(range(0, 4)) AS bi) bs
         |), sbucketed AS (
         |  SELECT bi, bval, doc_id AS id, ah_u,
         |    COUNT(*) OVER (PARTITION BY bi, bval) AS bsz,
         |    MIN(doc_id) OVER (PARTITION BY bi, bval) AS bmin
         |  FROM sblock
         |), spairs AS (
         |  SELECT x.id AS id_a, y.id AS id_b, x.ah_u AS ua, y.ah_u AS ub
         |  FROM sbucketed x JOIN sbucketed y ON x.bi = y.bi AND x.bval = y.bval AND x.id < y.id
         |  WHERE x.bsz <= 256
         |  UNION
         |  SELECT m.id, o.id, m.ah_u, o.ah_u
         |  FROM sbucketed o JOIN sbucketed m ON m.bi = o.bi AND m.bval = o.bval AND m.id = o.bmin
         |  WHERE o.bsz > 256 AND o.id <> o.bmin
         |)
         |SELECT id_a, id_b, CAST(MIN(hamming) AS INTEGER) AS hamming FROM (
         |  SELECT id_a, id_b, bit_count(xor(${signedSql("ua")}, ${signedSql("ub")})) AS hamming
         |  FROM spairs) p
         |WHERE hamming <= 3
         |GROUP BY id_a, id_b
         |ORDER BY id_a, id_b""".stripMargin,

    // hyperplane-LSH ANN replay: 4 tables x 8 bits of splitmix plane signs,
    // bucket = bit-packed dot signs, candidates = any shared (table,
    // bucket), exact cosine + deterministic rank over the candidate set
    "t_ann_lsh" ->
      s"""WITH ${signsCtes(32)}, dots AS (
         |  SELECT e.vec_id, sp.p, ${sigDotSql("e.embedding", "sp.sl")} AS dot
         |  FROM embeddings e CROSS JOIN signlists sp
         |), sigs AS (
         |  SELECT vec_id, p // 8 AS tb,
         |    CAST(SUM(CASE WHEN dot >= 0 THEN (1 << (p % 8)) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id, p // 8
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
         |  FROM sigs q JOIN sigs c ON q.tb = c.tb AND q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
         |), scored AS (
         |  SELECT cd.query_id, cd.corpus_id,
         |    ${cosineSql("qe.embedding", "ce.embedding")} AS cosine,
         |    ${idotSql(s"${qvecSql("qe.embedding")}", s"${qvecSql("ce.embedding")}")} AS dot,
         |    ${idotSql(s"${qvecSql("qe.embedding")}", s"${qvecSql("qe.embedding")}")} AS na,
         |    ${idotSql(s"${qvecSql("ce.embedding")}", s"${qvecSql("ce.embedding")}")} AS nb
         |  FROM cand cd
         |  JOIN embeddings qe ON qe.vec_id = cd.query_id
         |  JOIN embeddings ce ON ce.vec_id = cd.corpus_id
         |), ${cosKeyCtes("h", "scored", "query_id, corpus_id, cosine")}, ranked AS (
         |  SELECT query_id, corpus_id, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_key DESC NULLS LAST, corpus_id) AS BIGINT) AS rank
         |  FROM hkey
         |)
         |SELECT query_id, corpus_id, CAST(FLOOR(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_ppm, rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // IVF replay — the full trained index, integer fit: q24-quantized
    // components, exact-BIGINT squared-L2 Voronoi assignment, the
    // DISTRIBUTIVE integer Lloyd mean (order-independent sums, half-up
    // integer mean — the reason ivfFit needs no collect_list), then
    // nprobe=3 integer-argmin probing and exact cosine top-5 over the
    // probed candidates only (ranking margins measured: ORACLES.md 2b)
    "t_ann_ivf" ->
      s"""WITH qe AS (
         |  SELECT vec_id, embedding, ${qvecSql("embedding")} AS qv FROM embeddings
         |), ${qLloydCtes("v1", "qe", "vec_id", 16)}, cell_corpus AS (
         |  SELECT cent_id, corpus_id, cvec FROM (
         |    SELECT c.cent_id, e.vec_id AS corpus_id, e.embedding AS cvec,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${isqSql("e.qv", "c.qc")}, c.cent_id) AS r
         |    FROM qe e CROSS JOIN v1cents c) a
         |  WHERE r = 1
         |), cell_queries AS (
         |  SELECT cent_id, query_id, qvec FROM (
         |    SELECT c.cent_id, e.vec_id AS query_id, e.embedding AS qvec,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${isqSql("e.qv", "c.qc")}, c.cent_id) AS r
         |    FROM qe e CROSS JOIN v1cents c
         |    WHERE e.vec_id < 10) a
         |  WHERE r <= 3
         |), scored AS (
         |  SELECT q.query_id, c.corpus_id, ${cosineSql("q.qvec", "c.cvec")} AS cosine,
         |    ${idotSql(s"${qvecSql("q.qvec")}", s"${qvecSql("c.cvec")}")} AS dot,
         |    ${idotSql(s"${qvecSql("q.qvec")}", s"${qvecSql("q.qvec")}")} AS na,
         |    ${idotSql(s"${qvecSql("c.cvec")}", s"${qvecSql("c.cvec")}")} AS nb
         |  FROM cell_queries q JOIN cell_corpus c ON q.cent_id = c.cent_id
         |  WHERE c.corpus_id <> q.query_id
         |), ${cosKeyCtes("v", "scored", "query_id, corpus_id, cosine")}, ranked AS (
         |  SELECT query_id, corpus_id, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_key DESC NULLS LAST, corpus_id) AS BIGINT) AS rank
         |  FROM vkey
         |)
         |SELECT query_id, corpus_id, CAST(FLOOR(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_ppm, rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // PQ/ADC replay — the full trained index: per-subspace seed sample
    // (shared deterministic corpus sample, subvector per subspace), one
    // integer Lloyd refinement, the integer codeword means, re-assignment
    // (= the code table), the query LUT, and the integer ADC sum
    "t_ann_pq" -> pqAdcQuerySql(4, 16, 16),

    // the stored-index path (pqIndexWrite + pqSearchIndexed) is the SAME
    // trained artifact searched from tables instead of in-flight frames —
    // byte-identical output by construction, so the oracle is identical
    "t_ann_pq_indexed" -> pqAdcQuerySql(4, 16, 16),
    // the churn-priced state answers for the CURRENT corpus under books
    // fit on the current corpus — exactly what this replay re-derives;
    // the intermediate churn/maintain cycles are invisible by identity
    "t_ann_pq_incremental" -> pqAdcQuerySql(4, 16, 16),
    // the STREAMED code store under bootstrap-fit books answers the
    // same ADC search — same replay, the append state is invisible
    "s_ann_pq" -> pqAdcQuerySql(4, 16, 16),

    // PQ re-rank replay: the same trained index at m=8/ksub=32, the ADC
    // 200-candidate shortlist, then the exact cosine top-5 over ONLY the
    // shortlisted vectors — the two-stage retrieval contract
    "t_ann_pq_rerank" ->
      s"""WITH ${pqIndexCtes(8, 8, 32)}, ad AS (
         |  SELECT l.query_id, c.corpus_id, SUM(l.qd) AS adist
         |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |  WHERE c.corpus_id <> l.query_id
         |  GROUP BY l.query_id, c.corpus_id
         |), short AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY adist, corpus_id) AS r
         |    FROM ad) t WHERE r <= 200
         |), rr AS (
         |  SELECT s.query_id, s.corpus_id,
         |    ${cosineSql("qe.embedding", "ce.embedding")} AS cosine,
         |    ${idotSql(s"${qvecSql("qe.embedding")}", s"${qvecSql("ce.embedding")}")} AS dot,
         |    ${idotSql(s"${qvecSql("qe.embedding")}", s"${qvecSql("qe.embedding")}")} AS na,
         |    ${idotSql(s"${qvecSql("ce.embedding")}", s"${qvecSql("ce.embedding")}")} AS nb
         |  FROM short s
         |  JOIN embeddings qe ON qe.vec_id = s.query_id
         |  JOIN embeddings ce ON ce.vec_id = s.corpus_id
         |), ${cosKeyCtes("z", "rr", "query_id, corpus_id, cosine")}, ranked AS (
         |  SELECT query_id, corpus_id, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_key DESC NULLS LAST, corpus_id) AS BIGINT) AS rank
         |  FROM zkey
         |)
         |SELECT query_id, corpus_id,
         |  CAST(FLOOR(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_ppm, rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // embedding near-dup replay: 8-bit hyperplane bucket collision, the
    // EXACT integer cosine-threshold test (95/100, HUGEINT cross-multiply
    // on q24 components — pair membership cannot flip on a double fold)
    // within buckets; the emitted cosine_ppm is full-precision display
    // (margins measured: ORACLES.md 2b). The perturbed copies' float
    // multiply is bit-identical in DuckDB (exact 48-bit product rounds
    // the same way). Buckets over 64 members replay the min-id star
    // fallback (the embeddingNearDups skew guard), mirroring the
    // t_simhash_pairs oracle
    "t_embed_neardup" ->
      s"""WITH ${signsCtes(8)}, corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |    list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN CAST(x * CAST(1.05 AS REAL) AS REAL) ELSE x END)
         |  FROM embeddings WHERE vec_id < 10
         |), qn AS (
         |  SELECT vec_id, embedding, qv, ${idotSql("qv", "qv")} AS nn
         |  FROM (SELECT vec_id, embedding, ${qvecSql("embedding")} AS qv FROM corpus) t
         |), dots AS (
         |  SELECT e.vec_id, sp.p, ${sigDotSql("e.embedding", "sp.sl")} AS dot
         |  FROM corpus e CROSS JOIN signlists sp
         |), sigs AS (
         |  SELECT vec_id, CAST(SUM(CASE WHEN dot >= 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id
         |), bucketed AS (
         |  SELECT vec_id, bucket,
         |    COUNT(*) OVER (PARTITION BY bucket) AS bsz,
         |    MIN(vec_id) OVER (PARTITION BY bucket) AS bmin
         |  FROM sigs
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE a.bsz <= 64
         |  UNION ALL
         |  SELECT m.vec_id, o.vec_id
         |  FROM bucketed o JOIN bucketed m
         |    ON m.bucket = o.bucket AND m.vec_id = o.bmin
         |  WHERE o.bsz > 64 AND o.vec_id <> o.bmin
         |), scored AS (
         |  SELECT p.id_a, p.id_b,
         |    ${cosineSql("ea.embedding", "eb.embedding")} AS cosine,
         |    ${idotSql("ea.qv", "eb.qv")} AS dot, ea.nn AS na, eb.nn AS nb
         |  FROM pairs p
         |  JOIN qn ea ON ea.vec_id = p.id_a
         |  JOIN qn eb ON eb.vec_id = p.id_b
         |)
         |SELECT id_a, id_b, CAST(FLOOR(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_ppm
         |FROM scored WHERE ${intCosGteSql("dot", "na", "nb", 95, 100)}
         |ORDER BY id_a, id_b""".stripMargin,

    // resized-pixel oracle: source pixels are charAt(i % len)&0xFF (see
    // t_media_features); the 4x4 result is the closed-form 2x2 box average
    // (integer floor, per Multimodal.boxResample), then the same
    // brightness/sharpness forms over 16 pixels / 12 horizontal gradients
    "t_media_resize" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(text) = 0
        |         THEN list_transform(range(0, 64), i -> 0)
        |         ELSE [unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256
        |               FOR i IN range(0, 64)]
        |    END AS p
        |  FROM documents
        |), rp AS (
        |  SELECT doc_id,
        |    [ (p[CAST(8*((i//4)*2) + ((i%4)*2) + 1 AS INTEGER)]
        |     + p[CAST(8*((i//4)*2) + ((i%4)*2) + 2 AS INTEGER)]
        |     + p[CAST(8*((i//4)*2+1) + ((i%4)*2) + 1 AS INTEGER)]
        |     + p[CAST(8*((i//4)*2+1) + ((i%4)*2) + 2 AS INTEGER)]) // 4
        |      FOR i IN range(0, 16)] AS v
        |  FROM px
        |), f AS (
        |  SELECT doc_id,
        |    CAST(list_aggregate(v, 'sum') AS DOUBLE) AS gray_sum,
        |    CAST(list_aggregate([abs(v[i] - v[i-1]) FOR i IN range(2, 17) IF (i - 1) % 4 != 0],
        |      'sum') AS DOUBLE) AS diff_sum
        |  FROM rp
        |)
        |SELECT doc_id AS media_id,
        |  CAST(4 AS INTEGER) AS decoded_w, CAST(4 AS INTEGER) AS decoded_h,
        |  CAST(FLOOR(gray_sum / 16 / CAST(255.0 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS brightness_ppm,
        |  CAST(FLOOR(diff_sum / 12 / CAST(255.0 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sharpness_ppm
        |FROM f ORDER BY media_id""".stripMargin,

    // decontamination replay: distinct 8-gram FNV shingle sets, benchmark
    // set = union of doc_id < 5 shingles, per-doc overlap counts
    "t_contamination" ->
      s"""WITH cnorm AS (
         |  SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')) AS s FROM documents
         |), ctok AS (
         |  SELECT doc_id, s, string_split(s, ' ') AS toks FROM cnorm
         |), sh8 AS (
         |  SELECT doc_id, unnest(CASE
         |    WHEN s = '' THEN CAST([] AS VARCHAR[])
         |    WHEN len(toks) < 8 THEN [s]
         |    ELSE [toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7]||' '
         |          FOR i IN range(1, len(toks) - 6)]
         |  END) AS shs FROM ctok
         |), dsh AS (
         |  SELECT DISTINCT doc_id, ${fnvSql("shs")} AS h FROM sh8
         |), bench AS (
         |  SELECT DISTINCT h FROM dsh WHERE doc_id < 5
         |)
         |SELECT d.doc_id AS id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(CASE WHEN SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) > 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM dsh d LEFT JOIN bench b ON d.h = b.h
         |GROUP BY d.doc_id ORDER BY id""".stripMargin,

    // redaction replay: same RE2-compatible patterns, same injected PII,
    // md5 over the byte-identical redacted text
    "t_redact" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
         |           || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
         |      ELSE text END AS t
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${graft.ops.Curation.EmailRe}', 0)) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${graft.ops.Curation.Ipv4Re}', 0)) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(t, '${graft.ops.Curation.EmailRe}', '<EMAIL>', 'g'),
         |      '${graft.ops.Curation.Ipv4Re}', '<IP>', 'g')) AS redacted_md5
         |FROM aug ORDER BY doc_id""".stripMargin,

    // split replay: Spark xxhash64 (XXH64 of the 8-byte long, seed 42)
    // recomputed stage by stage, then pmod 10000 against the cumulative
    // basis-point thresholds
    "t_split" ->
      s"""WITH ${xxhash64Ctes("doc_id", "documents")},
         |b AS (SELECT doc_id, ((h % 10000) + 10000) % 10000 AS split_bucket FROM xxh)
         |SELECT doc_id, CAST(split_bucket AS BIGINT) AS split_bucket,
         |  CASE WHEN split_bucket < 9000 THEN 'train'
         |       WHEN split_bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    // leakage-safe split replay: the t_dedup_groups component closure,
    // group key = component (own id for singletons), then the same
    // xxhash64 bucket replay as t_split over the GROUP key
    "t_split_safe" ->
      s"""WITH RECURSIVE $minhashCtes, nodes AS (
         |  SELECT DISTINCT id FROM (SELECT id_a AS id FROM cand UNION ALL SELECT id_b FROM cand) u
         |), cedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM cand UNION SELECT id_b, id_a FROM cand
         |), reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.r FROM reach r JOIN cedges e ON e.src = r.id
         |), comp AS (
         |  SELECT id, MIN(r) AS component FROM reach GROUP BY id
         |), lab AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS split_group
         |  FROM corpus d LEFT JOIN comp c ON c.id = d.doc_id
         |), grp AS (SELECT DISTINCT split_group FROM lab),
         |${xxhash64Ctes("split_group", "grp")},
         |b AS (
         |  SELECT l.doc_id, l.split_group,
         |    ((x.h % 10000) + 10000) % 10000 AS split_bucket
         |  FROM lab l JOIN xxh x ON x.split_group = l.split_group
         |)
         |SELECT doc_id, split_group, CAST(split_bucket AS BIGINT) AS split_bucket,
         |  CASE WHEN split_bucket < 9000 THEN 'train'
         |       WHEN split_bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    // shard replay: the same xxhash64 HUGEINT chain as t_split; shard =
    // pmod(h, 8), position = within-shard (h, doc_id) rank
    "t_shards" ->
      s"""WITH ${xxhash64Ctes("doc_id", "documents")},
         |b AS (SELECT doc_id, ((h % 8) + 8) % 8 AS shard, h FROM xxh)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    - 1 AS BIGINT) AS pos
         |FROM b ORDER BY doc_id""".stripMargin,

    // Gopher-rule replay: the same cross-multiplied integer tests over
    // DuckDB list ops (boundaries inclusive on the passing side)
    "t_gopher" ->
      """WITH d AS (
        |  SELECT doc_id, COALESCE(text, '') AS t FROM documents
        |), w AS (
        |  SELECT doc_id, t,
        |    list_filter(regexp_split_to_array(t, '\s+'),
        |      x -> x <> '') AS words,
        |    list_filter(regexp_split_to_array(t, '\n'),
        |      l -> trim(l) <> '') AS lines
        |  FROM d
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(COALESCE(list_sum(list_transform(words,
        |      x -> length(x))), 0) AS BIGINT) AS total_chars,
        |    CAST(length(t) - length(replace(t, '#', ''))
        |      AS BIGINT) AS hashes,
        |    CAST((length(t) - length(replace(t, '...', ''))) // 3
        |      AS BIGINT) AS ellipses,
        |    CAST(len(list_filter(lines, l -> starts_with(trim(l), '-')
        |      OR starts_with(trim(l), '*') OR starts_with(trim(l), '•')))
        |      AS BIGINT) AS bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(trim(l), '...')))
        |      AS BIGINT) AS ellipsis_lines,
        |    CAST(len(list_filter(words, x -> regexp_matches(x,
        |      '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        |    (CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'the') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'be') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'to') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'of') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'and') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'that') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'have') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words,
        |       x -> lower(x)), 'with') THEN 1 ELSE 0 END) AS stop_hits
        |  FROM w
        |)
        |SELECT doc_id, n_words, n_lines,
        |  n_words >= 50 AND n_words <= 100000 AS r_word_count,
        |  n_words > 0 AND 3 * n_words <= total_chars
        |    AND total_chars <= 10 * n_words AS r_mean_word_len,
        |  hashes * 10 <= n_words AND ellipses * 10 <= n_words
        |    AS r_symbol_ratio,
        |  bullet_lines * 10 <= n_lines * 9 AS r_bullet_lines,
        |  ellipsis_lines * 10 <= n_lines * 3 AS r_ellipsis_lines,
        |  alpha_words * 5 >= n_words * 4 AS r_alpha_words,
        |  stop_hits >= 2 AS r_stopwords,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (n_words > 0 AND 3 * n_words <= total_chars
        |      AND total_chars <= 10 * n_words)
        |    AND hashes * 10 <= n_words AND ellipses * 10 <= n_words
        |    AND bullet_lines * 10 <= n_lines * 9
        |    AND ellipsis_lines * 10 <= n_lines * 3
        |    AND alpha_words * 5 >= n_words * 4
        |    AND stop_hits >= 2 AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

    // corpus-drift replay: same raw-space tokenization, per-source TVD
    // vs the corpus distribution in HUGEINT (absent terms folded in via
    // the N_s*(N - sum nct) closed form, exactly as the Spark side);
    // top term = argmax |dev|, ties by term ASC
    "t_corpus_drift" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE source IS NOT NULL
        |), st AS (
        |  SELECT source, term, COUNT(*) AS nst FROM toks GROUP BY 1, 2
        |), ct AS (SELECT term, SUM(nst) AS nct FROM st GROUP BY 1),
        |ns AS (SELECT source, SUM(nst) AS nsz FROM st GROUP BY 1),
        |nc AS (SELECT SUM(nst) AS ncz FROM st),
        |dev AS (
        |  SELECT s.source, s.term, c.nct,
        |    ABS(CAST(s.nst AS HUGEINT) * nc.ncz
        |      - CAST(n.nsz AS HUGEINT) * c.nct) AS absd
        |  FROM st s JOIN ct c USING (term) JOIN ns n USING (source) CROSS JOIN nc
        |), agg AS (
        |  SELECT source, SUM(absd) AS present_abs, SUM(nct) AS present_ct
        |  FROM dev GROUP BY 1
        |), top AS (
        |  SELECT source, term, absd,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY absd DESC, term ASC) AS rn
        |  FROM dev
        |)
        |SELECT a.source, CAST(n.nsz AS BIGINT) AS n_tokens,
        |  CAST(((a.present_abs + CAST(n.nsz AS HUGEINT) * (nc.ncz - a.present_ct))
        |      * 1000000) // (2 * CAST(n.nsz AS HUGEINT) * nc.ncz) AS BIGINT)
        |    AS tvd_ppm,
        |  tp.term AS top_term,
        |  CAST((tp.absd * 1000000) // (CAST(n.nsz AS HUGEINT) * nc.ncz) AS BIGINT)
        |    AS top_term_dev_ppm
        |FROM agg a JOIN ns n USING (source) CROSS JOIN nc
        |JOIN top tp ON tp.source = a.source AND tp.rn = 1
        |ORDER BY source""".stripMargin,

    // union-nomination drift replay: same grid the Spark side opts into
    "t_corpus_drift_union" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE source IS NOT NULL
        |), st AS (
        |  SELECT source, term, COUNT(*) AS nst FROM toks GROUP BY 1, 2
        |), ct AS (SELECT term, SUM(nst) AS nct FROM st GROUP BY 1),
        |ns AS (SELECT source, SUM(nst) AS nsz FROM st GROUP BY 1),
        |nc AS (SELECT SUM(nst) AS ncz FROM st),
        |dev AS (
        |  SELECT n.source, c.term, c.nct,
        |    ABS(CAST(COALESCE(s.nst, 0) AS HUGEINT) * nc.ncz
        |      - CAST(n.nsz AS HUGEINT) * c.nct) AS absd
        |  FROM ct c CROSS JOIN ns n CROSS JOIN nc
        |  LEFT JOIN st s ON s.source = n.source AND s.term = c.term
        |), agg AS (
        |  SELECT source, SUM(absd) AS sum_abs FROM dev GROUP BY 1
        |), top AS (
        |  SELECT source, term, absd,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY absd DESC, term ASC) AS rn
        |  FROM dev
        |)
        |SELECT a.source, CAST(n.nsz AS BIGINT) AS n_tokens,
        |  CAST((a.sum_abs * 1000000) // (2 * CAST(n.nsz AS HUGEINT) * nc.ncz)
        |      AS BIGINT) AS tvd_ppm,
        |  tp.term AS top_term,
        |  CAST((tp.absd * 1000000) // (CAST(n.nsz AS HUGEINT) * nc.ncz) AS BIGINT)
        |    AS top_term_dev_ppm
        |FROM agg a JOIN ns n USING (source) CROSS JOIN nc
        |JOIN top tp ON tp.source = a.source AND tp.rn = 1
        |ORDER BY source""".stripMargin,

    // corpus-frequency replay: same raw-space tokenization as the Spark
    // side (split on single space, empty text -> one empty token)
    "t_corpus_freq" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tc AS (
        |  SELECT term, COUNT(*) AS c FROM toks GROUP BY 1
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(c) AS BIGINT) AS freq_sum
        |FROM toks JOIN tc USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // BPE iteration-0 pair statistics: distinct-word frequencies, then
    // every adjacent character pair per word (lateral index unnest), freq-
    // weighted — overlaps included, matching the trainer's get_stats
    "t_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS f FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY w
        |), pairs AS (
        |  SELECT substr(word, i, 1) AS pair_left,
        |         substr(word, i + 1, 1) AS pair_right, f
        |  FROM wf, LATERAL (SELECT unnest(generate_series(1,
        |    length(word) - 1)) AS i) g
        |)
        |SELECT pair_left, pair_right, CAST(SUM(f) AS BIGINT) AS freq
        |FROM pairs GROUP BY 1, 2
        |ORDER BY freq DESC, pair_left, pair_right""".stripMargin,

    // BPE encode replay: per-word token counts come from the committed
    // word->n_tokens fixture (produced by the INDEPENDENT Python
    // reference encoder); per-doc sums must match Spark's mapPartitions
    // encoder bit for bit. LEFT JOIN from documents so a zero-word doc
    // still yields a (0, 0) row, matching the Spark side
    "t_bpe_encode" ->
      s"""WITH words AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id,
         |      unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
         |    FROM documents) t
         |  WHERE w <> ''
         |), per_doc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
         |  FROM words
         |  JOIN read_parquet('$repoRoot/src/test/resources/bpe_word_tokens.parquet') r
         |    ON words.w = r.word
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  COALESCE(p.n_words, 0) AS n_words,
         |  COALESCE(p.n_tokens, 0) AS n_tokens
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // byte-level BPE replay: DuckDB extracts the GPT-2 pre-tokens (the
    // corpus is single-spaced lowercase ASCII, so ' ?[a-z]+' is exactly
    // the pattern's behavior on it — richer inputs are fixture-pinned
    // in BpeSpec) and joins the INDEPENDENT Python reference encoder's
    // pretoken -> n_tokens table; per-doc sums must match Spark's
    // byte-level mapPartitions encoder bit for bit
    "t_bpe_bytes" ->
      s"""WITH pres AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
         |  FROM documents
         |), per_doc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
         |    CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
         |  FROM pres
         |  JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
         |    USING (pretoken)
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  COALESCE(p.n_pretokens, 0) AS n_pretokens,
         |  COALESCE(p.n_tokens, 0) AS n_tokens
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // byte-level id replay: same pre-token extraction, summing the
    // reference fixture's per-pretoken (token count, id checksum)
    "t_bpe_ids" ->
      s"""WITH pres AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
         |  FROM documents
         |), per_doc AS (
         |  SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(SUM(r.ids_sum) AS BIGINT) AS ids_sum
         |  FROM pres
         |  JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
         |    USING (pretoken)
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  COALESCE(p.n_tokens, 0) AS n_tokens,
         |  COALESCE(p.ids_sum, 0) AS ids_sum
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // OOV replay: same tokenization, same deterministic top-20 vocab
    // (count desc, term asc), integer-ppm rate via integer division
    "t_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, w AS term FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents) t
        |  WHERE w <> ''
        |), vocab AS (
        |  SELECT term FROM (
        |    SELECT term, COUNT(*) AS c FROM toks GROUP BY term)
        |  ORDER BY c DESC, term LIMIT 20
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS oov_ppm
        |FROM toks LEFT JOIN vocab v USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // incremental-vocabulary replay: the full word count over CURRENT
    // documents — the stored per-bucket state the Spark side answers
    // from is invisible here, which is exactly the identity under test
    "t_incremental_vocab" ->
      """SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
        |    AS w
        |  FROM documents) t
        |WHERE w <> ''
        |GROUP BY w ORDER BY term""".stripMargin,

    // incremental-bigram replay: the full bigram count over CURRENT
    // documents (1-indexed adjacent pairs == Spark's 0-indexed
    // transform; boundary pairs touching an empty token dropped on
    // both engines)
    "t_incremental_bigrams" ->
      """WITH d AS (
        |  SELECT regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
        |  FROM documents
        |), p AS (
        |  SELECT arr[i] AS w1, arr[i + 1] AS w2
        |  FROM d, LATERAL (SELECT unnest(generate_series(1,
        |    len(arr) - 1)) AS i) g
        |  WHERE len(arr) >= 2
        |)
        |SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM p
        |WHERE w1 <> '' AND w2 <> ''
        |GROUP BY w1, w2 ORDER BY w1, w2""".stripMargin,

    // bigram-LM replay: corpus bigram/context counts, add-one smoothing,
    // surprisal = bitlen(c(w1)+V) - bitlen(c(w1,w2)+1) via length(bin(x))
    // — whole-bit integers end to end, milli-bit average floor-divided
    "t_ngram_lm" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ') AS tk
        |  FROM documents
        |), tokpos AS (
        |  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS pos
        |  FROM toks
        |), bg AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tokpos a JOIN tokpos b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), bgc AS (
        |  SELECT w1, w2, COUNT(*) AS cbg FROM bg GROUP BY w1, w2
        |), ctx AS (
        |  SELECT w1, COUNT(*) AS cctx FROM bg GROUP BY w1
        |), voc AS (
        |  SELECT COUNT(DISTINCT w) AS v FROM tokpos
        |), perdoc AS (
        |  SELECT doc_id, w1, w2, COUNT(*) AS occ FROM bg GROUP BY doc_id, w1, w2
        |), sc AS (
        |  SELECT d.doc_id,
        |    SUM(d.occ) AS n_bigrams,
        |    SUM(d.occ * (length(bin(c.cctx + voc.v)) - length(bin(b.cbg + 1)))) AS sum_bits
        |  FROM perdoc d
        |  JOIN bgc b ON d.w1 = b.w1 AND d.w2 = b.w2
        |  JOIN ctx c ON d.w1 = c.w1
        |  CROSS JOIN voc
        |  GROUP BY d.doc_id
        |)
        |SELECT t.doc_id,
        |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(s.sum_bits, 0) AS BIGINT) AS sum_bits,
        |  CAST(CASE WHEN coalesce(s.n_bigrams, 0) > 0
        |    THEN (1000 * s.sum_bits) // s.n_bigrams ELSE 0 END AS BIGINT) AS avg_mbits
        |FROM toks t LEFT JOIN sc s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // DSIR replay: the t_ngram_lm pipeline twice — once with counts from
    // the whole corpus (self model), once with counts from the lang='en'
    // target — scored bigrams LEFT-join the model tables (unseen backs
    // off to count 0), milli-bit averages floor-divided, delta integer
    "t_dsir" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ') AS tk
        |  FROM documents
        |), tokpos AS (
        |  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS pos
        |  FROM toks
        |), bg AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tokpos a JOIN tokpos b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), perdoc AS (
        |  SELECT doc_id, w1, w2, COUNT(*) AS occ FROM bg GROUP BY doc_id, w1, w2
        |), sbgc AS (
        |  SELECT w1, w2, COUNT(*) AS cbg FROM bg GROUP BY w1, w2
        |), sctx AS (
        |  SELECT w1, COUNT(*) AS cctx FROM bg GROUP BY w1
        |), svoc AS (
        |  SELECT COUNT(DISTINCT w) AS v FROM tokpos
        |), mtokpos AS (
        |  SELECT t.doc_id, unnest(t.tk) AS w, generate_subscripts(t.tk, 1) AS pos
        |  FROM toks t JOIN documents d ON t.doc_id = d.doc_id
        |  WHERE d.lang = 'en'
        |), mbg AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM mtokpos a JOIN mtokpos b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), tbgc AS (
        |  SELECT w1, w2, COUNT(*) AS cbg FROM mbg GROUP BY w1, w2
        |), tctx AS (
        |  SELECT w1, COUNT(*) AS cctx FROM mbg GROUP BY w1
        |), tvoc AS (
        |  SELECT COUNT(DISTINCT w) AS v FROM mtokpos
        |), ssc AS (
        |  SELECT d.doc_id, SUM(d.occ) AS n_bigrams,
        |    SUM(d.occ * (length(bin(coalesce(c.cctx, 0) + voc.v))
        |      - length(bin(coalesce(b.cbg, 0) + 1)))) AS sum_bits
        |  FROM perdoc d
        |  LEFT JOIN sbgc b ON d.w1 = b.w1 AND d.w2 = b.w2
        |  LEFT JOIN sctx c ON d.w1 = c.w1
        |  CROSS JOIN svoc voc
        |  GROUP BY d.doc_id
        |), tsc AS (
        |  SELECT d.doc_id, SUM(d.occ) AS n_bigrams,
        |    SUM(d.occ * (length(bin(coalesce(c.cctx, 0) + voc.v))
        |      - length(bin(coalesce(b.cbg, 0) + 1)))) AS sum_bits
        |  FROM perdoc d
        |  LEFT JOIN tbgc b ON d.w1 = b.w1 AND d.w2 = b.w2
        |  LEFT JOIN tctx c ON d.w1 = c.w1
        |  CROSS JOIN tvoc voc
        |  GROUP BY d.doc_id
        |), avgs AS (
        |  SELECT t.doc_id,
        |    CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |    CAST(CASE WHEN coalesce(s.n_bigrams, 0) > 0
        |      THEN (1000 * s.sum_bits) // s.n_bigrams ELSE 0 END AS BIGINT) AS self_mbits,
        |    CAST(CASE WHEN coalesce(g.n_bigrams, 0) > 0
        |      THEN (1000 * g.sum_bits) // g.n_bigrams ELSE 0 END AS BIGINT) AS target_mbits
        |  FROM toks t LEFT JOIN ssc s USING (doc_id) LEFT JOIN tsc g USING (doc_id)
        |)
        |SELECT doc_id, n_bigrams, self_mbits, target_mbits,
        |  self_mbits - target_mbits AS delta_mbits
        |FROM avgs ORDER BY doc_id""".stripMargin,

    // line-dedup replay: the same deterministic 12-token span lining,
    // corpus-wide span frequency, drop-every-occurrence at minCount 2,
    // in-order reassembly; all-line-boilerplate docs keep a '' row
    "t_line_dedup" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    [array_to_string(t[(i*12+1):(i*12+12)], ' ')
        |     FOR i IN range(0, (len(t) + 11) // 12)] AS ls
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |), lines AS (
        |  SELECT doc_id, unnest(ls) AS line,
        |    unnest(range(1, len(ls) + 1)) AS pos
        |  FROM lined
        |), freq AS (
        |  SELECT line FROM lines GROUP BY line HAVING COUNT(*) >= 2
        |), kept AS (
        |  SELECT doc_id, pos, line FROM lines
        |  WHERE line NOT IN (SELECT line FROM freq)
        |), reasm AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct,
        |    COUNT(*) AS nk
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT l.doc_id, coalesce(r.ct, '') AS clean_text,
        |  CAST(len(l.ls) AS BIGINT) AS n_lines,
        |  CAST(coalesce(r.nk, 0) AS BIGINT) AS n_lines_kept,
        |  CAST(len(l.ls) - coalesce(r.nk, 0) AS BIGINT) AS n_lines_dropped
        |FROM lined l LEFT JOIN reasm r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // pagerank replay: symmetrized trade graph, 3 unrolled Pregel rounds,
    // all BIGINT floor divisions of non-negative operands (truncation ==
    // floor on both engines, nothing near 2^53)
    "t_pagerank" ->
      """WITH cs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), edges AS (
        |  SELECT a, b FROM cs UNION ALL SELECT b AS a, a AS b FROM cs
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) u
        |), params AS (
        |  SELECT COUNT(*) AS n,
        |    ((1000000000000 * 15) // 100) // COUNT(*) AS base,
        |    1000000000000 // COUNT(*) AS r0
        |  FROM nodes
        |), deg AS (
        |  SELECT a, COUNT(*) AS deg FROM edges GROUP BY a
        |), rank0 AS (
        |  SELECT node, p.r0 AS rank FROM nodes CROSS JOIN params p
        |), c1 AS (
        |  SELECT e.b AS node, SUM(r.rank // d.deg) AS s
        |  FROM edges e JOIN rank0 r ON r.node = e.a JOIN deg d ON d.a = e.a
        |  GROUP BY e.b
        |), rank1 AS (
        |  SELECT nd.node, p.base + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM nodes nd CROSS JOIN params p LEFT JOIN c1 c ON c.node = nd.node
        |), c2 AS (
        |  SELECT e.b AS node, SUM(r.rank // d.deg) AS s
        |  FROM edges e JOIN rank1 r ON r.node = e.a JOIN deg d ON d.a = e.a
        |  GROUP BY e.b
        |), rank2 AS (
        |  SELECT nd.node, p.base + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM nodes nd CROSS JOIN params p LEFT JOIN c2 c ON c.node = nd.node
        |), c3 AS (
        |  SELECT e.b AS node, SUM(r.rank // d.deg) AS s
        |  FROM edges e JOIN rank2 r ON r.node = e.a JOIN deg d ON d.a = e.a
        |  GROUP BY e.b
        |), rank3 AS (
        |  SELECT nd.node, p.base + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM nodes nd CROSS JOIN params p LEFT JOIN c3 c ON c.node = nd.node
        |)
        |SELECT node, CAST(rank AS BIGINT) AS rank FROM rank3
        |ORDER BY rank DESC, node LIMIT 50""".stripMargin,

    // count-min replay: sketch counters are sums, so the oracle builds
    // them from per-DISTINCT-term exact counts (sum of exact_n per cell
    // == count of occurrences per cell); fnv1a("r:" || term) mod the
    // power-of-two width keeps signed/unsigned parity exact
    "t_countmin" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(
         |    TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ')) AS term
         |  FROM documents
         |), exact AS (
         |  SELECT term, COUNT(*) AS exact_n FROM tok GROUP BY term
         |), rs AS (
         |  SELECT unnest(range(0, 4)) AS r
         |), cells AS (
         |  SELECT term, exact_n, r,
         |    CAST(${fnvSql("CAST(r AS VARCHAR) || ':' || term")} % 1024 AS BIGINT) AS cell
         |  FROM exact CROSS JOIN rs
         |), sketch AS (
         |  SELECT r, cell, SUM(exact_n) AS cnt FROM cells GROUP BY r, cell
         |), top AS (
         |  SELECT term, exact_n FROM exact ORDER BY exact_n DESC, term LIMIT 20
         |), qcells AS (
         |  SELECT c.term, c.exact_n, c.r, c.cell FROM cells c
         |  WHERE c.term IN (SELECT term FROM top)
         |), est AS (
         |  SELECT q.term, q.exact_n, MIN(coalesce(s.cnt, 0)) AS cm_est
         |  FROM qcells q LEFT JOIN sketch s USING (r, cell)
         |  GROUP BY q.term, q.exact_n
         |)
         |SELECT term, CAST(exact_n AS BIGINT) AS exact_n,
         |  CAST(cm_est AS BIGINT) AS cm_est
         |FROM est ORDER BY term""".stripMargin,

    // streaming count-min replay: the stream's complete-mode counter
    // state is exactly the batch sketch over the same events — per-cell
    // COUNT with the same fnv1a("r:" || key) cell map, width 256 a power
    // of two for signed/unsigned parity
    "s_countmin" ->
      s"""WITH h AS (
         |  SELECT CAST(event_id AS VARCHAR) AS k FROM events
         |), rs AS (
         |  SELECT unnest(range(0, 4)) AS r
         |), cells AS (
         |  SELECT r, CAST(${fnvSql("CAST(r AS VARCHAR) || ':' || k")} % 256 AS BIGINT) AS cell
         |  FROM h CROSS JOIN rs
         |)
         |SELECT CAST(r AS BIGINT) AS r, cell, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM cells GROUP BY r, cell ORDER BY r, cell""".stripMargin,

    // streaming HLL replay: the stream's complete-mode register state is
    // exactly the batch sketch over the same events
    "s_hll" ->
      s"""WITH ${hllRegCtes("", "CAST(event_id AS VARCHAR)", "events")}
         |SELECT register, MAX(rho) AS max_rho
         |FROM hrr GROUP BY register ORDER BY register""".stripMargin,

    // inverted-index replay: (term, doc) tf counts, within-term doc-order
    // ranking, 64-entry pages, "id:tf" postings joined in doc order
    "t_inverted_index" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ')) AS term
         |  FROM documents
         |), tfd AS (
         |  SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id
         |), stats AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         |    CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM tfd GROUP BY term
         |), rn AS (
         |  SELECT term, doc_id, tf,
         |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS r
         |  FROM tfd
         |), blk AS (
         |  SELECT term, CAST(r // 64 AS BIGINT) AS block,
         |    CAST(COUNT(*) AS BIGINT) AS n_block,
         |    string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
         |  FROM rn GROUP BY term, r // 64
         |)
         |SELECT b.term, b.block, s.df, s.cf, b.n_block, b.postings
         |FROM blk b JOIN stats s USING (term)
         |ORDER BY term, block""".stripMargin,

    // HLL replay: finalized (fnv1a + splitmix mixer) hash in unsigned
    // HUGEINT, register = h % 256 (power-of-two modulus == the JVM's
    // signed floorMod), rank from bit-length of h // 256 via
    // length(bin(x)) — integer end to end
    "t_hll" ->
      s"""WITH ${hllRegCtes("",
             "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)",
             "lineitem")}
         |SELECT register, MAX(rho) AS max_rho
         |FROM hrr GROUP BY register ORDER BY register""".stripMargin,

    // HLL estimate replay: the raw estimator in exact HUGEINT rationals —
    // alpha_256 = 7213*256*1000 / (10000*(256000+1079)), the harmonic
    // denominator scaled by 2^56 (the max rho of the finalized 63-bit
    // hash at p=8) so every term is integral, one floor division of
    // non-negative 128-bit integers
    "t_hll_est" ->
      s"""WITH ${hllRegCtes("",
             "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)",
             "lineitem")}, sk AS (
         |  SELECT register, MAX(rho) AS max_rho FROM hrr GROUP BY register
         |), agg AS (
         |  SELECT COUNT(*) AS used,
         |    SUM(CAST(1 AS HUGEINT) << CAST(56 - max_rho AS INTEGER)) AS dsum
         |  FROM sk
         |), ex AS (
         |  SELECT COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)) AS n_exact
         |  FROM lineitem
         |)
         |SELECT CAST(256 AS BIGINT) AS m, CAST(used AS BIGINT) AS n_used,
         |  CAST((CAST(1846528000 AS HUGEINT) * 256 * 256 * (CAST(1 AS HUGEINT) << 56)) //
         |    (CAST(2570790000 AS HUGEINT) *
         |      (dsum + (256 - used) * (CAST(1 AS HUGEINT) << 56))) AS BIGINT) AS n_est,
         |  CAST(n_exact AS BIGINT) AS n_exact
         |FROM agg CROSS JOIN ex""".stripMargin,

    // span-dedup replay: 5-gram window FNV fingerprints over the near-dup
    // corpus, corpus-wide frequency, per-token coverage via EXISTS over
    // duplicated starts (the oracle can afford the O(n*s) form the
    // operator's two-pointer sweep avoids), in-order reassembly
    "t_span_dedup" ->
      s"""WITH $corpusCte, toksl AS (
         |  SELECT doc_id,
         |    string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ') AS toks
         |  FROM corpus
         |), wstr AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(toks[(i+1):(i+5)], ' ')
         |            FOR i IN range(0, greatest(len(toks) - 4, 0))]) AS w,
         |    unnest(range(0, greatest(len(toks) - 4, 0))) AS p
         |  FROM toksl
         |), wins AS (
         |  SELECT doc_id, p, ${fnvSql("w")} AS wh FROM wstr
         |), freq AS (
         |  SELECT wh FROM wins GROUP BY wh HAVING COUNT(*) >= 2
         |), starts AS (
         |  SELECT doc_id, p FROM wins WHERE wh IN (SELECT wh FROM freq)
         |), ndw AS (
         |  SELECT doc_id, COUNT(*) AS ndw FROM starts GROUP BY doc_id
         |), tok AS (
         |  SELECT doc_id, unnest(toks) AS tk,
         |    unnest(range(0, len(toks))) AS i
         |  FROM toksl
         |), kept AS (
         |  SELECT t.doc_id, t.i, t.tk FROM tok t
         |  WHERE NOT EXISTS (SELECT 1 FROM starts s
         |    WHERE s.doc_id = t.doc_id AND s.p <= t.i AND t.i <= s.p + 4)
         |), reasm AS (
         |  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS ct,
         |    COUNT(*) AS nk
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT l.doc_id, coalesce(r.ct, '') AS clean_text,
         |  CAST(len(l.toks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(r.nk, 0) AS BIGINT) AS n_kept,
         |  CAST(len(l.toks) - coalesce(r.nk, 0) AS BIGINT) AS n_dropped,
         |  CAST(coalesce(d.ndw, 0) AS BIGINT) AS n_dup_windows
         |FROM toksl l LEFT JOIN reasm r USING (doc_id)
         |  LEFT JOIN ndw d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // linear-score replay: the splitmix64 fixture weight table in HUGEINT
    // (power-of-two moduli keep signed/unsigned parity exact), fnv1a
    // token bucketing mod 4096, integer logit sum over token occurrences
    "t_linear_score" ->
      s"""WITH normd AS (
         |  SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')) AS s
         |  FROM documents
         |), toksl AS (
         |  SELECT doc_id, string_split(s, ' ') AS toks FROM normd
         |), tok AS (
         |  SELECT doc_id, unnest(toks) AS w FROM toksl
         |), wt AS (
         |  SELECT j, CAST((t4 % 16) - 8 AS BIGINT) AS wv
         |  FROM (SELECT j, xor(t3, t3 // 2147483648) AS t4
         |    FROM (SELECT j, ${mulModSql("xor(t2, t2 // 134217728)", 2496678331L, 321982955L)} AS t3
         |      FROM (SELECT j, ${mulModSql("xor(t1, t1 // 1073741824)", 3210233709L, 484763065L)} AS t2
         |        FROM (SELECT j, (CAST(11400714819323198485 AS HUGEINT) + j) % $P64 AS t1
         |              FROM (SELECT unnest(range(0, 4096)) AS j) js) q1) q2) q3) q4
         |), bucketed AS (
         |  SELECT doc_id, CAST(${fnvSql("w")} % 4096 AS BIGINT) AS j FROM tok
         |), scored AS (
         |  SELECT doc_id, CAST(SUM(wv) AS BIGINT) AS logit
         |  FROM bucketed JOIN wt USING (j) GROUP BY doc_id
         |)
         |SELECT t.doc_id AS id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  s.logit AS logit,
         |  CAST(CASE WHEN s.logit >= 0 THEN 1 ELSE 0 END AS BIGINT) AS label
         |FROM toksl t JOIN scored s USING (doc_id)
         |ORDER BY id""".stripMargin,

    // budget-selection replay: one global running-sum window (the oracle
    // can afford the single-partition form the operator avoids)
    "t_budget_select" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_chars, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM d
        |)
        |SELECT doc_id, n_chars, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 15000 ORDER BY doc_id""".stripMargin,

    // linkage replay: CPython difflib ratios from the committed fixture
    // (the nation name universe is fixed at every SF), same blocking +
    // best-match logic
    "t_linkage" ->
      s"""WITH clean AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS right_id, n_name AS right_name FROM nation
        |), dirty AS (
        |  SELECT CAST(n_nationkey AS BIGINT) + 1000 AS left_id,
        |    replace(n_name, '_', '') AS left_name FROM nation
        |), cand AS (
        |  SELECT d.left_id, d.left_name, c.right_id, c.right_name, r.ratio
        |  FROM dirty d
        |  JOIN clean c ON substring(d.left_name, -1, 1) = substring(c.right_name, -1, 1)
        |  JOIN read_parquet('$repoRoot/src/test/resources/linkage_ratios.parquet') r
        |    ON d.left_name = r.a AND c.right_name = r.b
        |  WHERE r.ratio >= CAST(0.85 AS DOUBLE)
        |)
        |SELECT left_id, left_name, right_id, right_name,
        |  CAST(FLOOR(ratio * 1000000 + 0.5) AS BIGINT) AS ratio_ppm
        |FROM (
        |  SELECT cand.*, ROW_NUMBER() OVER (
        |    PARTITION BY left_id ORDER BY ratio DESC, right_id) AS rk FROM cand) t
        |WHERE rk = 1 ORDER BY left_id""".stripMargin,

    // quantile-filter replay: the t_quantiles bucket math over n_chars,
    // p25 rank selection, then the plain threshold filter
    "t_quality_filter" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN n_chars <= 0 THEN 0
        |         WHEN length(bin(n_chars)) - 1 < 7 THEN n_chars
        |         ELSE (length(bin(n_chars)) - 1 - 7 + 1) * 128
        |              + ((n_chars >> (length(bin(n_chars)) - 1 - 7)) - 128)
        |    END AS bucket
        |  FROM documents
        |), sk AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1
        |), c AS (
        |  SELECT bucket, cnt,
        |    SUM(cnt) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER () AS total
        |  FROM sk
        |), hit AS (
        |  SELECT MIN(bucket) AS bucket
        |  FROM c WHERE cum >= (250000 * total + 999999) // 1000000
        |), thr AS (
        |  SELECT CAST(CASE WHEN bucket < 128 THEN bucket
        |       ELSE ((bucket % 128) + 128) << ((bucket // 128) - 1)
        |       END AS BIGINT) AS v FROM hit
        |)
        |SELECT doc_id, n_chars FROM documents, thr
        |WHERE n_chars >= thr.v ORDER BY doc_id""".stripMargin,

    // stratified-sampling replay: same xxhash64 HUGEINT chain as t_split,
    // joined back for the stratum column; per-stratum rate as a CASE
    "t_stratified" ->
      s"""WITH ${xxhash64Ctes("doc_id", "documents")},
         |b AS (SELECT d.doc_id, d.lang,
         |        ((h % 10000) + 10000) % 10000 AS sample_bucket
         |      FROM documents d JOIN xxh USING (doc_id))
         |SELECT doc_id, lang, CAST(sample_bucket AS BIGINT) AS sample_bucket
         |FROM b
         |WHERE sample_bucket < CASE WHEN lang = 'en' THEN 2000 ELSE 8000 END
         |ORDER BY doc_id""".stripMargin,

    "t_source_cap" ->
      """SELECT source, doc_id, CAST(domain_rank AS BIGINT) AS domain_rank
        |FROM (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS domain_rank
        |  FROM documents) t
        |WHERE domain_rank <= 10
        |ORDER BY source, doc_id""".stripMargin,

    // incremental dedup replay: the bloom pre-filter never changes the
    // result (confirm join), so the oracle is the plain anti-join
    "t_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |corpus AS (SELECT doc_id, fp FROM d WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, fp FROM d WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, fp FROM corpus)
        |SELECT doc_id, fp FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
        |ORDER BY doc_id""".stripMargin,

    // k-means replay: two unrolled Lloyd iterations, integer end-to-end —
    // q24-quantize components FIRST (one IEEE op per value, fold-free),
    // then every assignment is an exact-BIGINT squared-L2 argmin and
    // every centroid a half-up integer mean on the q24 grid. No double
    // fold feeds any argmin, so NO engine version can flip an assignment
    // at a near-tie (the r6/r7 failure mode); the hashed output is
    // all-integer by construction
    "t_kmeans" ->
      s"""WITH qe AS (
         |  SELECT vec_id, ${qvecSql("embedding")} AS qv FROM embeddings
         |), ${qLloydCtes("k1", "qe", "vec_id", 8)}, a2 AS (
         |  SELECT e.vec_id AS vid, e.qv, c.cent_id, ${isqSql("e.qv", "c.qc")} AS d
         |  FROM qe e CROSS JOIN k1cents c
         |), c2 AS (
         |  SELECT cent_id, vid, qv FROM (
         |    SELECT cent_id, vid, qv,
         |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cent_id) AS r
         |    FROM a2) t WHERE r = 1
         |)
         |SELECT cent_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(SUM(val) AS BIGINT) AS ssum,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM (SELECT cent_id, unnest(qv) AS val,
         |        generate_subscripts(qv, 1) - 1 AS pos FROM c2) u
         |GROUP BY cent_id, pos
         |ORDER BY cent_id, pos""".stripMargin,

    // SemDeDup replay: same two-iteration integer Lloyd fit as t_kmeans
    // over the twin-injected corpus, one more integer-argmin assignment
    // off the final centroids, then the keep-lowest-index rule with the
    // EXACT integer cosine-threshold test (cross-multiplied in HUGEINT,
    // 0.95 = 95/100) over the full within-cluster pair scan — the whole
    // decision path is integer, so the surviving (vec_id, cent_id) set
    // cannot flip on any engine's double fold
    "t_semantic_dedup" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |    list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN CAST(x * CAST(1.05 AS REAL) AS REAL) ELSE x END)
         |  FROM embeddings WHERE vec_id < 10
         |), qe AS (
         |  SELECT vec_id, ${qvecSql("embedding")} AS qv FROM corpus
         |), ${qLloydCtes("d1", "qe", "vec_id", 8)}, a2 AS (
         |  SELECT e.vec_id AS vid, e.qv, c.cent_id, ${isqSql("e.qv", "c.qc")} AS d
         |  FROM qe e CROSS JOIN d1cents c
         |), c2 AS (
         |  SELECT cent_id, vid, qv FROM (
         |    SELECT cent_id, vid, qv,
         |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cent_id) AS r
         |    FROM a2) t WHERE r = 1
         |), s2 AS (
         |  SELECT cent_id, pos, CAST(SUM(val) AS BIGINT) AS ssum, COUNT(*) AS n
         |  FROM (SELECT cent_id, unnest(qv) AS val,
         |          generate_subscripts(qv, 1) - 1 AS pos FROM c2) u
         |  GROUP BY cent_id, pos
         |), cents2 AS (
         |  SELECT cent_id, list(qm ORDER BY pos) AS qc
         |  FROM (SELECT cent_id, pos, $qmeanSql AS qm FROM s2) q
         |  GROUP BY cent_id
         |), a3 AS (
         |  SELECT e.vec_id AS vid, e.qv, c.cent_id, ${isqSql("e.qv", "c.qc")} AS d
         |  FROM qe e CROSS JOIN cents2 c
         |), c3 AS (
         |  SELECT cent_id, vid, qv, ${idotSql("qv", "qv")} AS nn FROM (
         |    SELECT cent_id, vid, qv,
         |      ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cent_id) AS r
         |    FROM a3) t WHERE r = 1
         |), pd AS (
         |  SELECT b.vid AS vid, ${idotSql("a.qv", "b.qv")} AS dot,
         |    a.nn AS na, b.nn AS nb
         |  FROM c3 a JOIN c3 b ON a.cent_id = b.cent_id AND a.vid < b.vid
         |), dropped AS (
         |  SELECT DISTINCT vid FROM pd
         |  WHERE ${intCosGteSql("dot", "na", "nb", 95, 100)}
         |)
         |SELECT c.vid AS vec_id, c.cent_id
         |FROM c3 c LEFT JOIN dropped d ON c.vid = d.vid
         |WHERE d.vid IS NULL
         |ORDER BY vec_id""".stripMargin,

    // mixture replay: domains-sized aggregate, the min-ratio budget, the
    // identical double arithmetic for the rate, ppm-floored
    "t_mixture" ->
      """WITH tok AS (
        |  SELECT lang AS domain,
        |    CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]', 0)) AS BIGINT) AS toks
        |  FROM documents
        |), shares(domain, share) AS (
        |  VALUES ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.125 AS DOUBLE)),
        |         ('es', CAST(0.125 AS DOUBLE)), ('fr', CAST(0.125 AS DOUBLE)),
        |         ('zh', CAST(0.125 AS DOUBLE))
        |), agg AS (
        |  SELECT t.domain, CAST(SUM(t.toks) AS BIGINT) AS domain_tokens,
        |    ANY_VALUE(s.share) AS share
        |  FROM tok t JOIN shares s ON t.domain = s.domain
        |  GROUP BY t.domain
        |), b AS (
        |  SELECT MIN(CAST(domain_tokens AS DOUBLE) / share) AS budget FROM agg
        |)
        |SELECT domain, domain_tokens,
        |  CAST(FLOOR(share * budget / CAST(domain_tokens AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS rate_ppm
        |FROM agg CROSS JOIN b
        |ORDER BY domain""".stripMargin,

    // mixture-apply replay: the same budget/rates on the 2^20 grid, then
    // the unsigned-HUGEINT fnv1a draw against each domain's threshold
    "t_mixture_apply" ->
      s"""WITH tok AS (
        |  SELECT lang AS domain,
        |    CAST(len(regexp_extract_all(text, '[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]', 0)) AS BIGINT) AS toks
        |  FROM documents
        |), shares(domain, share) AS (
        |  VALUES ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.125 AS DOUBLE)),
        |         ('es', CAST(0.125 AS DOUBLE)), ('fr', CAST(0.125 AS DOUBLE)),
        |         ('zh', CAST(0.125 AS DOUBLE))
        |), agg AS (
        |  SELECT t.domain, CAST(SUM(t.toks) AS BIGINT) AS domain_tokens,
        |    ANY_VALUE(s.share) AS share
        |  FROM tok t JOIN shares s ON t.domain = s.domain
        |  GROUP BY t.domain
        |), b AS (
        |  SELECT MIN(CAST(domain_tokens AS DOUBLE) / share) AS budget FROM agg
        |), rates AS (
        |  SELECT domain,
        |    CAST(FLOOR(share * budget / CAST(domain_tokens AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) AS rate_q20
        |  FROM agg CROSS JOIN b
        |)
        |SELECT d.doc_id, d.lang, r.rate_q20
        |FROM documents d JOIN rates r ON d.lang = r.domain
        |WHERE ${fnvSql("CAST(d.doc_id AS VARCHAR)")} % 1048576 < r.rate_q20
        |ORDER BY d.doc_id""".stripMargin,

    // chunking replay: chunk k covers [k*224, k*224 + 256); the md5 pins
    // the exact chunk bytes, not just the boundaries
    "t_chunks" ->
      """WITH c AS (
        |  SELECT doc_id AS id, unnest(range(0, 1 + (length(text) - 1) // 224)) AS chunk_idx, text
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |)
        |SELECT id, chunk_idx,
        |  CAST(length(substring(text, CAST(chunk_idx * 224 + 1 AS INTEGER), 256)) AS BIGINT) AS n_chars,
        |  md5(substring(text, CAST(chunk_idx * 224 + 1 AS INTEGER), 256)) AS chunk_md5
        |FROM c ORDER BY id, chunk_idx""".stripMargin,

    // packing replay: per-source running token sum, bin = prev_cumsum DIV
    // capacity — exact integer arithmetic end to end
    "t_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prev
        |  FROM d
        |)
        |SELECT source, doc_id, n_tokens,
        |  CAST(prev // 2048 AS BIGINT) AS bin_id,
        |  CAST(prev AS BIGINT) AS bin_offset_tokens
        |FROM c ORDER BY source, doc_id""".stripMargin,

    // packed-export replay: fixture token counts -> xxhash64 shard ->
    // within-shard cumsum packing, every stage in exact integer SQL
    // the declarative pipeline emits t_export_packed's frame by
    // contract — same replay, stage for stage
    "t_pipeline_packed" -> exportPackedSql,

    // t_bpe_ids plus the boundary constants: +1 token, +280 (the
    // reserved <|endoftext|> id = 256 + 24 corpus merges) per document
    "t_bpe_ids_special" ->
      s"""WITH pres AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
         |  FROM documents
         |), per_doc AS (
         |  SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(SUM(r.ids_sum) AS BIGINT) AS ids_sum
         |  FROM pres
         |  JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
         |    USING (pretoken)
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  COALESCE(p.n_tokens, 0) + 1 AS n_tokens,
         |  COALESCE(p.ids_sum, 0) + 280 AS ids_sum
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // fixed-length sequence boundaries replayed from per-doc token
    // counts alone (see sequencesSql); the declarative pipeline with a
    // boundary-tokened tokenize + sequence_length export must emit the
    // identical frame — same replay
    "t_sequences" -> sequencesSql(padded = false),
    "t_pipeline_sequences" -> sequencesSql(padded = false),
    // the pad-policy twin: trailing partials report 2048 emitted
    // tokens and their pad count
    "t_sequences_padded" -> sequencesSql(padded = true),
    // the shuffled-sample permutation: identity-hash shard + rank
    "t_sequences_shuffled" -> sequencesShuffledSql,
    // the epoch-7 permutation (golden-gamma-shifted key) and its
    // mid-epoch resume cursor
    "t_epoch_order" -> epochOrderSql,
    "t_epoch_resume" -> epochResumeSql,
    // the weighted epoch: upsampling repeat rates + seeded fractional
    // draw + copy-packed position hash
    "t_epoch_mixture" -> epochMixtureSql,
    // the incremental feed: batch-order-prefixed stream replay,
    // complete rows only (the tail lives in the carry)
    "t_sequences_incremental" -> sequencesIncrementalSql,
    // the auditor over the same healthy store: per-shard row counts
    // from the stream replay, violation counters pinned at zero
    "t_feed_audit" ->
      s"""WITH ${sequencesCtes("t.doc_id % 3, ")}
         |SELECT shard,
         |  CAST(total // 2048 AS BIGINT) AS n_rows,
         |  CAST(total // 2048 - 1 AS BIGINT) AS max_seq_id,
         |  CAST(0 AS BIGINT) AS n_dup, CAST(0 AS BIGINT) AS n_gap,
         |  CAST(0 AS BIGINT) AS n_len_bad, CAST(0 AS BIGINT) AS n_sum_bad
         |FROM totals WHERE total >= 2048 ORDER BY shard""".stripMargin,
    // the snapshot over the same feed: batches 0-1 frozen at publish
    "t_feed_snapshot" -> feedSnapshotSql,
    "t_curated_feed" -> curatedFeedSql,

    // decode(encode(text)) identity: the oracle is the original text
    // itself (md5 over UTF-8 bytes; null text encodes as '')
    "t_bpe_decode" ->
      """SELECT doc_id, md5(COALESCE(text, '')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the t_export_packed replay with every document one boundary
    // token longer (the packer must count the inserted <|endoftext|>)
    "t_export_packed_eot" ->
      s"""WITH ${xxhash64Ctes("doc_id", "documents")},
         |pres AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pretoken
         |  FROM documents
         |), tok AS (
         |  SELECT d.doc_id, COALESCE(s.n_tokens, 0) + 1 AS n_tokens FROM
         |  documents d LEFT JOIN (
         |    SELECT doc_id, CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens
         |    FROM pres
         |    JOIN read_parquet('$repoRoot/src/test/resources/bpe_bytes_pretoken_tokens.parquet') r
         |      USING (pretoken)
         |    GROUP BY doc_id) s USING (doc_id)
         |), d AS (
         |  SELECT t.doc_id, x.h, ((x.h % 8) + 8) % 8 AS shard, t.n_tokens
         |  FROM tok t JOIN xxh x USING (doc_id)
         |), c AS (
         |  SELECT doc_id, shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - n_tokens AS prev
         |  FROM d
         |)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
         |  CAST(prev // 2048 AS BIGINT) AS bin_id,
         |  CAST(prev AS BIGINT) AS bin_offset_tokens
         |FROM c ORDER BY doc_id""".stripMargin,

    "t_export_packed" -> exportPackedSql,

    // quantile-sketch replay: bin() string length = exact floor(log2)+1
    // in both engines; every other op is integer shift/div/mod
    "t_quantiles" ->
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events
        |), b AS (
        |  SELECT event_type,
        |    CASE WHEN cents <= 0 THEN 0
        |         WHEN length(bin(cents)) - 1 < 7 THEN cents
        |         ELSE (length(bin(cents)) - 1 - 7 + 1) * 128
        |              + ((cents >> (length(bin(cents)) - 1 - 7)) - 128)
        |    END AS bucket
        |  FROM v
        |), sk AS (
        |  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, bucket, cnt,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM sk
        |), q AS (
        |  SELECT * FROM (VALUES ('p50', 500000), ('p90', 900000), ('p99', 990000),
        |    ('p999', 999000)) t(q_label, q_ppm)
        |), hit AS (
        |  SELECT c.event_type, q.q_label,
        |    MIN(c.bucket) AS bucket,
        |    MIN((q.q_ppm * c.total + 999999) // 1000000) AS rank
        |  FROM c CROSS JOIN q
        |  WHERE c.cum >= (q.q_ppm * c.total + 999999) // 1000000
        |  GROUP BY 1, 2
        |)
        |SELECT event_type, q_label, CAST(rank AS BIGINT) AS rank,
        |  CAST(bucket AS BIGINT) AS bucket,
        |  CAST(CASE WHEN bucket < 128 THEN bucket
        |       ELSE ((bucket % 128) + 128) << ((bucket // 128) - 1)
        |       END AS BIGINT) AS q_value
        |FROM hit ORDER BY event_type, q_label""".stripMargin,
    "t_rownum" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
        |FROM documents ORDER BY doc_id""".stripMargin,

    // repetition replay: n-grams via 1-based list slices, counts grouped,
    // top-1 by (count desc, gram asc), dup = sum of chars in grams seen
    // >= 2x; all-integer ppm (floor division) — exact on both engines.
    // Same every-11th-doc phrase injection as the Spark side.
    "t_repetition" ->
      """WITH docs2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |      THEN text || repeat(' badger mushroom snake', 8) ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS tc,
        |         string_split(text, ' ') AS w
        |  FROM docs2
        |), grams AS (
        |  SELECT doc_id, tc, n, unnest(gs) AS g
        |  FROM (
        |    SELECT doc_id, tc, n.n AS n,
        |      [array_to_string(w[i:i+n.n-1], ' ') for i in range(1, len(w)-n.n+2)] AS gs
        |    FROM toks, (SELECT unnest([2,3,4,5,8,10]) AS n) n
        |    WHERE len(w) >= n.n
        |  )
        |), cnts AS (
        |  SELECT doc_id, tc, n, g, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM grams GROUP BY doc_id, tc, n, g
        |), top AS (
        |  SELECT doc_id, n,
        |    CAST((1000000 * c * LENGTH(g)) // tc AS BIGINT) AS ppm
        |  FROM (SELECT *, row_number() OVER
        |          (PARTITION BY doc_id, n ORDER BY c DESC, g ASC) AS rn
        |        FROM cnts WHERE tc > 0)
        |  WHERE rn = 1 AND n IN (2,3,4)
        |), dup AS (
        |  SELECT doc_id, n,
        |    CAST((1000000 * COALESCE(SUM(c * LENGTH(g)) FILTER (c >= 2), 0)) // tc AS BIGINT) AS ppm
        |  FROM cnts WHERE tc > 0 AND n IN (5,8,10)
        |  GROUP BY doc_id, n, tc
        |)
        |SELECT d.doc_id,
        |  COALESCE(t2.ppm, 0) AS top2_ppm, COALESCE(t3.ppm, 0) AS top3_ppm,
        |  COALESCE(t4.ppm, 0) AS top4_ppm, COALESCE(d5.ppm, 0) AS dup5_ppm,
        |  COALESCE(d8.ppm, 0) AS dup8_ppm, COALESCE(d10.ppm, 0) AS dup10_ppm
        |FROM docs2 d
        |LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.n = 2
        |LEFT JOIN top t3 ON t3.doc_id = d.doc_id AND t3.n = 3
        |LEFT JOIN top t4 ON t4.doc_id = d.doc_id AND t4.n = 4
        |LEFT JOIN dup d5 ON d5.doc_id = d.doc_id AND d5.n = 5
        |LEFT JOIN dup d8 ON d8.doc_id = d.doc_id AND d8.n = 8
        |LEFT JOIN dup d10 ON d10.doc_id = d.doc_id AND d10.n = 10
        |ORDER BY d.doc_id""".stripMargin,

    // BM25 replay: rational idf (no ln), expression tree parenthesized
    // identically to TextAnalysis.bm25KeyTerms — every op is a correctly-
    // rounded IEEE double +,-,*,/ so the floors agree bit-for-bit
    "t_keyterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), corpus AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS total_len
        |), wd AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df, n_docs, total_len,
        |         CAST(SUM(tf.tf) OVER (PARTITION BY tf.doc_id) AS BIGINT) AS dl
        |  FROM tf JOIN dfq USING (term) CROSS JOIN corpus
        |), scored AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(FLOOR(
        |      ((((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + CAST(0.5 AS DOUBLE))
        |         / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
        |       * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |          / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |             (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |              (CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS score_ppm
        |  FROM wd
        |)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, tf, df, score_ppm
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score_ppm DESC, term ASC) AS rn
        |      FROM scored)
        |WHERE rn <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    // decoded-PCM oracle: the 256 WAV samples are charAt(i % len)&0xFF by
    // construction (empty text -> 0, i.e. centered value -128); RMS and
    // zero crossings have closed integer forms until the final sqrt
    "t_audio_features" ->
      """WITH sam AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(text) = 0
        |         THEN list_transform(range(0, 256), i -> -128)
        |         ELSE [unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256 - 128
        |               FOR i IN range(0, 256)]
        |    END AS k
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    list_aggregate(list_transform(k, x -> x * x), 'sum') AS sum_sq,
        |    len(list_filter(range(2, 257), i -> k[CAST(i AS INTEGER)] * k[CAST(i-1 AS INTEGER)] < 0)) AS crossings
        |  FROM sam
        |)
        |SELECT doc_id AS media_id, CAST(256 AS BIGINT) AS n_samples,
        |  CAST(FLOOR(sqrt(CAST(sum_sq AS DOUBLE) / CAST(16384.0 AS DOUBLE) / CAST(256.0 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS rms_ppm,
        |  CAST(crossings AS BIGINT) AS zero_crossings
        |FROM f ORDER BY media_id""".stripMargin,

    // framed-PCM oracle: per 64-sample frame, the same closed integer
    // forms as t_audio_features scoped to the frame's slice
    "t_audio_frames" ->
      """WITH sam AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(text) = 0
        |         THEN list_transform(range(0, 256), i -> -128)
        |         ELSE [unicode(substring(text, CAST(i % length(text) AS INTEGER) + 1, 1)) % 256 - 128
        |               FOR i IN range(0, 256)]
        |    END AS k
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, k, unnest(range(0, 4)) AS f FROM sam
        |), g AS (
        |  SELECT doc_id, f,
        |    list_aggregate([k[CAST(f*64 + j AS INTEGER)] * k[CAST(f*64 + j AS INTEGER)]
        |                    FOR j IN range(1, 65)], 'sum') AS sum_sq,
        |    len(list_filter(range(2, 65),
        |      j -> k[CAST(f*64 + j AS INTEGER)] * k[CAST(f*64 + j - 1 AS INTEGER)] < 0)) AS crossings
        |  FROM fr
        |)
        |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(64 AS BIGINT) AS n_samples,
        |  CAST(FLOOR(sqrt(CAST(sum_sq AS DOUBLE) / CAST(16384.0 AS DOUBLE) / CAST(64.0 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS rms_ppm,
        |  CAST(crossings AS BIGINT) AS zero_crossings
        |FROM g ORDER BY media_id, frame_idx""".stripMargin,

    // frame sampling replay: stride-64 byte windows of the (ASCII) text
    // payload, FNV checksum per frame, Long-wrapping sum per media item
    "t_frame_sample" ->
      s"""WITH fdocs AS (
         |  SELECT doc_id, text, least(16, 1 + (length(text) - 1) // 64) AS nf
         |  FROM documents WHERE length(text) > 0
         |), frames AS (
         |  SELECT doc_id, text, nf, unnest(range(0, nf)) AS f FROM fdocs
         |), fck AS (
         |  SELECT doc_id, nf, ${fnvSql("substring(text, CAST(f*64 + 1 AS INTEGER), 64)")} AS ck_u
         |  FROM frames
         |)
         |SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
         |  CAST((((SUM(CAST(${signedSql("ck_u")} AS HUGEINT)) % $P64) + $P64 + $P63) % $P64) - $P63 AS BIGINT) AS checksum_sum
         |FROM fck GROUP BY doc_id, nf ORDER BY media_id""".stripMargin,

    // ordered funnel: each stage's entry is the min event ts STRICTLY
    // after the user's entry to the previous stage
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
        |)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step, count(*) AS users FROM v
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM c
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,

    "q_retention" ->
      """WITH first AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
        |)
        |SELECT cohort, week_offset, count(*) AS users FROM (
        |  SELECT DISTINCT e.user_id,
        |    strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort,
        |    CAST(date_diff('day', CAST(date_trunc('week', f.first_ts) AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset
        |  FROM events e JOIN first f ON e.user_id = f.user_id
        |)
        |GROUP BY cohort, week_offset ORDER BY cohort, week_offset""".stripMargin,

    "q_scd_intervals" ->
      """WITH seg AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), runs AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM seg
        |), iv AS (
        |  SELECT user_id, CAST(seg AS BIGINT) AS seg, min(event_type) AS state,
        |    min(epoch_us(ts)) AS from_us, count(*) AS n_events
        |  FROM runs GROUP BY user_id, seg
        |)
        |SELECT user_id, seg, state, from_us,
        |  lead(from_us) OVER (PARTITION BY user_id ORDER BY seg) AS to_us,
        |  n_events
        |FROM iv ORDER BY user_id, seg""".stripMargin,

    // Morton interleave replayed as the identical unrolled shift/mask
    // sum. The Spark side sizes the interleave to the key domain
    // (zBucketAdaptive: bits = bit length of the max key, min 3); here
    // the unroll is a STATIC 31-bit interleave — numerically identical,
    // since wider interleaves only prepend zero terms — and the bucket
    // shift re-derives the same domain width as a scalar subquery:
    // 2*greatest(length(bin(max key)), 3) - log2Buckets
    "t_zorder" -> {
      val z = graft.ops.Layout.zValueSql("x", "y", 31)
      s"""WITH li AS (
         |  SELECT l_orderkey, l_partkey AS x, l_suppkey AS y FROM lineitem
         |), zb AS (
         |  SELECT x, y, CAST($z AS BIGINT) >>
         |    (2 * (SELECT greatest(length(bin(greatest(max(x), max(y)))), 3)
         |          FROM li) - 6) AS bucket
         |  FROM li
         |), hb AS (
         |  SELECT x, y, l_orderkey % 64 AS bucket FROM li
         |), zm AS (
         |  SELECT 'zorder' AS layout, CAST(bucket AS BIGINT) AS bucket,
         |    count(*) AS cnt, min(x) AS min_x, max(x) AS max_x,
         |    min(y) AS min_y, max(y) AS max_y
         |  FROM zb GROUP BY bucket
         |  UNION ALL
         |  SELECT 'hash', CAST(bucket AS BIGINT), count(*), min(x), max(x),
         |    min(y), max(y)
         |  FROM hb GROUP BY bucket
         |)
         |SELECT layout, bucket, cnt,
         |  CAST(min_x AS BIGINT) AS min_x, CAST(max_x AS BIGINT) AS max_x,
         |  CAST(min_y AS BIGINT) AS min_y, CAST(max_y AS BIGINT) AS max_y
         |FROM zm ORDER BY layout, bucket""".stripMargin
    },

    // triangle counting replay: same canonical edge set, degree-ordered
    // orientation, wedge join + id-canonical closing-edge join. The
    // orientation tie-break order only decides WHICH root counts a
    // triangle — the triangle set, and so the per-node counts, are
    // order-invariant
    "t_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, 'p' || CAST(l_partkey AS VARCHAR) AS p
        |  FROM lineitem WHERE l_partkey % 4 = 0
        |), e AS (
        |  SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |), deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e
        |  ) GROUP BY node
        |), o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
        |           THEN e.u ELSE e.v END AS src,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
        |           THEN e.v ELSE e.u END AS dst
        |  FROM e JOIN deg d1 ON e.u = d1.node JOIN deg d2 ON e.v = d2.node
        |), tri AS (
        |  SELECT w.p, w.q1, w.q2 FROM (
        |    SELECT e1.src AS p, e1.dst AS q1, e2.dst AS q2
        |    FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst
        |  ) w JOIN e ON least(w.q1, w.q2) = e.u AND greatest(w.q1, w.q2) = e.v
        |)
        |SELECT node, count(*) AS triangles FROM (
        |  SELECT p AS node FROM tri UNION ALL SELECT q1 FROM tri
        |  UNION ALL SELECT q2 FROM tri
        |) GROUP BY node ORDER BY triangles DESC, node LIMIT 50""".stripMargin,

    // brute-force exact Jaccard >= 2/5 over 3-gram shingle sets (prefix
    // filtering is lossless, so the candidate-generation strategy cannot
    // change the answer; pairs sharing no shingle have J = 0 < t and are
    // correctly absent from the shared-shingle brute force too)
    "t_setsim_join" ->
      s"""WITH $corpusCte, ta AS (
         |  SELECT doc_id, string_split_regex(trim(text), '$WS') AS ts FROM corpus
         |), tok AS (
         |  SELECT DISTINCT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS tok
         |  FROM ta, unnest(range(1, len(ts) - 1)) AS u(i)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |), ov AS (
         |  SELECT c.id_a, c.id_b, count(*) AS inter
         |  FROM cand c
         |  JOIN tok ta ON ta.doc_id = c.id_a
         |  JOIN tok tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
         |  GROUP BY c.id_a, c.id_b
         |)
         |SELECT o.id_a, o.id_b, o.inter, sa.n + sb.n - o.inter AS un
         |FROM ov o JOIN sz sa ON o.id_a = sa.doc_id
         |JOIN sz sb ON o.id_b = sb.doc_id
         |WHERE o.inter * 5 >= 2 * (sa.n + sb.n - o.inter)
         |ORDER BY id_a, id_b""".stripMargin,

    // grouped HLL: registers replayed exactly (finalized-hash low-8-bit
    // register, integer bit-length rank), estimate replayed in HUGEINT —
    // same exact-rational estimator, floor division, all operands positive
    "t_hll_group" ->
      s"""WITH tok AS (
         |  SELECT lang, t AS tok
         |  FROM documents, unnest(string_split_regex(trim(text), '$WS')) AS u(t)
         |  WHERE t <> ''
         |), ${hllRegCtes("lang, ", "tok", "tok")}, sk AS (
         |  SELECT lang, register, max(rho) AS max_rho FROM hrr
         |  GROUP BY lang, register
         |), est AS (
         |  SELECT lang, count(*) AS n_used,
         |    sum(CAST(1 AS HUGEINT) << CAST(56 - max_rho AS INTEGER)) +
         |      (256 - count(*)) * (CAST(1 AS HUGEINT) << 56) AS dsum
         |  FROM sk GROUP BY lang
         |), ex AS (
         |  SELECT lang, count(DISTINCT tok) AS n_exact FROM tok GROUP BY lang
         |)
         |SELECT e.lang, e.n_used,
         |  CAST((CAST(7213 AS HUGEINT) * 256 * 1000 * 256 * 256 *
         |    (CAST(1 AS HUGEINT) << 56)) //
         |    (CAST(10000 AS HUGEINT) * (1000 * 256 + 1079) * e.dsum) AS BIGINT)
         |    AS n_est,
         |  ex.n_exact
         |FROM est e JOIN ex ON e.lang = ex.lang ORDER BY e.lang""".stripMargin,

    "t_allocate" ->
      """WITH c AS (
        |  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
        |), tot AS (
        |  SELECT sum(cnt) AS total FROM c
        |), q AS (
        |  SELECT event_type, cnt,
        |    (CAST(997 AS HUGEINT) * cnt) // total AS floor_alloc,
        |    (CAST(997 AS HUGEINT) * cnt) % total AS rem
        |  FROM c, tot
        |), lo AS (
        |  SELECT 997 - sum(floor_alloc) AS leftover FROM q
        |), r AS (
        |  SELECT q.*, row_number() OVER (ORDER BY rem DESC, event_type) AS rrank
        |  FROM q
        |)
        |SELECT event_type, cnt,
        |  CAST(floor_alloc + CASE WHEN rrank <= (SELECT leftover FROM lo)
        |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY event_type""".stripMargin,

    // systematic PPS grid replay: id-ordered running weight sum, picks by
    // telescoping ceiling division — all-positive integer `//` (floor)
    // == Spark decimal `div` (truncation); HUGEINT keeps 500*W exact
    "t_weighted_sample" ->
      """WITH pos AS (
        |  SELECT doc_id, n_chars FROM documents WHERE n_chars > 0
        |), cum AS (
        |  SELECT doc_id, n_chars,
        |    SUM(n_chars) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_hi
        |  FROM pos
        |), w AS (
        |  SELECT MAX(cum_hi) AS tw FROM cum
        |)
        |SELECT doc_id, n_chars,
        |  CAST(cum_hi - n_chars AS BIGINT) AS cum_lo,
        |  CAST(cum_hi AS BIGINT) AS cum_hi,
        |  CAST((CAST(500 AS HUGEINT) * cum_hi + tw - 1) // tw
        |    - (CAST(500 AS HUGEINT) * (cum_hi - n_chars) + tw - 1) // tw
        |    AS BIGINT) AS picks
        |FROM cum CROSS JOIN w
        |WHERE (CAST(500 AS HUGEINT) * cum_hi + tw - 1) // tw
        |    - (CAST(500 AS HUGEINT) * (cum_hi - n_chars) + tw - 1) // tw > 0
        |ORDER BY doc_id""".stripMargin,

    // CDC merge replay: base rows as seq = -2^63 inserts, one window over
    // the union, latest (seq, op, payload) per key, deletes filtered —
    // (seq is unique per key: it embeds the unique order key, and the
    // base sentinel appears once per customer). The SAME text also
    // oracles s_cdc_merge: the streaming max_by winner is definitionally
    // this window's rank-1 row
    "q_cdc_merge" -> cdcMergeSql,
    "s_cdc_merge" -> cdcMergeSql,

    // lift-ranked collocations: exact integer c(xy)*N*10^6 // (c(x)*c(y))
    // in HUGEINT (Spark side DECIMAL(38,0) — both exact), unigram counts
    // over all non-empty normalized tokens, bigrams over adjacent pairs
    "t_pmi" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    string_split(TRIM(REGEXP_REPLACE(LOWER(text), '$WS', ' ', 'g')), ' ') AS tk
        |  FROM documents
        |), tokpos AS (
        |  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS pos
        |  FROM toks
        |), uni AS (
        |  SELECT w, COUNT(*) AS cw FROM tokpos WHERE w <> '' GROUP BY w
        |), n AS (
        |  SELECT COUNT(*) AS n_toks FROM tokpos WHERE w <> ''
        |), bg AS (
        |  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cxy
        |  FROM tokpos a JOIN tokpos b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.w <> '' AND b.w <> ''
        |  GROUP BY a.w, b.w HAVING COUNT(*) >= 5
        |)
        |SELECT bg.w1, bg.w2, bg.cxy, ux.cw AS cx, uy.cw AS cy,
        |  CAST((CAST(bg.cxy AS HUGEINT) * n.n_toks * 1000000)
        |    // (CAST(ux.cw AS HUGEINT) * uy.cw) AS BIGINT) AS lift_ppm
        |FROM bg JOIN uni ux ON bg.w1 = ux.w
        |JOIN uni uy ON bg.w2 = uy.w CROSS JOIN n
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin,

    // brute-force edit join on the same every-10th-part subset: the
    // PASS-JOIN segment filter is lossless, so all-pairs (with the
    // sound |length diff| <= d prefilter) IS the answer; levenshtein is
    // the classic integer DP in both engines
    "t_edit_join" ->
      """WITH p AS (
        |  SELECT p_partkey AS id, p_name AS nm FROM part
        |  WHERE p_partkey % 10 = 0
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.id < b.id
        |  AND abs(length(a.nm) - length(b.nm)) <= 2
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // identical +-1 matrix (constants inlined by the same generator) over
    // the identical q24 components: pure integer sums, fold-order-free
    "t_rand_proj" ->
      s"""WITH qv AS (
         |  SELECT vec_id, ${qvecSql("embedding")} AS qv FROM embeddings
         |)
         |SELECT vec_id,
         |  ${graft.ops.Similarity.randomProjectionSql(64, 16, "qv")
              .mkString(",\n         |  ")}
         |FROM qv ORDER BY vec_id""".stripMargin,

    // whole-bit TF-IDF replay: df = docs containing the term (the
    // index's df), N = corpus size, score = bitlen(N // df) * bitlen(tf).
    // The stored-index twin (indexWrite + searchIndexStored) answers from
    // the persisted term-bucketed posting table — byte-identical output
    // by construction, so the oracle text is shared
    "t_index_search" -> indexSearchSql,
    "t_index_search_stored" -> indexSearchSql,
    // the churn-priced posting store converges to the CURRENT corpus's
    // postings/df/nDocs — the stored state is invisible to this replay
    "t_index_search_incremental" -> indexSearchSql,
    // the STREAMED append-only posting store answers the same retrieval
    // over everything that has arrived — same replay, state invisible
    "s_index_search" -> indexSearchSql,

    "t_kcore" -> kCoreSql(k = 2, rounds = 12),

    // two-stage JL retrieval replay: identical inlined +-1 projection,
    // shortlist distances in HUGEINT (diff^2 ~ 2^62 x 16 dims overflows
    // BIGINT; Spark side uses DECIMAL(38,0) — both exact), ties by
    // corpus id at both stages, exact stage = integer squared-L2
    "t_ann_rp" -> {
      val pd = (0 until 16).map(j =>
        s"(CAST(c.p$j AS HUGEINT) - q.p$j) * (CAST(c.p$j AS HUGEINT) - q.p$j)")
        .mkString(" + ")
      s"""WITH qv AS MATERIALIZED (
         |  SELECT vec_id, ${qvecSql("embedding")} AS qv FROM embeddings
         |), p AS MATERIALIZED (
         |  SELECT vec_id,
         |  ${graft.ops.Similarity.randomProjectionSql(64, 16, "qv")
              .mkString(",\n         |  ")}
         |  FROM qv
         |), sh AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $pd, c.vec_id) AS prank
         |  FROM p c JOIN p q ON q.vec_id < 10 AND c.vec_id <> q.vec_id
         |), re AS (
         |  SELECT s.query_id, s.corpus_id,
         |    ${isqSql("cq.qv", "qq.qv")} AS sq_dist
         |  FROM sh s
         |  JOIN qv cq ON s.corpus_id = cq.vec_id
         |  JOIN qv qq ON s.query_id = qq.vec_id
         |  WHERE s.prank <= 100
         |), rk AS (
         |  SELECT query_id, corpus_id, sq_dist,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sq_dist, corpus_id) AS rank
         |  FROM re
         |)
         |SELECT query_id, corpus_id, sq_dist, CAST(rank AS BIGINT) AS rank
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // skyline replay: the operator's output is the dominance-defined SET
    // (partitioning-independent by candidate losslessness), so a
    // declarative window formulation is a valid oracle — dominated(b)
    // <=> max y over strictly-greater x >= y_b (the RANGE frame: integer
    // cents, so x' > x <=> x' >= x+1), OR some same-x row has greater y
    "q_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey AS id,
        |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dday
        |  FROM orders
        |), w AS (
        |  SELECT id, cents, dday,
        |    max(dday) OVER (ORDER BY cents DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
        |    max(dday) OVER (PARTITION BY cents) AS gm
        |  FROM o
        |)
        |SELECT id, cents, dday FROM w
        |WHERE (m1 IS NULL OR m1 < dday) AND dday = gm
        |ORDER BY id""".stripMargin,

    // 3-D skyline replay: the dominance DEFINITION as a NOT EXISTS over
    // the (customer-sized) aggregate — quadratic in candidates but the
    // frame is 1500*SF*100 rows, and the set is partitioning-independent
    // (losslessness argument in Skyline.scala), so the plain declarative
    // form is a valid oracle
    "q_skyline_3d" ->
      """WITH c AS (
        |  SELECT o_custkey AS id, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS last_day
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT id, n_orders, cents, last_day FROM c a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c b
        |  WHERE b.n_orders >= a.n_orders AND b.cents >= a.cents
        |    AND b.last_day >= a.last_day
        |    AND (b.n_orders > a.n_orders OR b.cents > a.cents
        |         OR b.last_day > a.last_day))
        |ORDER BY id""".stripMargin,

    "q_skyline_4d" ->
      """WITH c AS (
        |  SELECT o_custkey AS id, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS last_day,
        |    CAST(-MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS neg_first_day
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT id, n_orders, cents, last_day, neg_first_day FROM c a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c b
        |  WHERE b.n_orders >= a.n_orders AND b.cents >= a.cents
        |    AND b.last_day >= a.last_day AND b.neg_first_day >= a.neg_first_day
        |    AND (b.n_orders > a.n_orders OR b.cents > a.cents
        |         OR b.last_day > a.last_day OR b.neg_first_day > a.neg_first_day))
        |ORDER BY id""".stripMargin,

    // exact heavy hitters: the Misra-Gries candidate pass is a proven
    // superset and verification is exact, so the plain exact answer IS
    // the oracle regardless of partitioning
    "t_heavy_hitters" ->
      s"""WITH t2 AS (
         |  SELECT string_split_regex(TRIM(text), '$WS') AS ts
         |  FROM documents WHERE text IS NOT NULL
         |), bg AS (
         |  SELECT ts[i] || ' ' || ts[i+1] AS k
         |  FROM t2, unnest(range(1, len(ts))) AS u(i)
         |), n AS (
         |  SELECT count(*) AS c FROM bg
         |)
         |SELECT k AS key, count(*) AS cnt
         |FROM bg CROSS JOIN n
         |GROUP BY k, c HAVING count(*) * 800 >= c
         |ORDER BY key""".stripMargin
  )
}
