package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}

import graft.functions.{compositeKey, seqRatioGte}

/** Comparison mode — reference `data_type: integer | string | date`
  * (`config.yaml:8`, `running_validation.py:643-650`). */
sealed trait CompareMode
object CompareMode {
  /** pandas `to_numeric(errors='coerce')` parity: values coerced to double,
    * unparseable -> null (reference V2, `running_validation.py:242-249`). */
  case object Numeric extends CompareMode
  /** pandas `to_datetime(errors='coerce')` parity (reference V3,
    * `running_validation.py:412-415`). */
  case object Date extends CompareMode
  /** difflib fuzzy ratio >= threshold (reference F1,
    * `running_validation.py:306-316`); threshold >= 1 degenerates to exact
    * null-safe equality (ratio == 1.0 iff strings equal). */
  final case class Fuzzy(threshold: Double) extends CompareMode
}

/** The three independent result sets of one validation run — reference
  * emits them padded side-by-side into one CSV (V5,
  * `running_validation.py:262-275`); we keep them tidy. */
final case class ValidationOutput(
    missingInFirst: DataFrame,   // ids present in second, absent in first
    missingInSecond: DataFrame,  // ids present in first, absent in second
    differing: DataFrame)        // inner-joined rows whose check values differ

/** Spark-native core of the table-diff engine.
  *
  * Scale notes (100 TB):
  *  - both anti-joins and the inner join shuffle on `id` once each; Catalyst
  *    reuses the exchange where plans align, and AQE converts to broadcast
  *    when one side is small (the reference's recorded workload was 2 rows
  *    vs 1.94 M — a textbook broadcast case).
  *  - the diff predicates are pure expressions (`<=>` under whole-stage
  *    codegen); the fuzzy UDF only runs when threshold < 1, post-join.
  *  - duplicate ids produce many-to-many join multiplicity — intended
  *    reference behavior (pandas merge semantics, SURVEY §2.3 J3).
  */
object Validator {

  /** Project a source down to `(id, check)` — composite key construction +
    * column pruning, the reference's synthesized SELECT
    * (`running_validation.py:489-504`). Catalyst pushes the pruning into
    * the scan. */
  def keyed(df: DataFrame, keyCols: Seq[String], checkCol: String): DataFrame =
    df.select(compositeKey(keyCols).as("id"), col(checkCol).as("check"))

  /** Optional date-range filter — exclusive on both ends, matching the
    * reference (`running_validation.py:495-496`: `> start AND < end`). */
  def dateFiltered(df: DataFrame, dateCol: String, start: String, end: String): DataFrame =
    df.filter(col(dateCol) > to_timestamp(lit(start)) && col(dateCol) < to_timestamp(lit(end)))

  /** Coercion used by Numeric mode. `try_cast` ≙ pandas errors='coerce'
    * (works under ANSI mode too). */
  def toNumeric(c: Column): Column = c.cast(StringType).try_cast(DoubleType)

  /** Coercion used by Date mode. */
  def toTs(c: Column): Column = c.try_cast(TimestampType)

  /** The per-mode "values differ" predicate over two check columns.
    * Truth tables (reference V2/V3/F1): both-null -> equal; one-null ->
    * differ; otherwise typed comparison. `<=>` (null-safe equal) negated
    * encodes the whole table in one codegen'd expression. */
  def differs(a: Column, b: Column, mode: CompareMode): Column = mode match {
    case CompareMode.Numeric => !(toNumeric(a) <=> toNumeric(b))
    case CompareMode.Date    => !(toTs(a) <=> toTs(b))
    case CompareMode.Fuzzy(t) if t >= 1.0 => !(a.cast(StringType) <=> b.cast(StringType))
    case CompareMode.Fuzzy(t) =>
      // guarded form: difflib's O(1)/O(n) upper bounds short-circuit the
      // O(n^2) matcher on pairs that can't reach the threshold
      !seqRatioGte(a.cast(StringType), b.cast(StringType), t)
  }

  /** Full validation of two keyed frames (each `(id, check)`).
    *
    * @param firstName/secondName suffix the check columns in the differing
    *        output, matching the reference's `suffixes=(f'_{db1}', f'_{db2}')`
    *        (`running_validation.py:233-239`).
    */
  def validate(
      first: DataFrame,
      second: DataFrame,
      mode: CompareMode,
      firstName: String = "first",
      secondName: String = "second",
      checkName: String = "check"): ValidationOutput = {
    val f = first.select(col("id").cast(StringType).as("id"), col("check"))
    val s = second.select(col("id").cast(StringType).as("id"), col("check"))

    val missingInFirst  = s.select("id").join(f.select("id"), Seq("id"), "left_anti")
    val missingInSecond = f.select("id").join(s.select("id"), Seq("id"), "left_anti")

    val ca = s"${checkName}_$firstName"
    val cb = s"${checkName}_$secondName"
    val joined = f.select(col("id"), col("check").as(ca))
      .join(s.select(col("id"), col("check").as(cb)), Seq("id"), "inner")
    val differing = joined.filter(differs(col(ca), col(cb), mode))

    ValidationOutput(missingInFirst, missingInSecond, differing)
  }

  /** Bucket-level checksums for incremental/merkle-style validation: rows
    * are hashed into `nBuckets` by key; each bucket carries (row count,
    * exact cent-sum of the numeric check column). Comparing the two
    * tables' bucket vectors finds WHERE they differ for the cost of two
    * scans + a tiny aggregate — at 100 TB you run this first and row-diff
    * only the differing buckets (each a 1/nBuckets slice), instead of
    * shuffling both full tables on id.
    */
  /** Conflict-resolution strategy for [[reconcile]]. */
  sealed trait Resolution
  object Resolution {
    case object PreferFirst extends Resolution
    case object PreferSecond extends Resolution
    case object NullOnConflict extends Resolution
  }

  /** Reconciliation: merge the two keyed tables into one corrected
    * `(id, check, status)` table — the natural downstream of a diff
    * report. Equal (null-safe) values pass through; conflicts resolve per
    * strategy; one-sided keys are kept and labeled. One full-outer join,
    * one shuffle.
    *
    * status ∈ {match, conflict, only_first, only_second}. */
  def reconcile(first: DataFrame, second: DataFrame,
      resolution: Resolution = Resolution.PreferFirst): DataFrame = {
    val f = first.select(col("id").cast(StringType).as("id"),
      col("check").as("check_first")).withColumn("in_first", lit(true))
    val s = second.select(col("id").cast(StringType).as("id"),
      col("check").as("check_second")).withColumn("in_second", lit(true))
    val j = f.join(s, Seq("id"), "full_outer")
    val equal = col("check_first") <=> col("check_second")
    val conflictValue = resolution match {
      case Resolution.PreferFirst    => col("check_first")
      case Resolution.PreferSecond   => col("check_second")
      case Resolution.NullOnConflict => lit(null)
    }
    j.select(
      col("id"),
      when(col("in_first").isNull, col("check_second"))
        .when(col("in_second").isNull, col("check_first"))
        .when(equal, col("check_first"))
        .otherwise(conflictValue).as("check"),
      when(col("in_first").isNull, "only_second")
        .when(col("in_second").isNull, "only_first")
        .when(equal, "match")
        .otherwise("conflict").as("status"))
  }

  /** Default bucketing: hash of the key (xxhash64). Pass a custom
    * `bucketExpr` (e.g. `pmod(id.cast(long), n)`) when cross-engine
    * reproducibility of bucket ids matters. */
  def defaultBucket(nBuckets: Int): Column =
    pmod(xxhash64(col("id")), lit(nBuckets.toLong))

  def bucketChecksums(keyed: DataFrame, bucketExpr: Column): DataFrame =
    keyed.groupBy(bucketExpr.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(ROUND(CAST(check AS DOUBLE) * 100) AS BIGINT)")).as("check_cents"))

  /** Buckets whose (count, checksum) differ between the two sides —
    * null-safe full-outer compare so one-sided buckets surface too. */
  def differingBuckets(first: DataFrame, second: DataFrame,
      bucketExpr: Column): DataFrame = {
    val a = bucketChecksums(first, bucketExpr)
      .select(col("bucket"), col("n_rows").as("n_first"), col("check_cents").as("cents_first"))
    val b = bucketChecksums(second, bucketExpr)
      .select(col("bucket"), col("n_rows").as("n_second"), col("check_cents").as("cents_second"))
    a.join(b, Seq("bucket"), "full_outer")
      .filter(!(col("n_first") <=> col("n_second")) ||
        !(col("cents_first") <=> col("cents_second")))
  }

  /** Schema drift between the two sides — the metadata pre-check a
    * validation run should do before shuffling a single row: per column
    * (union of both sides), the Spark type on each side and a status in
    * {match, type_mismatch, only_first, only_second}. Pure driver-side
    * metadata (no job); the result is a tiny local DataFrame. */
  def schemaDiff(first: DataFrame, second: DataFrame): DataFrame = {
    val f = first.schema.map(sf => sf.name -> sf.dataType.simpleString).toMap
    val s = second.schema.map(sf => sf.name -> sf.dataType.simpleString).toMap
    val rows = (f.keySet ++ s.keySet).toSeq.sorted.map { c =>
      val status = (f.get(c), s.get(c)) match {
        case (Some(a), Some(b)) if a == b => "match"
        case (Some(_), Some(_))           => "type_mismatch"
        case (Some(_), None)              => "only_first"
        case (None, Some(_))              => "only_second"
        case (None, None)                 => "unreachable"
      }
      (c, f.get(c).orNull, s.get(c).orNull, status)
    }
    val spark = first.sparkSession
    import spark.implicits._
    rows.toDF("column_name", "type_first", "type_second", "status")
  }

  /** One-row metrics summary of a validation run (counts + match rate) —
    * the aggregate surface the reference lacked but a report needs.
    * Multi-action: counts each result set separately (6 jobs, repeated
    * scans). Kept as the reference implementation that [[summaryFast]] —
    * the single-job production path for every mode — is tested against. */
  def summary(first: DataFrame, second: DataFrame, out: ValidationOutput): DataFrame = {
    val nF = first.count()
    val nS = second.count()
    val m1 = out.missingInFirst.count()
    val m2 = out.missingInSecond.count()
    val nd = out.differing.count()
    val matched = nS - m1 // keys of second found in first (with multiplicity)
    val spark = first.sparkSession
    import spark.implicits._
    Seq((nF, nS, m1, m2, nd, matched))
      .toDF("n_first", "n_second", "missing_in_first", "missing_in_second",
        "n_differing", "n_matched")
  }

  /** Single-pass summary — identical numbers to [[summary]] but ONE Spark
    * job with no repeated scans:
    *
    * each side is reduced to per-(id, coercedValue) counts; per-id pair
    * algebra then yields every metric, including the m-by-n duplicate-key
    * multiplicity of the inner-join diff (differing pairs per id =
    * tot1*tot2 - equal pairs). At 100 TB this replaces six scan+join jobs
    * with two aggregations and two id-keyed joins inside one job.
    *
    * Every mode counts equal pairs over the per-id DISTINCT value sets
    * (id-only join keys — see the eq comment below for why v never
    * becomes a join key), weighted by c1*c2: equality modes test the
    * coerced values null-safe; Fuzzy(t<1) — not an equivalence relation
    * — scores `seq_ratio` once per distinct (v1, v2) pair, the same
    * pairs [[validate]]'s inner join scores row-by-row but deduplicated.
    * Null-id rows (impossible via compositeKey, possible on raw nullable
    * inputs) contribute through count-only sidecar aggregates with
    * exactly [[summary]]'s semantics: they count toward their side's
    * total and its missing-in-the-other metric, never toward
    * differing/matched. */
  def summaryFast(first: DataFrame, second: DataFrame, mode: CompareMode): DataFrame = {
    val coerce: Column => Column = mode match {
      case CompareMode.Numeric  => toNumeric
      case CompareMode.Date     => toTs
      case CompareMode.Fuzzy(_) => c => c.cast(StringType)
    }
    // ONE exchange per side: hashpartitioning(id) satisfies every
    // downstream distribution — the (id, v) grouping (id is a subset of
    // the clustering keys, so same-(id,v) rows are already co-located),
    // the per-id totals, and the id equi-joins — so the explicit
    // repartition replaces what would otherwise be three exchanges per
    // side. Map-side combine is not missed: validation keys are
    // near-unique, so pre-exchange partials save ~nothing. A HOT key
    // necessarily lands in one partition (its rows must meet to be
    // counted); that task's work is the hot key's row share — the
    // skewed-key rehearsal leg measures the bound (a key holding 1% of
    // 10M rows costs ~1.6x the duplicate-key regime), and a key hot
    // enough to dominate would indict the key CHOICE (validation keys
    // are meant to be near-unique), not the plan: repartitioning by
    // (id, v) instead would split it but double-shuffle the common case.
    //
    // The explicit isnotnull(id) filter is load-bearing for that claim:
    // each side feeds TWO consumers (its per-id totals and the eq join),
    // and the exchanges collapse to one per side only when both
    // consumers' subtrees are canonically IDENTICAL. The inner eq join
    // infers isnotnull(id) into ITS copy of each side; with a nullable
    // id column (any parquet read) the totals copy lacked that filter,
    // the subtrees stopped matching, and every input was scanned and
    // shuffled twice — the regression the dupkey rehearsal leg caught
    // (4 keyed exchanges instead of 2). Filtering both branches up
    // front restores the match; null-id rows re-enter through the
    // sidecar aggregates below with exact summary() semantics. For the
    // production path (compositeKey ids, provably non-null) both the
    // filter and the sidecars constant-fold away to nothing.
    def grouped(df: DataFrame) = df
      .filter(col("id").isNotNull)
      .select(col("id").cast(StringType).as("id"), coerce(col("check")).as("v"))
      .repartition(col("id"))
      .groupBy("id", "v").agg(count(lit(1)).as("c"))
    val g1 = grouped(first)
    val g2 = grouped(second)
    val t1 = g1.groupBy("id").agg(sum("c").as("tot1"))
    val t2 = g2.groupBy("id").agg(sum("c").as("tot2"))
    // equal (per the mode's truth table) value pairs per id. The join
    // keys are id ONLY, for every mode: putting v <=> v into the join
    // keys (the exact modes' natural form) makes the planner require a
    // hashpartitioning(id, v) distribution (requireAllClusterKeysForCoPartition
    // defaults true), re-exchanging both aggregated sides — a third and
    // fourth shuffle the id-only join avoids.
    //
    // Exact modes (v already coerced by grouped()) do NOT pay the
    // per-id |V1| x |V2| join expansion for that: g2's distinct values
    // collapse to ONE row per id — a (v -> count) map plus a null-v
    // count — and each g1 row contributes c1 * lookup(v1), so a dirty
    // key carrying thousands of distinct values costs |V1| + |V2| per
    // side, not their product. The per-id map is bounded by that key's
    // OWN distinct values — the same memory class as the rows it
    // replaces. groupBy's NormalizeFloatingNumbers canonicalizes
    // NaN/-0.0 on BOTH sides before the map is built/probed, so the
    // binary map lookup agrees with <=>'s truth table; both-null pairs
    // multiply the two null counts. Fuzzy(t<1) is not an equivalence
    // relation — every distinct pair must be SCORED, so the cross
    // product is intrinsic there and stays the id-only join.
    val eq = mode match {
      case CompareMode.Fuzzy(t) if t < 1.0 =>
        g1.as("a").join(g2.as("b"), col("a.id") === col("b.id"))
          .groupBy(col("a.id"))
          .agg(sum(when(differs(col("a.v"), col("b.v"), mode), lit(0L))
            .otherwise(col("a.c") * col("b.c"))).as("eq_pairs"))
      case _ =>
        val g2m = g2.groupBy("id").agg(
          map_from_entries(collect_list(
            when(col("v").isNotNull, struct(col("v"), col("c"))))).as("m2"),
          sum(when(col("v").isNull, col("c")).otherwise(lit(0L))).as("nulls2"))
        g1.join(g2m, Seq("id"))
          .groupBy("id")
          .agg(sum(
            when(col("v").isNull, col("c") * col("nulls2"))
              .otherwise(col("c") *
                coalesce(element_at(col("m2"), col("v")), lit(0L))))
            .as("eq_pairs"))
    }
    // null-id sidecars: a null id never joins (and never matches in
    // summary()'s anti-joins), so each side's null rows contribute
    // count-only — to (n_first, missing_in_second) resp. (n_second,
    // missing_in_first). Shaped as extra (tot1, eq_pairs, tot2) rows so
    // the final aggregate's existing CASE arithmetic absorbs them: a
    // (n, null, null) row adds n to n_first and — tot2 being null — to
    // missing_in_second, and nothing anywhere else. Cost: a pushed-down
    // `id IS NULL` scan per side when id is nullable (row-group stats
    // skip null-free files); an empty-relation constant when it is not.
    def nullSide(df: DataFrame, firstSide: Boolean) = {
      val n = df.filter(col("id").isNull)
        .agg(count(lit(1)).as(if (firstSide) "tot1" else "tot2"))
      if (firstSide)
        n.select(col("tot1"), lit(null).cast("long").as("eq_pairs"),
          lit(null).cast("long").as("tot2"))
      else
        n.select(lit(null).cast("long").as("tot1"),
          lit(null).cast("long").as("eq_pairs"), col("tot2"))
    }
    // eq attaches to t1 BEFORE the full outer: eq ids are a subset of
    // t1's (they come from the g1xg2 inner join), and t1/eq are both
    // id-partitioned, so this left join needs no exchange — whereas
    // joining eq AFTER the full outer keys on coalesce(id, id), a new
    // expression that would force one more shuffle of the merged side
    t1.join(eq, Seq("id"), "left_outer")
      .join(t2, Seq("id"), "full_outer")
      .select(col("tot1"), col("eq_pairs"), col("tot2"))
      .unionByName(nullSide(first, firstSide = true))
      .unionByName(nullSide(second, firstSide = false))
      .agg(
        sum(coalesce(col("tot1"), lit(0L))).as("n_first"),
        sum(coalesce(col("tot2"), lit(0L))).as("n_second"),
        sum(when(col("tot1").isNull, col("tot2")).otherwise(0L)).as("missing_in_first"),
        sum(when(col("tot2").isNull, col("tot1")).otherwise(0L)).as("missing_in_second"),
        sum(when(col("tot1").isNotNull && col("tot2").isNotNull,
          col("tot1") * col("tot2") - coalesce(col("eq_pairs"), lit(0L)))
          .otherwise(0L)).as("n_differing"),
        sum(when(col("tot1").isNotNull, col("tot2")).otherwise(0L)).as("n_matched"))
      .na.fill(0L) // empty inputs: global agg yields nulls, report zeros
  }
}
