package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity join by prefix filtering (Chaudhuri, Ganti &
  * Kaushik 2006, "A primitive operator for similarity joins in data
  * cleaning"; the position-enhanced variants are Xiao et al. 2008,
  * PPJoin). Complements the probabilistic near-dup stack in [[Dedup]]:
  * MinHash/LSH trade recall for speed; prefix filtering is LOSSLESS —
  * it returns exactly the pairs with Jaccard >= t, just without the
  * all-pairs blow-up.
  *
  * The filter: order the token universe by ascending document frequency
  * (rarest first, ties by token). For a set x of size n and threshold t,
  * any y with J(x,y) >= t must share at least one token with x among
  * x's first `n - ceil(t*n) + 1` tokens in that global order (if all of
  * x's prefix tokens were absent from y, the overlap is at most
  * n - prefix < ceil(t*n) <= t*|x u y| — contradiction). So candidate
  * generation only indexes PREFIX tokens — and because the order puts
  * RARE tokens in prefixes, the per-token candidate lists are short:
  * the frequent tokens that would create quadratic blocks land at the
  * back of every set, outside every prefix.
  *
  * Why this survives 100 TB: the candidate join keys on prefix tokens
  * whose posting lists the frequency order keeps small; verification
  * is a keyed intersection count over candidates only; every quantity
  * (overlap, union, the threshold test by integer cross-multiplication)
  * is exact integer arithmetic — engine-exact, no floats anywhere.
  */
object SetSim {

  /** All unordered pairs of `docs` with Jaccard >= tn/td (threshold as
    * an exact rational, e.g. 2/5) between their DISTINCT `shingleW`-gram
    * shingle sets (whitespace tokens joined by single spaces; `shingleW
    * = 1` compares raw token sets — note single-token sets are far less
    * discriminative: on repetitive corpora most pairs collide, and the
    * output itself goes quadratic). Output: (id_a, id_b, inter, un) with
    * id_a < id_b — overlap and union sizes as BIGINTs; the Jaccard test
    * `inter/un >= tn/td` is evaluated as `inter*td >= tn*un`.
    *
    * Plan shape: one shingle-frequency aggregate; a global frequency rank
    * via [[Indexing.globalRowNumber]]'s partition-offset decomposition
    * (NO single-partition window anywhere — the vocabulary is unbounded
    * at web scale, so the rank must distribute); per-doc
    * sorted shingle-rank arrays (per-doc bounded); a candidate equi-join
    * on prefix shingles; one verification join on (id_a, id_b) against
    * the exploded shingle table. Nothing all-pairs, nothing driver-side. */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      tn: Int, td: Int, shingleW: Int = 3): DataFrame = {
    require(tn > 0 && td > 0 && tn <= td, "threshold must be in (0, 1]")
    require(shingleW >= 1, "shingle width must be positive")
    val w = shingleW
    val shingleExpr =
      if (w == 1) "array_distinct(filter(__ta, t -> t != ''))"
      else {
        val cat = (0 until w).map(j => s"__ta[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
        s"CASE WHEN size(__ta) >= $w THEN " +
          s"array_distinct(transform(sequence(0, size(__ta)-$w), i -> $cat)) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END"
      }
    val toks = docs
      .select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("__ta"))
      .select(col("id"), explode(expr(shingleExpr)).as("tok"))
      .persist()
    // global order: ascending doc frequency, ties by token text — via the
    // partition-offset decomposition (globalRowNumber), never a
    // single-partition window: the frame is vocabulary-sized, which at
    // web scale is far too large to sort on one task
    val rank = Indexing.globalRowNumber(
        toks.groupBy("tok").agg(count(lit(1)).as("df")),
        Seq("df", "tok"), outCol = "r")
      .select("tok", "r")
    val ranked = toks.join(rank, "tok").select(col("id"), col("r"))
    // per-doc rank-sorted token array + size; prefix length
    // n - ceil(tn*n/td) + 1, with ceil(a/b) = (a+b-1) div b for a,b > 0
    // (Spark's `div` truncates toward zero, DuckDB's `//` floors — the
    // all-positive form is identical under both)
    val sets = ranked.groupBy("id")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .withColumn("n", size(col("rs")).cast("long"))
      .withColumn("plen",
        col("n") - expr(s"(($tn * n) + ${td - 1}) div $td") + lit(1L))
      .persist()
    val prefixes = sets.select(col("id"), col("n"),
      posexplode(slice(col("rs"), lit(1), col("plen").cast("int"))))
      .withColumnRenamed("col", "r") // (pos = 0-based index, r = rank)
    // candidates: docs sharing a prefix token, each unordered pair once.
    // Two lossless prunes run IN the join so rejected rows never reach
    // the dedup exchange: the size filter (J >= t forces td*na >= tn*nb
    // and vice versa) and PPJoin's positional filter (Xiao et al. 2008):
    // a pair's overlap o needs o*(tn+td) >= tn*(na+nb), but the common
    // tokens all sit at or after the matching positions, so o <=
    // min(na-pa, nb-pb)+1 — a pair whose every prefix match fails the
    // bound cannot reach the threshold, while a qualifying pair always
    // passes it at its FIRST common token. All-integer arithmetic.
    // o_ub >= ceil(tn*(na+nb)/(tn+td))  <=>  o_ub*(tn+td) >= tn*(na+nb)
    // (cross-multiplied: integer-exact, no division at all)
    val cands = prefixes.as("x").join(prefixes.as("y"),
        col("x.r") === col("y.r") && col("x.id") < col("y.id") &&
          col("x.n") * td >= col("y.n") * tn &&
          col("y.n") * td >= col("x.n") * tn &&
          (least(col("x.n") - col("x.pos") - 1, col("y.n") - col("y.pos") - 1)
            + lit(1L)) * lit(tn + td) >= lit(tn) * (col("x.n") + col("y.n")))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // exact overlap WITHOUT re-exploding: each candidate pair fetches the
    // two per-doc sorted rank arrays (two keyed joins against the
    // doc-sized sets frame) and counts the overlap with ONE allocation-
    // free sorted-merge sweep in codegen ([[graft.functions
    // .sortedIntersectSize]] — ranks are distinct and rs is sorted, the
    // expression's contract). The alternatives measured at sf0.1: the
    // exploded-token re-join shuffles |pairs| x |shingles| skinny rows
    // (~5 s); size(array_intersect(...)) allocates a hash set per pair
    // (~2.4 s); the merge sweep is ~86 comparisons per pair.
    val inter = cands
      .join(sets.select(col("id").as("id_a"), col("rs").as("rs_a"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("rs").as("rs_b"),
        col("n").as("nb")), "id_b")
      .withColumn("inter",
        graft.functions.sortedIntersectSize(col("rs_a"), col("rs_b")))
    val out = inter
      .withColumn("un", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * td >= col("un") * tn)
      .select(col("id_a"), col("id_b"), col("inter"), col("un"))
      .localCheckpoint(true)
    sets.unpersist()
    toks.unpersist()
    out
  }
}
