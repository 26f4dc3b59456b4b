package graft.functions

import scala.collection.mutable

/** Faithful Scala port of CPython `difflib.SequenceMatcher(None, a, b).ratio()`
  * operating on character sequences, including the *autojunk* heuristic
  * (elements occurring in more than 1% of positions of `b` when
  * `b.length >= 200` are treated as junk for anchoring, but matches may still
  * extend through them).
  *
  * This is the only genuinely custom scalar kernel the reference engine has:
  * its fuzzy string comparator (reference `running_validation.py:306-316`)
  * is `SequenceMatcher(None, str(s1), str(s2)).ratio() >= threshold`.
  * Ratcliff–Obershelp: ratio = 2*M / (len(a)+len(b)) where M is the total
  * size of matched blocks found by recursively taking the longest matching
  * block and recursing on both sides.
  *
  * Port is algorithmically identical to CPython's difflib so that golden
  * outputs of the reference (e.g. `CTS-VS` vs `CTS-V` -> 10/11) reproduce
  * bit-for-bit.
  */
object DifflibRatio extends Serializable {

  /** ratio in [0,1]; both empty -> 1.0 (difflib behavior: 2*0/0 is special-
    * cased by calc_ratio only when total length > 0; difflib returns 1.0). */
  def ratio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (a == b) return 1.0 // exact: identical strings match in full, 2n/2n
    val matches = totalMatches(a, b)
    2.0 * matches / (la + lb)
  }

  /** Port of difflib `real_quick_ratio`: upper bound on [[ratio]] from
    * lengths alone (matched blocks can't exceed the shorter string). O(1). */
  def realQuickRatio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) 1.0
    else 2.0 * math.min(la, lb) / (la + lb)
  }

  /** Port of difflib `quick_ratio`: upper bound on [[ratio]] from the
    * character-multiset intersection (matched blocks consume one occurrence
    * of each character from both sides). O(la + lb). */
  def quickRatio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    val full = new mutable.HashMap[Char, Int]()
    var i = 0
    while (i < lb) {
      val ch = b.charAt(i)
      full(ch) = full.getOrElse(ch, 0) + 1
      i += 1
    }
    val avail = new mutable.HashMap[Char, Int]()
    var matches = 0
    i = 0
    while (i < la) {
      val ch = a.charAt(i)
      val numb = avail.getOrElse(ch, full.getOrElse(ch, 0))
      avail(ch) = numb - 1
      if (numb > 0) matches += 1
      i += 1
    }
    2.0 * matches / (la + lb)
  }

  /** `ratioNullSafe(a, b) >= threshold`, but with difflib's cheap upper
    * bounds tried first — the guard that keeps adversarially long strings
    * from stalling a task on the O(n^2) matcher: O(1) length bound, then
    * the O(n) multiset bound, and only when both clear the threshold the
    * full [[ratio]]. The bounds are proven >= ratio (difflib contract;
    * property-tested), so the answer is EXACTLY the unguarded comparison. */
  def ratioGteNullSafe(a: String, b: String, threshold: Double): Boolean = {
    if (a == null && b == null) return 1.0 >= threshold
    if (a == null || b == null) return -1.0 >= threshold
    if (a == b) return 1.0 >= threshold
    if (realQuickRatio(a, b) < threshold) return false
    if (quickRatio(a, b) < threshold) return false
    // a != b here, so la+lb > 0 and ratio()'s empty/equal re-checks are
    // dead — go straight to the matcher
    2.0 * totalMatches(a, b) / (a.length + b.length) >= threshold
  }

  /** Null-semantics wrapper matching the reference's fuzzy_match
    * (`running_validation.py:311-314`): both null -> match (1.0),
    * one null -> mismatch (-1 so any threshold fails). */
  def ratioNullSafe(a: String, b: String): Double =
    if (a == null && b == null) 1.0
    else if (a == null || b == null) -1.0
    else ratio(a, b)

  private final case class Match(i: Int, j: Int, size: Int)

  private def totalMatches(a: String, b: String): Int = {
    val lb = b.length
    // b2j: char -> ascending positions in b (difflib __chain_b)
    val b2j = new mutable.HashMap[Char, mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < lb) {
      b2j.getOrElseUpdate(b.charAt(i), new mutable.ArrayBuffer[Int]()) += i
      i += 1
    }
    // autojunk: popular elements are removed from b2j (they can't ANCHOR a
    // match) but are NOT junk — CPython's isbjunk tests self.bjunk, which
    // stays empty without an isjunk function, so the primary extension
    // phase extends straight through popular characters. (Treating popular
    // as junk reorders the extension phases and changes ratios; caught by
    // the 2000-pair CPython fuzz fixture.)
    if (lb >= 200) {
      val ntest = lb / 100 + 1
      val popular = b2j.collect { case (ch, idxs) if idxs.length > ntest => ch }
      popular.foreach(b2j.remove)
    }
    val bjunk = new mutable.HashSet[Char]() // would hold isjunk() chars; none here

    var total = 0
    val queue = new mutable.ArrayDeque[(Int, Int, Int, Int)]()
    queue.append((0, a.length, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.removeLast()
      val m = findLongestMatch(a, b, b2j, bjunk, alo, ahi, blo, bhi)
      if (m.size > 0) {
        total += m.size
        if (alo < m.i && blo < m.j) queue.append((alo, m.i, blo, m.j))
        if (m.i + m.size < ahi && m.j + m.size < bhi)
          queue.append((m.i + m.size, ahi, m.j + m.size, bhi))
      }
    }
    total
  }

  /** Port of SequenceMatcher.find_longest_match with the two-phase
    * non-junk / junk extension steps. */
  private def findLongestMatch(
      a: String, b: String,
      b2j: mutable.HashMap[Char, mutable.ArrayBuffer[Int]],
      bjunk: mutable.HashSet[Char],
      alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    var j2len = new mutable.HashMap[Int, Int]()
    var i = alo
    while (i < ahi) {
      val newj2len = new mutable.HashMap[Int, Int]()
      b2j.get(a.charAt(i)) match {
        case Some(idxs) =>
          var p = 0
          var break = false
          while (p < idxs.length && !break) {
            val j = idxs(p)
            if (j < blo) { /* skip */ }
            else if (j >= bhi) { break = true }
            else {
              val k = j2len.getOrElse(j - 1, 0) + 1
              newj2len(j) = k
              if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
            }
            p += 1
          }
        case None =>
      }
      j2len = newj2len
      i += 1
    }
    // extend over non-junk
    while (besti > alo && bestj > blo && !bjunk.contains(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        !bjunk.contains(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
      bestsize += 1
    }
    // extend over junk
    while (besti > alo && bestj > blo && bjunk.contains(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        bjunk.contains(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
      bestsize += 1
    }
    Match(besti, bestj, bestsize)
  }
}
