package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DifflibRatio

/** Golden values generated with CPython 3.x difflib:
  * `difflib.SequenceMatcher(None, a, b).ratio()`. The first two pairs are
  * the reference's own golden diff artifact rows
  * (`output/result/output_oracle_postgres_MODEL_result.csv_differing_values.csv`).
  */
class DifflibRatioSpec extends AnyFunSuite {

  private def assertClose(got: Double, want: Double): Unit =
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")

  test("golden parity with CPython difflib") {
    assertClose(DifflibRatio.ratio("CTS-VS", "CTS-V"), 0.9090909090909091)
    assertClose(DifflibRatio.ratio("Ssierraa", "Sierra"), 0.8571428571428571)
    assertClose(DifflibRatio.ratio("", ""), 1.0)
    assertClose(DifflibRatio.ratio("a", ""), 0.0)
    assertClose(DifflibRatio.ratio("abc", "abc"), 1.0)
    assertClose(DifflibRatio.ratio("abcdef", "xyz"), 0.0)
    assertClose(DifflibRatio.ratio("the quick brown fox", "the quick brown dog"),
      0.8947368421052632)
  }

  test("autojunk path (b >= 200 chars with popular elements)") {
    // difflib: 0.9615384615384616 — popular 'a' is junk for anchoring but
    // matches still extend through it
    assertClose(DifflibRatio.ratio("a" * 250 + "b" * 10, "a" * 250 + "c" * 10),
      0.9615384615384616)
  }

  test("null semantics wrapper") {
    assertClose(DifflibRatio.ratioNullSafe(null, null), 1.0)
    assert(DifflibRatio.ratioNullSafe("x", null) < 0)
    assert(DifflibRatio.ratioNullSafe(null, "x") < 0)
    assertClose(DifflibRatio.ratioNullSafe("x", "x"), 1.0)
  }

  test("property sweep: bounds, identity, disjoint-alphabet zero") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(300)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(300)).mkString
      val r = DifflibRatio.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0, s"out of bounds for ${a.take(20)}/${b.take(20)}")
      assertClose(DifflibRatio.ratio(a, a), 1.0)
    }
    for (_ <- 1 to 100) {
      val a = Seq.fill(rnd.nextInt(50) + 1)(('a' + rnd.nextInt(3)).toChar).mkString
      val b = a.map(c => (c + 3).toChar) // d,e,f — disjoint alphabet
      assertClose(DifflibRatio.ratio(a, b), 0.0)
    }
  }
}
