package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class RepetitionStatsSpec extends AnyFunSuite {

  private val Eps = 1e-12

  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < Eps

  test("null and empty text score zero everywhere") {
    for (t <- Seq(null, "")) {
      val s = RepetitionStats.compute(t)
      assert(s == RepetitionStats.Stats(0L, 0.0, 0.0, 0.0, 0.0, 0.0))
    }
  }

  test("duplicate line fractions: hand-computed") {
    // lines: "a b", "c d", "a b" -> 3 lines, 2 distinct
    val s = RepetitionStats.compute("a b\nc d\na b")
    assert(s.nLines == 3L)
    assert(approx(s.dupLineFrac, 1.0 / 3))
    // dup chars: "a b" (len 3) x2 = 6; total = 6 + 3 = 9
    assert(approx(s.dupLineCharFrac, 6.0 / 9))
  }

  test("line trimming drops blank lines and strips tabs/CR, not inner spaces") {
    val s = RepetitionStats.compute("  x y \r\n\t\n   \nx y")
    // trimmed lines: "x y", "x y" (blank-only lines dropped)
    assert(s.nLines == 2L)
    assert(approx(s.dupLineFrac, 0.5))
    assert(approx(s.dupLineCharFrac, 1.0))
  }

  test("top n-gram char fractions: hand-computed") {
    // tokens: a b c d a b (6 tokens, normalized len 11)
    // 2-grams: "a b" x2, "b c", "c d", "d a" -> top mass 2*3=6
    // 3-grams: all distinct, top is smallest in byte order "a b c" mass 5
    val s = RepetitionStats.compute("a b c d a b")
    assert(approx(s.top2gramFrac, 6.0 / 11))
    assert(approx(s.top3gramFrac, 5.0 / 11))
    // 5-grams: "a b c d a", "b c d a b" distinct -> no duplication
    assert(s.dup5gramFrac == 0.0)
  }

  test("degenerate repetition saturates the top-gram cap at 1.0") {
    // "spam spam spam spam spam spam": top 2-gram "spam spam" occurs 5x,
    // mass 5*9=45 > norm chars 29 -> capped
    val s = RepetitionStats.compute("spam spam spam spam spam spam")
    assert(s.top2gramFrac == 1.0)
    assert(s.top3gramFrac == 1.0)
    // 5-grams: "spam spam spam spam spam" x2 -> every gram duplicated
    assert(s.dup5gramFrac == 1.0)
  }

  test("duplicated 5-gram fraction: mixed corpus") {
    // 10 tokens: "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5" -> 6 five-grams, the
    // gram "x1 x2 x3 x4 x5" (len 14) occurs twice, others once (len 14).
    val s = RepetitionStats.compute("x1 x2 x3 x4 x5 x1 x2 x3 x4 x5")
    val total = 6.0 * 14
    assert(approx(s.dup5gramFrac, (2.0 * 14) / total))
  }

  test("fewer tokens than n scores zero for that n") {
    val s = RepetitionStats.compute("one two three")
    assert(s.top2gramFrac > 0.0)
    assert(s.top3gramFrac > 0.0)
    assert(s.dup5gramFrac == 0.0)
    val tiny = RepetitionStats.compute("one")
    assert(tiny.top2gramFrac == 0.0)
    assert(tiny.top3gramFrac == 0.0)
  }

  test("top-gram tie breaks by UTF-8 byte order (DuckDB binary collation)") {
    // tokens: "b z a z" -> 2-grams "b z", "z a", "a z", each once; the top
    // must be "a z" (smallest bytes), mass 3 over norm len 7
    val s = RepetitionStats.compute("b z a z")
    assert(approx(s.top2gramFrac, 3.0 / 7))
  }

  test("tokenization is case-folded and char counts are code points") {
    // "Ab ab" folds to "ab ab": top 2-gram mass 5 = norm len -> 1.0
    val sFold = RepetitionStats.compute("Ab ab")
    assert(sFold.top2gramFrac == 1.0)
    // CJK: each ideograph is one char; "中 文 中 文" norm len 7,
    // top 2-gram "中 文" x2? occurrences: (中 文), (文 中), (中 文) -> mass 2*3=6
    val sCjk = RepetitionStats.compute("中 文 中 文")
    assert(approx(sCjk.top2gramFrac, 6.0 / 7))
  }

  test("whitespace-only text does not crash and stays consistent") {
    val s = RepetitionStats.compute("\n \n")
    assert(s.nLines == 0L)
    // split artifact: two empty tokens -> single 2-gram " ", norm len 1
    assert(s.top2gramFrac == 1.0)
  }
}
