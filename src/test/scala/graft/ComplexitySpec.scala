package graft

import graft.operators.Complexity
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived LZ76 goldens: each expected phrase count was walked
  * through the (i, k, l, kmax, c) state machine by hand, with the parsed
  * phrase decomposition noted — the same transitions the qd0 oracle's
  * recursive CTE replays.
  */
class ComplexitySpec extends AnyFunSuite {

  test("degenerate lengths: n <= 1 returns n") {
    assert(Complexity.lz76("") == 0)
    assert(Complexity.lz76("0") == 1)
    assert(Complexity.lz76("1") == 1)
  }

  test("constant string parses into two phrases (0|000)") {
    assert(Complexity.lz76("0000") == 2)
  }

  test("hand-derived: 01011010 parses 0|1|011|010 = 4") {
    assert(Complexity.lz76("01011010") == 4)
  }

  test("Kaspar-Schuster example: 0001101001000101 parses " +
    "000|1|10|100|1000|101 = 6") {
    assert(Complexity.lz76("0001101001000101") == 6)
  }

  test("alternating string stays low-complexity") {
    // 0|1|0101... : after the first two phrases the parser copies the
    // whole alternating tail in one phrase.
    assert(Complexity.lz76("01010101") == 3)
  }
}
