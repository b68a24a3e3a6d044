package graft.operators

/** Lempel-Ziv (LZ76) sequence complexity: the number of distinct phrases
  * the exhaustive-history parser emits while scanning the string once —
  * the classic model-free randomness measure for binarized series
  * (Kaspar-Schuster 1987 formulation). A constant string parses into ~2
  * phrases; an i.i.d. random one approaches n/log2(n).
  *
  * Deterministic integer state machine, so the oracle replays it as a
  * DuckDB recursive CTE walking the identical (i, k, l, kmax, c)
  * transitions — hand-derived goldens in ComplexitySpec pin both.
  *
  * Reference anchor: the-hive has no sequence-complexity surface
  * (internal/server/search_handler.go stops at counts); this extends the engine's
  * time-series battery beside permutation entropy (qbc) and sample
  * entropy (qcy).
  */
object Complexity {

  /** LZ76 phrase count of `s` (any alphabet; callers binarize upstream).
    * n <= 1 returns n: the first comparison needs two characters.
    */
  def lz76(s: String): Int = {
    val n = s.length
    if (n <= 1) return n
    var c = 1; var l = 1; var i = 0; var k = 1; var kmax = 1
    var done = false
    while (!done) {
      if (s.charAt(i + k - 1) == s.charAt(l + k - 1)) {
        k += 1
        if (l + k > n) { c += 1; done = true }
      } else {
        if (k > kmax) kmax = k
        i += 1
        if (i == l) {
          c += 1
          l += kmax
          if (l + 1 > n) done = true
          else { i = 0; k = 1; kmax = 1 }
        } else k = 1
      }
    }
    c
  }
}
