package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic hashing primitives for near-duplicate detection at scale:
  * MinHash signatures (→ LSH band join), 64-bit SimHash (→ hamming-banded
  * join), and a Karp-Rabin rolling hash fingerprint.
  *
  * All hashes are seed-fixed and engine-independent so results are stable
  * across runs and cluster sizes.
  */
object TextHashing {
  val MinhashSize = 64
  val LshBands = 16 // 16 bands x 4 rows: ~Jaccard 0.5+ pairs become candidates
  val LshRows: Int = MinhashSize / LshBands

  private val Mersenne61 = (1L << 61) - 1

  // Fixed affine permutation parameters a_i * x + b_i mod (2^61-1),
  // generated from a seeded splitmix64 so every run/engine agrees.
  private val (hashA, hashB): (Array[Long], Array[Long]) = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.fill(MinhashSize)((next() & Long.MaxValue) % (Mersenne61 - 1) + 1)
    val b = Array.fill(MinhashSize)((next() & Long.MaxValue) % Mersenne61)
    (a, b)
  }

  /** Base 64-bit hash of a string (two murmur3-32 halves, fixed seeds). */
  def hash64(s: String): Long = {
    val hi = MurmurHash3.stringHash(s, 0x9747b28c)
    val lo = MurmurHash3.stringHash(s, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  private def mulmod61(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 without overflow, via 128-bit split
    val aHi = a >>> 32
    val aLo = a & 0xffffffffL
    val bHi = b >>> 32
    val bLo = b & 0xffffffffL
    // a*b = aHi*bHi*2^64 + (aHi*bLo + aLo*bHi)*2^32 + aLo*bLo
    var res = modPow2(aHi * bHi, 64) // contribution of 2^64 term
    res = (res + modPow2(aHi * bLo + aLo * bHi, 32)) % Mersenne61
    // aLo*bLo < 2^64 may wrap the signed long; unsigned remainder is exact
    res = (res + java.lang.Long.remainderUnsigned(aLo * bLo, Mersenne61)) % Mersenne61
    res
  }

  // (x * 2^k) mod 2^61-1 where x < 2^64; uses 2^61 ≡ 1
  private def modPow2(x: Long, k: Int): Long = {
    var v = java.lang.Long.remainderUnsigned(x, Mersenne61)
    var shift = k
    while (shift >= 61) { v = (v << 61 - 61); shift -= 61 } // 2^61 ≡ 1: no-op on v
    // v * 2^shift mod M, shift < 61
    val hi = v >>> (61 - shift)
    val lo = (v << shift) & Mersenne61
    (hi + lo) % Mersenne61
  }

  /** MinHash signature over a set of shingles. Empty input → all-max sig. */
  def minhashSignature(shingles: Iterable[String]): Array[Long] = {
    val sig = Array.fill(MinhashSize)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) {
      val x = java.lang.Long.remainderUnsigned(hash64(it.next()), Mersenne61)
      var i = 0
      while (i < MinhashSize) {
        val h = (mulmod61(hashA(i), x) + hashB(i)) % Mersenne61
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** LSH band keys: hash of each band's rows. Equal band key → candidate pair. */
  def lshBands(sig: Array[Long]): Array[Long] = {
    val bands = new Array[Long](LshBands)
    var b = 0
    while (b < LshBands) {
      var acc = 1125899906842597L
      var r = 0
      while (r < LshRows) {
        acc = acc * 31 + sig(b * LshRows + r)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    bands
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing components. */
  def minhashJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < MinhashSize) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / MinhashSize
  }

  /** 64-bit SimHash over tokens (unit weights). */
  def simhash64(toks: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    val it = toks.iterator
    while (it.hasNext) {
      val h = hash64(it.next())
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash 16-bit chunk keys: hamming distance ≤3 pairs share ≥1 of 4 keys
    * (pigeonhole), making near-dup search a 4-way equality join, not O(n²).
    */
  def simhashChunks(h: Long): Array[Long] = {
    Array.tabulate(4)(i => (i.toLong << 32) | ((h >>> (i * 16)) & 0xffffL))
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Karp-Rabin rolling-hash fingerprints of character k-grams: the minimum
    * w of every window — a winnowing-style document fingerprint.
    */
  def rollingFingerprint(text: String, k: Int = 8): Long = {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.isEmpty) return 0L
    if (s.length <= k) return java.lang.Long.remainderUnsigned(hash64(s), Mersenne61)
    val base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = mulmod61(pow, base); i += 1 }
    var h = 0L
    var minH = Long.MaxValue
    i = 0
    while (i < s.length) {
      h = (mulmod61(h, base) + s.charAt(i)) % Mersenne61
      if (i >= k) {
        h = (h - mulmod61(s.charAt(i - k).toLong, mulmod61(pow, base)) % Mersenne61 + Mersenne61) % Mersenne61
      }
      if (i >= k - 1 && h < minH) minH = h
      i += 1
    }
    minH
  }
}
