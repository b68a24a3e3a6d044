package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextHashingSpec extends AnyFunSuite {
  import TextHashing._

  private def shingles(s: String): Set[String] =
    s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet

  private def exactJaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("minhash estimate tracks exact jaccard") {
    val base = (1 to 200).map(i => s"token$i word$i item$i").mkString(" ")
    val similar = base.split(" ").drop(30).mkString(" ") // high overlap
    val unrelated = (1 to 200).map(i => s"other$i thing$i stuff$i").mkString(" ")
    val (sa, sb, sc) = (shingles(base), shingles(similar), shingles(unrelated))
    val (ma, mb, mc) =
      (minhashSignature(sa), minhashSignature(sb), minhashSignature(sc))
    assert(math.abs(minhashJaccard(ma, mb) - exactJaccard(sa, sb)) < 0.2)
    assert(minhashJaccard(ma, mc) < 0.1)
    assert(exactJaccard(sa, sc) == 0.0)
  }

  test("minhash signature is deterministic and order-insensitive") {
    val s = Set("a b c", "b c d", "c d e")
    assert(minhashSignature(s).sameElements(minhashSignature(s.toList.reverse)))
  }

  test("lsh bands collide for near-identical docs, not for unrelated ones") {
    val base = (1 to 300).map(i => s"w$i").mkString(" ")
    val near = base + " extra"
    val far = (1 to 300).map(i => s"z$i").mkString(" ")
    val bandsOf = (t: String) => lshBands(minhashSignature(shingles(t))).toSet
    assert(bandsOf(base).intersect(bandsOf(near)).nonEmpty)
    assert(bandsOf(base).intersect(bandsOf(far)).isEmpty)
  }

  test("simhash: similar token sets → small hamming distance") {
    val a = (1 to 200).map(i => s"tok$i")
    val b = a.updated(5, "changed").updated(100, "also")
    val c = (1 to 200).map(i => s"zzz$i")
    val (ha, hb, hc) = (simhash64(a), simhash64(b), simhash64(c))
    assert(hammingDistance(ha, hb) < 12)
    assert(hammingDistance(ha, hc) > 20)
    assert(hammingDistance(ha, ha) == 0)
  }

  test("simhash chunk banding is lossless for hamming ≤ 3") {
    val h = simhash64((1 to 100).map(i => s"t$i"))
    // flip 3 bits spread across different 16-bit chunks
    val h2 = h ^ (1L << 2) ^ (1L << 20) ^ (1L << 40)
    assert(hammingDistance(h, h2) == 3)
    // pigeonhole: 4 chunks, 3 flips → at least one chunk untouched
    assert(simhashChunks(h).toSet.intersect(simhashChunks(h2).toSet).nonEmpty)
  }

  test("rolling fingerprint: whitespace/case-insensitive, content-sensitive") {
    val fp = rollingFingerprint("The Quick  Brown Fox")
    assert(fp == rollingFingerprint("the quick brown\tfox"))
    assert(fp != rollingFingerprint("the quick brown cat"))
    assert(rollingFingerprint("") == 0L)
    assert(rollingFingerprint("abc") == rollingFingerprint("abc"))
  }

  test("rolling fingerprint folds codepoints, not UTF-16 units (oracle parity)") {
    // independent BigInt reference over codepoints — the same fold the q2c
    // DuckDB oracle computes with unicode(c); a surrogate-pair iteration
    // would fold two values for the emoji and diverge
    val m = BigInt(2).pow(61) - 1
    def ref(s: String): Long = {
      var h = BigInt(0)
      s.codePoints().toArray.foreach(cp => h = (h * 1000003 + cp) % m)
      h.toLong
    }
    val nonBmp = "a😀b" // a😀b
    assert(rollingFingerprint(nonBmp) == ref(nonBmp.toLowerCase))
    assert(rollingFingerprint("héllo wörld") == ref("héllo wörld"))
  }

  test("winnowing fingerprints: shared runs share fingerprints") {
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val b = "PREFIX text here. " + a + " SUFFIX trailing words"
    val c = "completely different content with no overlap at all whatsoever here"
    val (fa, fb, fc) = (winnowingFingerprints(a).toSet,
      winnowingFingerprints(b).toSet, winnowingFingerprints(c).toSet)
    assert(fa.intersect(fb).size >= fa.size / 2) // long shared run
    assert(fa.intersect(fc).isEmpty)
    assert(winnowingFingerprints("").isEmpty)
    assert(winnowingFingerprints("tiny").length == 1)
  }

  test("hash64 is stable (fixed seeds)") {
    assert(hash64("stable") == hash64("stable"))
    assert(hash64("a") != hash64("b"))
  }
}
