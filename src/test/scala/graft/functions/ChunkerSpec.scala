package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's chunker unit contract
  * (/root/reference/internal/processor/chunker_test.go:10-160) plus
  * seeded property-style overlap/coverage invariants.
  */
class ChunkerSpec extends AnyFunSuite {
  import TextChunker._

  test("short text returns a single identical chunk") {
    val text = "This is a short text. It should fit in one chunk."
    assert(chunkSentenceAware(text) == Seq(text))
  }

  test("empty input yields zero chunks") {
    assert(chunkSentenceAware("") == Seq.empty)
    assert(chunkNaive("") == Seq.empty)
  }

  test("long text yields multiple chunks with bounded total length") {
    val para = "The quick brown fox jumps over the lazy dog. " * 10
    val text = Seq.fill(7)(para).mkString("\n\n")
    val chunks = chunkSentenceAware(text)
    assert(chunks.length >= 2)
    // every chunk within the size bound
    assert(chunks.forall(_.length <= DefaultChunkSize))
    // total ≤ original + overlap per join (trim can only shrink)
    val bound = text.length + DefaultOverlap * (chunks.length - 1)
    assert(chunks.map(_.length).sum <= bound)
  }

  test("consecutive chunks overlap") {
    val text = ("A" * 800) + ". " + ("B" * 800) + ". " + ("C" * 800) + "."
    val chunks = chunkSentenceAware(text)
    assert(chunks.length >= 2)
    chunks.sliding(2).foreach {
      case Seq(prev, next) =>
        // the head of `next` must occur in `prev` (shared overlap region)
        val head = next.take(20)
        assert(prev.contains(head) || text.contains(head))
      case _ =>
    }
  }

  test("at least half of the chunks end at a sentence boundary") {
    val sentences = (1 to 200).map(i => s"Sentence number $i is here.").mkString(" ")
    val chunks = chunkSentenceAware(sentences)
    val atBoundary = chunks.count(c =>
      c.endsWith(".") || c.endsWith("!") || c.endsWith("?"))
    assert(chunks.nonEmpty)
    assert(atBoundary * 2 >= chunks.length)
  }

  test("naive chunker: fixed windows, 200 overlap, empties kept") {
    val text = "x" * 2500
    val chunks = chunkNaive(text)
    // windows: [0,1000) [800,1800) [1600,2500) → 3 chunks
    assert(chunks.length == 3)
    assert(chunks(0).length == 1000)
    assert(chunks(2).length == 900)
  }

  test("property: every chunk is a trimmed substring; full text covered") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(300)
      val words = Seq.fill(n)(
        new String(Array.fill(1 + rnd.nextInt(12))(('a' + rnd.nextInt(26)).toChar)))
      val text = words.mkString(" ") + "."
      val chunks = chunkSentenceAware(text, chunkSize = 120, overlap = 20)
      assert(chunks.forall(c => text.contains(c)))
      // coverage: last chunk reaches the end of the trimmed text
      assert(chunks.nonEmpty && text.trim.endsWith(chunks.last.takeRight(5)))
    }
  }

  test("loop guard: pathological overlap ≥ size terminates") {
    val chunks = chunkSentenceAware("y" * 5000, chunkSize = 100, overlap = 100)
    assert(chunks.nonEmpty) // termination is the assertion
  }
}
