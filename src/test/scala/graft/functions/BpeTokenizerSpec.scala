package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // the Sennrich et al. (2016) worked example: low x5, lower x2,
  // newest x6, widest x3
  private def corpus = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq(Tuple1(words.mkString(" "))).toDF("text")
  }

  test("learned merges match the hand-computed Sennrich example") {
    import BpeTokenizer.Merge
    val merges = BpeTokenizer.train(corpus, "text", nMerges = 4)
    // pair counts: (e,s)=9 ties (s,t</w>)=9 -> lexicographic a wins;
    // then (es,t</w>)=9; then (l,o)=7; then the 6-tie (e,w)<(n,e)<(w,est</w>)
    assert(merges == Seq(
      Merge("e", "s"),
      Merge("es", "t" + BpeTokenizer.EndOfWord),
      Merge("l", "o"),
      Merge("e", "w")))
  }

  test("training is deterministic across partitionings") {
    val a = BpeTokenizer.train(corpus, "text", nMerges = 6)
    val b = BpeTokenizer.train(corpus.repartition(7), "text", nMerges = 6)
    assert(a == b)
  }

  test("encode applies merges by rank and respects word boundaries") {
    val merges = BpeTokenizer.train(corpus, "text", nMerges = 4)
    val eow = BpeTokenizer.EndOfWord
    assert(BpeTokenizer.encode("low", merges) == Seq("lo", "w" + eow))
    assert(BpeTokenizer.encode("lower", merges) == Seq("lo", "w", "e", "r" + eow))
    assert(BpeTokenizer.encode("newest", merges) ==
      Seq("n", "ew", "est" + eow))
    // unseen word degrades to characters + learned sub-units, never fails
    assert(BpeTokenizer.encode("lowest", merges) == Seq("lo", "w", "est" + eow))
    // boundaries: two words never merge across the space
    assert(BpeTokenizer.encode("low low", merges) ==
      Seq("lo", "w" + eow, "lo", "w" + eow))
    assert(BpeTokenizer.encode(null, merges) == Seq.empty)
    assert(BpeTokenizer.encode("", merges) == Seq.empty)
  }

  test("more merges never increase a text's token count") {
    val m2 = BpeTokenizer.train(corpus, "text", nMerges = 2)
    val m8 = BpeTokenizer.train(corpus, "text", nMerges = 8)
    val sample = "newest lowest widest lower"
    assert(BpeTokenizer.encode(sample, m8).length
      <= BpeTokenizer.encode(sample, m2).length)
  }

  test("encoder works as a column UDF; minWordCount floors the vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val merges = BpeTokenizer.train(corpus, "text", nMerges = 4)
    val counts = corpus.select(
      BpeTokenizer.tokenCount(merges)(col("text")).as("n")).head.getInt(0)
    assert(counts > 0)
    // flooring at count >= 3 drops 'lower' (x2) from training entirely:
    // merges can then only come from low/newest/widest symbol stats
    val floored = BpeTokenizer.train(corpus, "text", nMerges = 4, minWordCount = 3L)
    assert(floored.nonEmpty && floored != merges)
  }

  test("marker cannot be forged from corpus text (markup collision guard)") {
    import spark.implicits._
    // markup text whose characters could assemble a literal '</w>'-style
    // marker; with the U+FFFF noncharacter marker no merge sequence can
    // ever equal a boundary-tagged symbol, and literal U+FFFF is stripped
    val docs = Seq(Tuple1("end</w>tag end</w>tag ends ends")).toDF("text")
    val merges = BpeTokenizer.train(docs, "text", nMerges = 12)
    val enc = BpeTokenizer.encode("end</w>tag", merges)
    // the final symbol (and only it) carries the marker
    assert(enc.last.endsWith(BpeTokenizer.EndOfWord))
    assert(enc.init.forall(!_.contains(BpeTokenizer.EndOfWord)))
    // a literal marker char in input is stripped, not boundary-conflated
    assert(BpeTokenizer.encode("ab" + BpeTokenizer.EndOfWord + "cd", merges)
      == BpeTokenizer.encode("abcd", merges))
  }

  test("encode tokenization matches the train-side contract on control chars") {
    import spark.implicits._
    // U+0001 (spelled as an escape per the no-invisible-chars source rule)
    // is <= U+0020, so Java String.trim would strip it — but it is NOT
    // regex-whitespace, so the shared lowerTokens contract KEEPS it in the
    // word. Training on such a corpus learns merges over the tagged word;
    // encode must derive the identical word or its merges never apply.
    val ctl = "\u0001"
    val docs = Seq(Tuple1(s"${ctl}ab ${ctl}ab ab")).toDF("text")
    val merges = BpeTokenizer.train(docs, "text", nMerges = 4)
    val enc = BpeTokenizer.encode(s"${ctl}ab", merges)
    assert(enc.mkString == ctl + "ab" + BpeTokenizer.EndOfWord)
    // space-bounded text still trims; tabs/newlines split but never vanish
    assert(BpeTokenizer.encode("  ab  ", merges) == BpeTokenizer.encode("ab", merges))
    assert(BpeTokenizer.encode("\tab\n", merges) == BpeTokenizer.encode("ab", merges))
  }

  test("training exhausts gracefully when fewer merges exist than requested") {
    import spark.implicits._
    val tiny = Seq(Tuple1("ab ab")).toDF("text")
    // 'ab' -> a b</w>: exactly one mergeable pair, then single symbols
    val merges = BpeTokenizer.train(tiny, "text", nMerges = 10)
    assert(merges.length < 10)
    assert(BpeTokenizer.encode("ab", merges) ==
      Seq("ab" + BpeTokenizer.EndOfWord))
  }
}
