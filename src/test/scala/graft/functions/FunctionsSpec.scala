package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // --- mock embedder (mock.go:27-56 semantics) ---

  test("fnv32a matches the independent reference implementation") {
    assert(MockEmbedder.fnv32a("hello") == 1335831723L)
    assert(MockEmbedder.fnv32a("") == 2166136261L)
    assert(MockEmbedder.fnv32a("spark window query merge") == 381383822L)
  }

  test("mock embedding is deterministic, L2-normalized, right dimension") {
    val a = MockEmbedder.embed("some text", 384)
    val b = MockEmbedder.embed("some text", 384)
    assert(a.sameElements(b))
    assert(a.length == 384)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(!MockEmbedder.embed("other text", 384).sameElements(a))
  }

  // --- uuid5 (RFC 4122, URL namespace) ---

  test("uuid5 matches the RFC reference implementation") {
    assert(Uuid5.uuid5(Uuid5.NamespaceUrl, "hello").toString
      == "074171de-bc84-5ea4-b636-1135477620e1")
    assert(Uuid5.chunkId("/data/a.txt", 0)
      == "ed1844fc-1c4b-577e-95e0-8b73d0913a0e")
    assert(Uuid5.uuid5(Uuid5.NamespaceUrl, "").toString
      == "1b4db7eb-4057-5ddf-91e0-36dec72071f5")
  }

  test("uuid5 is idempotent across calls (re-ingest stability)") {
    assert(Uuid5.chunkId("p", 3) == Uuid5.chunkId("p", 3))
    assert(Uuid5.chunkId("p", 3) != Uuid5.chunkId("p", 4))
  }

  // --- cosine expression vs pure-API HOF vs scala reference ---

  test("codegen CosineSimilarity == HOF cosine == scala reference") {
    import spark.implicits._
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.5f, 0.25f), Array(-1.0f, 0.75f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val rows = vecs.select(
      VectorFunctions.cosine(col("a"), col("b")).as("expr"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("hof")).collect()
    def ref(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val expected = Seq(
      ref(Array(1f, 2f, 3f), Array(3f, 2f, 1f)),
      ref(Array(0.5f, -0.5f, 0.25f), Array(-1f, 0.75f, 2f)),
      0.0)
    rows.zip(expected).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(0) - e) < 1e-12, "expr")
      assert(math.abs(r.getDouble(1) - e) < 1e-12, "hof")
    }
  }

  test("cosine survives whole-stage codegen over a real scan") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (i.toLong, MockEmbedder.embed(s"doc $i", 16))).toDF("id", "v")
    val q = MockEmbedder.embed("doc 42", 16)
    val top = df.withColumn("s", VectorFunctions.cosine(col("v"), typedLit(q)))
      .orderBy(col("s").desc).limit(1).collect()
    assert(top.head.getLong(0) == 42L)
    assert(math.abs(top.head.getAs[Double]("s") - 1.0) < 1e-9)
  }

  test("codegen int8 codec == HOF twins, incl. half-way rounding and zero scale") {
    import spark.implicits._
    // max = 127 → scale exactly 1.0, so ±2.5 sit exactly on the .5
    // boundary: Spark ROUND is HALF_UP away from zero (3 / −3), where
    // Math.round would give −2 — the parity trap Int8Codec.roundHalfUp0
    // exists for. Plus the zero vector (scale 0 → all-zero codes of the
    // same length) and real embedder vectors.
    val vecs = Seq(
      Array(127.0f, 2.5f, -2.5f, 0.1f, -126.9f),
      Array.fill(5)(0.0f),
      MockEmbedder.embed("alpha", 5),
      MockEmbedder.embed("beta", 5)).map(Tuple1(_)).toDF("v")
    val out = vecs
      .withColumn("s", VectorFunctions.int8Scale(col("v")))
      .withColumn("sh", VectorFunctions.int8ScaleHof(col("v")))
      .withColumn("q", VectorFunctions.int8Quantize(col("v"), col("s")))
      .withColumn("qh", VectorFunctions.int8QuantizeHof(col("v"), col("s")))
      .withColumn("d", VectorFunctions.int8Dequant(col("q"), col("s")))
      .withColumn("dh", VectorFunctions.int8DequantHof(col("qh"), col("s")))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), "scale == HOF scale")
      assert(r.getAs[scala.collection.Seq[Byte]]("q") ==
        r.getAs[scala.collection.Seq[Byte]]("qh"), "codes == HOF codes")
      assert(r.getAs[scala.collection.Seq[Float]]("d") ==
        r.getAs[scala.collection.Seq[Float]]("dh"), "dequant == HOF dequant")
    }
    val q0 = out.head.getAs[scala.collection.Seq[Byte]]("q")
    assert(q0(1) == 3 && q0(2) == -3, s"HALF_UP away from zero, got $q0")
    assert(out(1).getAs[scala.collection.Seq[Byte]]("q") == Seq.fill(5)(0.toByte))
  }

  test("codegen HyperplaneBucket == scala reference dot-sign fold") {
    import spark.implicits._
    val data = (0 until 50).map(i => MockEmbedder.embed(s"v$i", 16))
    val got = data.map(Tuple1(_)).toDF("v")
      .select(graft.operators.VectorSearch
        .hyperplaneBucket(col("v"), nBits = 6, dim = 16, seedBase = 3).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val planes = (0 until 6).map(b =>
      graft.operators.VectorSearch.hyperplane(3 + b, 16))
    val want = data.map { v =>
      (0 until 6).map { b =>
        var dot = 0.0; var j = 0
        while (j < 16) { dot += v(j).toDouble * planes(b)(j); j += 1 }
        if (dot >= 0) 1L << b else 0L
      }.sum
    }
    assert(got == want)
    // wrong-length vector buckets to 0 (the former chain's null-padded
    // zip_with folded such rows to bucket 0 likewise)
    val z = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
      .select(graft.operators.VectorSearch.hyperplaneBucket(col("v"), 6, 16, 3))
      .head().getLong(0)
    assert(z == 0L)
  }

  // --- text analysis columns ---

  test("token count / stopword ratio / mean word length") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "  ", "a a a b").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.meanWordLen(col("text")).as("mwl")).collect()
    assert(r(0).getLong(0) == 4)
    assert(math.abs(r(0).getDouble(1) - 0.25) < 1e-12) // "the"
    assert(math.abs(r(0).getDouble(2) - 4.0) < 1e-12) // (3+5+5+3)/4
    assert(r(1).getLong(0) == 0 && r(1).getDouble(1) == 0.0)
    assert(r(2).getLong(0) == 4)
    assert(math.abs(r(2).getDouble(1) - 0.75) < 1e-12) // three "a"
  }

  test("word shingles: distinct 3-grams, short-text fallback") {
    import spark.implicits._
    val df = Seq("a b c d", "one two").toDF("text")
    val r = df.select(TextAnalysis.wordShingles(col("text"), 3).as("g")).collect()
    assert(r(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0) == Seq("one two"))
  }

  test("script counts and ratios on mixed-script text") {
    import spark.implicits._
    // "Hello(e-acute) Han-x2 Cyrillic-x3 abc": Latin 8, Han 2, Cyrillic 3;
    // non-whitespace total 13
    val t = "H\u00E9llo \u4E2D\u6587 \u043C\u0438\u0440 abc"
    val r = Seq(Tuple1(t)).toDF("text").select(
      TextAnalysis.scriptCount(col("text"), "Latin").as("la"),
      TextAnalysis.scriptCount(col("text"), "Han").as("ha"),
      TextAnalysis.scriptCount(col("text"), "Cyrillic").as("cy"),
      TextAnalysis.scriptRatio(col("text"), "Latin").as("lr")).collect().head
    assert(r.getInt(0) == 8 && r.getInt(1) == 2 && r.getInt(2) == 3)
    assert(math.abs(r.getDouble(3) - 8.0 / 13) < 1e-12)
    val empty = Seq(Tuple1("   ")).toDF("text")
      .select(TextAnalysis.scriptRatio(col("text"), "Latin")).collect().head
    assert(empty.getDouble(0) == 0.0)
  }

  test("dedupLines keeps first occurrences in order; blanks collapse") {
    import spark.implicits._
    val df = Seq(
      "nav\nbody one\nnav\nbody two\nnav", // boilerplate interleaved
      "a\n\nb\n\nc", // repeated blanks collapse to one
      "only line").toDF("text")
    val r = df.select(TextAnalysis.dedupLines(col("text")).as("d"))
      .collect().map(_.getString(0))
    assert(r(0) == "nav\nbody one\nbody two")
    assert(r(1) == "a\n\nb\nc")
    assert(r(2) == "only line")
  }

  test("langid detects via stopwords and han fast-path") {
    assert(LangId.detect("the cat sat on the mat with it") == "en")
    assert(LangId.detect("el perro y la casa de los niños") == "es")
    assert(LangId.detect("der Hund und die Katze auf den Tischen") == "de")
    assert(LangId.detect("le chat et les maisons du village") == "fr")
    assert(LangId.detect("这是一个中文句子") == "zh")
    assert(LangId.detect("xyzzy plugh") == "und")
    assert(LangId.detect("") == "und")
    // ideographic space U+3000 counts as a character (RE2 \s doesn't strip
    // it), exactly like the q2b oracle — must still classify as zh
    assert(LangId.detect("这是中文　句子") == "zh")
    // non-BMP chars count once (codepoint iteration, like DuckDB length())
    assert(LangId.detect("😀 the and of to in is that it") == "en")
  }
}
