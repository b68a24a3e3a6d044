package graft.operators

import graft.SparkTestBase
import graft.functions.MockEmbedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Seeder corpus (FIXTURES.md §1 / cmd/seeder/main.go:30-160): five docs
    * with unique searchable phrases.
    */
  private val seederDocs = Seq(
    ("alpha", "Project Alpha confidential report. This document contains CONFIDENTIAL data about the project."),
    ("beta", "Beta analysis quarterly results. Financial metrics and growth numbers."),
    ("gamma", "Gamma protocol implementation guide. Security terms and handshake specification."),
    ("delta", "Delta research findings summary. Compression algorithms comparison."),
    ("epsilon", "Epsilon design document architecture. Microservices and queue topology."))

  private def chunksDf = {
    import spark.implicits._
    seederDocs.toDF("document_id", "content")
      .withColumn("vector", graft.functions.GraftFunctions.mockEmbed(col("content"), 64))
      .withColumn("organization_id", lit("org1"))
  }

  test("semantic search ranks the exact phrase's document first") {
    for ((id, phrase) <- Seq(
        "alpha" -> "Project Alpha confidential report. This document contains CONFIDENTIAL data about the project.")) {
      val hits = VectorSearch.semanticSearch(chunksDf, phrase, k = 3,
        organizationId = Some("org1"), dim = 64).collect()
      assert(hits.head.getAs[String]("document_id") == id)
      assert(hits.head.getAs[Double]("score") > 0.999)
    }
  }

  test("tenant filter excludes other organizations (F4)") {
    val hits = VectorSearch.semanticSearch(chunksDf, "anything", k = 3,
      organizationId = Some("other-org"), dim = 64)
    assert(hits.count() == 0)
  }

  test("topK matches a driver-side brute-force ranking") {
    import spark.implicits._
    val corpus = (0 until 200).map(i => (i.toLong, MockEmbedder.embed(s"doc $i", 32)))
    val q = MockEmbedder.embed("doc 7", 32)
    val got = VectorSearch.topK(corpus.toDF("id", "vector"), "vector", q, 5)
      .select("id").as[Long].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expected = corpus.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  test("knnJoin returns k neighbors per query, self excluded, ranked") {
    import spark.implicits._
    val e = (0 until 50).map(i => (i.toLong, MockEmbedder.embed(s"v$i", 32))).toDF("id", "v")
    val res = VectorSearch.knnJoin(
      e.filter(col("id") < 3).select(col("id").as("q_id"), col("v").as("qv")),
      e.select(col("id").as("c_id"), col("v").as("cv")),
      "q_id", "qv", "c_id", "cv", k = 4).collect()
    assert(res.length == 12)
    assert(res.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("knnJoinViaAggregator matches the window-based knnJoin exactly") {
    import spark.implicits._
    val e = (0 until 80).map(i => (i.toLong, MockEmbedder.embed(s"vec$i", 24))).toDF("id", "v")
    val queries = e.filter(col("id") < 5).select(col("id").as("q_id"), col("v").as("qv"))
    val corpus = e.select(col("id").as("c_id"), col("v").as("cv"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "score", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val viaWindow = canon(VectorSearch.knnJoin(queries, corpus, "q_id", "qv", "c_id", "cv", 4))
    val viaAgg = canon(VectorSearch.knnJoinViaAggregator(queries, corpus, "q_id", "qv", "c_id", "cv", 4))
    assert(viaAgg == viaWindow)
  }

  test("hardNegatives: band-filtered top-k, matches filtered brute force") {
    import spark.implicits._
    val e = (0 until 60).map(i => (i.toLong, MockEmbedder.embed(s"hn$i", 24))).toDF("id", "v")
    val queries = e.filter(col("id") < 4).select(col("id").as("q_id"), col("v").as("qv"))
    val corpus = e.filter(col("id") >= 4).select(col("id").as("c_id"), col("v").as("cv"))
    val ceiling = 0.3
    val got = VectorSearch.hardNegatives(queries, corpus,
        "q_id", "qv", "c_id", "cv", k = 3, ceiling = ceiling, floor = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    // brute force: score every pair, filter band, window top-3
    val want = VectorSearch.knnJoin(queries, corpus, "q_id", "qv", "c_id", "cv",
        k = Int.MaxValue - 1)
      .filter(col("score") < ceiling && col("score") >= 0.0)
      .withColumn("rn2", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rn2") <= 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rn2")))
      .sortBy(t => (t._1, t._4)).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(t => t._3 < ceiling && t._3 >= 0.0))
  }

  test("hardNegatives rejects an inverted band") {
    import spark.implicits._
    val e = Seq((1L, MockEmbedder.embed("x", 8))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      VectorSearch.hardNegatives(
        e.select(col("id").as("q_id"), col("v").as("qv")),
        e.select(col("id").as("c_id"), col("v").as("cv")),
        "q_id", "qv", "c_id", "cv", k = 1, ceiling = 0.1, floor = 0.5)
    }
  }

  test("knnJoinViaAggregator handles uuid string ids like the window path") {
    import spark.implicits._
    // uuid-style string keys, including score ties (duplicate vectors) so the
    // lexicographic tiebreak is actually exercised
    val e = (0 until 60).map { i =>
      val vec = MockEmbedder.embed(s"vec${i % 30}", 24) // each vector twice → ties
      (f"chunk-${i % 30}%02d-${i / 30}", vec)
    }.toDF("id", "v")
    val queries = e.filter(col("id").startsWith("chunk-00"))
      .limit(3).select(col("id").as("q_id"), col("v").as("qv"))
    val corpus = e.select(col("id").as("c_id"), col("v").as("cv"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "score", "rn")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val viaWindow = canon(VectorSearch.knnJoin(queries, corpus, "q_id", "qv", "c_id", "cv", 5))
    val viaAgg = canon(VectorSearch.knnJoinViaAggregator(queries, corpus, "q_id", "qv", "c_id", "cv", 5))
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("knnJoinViaAggregator rejects fractional ids instead of truncating") {
    import spark.implicits._
    val e = Seq((1.2, MockEmbedder.embed("a", 8)), (1.9, MockEmbedder.embed("b", 8)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      VectorSearch.knnJoinViaAggregator(
        e.select(col("id").as("q_id"), col("v").as("qv")),
        e.select(col("id").as("c_id"), col("v").as("cv")),
        "q_id", "qv", "c_id", "cv", k = 1)
    }
  }

  test("lsh bucket join recall: clustered vectors find their cluster") {
    import spark.implicits._
    // build clusters: 10 centers, members = center + tiny per-member jitter
    val rnd = new scala.util.Random(7)
    val centers = (0 until 10).map(c => Array.fill(32)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- 0 until 10
      m <- 0 until 20
    } yield {
      val v = centers(c).map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      ((c * 20 + m).toLong, c, v)
    }
    val df = rows.toDF("id", "cluster", "v")
    val res = VectorSearch.lshBucketJoin(
      df.filter(col("id") % 20 === 0).select(col("id").as("q_id"), col("v").as("qv")),
      df.select(col("id").as("c_id"), col("v").as("cv")),
      "q_id", "qv", "c_id", "cv", k = 5, nBits = 6, dim = 32).collect()
    // every returned neighbor should be from the query's own cluster
    val ok = res.count { r =>
      r.getAs[Long]("neighbor_id") / 20 == r.getAs[Long]("query_id") / 20
    }
    assert(res.nonEmpty)
    assert(ok.toDouble / res.length > 0.95)

    // multi-probe recovers at least as many neighbors (hamming-1 buckets)
    val single = res.length
    val multi = VectorSearch.lshBucketJoin(
      df.filter(col("id") % 20 === 0).select(col("id").as("q_id"), col("v").as("qv")),
      df.select(col("id").as("c_id"), col("v").as("cv")),
      "q_id", "qv", "c_id", "cv", k = 5, nBits = 6, dim = 32,
      multiProbe = true).collect()
    assert(multi.length >= single)
    val okMulti = multi.count { r =>
      r.getAs[Long]("neighbor_id") / 20 == r.getAs[Long]("query_id") / 20
    }
    assert(okMulti.toDouble / multi.length > 0.95)
  }

  test("int8 quantization: bounded error, ranking fidelity, zero-vector safe") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val e = ((0 until 200).map(i => (i.toLong, MockEmbedder.embed(s"vec $i", 32)))
      :+ (999L, Array.fill(32)(0f))).toDF("id", "v")
      .withColumn("scale", int8Scale(col("v")))
      .withColumn("q8", int8Quantize(col("v"), col("scale")))
      .withColumn("dv", int8Dequant(col("q8"), col("scale")))
      .cache()
    // per-component reconstruction error ≤ scale/2 (symmetric rounding)
    val bad = e.withColumn("err",
      aggregate(zip_with(col("v"), col("dv"), (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, x) => greatest(acc, x)))
      .filter(col("err") > col("scale") / 2 + 1e-9).count()
    assert(bad == 0)
    // zero vector quantizes to all-zero bytes, dequantizes to zeros
    val z = e.filter(col("id") === 999L).select("q8", "dv").head()
    assert(z.getAs[scala.collection.Seq[Byte]]("q8").forall(_ == 0))
    assert(z.getAs[scala.collection.Seq[Float]]("dv").forall(_ == 0f))
    // ranking fidelity: top-10 by quantized cosine overlaps float top-10
    val q = MockEmbedder.embed("vec 7", 32)
    def top(c: String) = VectorSearch.topK(
      e.filter(col("id") =!= 999L).select(col("id"), col(c).as("vector")),
      "vector", q, k = 10).select("id").as[Long].collect().toSet
    val overlap = (top("v") intersect top("dv")).size
    assert(overlap >= 8, s"quantized top-10 overlap only $overlap/10")
    e.unpersist()
  }

  test("pre-normalized dot ranking equals cosine ranking on raw vectors") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val e = (0 until 150).map(i => (i.toLong, MockEmbedder.embed(s"n$i", 24)))
      .toDF("id", "v")
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("nv", l2NormalizeWith(col("v"), col("nrm")))
    val qRaw = MockEmbedder.embed("n3", 24)
    val nrm = math.sqrt(qRaw.map(x => x.toDouble * x).sum)
    val qNorm = qRaw.map(x => (x / nrm).toFloat)
    val byCosine = VectorSearch.topK(
      e.select(col("id"), col("v").as("vector")), "vector", qRaw, 10)
      .select("id").as[Long].collect().toSeq
    val byDot = e.crossJoin(
        Seq(Tuple1(qNorm)).toDF("qv"))
      .select(col("id"), round(dot(col("nv"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(10)
      .select("id").as[Long].collect().toSeq
    assert(byDot == byCosine)
  }

  test("cosinePairs finds only above-threshold pairs") {
    import spark.implicits._
    val a = Array.fill(16)(1.0f)
    val b = a.clone(); b(0) = 0.9f // nearly identical
    val c = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "v")
    val pairs = VectorSearch.cosinePairs(df, "id", "v", threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("vec_a") == 1L)
    assert(pairs.head.getAs[Long]("vec_b") == 2L)
  }

  test("semanticDedup: survivors have no smaller-id near-dup in their cell") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.centroidsByDraw(e, "vec_id", "embedding", nCells = 16)
    val assigned = IvfIndex.assign(e, "embedding", idx)
    val survivors = VectorSearch.semanticDedup(
      assigned, "vec_id", "embedding", threshold = 0.38)
    // brute-force replica of the survivor rule
    val all = assigned.select(col("vec_id"), col("cell"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).toArray))
    val expect = all.filter { case (id, cell, v) =>
      !all.exists { case (id2, cell2, v2) =>
        id2 < id && cell2 == cell &&
          IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v2, v), 6) >= 0.38
      }
    }.map(_._1).toSet
    val got = survivors.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.size < all.length, "threshold 0.38 must actually drop something")
    // schema passes through unchanged (dedup is an anti-join, not a reshape)
    assert(survivors.columns.toSeq === assigned.columns.toSeq)
  }

  test("semanticDedup threshold extremes: keep-all above max, one-per-cell at zero") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.centroidsByDraw(e, "vec_id", "embedding", nCells = 16)
    val assigned = IvfIndex.assign(e, "embedding", idx).cache()
    try {
      val n = assigned.count()
      // above any attainable cosine: nothing drops
      assert(VectorSearch.semanticDedup(assigned, "vec_id", "embedding",
        threshold = 1.1).count() === n)
      // at -1.1 every pair qualifies: exactly the min id of each cell survives
      val minPerCell = assigned.groupBy("cell")
        .agg(org.apache.spark.sql.functions.min("vec_id").as("m"))
        .collect().map(_.getLong(1)).toSet
      val got = VectorSearch.semanticDedup(assigned, "vec_id", "embedding",
        threshold = -1.1).select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got === minPerCell)
    } finally assigned.unpersist()
  }

  test("semanticDecontaminate: drops exactly the corpus docs near a benchmark vector") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.centroidsByDraw(e, "vec_id", "embedding", nCells = 16)
    val assigned = IvfIndex.assign(e, "embedding", idx).cache()
    try {
      val corpus = assigned.filter(col("vec_id") >= 20)
      val bench = assigned.filter(col("vec_id") < 20)
      val got = VectorSearch.semanticDecontaminate(
        corpus, bench, "vec_id", "embedding", threshold = 0.35)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      // brute-force replica
      val all = assigned.select(col("vec_id"), col("cell"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getAs[scala.collection.Seq[Float]](2).toArray))
      val expect = all.filter(_._1 >= 20).filter { case (_, cell, v) =>
        !all.exists { case (id2, cell2, v2) =>
          id2 < 20 && cell2 == cell &&
            IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v2, v), 6) >= 0.35
        }
      }.map(_._1).toSet
      assert(got === expect)
      assert(got.size < all.count(_._1 >= 20), "threshold 0.35 must drop something")
      // above any attainable cosine nothing drops; at -2 every corpus doc
      // sharing a cell with ANY benchmark vector falls
      assert(VectorSearch.semanticDecontaminate(corpus, bench, "vec_id",
        "embedding", 1.1).count() === corpus.count())
      val benchCells = bench.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      val survivors = VectorSearch.semanticDecontaminate(corpus, bench,
        "vec_id", "embedding", -2.0)
        .select("cell").collect().map(_.getInt(0)).toSet
      assert(survivors.intersect(benchCells).isEmpty)
    } finally assigned.unpersist()
  }

  test("semanticDedup is partition-invariant") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.centroidsByDraw(e, "vec_id", "embedding", nCells = 16)
    def run(parts: Int) = VectorSearch.semanticDedup(
      IvfIndex.assign(e.repartition(parts), "embedding", idx),
      "vec_id", "embedding", threshold = 0.38)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(run(1) === run(13))
  }
}
