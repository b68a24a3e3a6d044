package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Offline contract tests for the production embedder adapter against an
  * in-process HTTP stub (VERDICT r7 task 3): batches form at ≤batchSize
  * texts per request, timeouts and transient failures retry, exhausted
  * retries degrade to zero vectors instead of failing the task, and the
  * mapPartitions seam plugs into chunkAndEmbed where the mock plugs today.
  */
class HttpEmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Minimal embedding service stub: answers each request's input texts
    * with the deterministic MockEmbedder vectors (dim 8), after applying a
    * per-request behavior from `script` (sleepMs or HTTP status); requests
    * beyond the script behave normally. Records request input counts.
    */
  private def withStub[A](script: Seq[Either[Int, Int]] = Seq.empty)(
      f: (String, java.util.List[Integer], AtomicInteger) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val sizes = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Integer]())
    val hits = new AtomicInteger(0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      // our own fixed request shape: {"input":["t1","t2",...],"model":".."}
      val in = body.substring(body.indexOf('[') + 1, body.indexOf(']'))
      val texts =
        if (in.trim.isEmpty) Seq.empty[String]
        else in.split("\",\"").map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
      sizes.add(texts.length)
      val n = hits.getAndIncrement()
      val fail = script.lift(n) match {
        case Some(Left(sleepMs)) => Thread.sleep(sleepMs.toLong); None
        case Some(Right(status)) if status != 200 => Some(status)
        case _ => None
      }
      fail match {
        case Some(status) =>
          ex.sendResponseHeaders(status, -1)
          ex.close()
        case None =>
          val data = texts.map { t =>
            val v = graft.functions.MockEmbedder.embed(t, 8)
            v.mkString("{\"embedding\":[", ",", "]}")
          }.mkString("{\"data\":[", ",", "]}")
          val bytes = data.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
      }
    })
    // concurrent executor: a handler sleeping out a timeout script entry
    // must not serialize the retry behind it
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings",
      sizes, hits)
    finally server.stop(0)
  }

  private def emb(url: String, timeoutMs: Int = 5000) = HttpEmbedder(
    endpoint = url, model = "test-model", dim = 8, batchSize = 4,
    timeoutMs = timeoutMs, maxRetries = 2, retryBackoffMs = 1L)

  test("batches form at <=batchSize texts per request, vectors line up") {
    withStub() { (url, sizes, _) =>
      val e = emb(url)
      val texts = (1 to 10).map(i => s"text$i")
      val got = texts.grouped(e.batchSize).flatMap(b => e.embedBatch(b)).toSeq
      assert(sizes.size == 3 && sizes.get(0) == 4 && sizes.get(1) == 4 &&
        sizes.get(2) == 2)
      texts.zip(got).foreach { case (t, v) =>
        assert(v.sameElements(graft.functions.MockEmbedder.embed(t, 8)), t)
      }
    }
  }

  test("a transient 500 retries and succeeds; attempts are bounded") {
    withStub(script = Seq(Right(500))) { (url, _, hits) =>
      val got = emb(url).embedBatch(Seq("abc"))
      assert(hits.get == 2, "one failure + one successful retry")
      assert(got.head.sameElements(graft.functions.MockEmbedder.embed("abc", 8)))
    }
  }

  test("a read timeout retries and succeeds") {
    withStub(script = Seq(Left(900))) { (url, _, hits) =>
      val got = emb(url, timeoutMs = 250).embedBatch(Seq("slow"))
      assert(hits.get >= 2)
      assert(got.head.sameElements(graft.functions.MockEmbedder.embed("slow", 8)))
    }
  }

  test("exhausted retries fall back to zero vectors, never an exception") {
    withStub(script = Seq(Right(500), Right(503), Right(500))) { (url, _, hits) =>
      val got = emb(url).embedBatch(Seq("a", "b"))
      assert(hits.get == 3, "initial + maxRetries=2")
      assert(got.length == 2 && got.forall(_.forall(_ == 0f)))
    }
  }

  test("a short (length-mismatched) response is an error, not a partial result") {
    // stub that always answers with ONE embedding regardless of input size
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/e", (ex: HttpExchange) => {
      hits.incrementAndGet()
      ex.getRequestBody.readAllBytes()
      val b = "{\"data\":[{\"embedding\":[0,0,0,0,0,0,0,0]}]}"
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val e = emb(s"http://127.0.0.1:${server.getAddress.getPort}/e")
      val got = e.embedBatch(Seq("a", "b"))
      assert(hits.get == 3, "length mismatch must retry, then fall back")
      assert(got.length == 2 && got.forall(_.forall(_ == 0f)))
    } finally server.stop(0)
  }

  test("withEmbedding maps partitions through the HTTP adapter inside Spark") {
    withStub() { (url, sizes, _) =>
      import spark.implicits._
      val df = (1 to 9).map(i => (i.toLong, s"doc $i")).toDF("id", "txt")
        .repartition(2)
      val got = Ingest.withEmbedding(df, "txt", emb(url))
        .select("txt", "vector").collect()
      assert(got.length == 9)
      got.foreach { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("vector").toArray
        assert(v.sameElements(
          graft.functions.MockEmbedder.embed(r.getString(0), 8)))
      }
      // 9 rows over 2 partitions at batchSize 4 → 3-4 requests, none over 4
      sizes.forEach(s => assert(s <= 4))
    }
  }

  test("chunkAndEmbedWith(MockBatchEmbedder) equals the codegen mock column path") {
    import spark.implicits._
    val parsed = Seq(
      ("/a/one.txt", "one.txt", "alpha beta gamma delta. second sentence here."),
      ("/a/two.txt", "two.txt", "short doc"))
      .toDF("path", "filename", "text")
    val viaColumn = Ingest.chunkAndEmbed(parsed, "org1", 20, 5, dim = 16)
    val viaSeam = Ingest.chunkAndEmbedWith(parsed, "org1", 20, 5,
      MockBatchEmbedder(dim = 16, batchSize = 3))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("document_id"), col("content"), col("chunk_index"),
        col("vector").cast("array<float>"), col("organization_id"))
      .orderBy("id").collect().map(_.toString).toSeq
    assert(rows(viaSeam) == rows(viaColumn))
    // null text embeds as a zero vector without consuming a batch slot
    val withNull = Seq(("p", "f", null: String)).toDF("path", "filename", "text")
      .withColumn("content", col("text"))
    val z = Ingest.withEmbedding(withNull, "content",
      MockBatchEmbedder(dim = 4, batchSize = 2))
      .select("vector").collect().head.getAs[scala.collection.Seq[Float]](0)
    assert(z.forall(_ == 0f) && z.length == 4)
  }
}
