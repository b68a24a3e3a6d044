package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Pluggable batch embedding contract: the seam where a production
  * embedding service replaces the deterministic
  * [[graft.functions.MockEmbedder]]. Implementations must be Serializable —
  * they ship inside Spark task closures and are invoked per PARTITION
  * batch, never per row.
  */
trait BatchEmbedder extends Serializable {
  /** Embedding dimension (fallback vectors are sized with it). */
  def dim: Int
  /** Texts per HTTP request — the mapPartitions grouping size. */
  def batchSize: Int
  /** Embed one batch (≤ [[batchSize]] texts), one vector per input text. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  /** Degraded-batch counter, wired by [[Ingest.withEmbedding]] before the
    * instance ships to tasks (accumulators are serializable, so the tasks'
    * adds flow back to the driver). Implementations that ever fall back to
    * placeholder output MUST `add(1)` here per degraded batch — a corpus
    * silently embedded as zeros is the production failure this surfaces.
    */
  var degradedBatches: Option[org.apache.spark.util.LongAccumulator] = None
}

/** The deterministic in-process embedder behind the [[BatchEmbedder]] seam
  * (what all correctness tests run on — no network).
  */
final case class MockBatchEmbedder(
    dim: Int = graft.functions.MockEmbedder.DefaultDim,
    batchSize: Int = 64) extends BatchEmbedder {
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => graft.functions.MockEmbedder.embed(t, dim))
}

/** Production embedding-service adapter skeleton with the reference's
  * client contract (behavioral parity, JDK-only so it is offline-testable
  * against an in-process `com.sun.net.httpserver` stub):
  *
  *   - batch endpoint: one POST per ≤batchSize texts, body
  *     `{"input":[texts],"model":m}`, response `{"data":[{"embedding":
  *     [..]},..]}` with a length check against the request
  *     (reference/internal/embeddings/openai.go:55-136 EmbedBatch);
  *   - timeouts: 30 s default (openai.go:36), 60 s for slower local
  *     servers (ollama.go:31) — pass `timeoutMs`;
  *   - bounded retry with linear backoff on IO errors / non-200 / malformed
  *     responses (the adapter improvement the reference leaves to callers);
  *   - zero-vector fallback once retries are exhausted
  *     (reference/internal/ai/openai.go:16-24 returns a zero vector rather
  *     than failing the pipeline) — the batch degrades, the job survives.
  *
  * Scale shape: invoked from `Ingest.withEmbedding`'s mapPartitions, so
  * each task holds ONE connection sequence and in-flight request — request
  * parallelism equals task parallelism, which is the cluster-native way to
  * rate-limit an external service (tune with a coalesce on the input).
  * The API key travels as a constructor field inside the task closure;
  * read it from the environment at the call site, never hard-code it.
  */
final case class HttpEmbedder(
    endpoint: String,
    model: String = "",
    apiKey: String = "",
    dim: Int = graft.functions.MockEmbedder.DefaultDim,
    batchSize: Int = 64,
    timeoutMs: Int = 30000,
    maxRetries: Int = 2,
    retryBackoffMs: Long = 200L) extends BatchEmbedder {
  require(batchSize > 0 && dim > 0, s"bad embedder config $batchSize/$dim")
  require(maxRetries >= 0, s"negative maxRetries $maxRetries")

  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    require(texts.length <= batchSize,
      s"batch of ${texts.length} exceeds batchSize=$batchSize")
    var attempt = 0
    while (attempt <= maxRetries) {
      tryOnce(texts) match {
        case Some(vecs) => return vecs
        case None =>
          attempt += 1
          if (attempt <= maxRetries && retryBackoffMs > 0)
            Thread.sleep(retryBackoffMs * attempt)
      }
    }
    // retries exhausted: zero-vector fallback, never a failed task — but
    // LOUDLY: an ingest against a dead endpoint must not ship an
    // all-zeros corpus with no signal anywhere (round-9 ADVICE), so the
    // degradation logs per batch and counts through the accumulator
    // surfaced by Ingest.withEmbedding.
    System.err.println(
      s"[graft.HttpEmbedder] batch of ${texts.length} texts degraded to " +
        s"zero vectors after ${maxRetries + 1} attempts against $endpoint " +
        s"(last failure: $lastFailure)")
    degradedBatches.foreach(_.add(1L))
    Seq.fill(texts.length)(new Array[Float](dim))
  }

  /** Last per-attempt failure detail for the degradation log line (task-
    * local; the adapter is instantiated per task closure).
    */
  @transient private var lastFailure: String = "unknown"

  /** One HTTP round trip; None on any failure (IO, status, shape). */
  private def tryOnce(texts: Seq[String]): Option[Seq[Array[Float]]] =
    try {
      val conn = new URI(endpoint).toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      try {
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        if (apiKey.nonEmpty)
          conn.setRequestProperty("Authorization", s"Bearer $apiKey")
        conn.setDoOutput(true)
        val body = requestJson(texts).getBytes(StandardCharsets.UTF_8)
        conn.setFixedLengthStreamingMode(body.length)
        val os = conn.getOutputStream
        try { os.write(body); os.flush() } finally os.close()
        if (conn.getResponseCode != 200) {
          lastFailure = s"HTTP ${conn.getResponseCode}"
          None
        } else {
          val vecs = parseEmbeddings(readAll(conn.getInputStream))
          // the reference's length check: a short response is an error,
          // not a silent partial result
          if (vecs.length == texts.length && vecs.forall(_.length == dim))
            Some(vecs)
          else {
            lastFailure =
              s"response shape ${vecs.length} vectors for ${texts.length} texts"
            None
          }
        }
      } finally conn.disconnect()
    } catch {
      case e @ (_: java.io.IOException | _: IllegalArgumentException) =>
        lastFailure = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        None
    }

  private def readAll(in: InputStream): String = {
    val buf = new ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    in.close()
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private[sources] def requestJson(texts: Seq[String]): String = {
    val items = texts.map(t => "\"" + jsonEscape(t) + "\"").mkString(",")
    s"""{"input":[$items],"model":"${jsonEscape(model)}"}"""
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Extract the embedding arrays from `{"data":[{"embedding":[n,..]},..]}`.
    * A purpose-built scanner for the fixed wire shape (numbers inside the
    * "embedding" arrays; any structural surprise → empty → caller retries):
    * finds each `"embedding"` key, then reads the following `[..]` as
    * doubles. Throws IllegalArgumentException on malformed numerics, which
    * [[tryOnce]] converts to a retry.
    */
  private[sources] def parseEmbeddings(body: String): Seq[Array[Float]] = {
    val out = Seq.newBuilder[Array[Float]]
    val key = "\"embedding\""
    var i = body.indexOf(key)
    while (i >= 0) {
      var j = i + key.length
      while (j < body.length && (body(j) == ':' || body(j).isWhitespace)) j += 1
      if (j >= body.length || body(j) != '[')
        throw new IllegalArgumentException("embedding key without array")
      val end = body.indexOf(']', j)
      if (end < 0) throw new IllegalArgumentException("unterminated array")
      val inner = body.substring(j + 1, end).trim
      val vec =
        if (inner.isEmpty) Array.empty[Float]
        else inner.split(",").map(s => s.trim.toDouble.toFloat)
      out += vec
      i = body.indexOf(key, end)
    }
    out.result()
  }
}
