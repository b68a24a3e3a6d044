package graft.functions

import java.nio.charset.StandardCharsets

/** Deterministic mock embedder — the engine's no-network embedding path.
  *
  * Reproduces the behavior of /root/reference/internal/embeddings/mock.go:27-56
  * exactly (FNV-32a seed over UTF-8 bytes, `sin(uint32(seed*(i+1)) * 0.1)`
  * series with uint32 wraparound, float32 L2 normalization), so top-k rankings
  * are reproducible without any network. Default dimension 384
  * (embeddings.go:47).
  *
  * Production embedding is a pluggable side-effect behind [[graft.operators.LLMOracle]];
  * all correctness tests rest on this deterministic path (SURVEY.md §2.10).
  */
object MockEmbedder {
  val DefaultDim = 384

  private val FnvOffset = 0x811c9dc5 // 2166136261
  private val FnvPrime = 0x01000193 // 16777619

  /** FNV-32a over UTF-8 bytes, as unsigned 32-bit in a Long. */
  def fnv32a(text: String): Long = {
    var h = FnvOffset
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= FnvPrime // wraps like uint32 in the low 32 bits
      i += 1
    }
    h.toLong & 0xffffffffL
  }

  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val seed = fnv32a(text)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val prod = (seed * (i + 1)) & 0xffffffffL // uint32 multiply wraparound
      out(i) = math.sin(prod.toDouble * 0.1).toFloat
      i += 1
    }
    // float32 accumulation, matching the reference's normalization loop
    var sum = 0.0f
    i = 0
    while (i < dim) { sum += out(i) * out(i); i += 1 }
    val norm = math.sqrt(sum.toDouble).toFloat
    if (norm > 0) {
      i = 0
      while (i < dim) { out(i) = out(i) / norm; i += 1 }
    }
    out
  }
}
