package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Text chunking — the reference's signature 1→N transform.
  *
  * Two variants, matching the two implementations in the reference:
  *  - [[chunkSentenceAware]]: 1000-char windows, 100-char overlap, backtracks
  *    up to 200 chars to a sentence end (`.`/`!`/`?` followed by space/newline)
  *    or a paragraph break (`\n\n`); trims; drops empties; loop-guarded.
  *    Behavior of /root/reference/internal/processor/chunker.go:17-97 (the
  *    HTTP-ingest path, ingest_handler.go:44).
  *  - [[chunkNaive]]: fixed 1000-char windows with 200-char overlap, trimmed,
  *    empties KEPT (faithful to /root/reference/internal/parser/chunker.go:24-60,
  *    the drone path, manager.go:77).
  *
  * Indices here are character-based (the reference indexes bytes; identical on
  * ASCII, and char-based is the correct generalization for UTF-8 text).
  */
object TextChunker {
  val DefaultChunkSize = 1000
  val DefaultOverlap = 100
  val NaiveOverlap = 200
  private val BacktrackWindow = 200

  def chunkSentenceAware(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var done = false
    while (start < n && !done) {
      var end = math.min(start + chunkSize, n)
      if (end < n) {
        val searchStart = math.max(end - BacktrackWindow, start)
        var bestBreak = end
        var i = end - 1
        var found = false
        while (i >= searchStart && !found) {
          val c = text.charAt(i)
          if ((c == '.' || c == '!' || c == '?') && i + 1 < n) {
            val nx = text.charAt(i + 1)
            if (nx == ' ' || nx == '\n' || nx == '\r') {
              bestBreak = i + 1
              found = true
            }
          }
          if (!found && i + 1 < n && c == '\n' && text.charAt(i + 1) == '\n') {
            bestBreak = i + 2
            found = true
          }
          i -= 1
        }
        if (bestBreak > start) end = bestBreak
      }
      val chunk = text.substring(start, end).trim
      if (chunk.nonEmpty) out += chunk
      if (end >= n) done = true
      else {
        // strict-progress guard: with overlap >= advance the reference's
        // `start >= end` check never fires and the loop stalls; require the
        // new start to move past the old one (identical behavior whenever
        // overlap < chunkSize, i.e. all reference configurations)
        val next = math.max(end - overlap, 0)
        start = if (next > start) next else end
      }
    }
    out.toSeq
  }

  def chunkNaive(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = NaiveOverlap): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var done = false
    while (start < n && !done) {
      val end = math.min(start + chunkSize, n)
      out += text.substring(start, end).trim
      if (end >= n) done = true
      else {
        // same strict-progress guard as the sentence-aware variant:
        // overlap >= chunkSize would otherwise stall the loop forever
        val next = math.max(end - overlap, 0)
        start = if (next > start) next else end
      }
    }
    out.toSeq
  }

  /** Chunks with their 0-based index — the explode-ready shape. */
  def chunkWithIndex(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Seq[(Int, String)] =
    chunkSentenceAware(text, chunkSize, overlap).zipWithIndex.map(_.swap)
}
