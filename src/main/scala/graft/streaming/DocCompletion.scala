package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incoming chunk message (proto Chunk + total_chunks metadata,
  * hive.proto:17-23 / manager.go:468-477).
  */
final case class ChunkMsg(
    document_id: String,
    chunk_index: Int,
    content: String,
    total_chunks: Int,
    event_time: Timestamp)

/** A completed document: all chunks joined in chunk_index order. */
final case class CompletedDoc(
    document_id: String,
    n_chunks: Int,
    complete: Boolean,
    content: String)

private final case class DocState(chunks: Map[Int, String], total: Int)

/** Stateful document-completion sessions (SURVEY.md §2.9):
  * the reference accumulates chunks per document in an in-memory tracker and
  * declares completion when `received >= total_chunks` or after a 2-second
  * inactivity timeout (hive_service.go:128-219, timeout at :170-189).
  *
  * Spark-native: `flatMapGroupsWithState` keyed by document_id with a
  * processing-time timeout. Unlike the reference (arrival-order concat,
  * hive_service.go:194), content joins in `chunk_index` order —
  * deterministic under reordering/retries (SURVEY.md §7.4 item 3).
  */
object DocCompletion {
  val InactivityTimeoutMs = 2000L

  def completionFn(
      docId: String,
      msgs: Iterator[ChunkMsg],
      state: GroupState[DocState]): Iterator[CompletedDoc] =
    completionFnWithTimeout(Some(InactivityTimeoutMs))(docId, msgs, state)

  /** Core session logic; `timeoutMs = None` disables the inactivity timer
    * (for NoTimeout execution, e.g. replay/backfill where every document is
    * known to be fully present).
    */
  def completionFnWithTimeout(timeoutMs: Option[Long])(
      docId: String,
      msgs: Iterator[ChunkMsg],
      state: GroupState[DocState]): Iterator[CompletedDoc] = {
    if (state.hasTimedOut) {
      // incomplete document flushed by inactivity (reference behavior:
      // process whatever arrived after 2s of silence)
      val st = state.get
      state.remove()
      Iterator.single(assemble(docId, st, complete = false))
    } else {
      val prior = state.getOption.getOrElse(DocState(Map.empty, -1))
      val updated = msgs.foldLeft(prior) { (st, m) =>
        DocState(st.chunks + (m.chunk_index -> m.content),
          if (m.total_chunks > 0) m.total_chunks else st.total)
      }
      if (updated.total > 0 && updated.chunks.size >= updated.total) {
        state.remove()
        Iterator.single(assemble(docId, updated, complete = true))
      } else if (timeoutMs.isEmpty && updated.total <= 0) {
        // no timer exists to ever flush a document with unknown
        // total_chunks under NoTimeout — emit what arrived (incomplete)
        // instead of leaking its state forever
        state.remove()
        Iterator.single(assemble(docId, updated, complete = false))
      } else {
        state.update(updated)
        timeoutMs.foreach(state.setTimeoutDuration)
        Iterator.empty
      }
    }
  }

  private def assemble(docId: String, st: DocState, complete: Boolean) =
    CompletedDoc(docId, st.chunks.size, complete,
      st.chunks.toSeq.sortBy(_._1).map(_._2).mkString("\n\n"))

  /** Wire the session operator onto a (possibly streaming) Dataset.
    * `inactivityTimeoutMs = None` → NoTimeout (complete-only emission).
    */
  def sessions(
      spark: SparkSession, msgs: Dataset[ChunkMsg],
      inactivityTimeoutMs: Option[Long] = Some(InactivityTimeoutMs)): Dataset[CompletedDoc] = {
    import spark.implicits._
    val conf = inactivityTimeoutMs.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout)(
      _ => GroupStateTimeout.ProcessingTimeTimeout)
    msgs.groupByKey(_.document_id)
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        completionFnWithTimeout(inactivityTimeoutMs))
  }
}
