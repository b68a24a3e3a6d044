package graft.model

import java.sql.Timestamp

/** The engine's data model (SURVEY.md §1, FIXTURES.md §2): typed case classes
  * for the warehouse tables. Metadata is `Map[String,String]` everywhere —
  * preserving the reference's string-only payload contract
  * (/root/reference/internal/vectordb/vectordb.go:150-156); the engine
  * validates rather than silently dropping non-string values.
  *
  * At scale, `chunks`/`events`/`audit_logs` partition by `organization_id`
  * (and date for append-only tables) so the mandatory tenant predicate (F4)
  * prunes partitions at the scan.
  */
final case class Chunk(
    id: String,
    document_id: String,
    content: String,
    chunk_index: Int,
    vector: Array[Float],
    metadata: Map[String, String],
    organization_id: String,
    created_at: Timestamp)

final case class DocumentRow(
    id: String,
    filename: String,
    uploaded_at: Timestamp,
    metadata: Map[String, String],
    organization_id: String)

/** events table (events.go:37-48): event_type ∈ {ingest, update, alert}. */
final case class EventRow(
    timestamp: Timestamp,
    event_type: String,
    document_name: String,
    details: String)

/** audit_logs (audit_log.go:47-58): action ∈ {SEARCH, INGEST}. */
final case class AuditRow(
    timestamp: Timestamp,
    client_ip: String,
    action: String,
    details: String,
    organization_id: String)

/** graph_edges (graph.go:35-48); PK (source, target, type). */
final case class GraphEdge(
    source_doc_id: String,
    target_doc_id: String,
    relationship_type: String,
    description: String,
    created_at: Timestamp)

/** rules (rules/store.go:49-56). */
final case class Rule(
    id: Long,
    query: String,
    active: Boolean,
    organization_id: String)

/** file_catalog — the drone's tracked_files dedup state
  * (client_db.go:70-79), re-expressed as a table for anti-join dedup.
  */
final case class FileCatalogEntry(
    file_path: String,
    file_hash: String,
    last_processed: Timestamp,
    server_status: String)

/** RECONSTRUCTED thin tables: the reference's user/org/usage/domain stores
  * are missing from the snapshot (SURVEY.md preamble caveat; constructors
  * called at cmd/hive-server/main.go:199-232 but absent from
  * internal/database/). Shapes inferred from handler call sites
  * (tenant_handler.go, login/licensing middleware) — API-surface
  * requirements, not behavior specs.
  */
final case class UserRow(
    user_id: String,
    email: String,
    organization_id: String,
    created_at: Timestamp)

final case class OrganizationRow(
    organization_id: String,
    name: String,
    created_at: Timestamp)

final case class UsageRow(
    organization_id: String,
    period: String, // e.g. "2026-08"
    n_searches: Long,
    n_ingests: Long)

final case class CustomDomainRow(
    domain: String,
    organization_id: String,
    created_at: Timestamp)

/** Chat session (reconstructed from call sites — the reference's ChatStore
  * is missing from the snapshot; shape per chat_handler.go:156-195).
  */
final case class ChatSession(
    session_id: String,
    user_id: String,
    organization_id: String,
    first_query: String,
    created_at: Timestamp)

/** Chat message with citation structs (chat_handler.go:170-195). */
final case class ChatMessage(
    session_id: String,
    role: String, // user | assistant
    content: String,
    citations: Seq[Citation],
    created_at: Timestamp)

final case class Citation(
    document_id: String,
    chunk_id: String,
    content: String,
    score: Double)

/** Alert row emitted by keyword alerting / rule matches. */
final case class Alert(
    alert_type: String,
    document_id: String,
    detail: String,
    organization_id: String,
    created_at: Timestamp)
