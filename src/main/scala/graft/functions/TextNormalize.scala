package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode canonicalization for dedup/fingerprint stability: the same
  * visible text must hash identically whether a crawler delivered it
  * NFC-composed or decomposed, with CRLF or LF, or salted with zero-width
  * characters (a classic near-dup evasion and PDF-extraction artifact).
  *
  * Pipeline (order matters and is replayed exactly by the q3v oracle):
  *   1. newline canonicalization (CRLF and lone CR → LF),
  *   2. zero-width strip (ZWSP/ZWNJ/ZWJ/BOM) — BEFORE NFC so a zero-width
  *      char between a base and its combining mark cannot block composition,
  *   3. C0-control strip (except \t \n) + DEL,
  *   4. NFC composition (the one step Spark has no built-in for — a UDF;
  *      DuckDB replays it via `nfc_normalize`).
  *
  * Steps 1–3 are codegen'd `regexp_replace`s; only step 4 leaves codegen.
  * Narrow, shuffle-free, linear — run it at ingest, before any hashing.
  */
object TextNormalize {

  private val ZeroWidthClass = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
  private val ControlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  val nfcUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** Steps 1–3 (pure codegen; useful alone when NFC is already guaranteed). */
  def stripped(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(text, "\r\n", "\n"), "\r", "\n"),
        ZeroWidthClass, ""),
      ControlClass, "")

  /** The full canonical form (steps 1–4). */
  def canonicalize(text: Column): Column = nfcUdf(stripped(text))

  /** Plain-Scala twin of [[canonicalize]] for one-call registration on the
    * SQL front door — same java.util.regex patterns Spark's
    * `regexp_replace` compiles, so the two paths cannot diverge. (The bare
    * [[nfcUdf]] alone would SKIP the strip-before-NFC ordering: a
    * zero-width char between a base and its mark would block composition
    * and SQL-pipeline hashes would differ from batch hashes.)
    */
  def canonicalizeString(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(
      s.replace("\r\n", "\n").replace("\r", "\n")
        .replaceAll(ZeroWidthClass, "")
        .replaceAll(ControlClass, ""),
      java.text.Normalizer.Form.NFC)

  val canonicalizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => canonicalizeString(s))
}
