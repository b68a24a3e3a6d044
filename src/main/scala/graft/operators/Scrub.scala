package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect + redact the classic pattern
  * classes (emails, phone numbers, IPv4 addresses, SSN-shaped ids).
  *
  * Patterns use only RE2-compatible syntax (no lookarounds, no backrefs) so
  * the exact same regex runs in Spark (Java regex) and the DuckDB oracle —
  * engine-identical semantics, and portable to RE2-based scanners.
  * Detection/redaction are plain `regexp_*` expressions: whole-stage
  * codegen, no UDFs, linear scans.
  */
object Scrub {

  /** Pattern class → RE2-compatible regex (ordering matters for redaction:
    * IP before phone would not collide, but email must go before phone so
    * digits inside addresses aren't re-matched — kept alphabetically stable
    * here because the classes are disjoint on these patterns).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** Count of matches for one class. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** All counts as columns n_email / n_ipv4 / n_ssn / n_phone. */
  def withPiiCounts(df: DataFrame, textCol: String): DataFrame =
    PiiPatterns.foldLeft(df) { case (d, (name, pat)) =>
      d.withColumn(s"n_$name", piiCount(col(textCol), pat))
    }

  /** Redact every class to `<CLASS>` tokens, applied in [[PiiPatterns]]
    * order (email first — its local part may contain digit runs that the
    * later numeric patterns would otherwise shred).
    */
  def redact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"<${name.toUpperCase(java.util.Locale.ROOT)}>")
    }
}
