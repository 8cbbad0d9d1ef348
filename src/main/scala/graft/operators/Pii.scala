package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PII detection and redaction — the scrub pass a training corpus runs
  * before anything ships: find personally-identifying spans (emails,
  * phone numbers), count them for the audit report, and rewrite them to
  * typed placeholder tokens.
  *
  * Patterns deliberately stay in the regex subset Java's engine and RE2
  * (DuckDB/Go — the oracle side) interpret identically: explicit
  * character classes, no backreferences, no lookaround — which is also
  * the subset that stays linear-time at 100 TB (catastrophic
  * backtracking on adversarial documents is a real outage mode for
  * corpus scrubbing; RE2-safe patterns can't backtrack).
  *
  * Everything is per-row `regexp_count`/`regexp_replace` — codegen'd,
  * no shuffle, no UDF.
  */
object Pii {

  /** user@host.tld with the usual local-part/domain characters. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style 3-3-4 dashed phone numbers. */
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("long")

  /** All PII spans rewritten to typed placeholders ([EMAIL], [PHONE]) —
    * typed (rather than deleted) so token-count accounting and n-gram
    * statistics downstream stay meaningful. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Per-row audit + scrub: `(idCol, n_emails, n_phones, redacted)`. */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      phoneCount(col(textCol)).as("n_phones"),
      redact(col(textCol)).as("redacted"))
}
