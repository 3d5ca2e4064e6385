package minietl.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: scrub emails, phone numbers,
  * national-ID-shaped digit groups, and IPv4 addresses from a text column
  * before the corpus ships to training.
  *
  * Everything is `regexp_replace`/`regexp_count` — codegen'd, one pass per
  * pattern over the scan, no shuffle, linear at any corpus size. The
  * patterns deliberately stick to the regex subset shared by Java (Spark)
  * and RE2 (DuckDB/Go tooling): character classes, bounded repetition, and
  * ASCII word boundaries — no backreferences or lookaround — so the exact
  * same scrub is replayable outside the JVM.
  *
  * Replacement order matters and is fixed: email first (emails contain
  * dots and digits that the looser patterns could shred), then the
  * ID/phone digit-group shapes (3-2-4 before 3-3-4 — disjoint, but the
  * fixed order keeps the fold deterministic), then IPv4 last.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IdRe    = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The ordered (pattern, token) scrub table. */
  val Scrubs: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    IdRe    -> "<ID>",
    PhoneRe -> "<PHONE>",
    Ipv4Re  -> "<IP>")

  /** All-pattern scrub: replaces every match of every pattern, in the
    * fixed [[Scrubs]] order.
    */
  def redact(text: Column): Column =
    Scrubs.foldLeft(text) { case (acc, (re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Per-pattern match counts over the ORIGINAL text (count before you
    * scrub — the fold rewrites matches away). Returned in [[Scrubs]] order
    * as (email, id, phone, ipv4).
    */
  def counts(text: Column): Seq[Column] =
    Scrubs.map { case (re, _) => regexp_count(text, lit(re)).cast("bigint") }
}
