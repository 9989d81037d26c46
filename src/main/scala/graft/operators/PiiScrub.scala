package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the corpus-hygiene step every training-data
  * pipeline runs before text ships (emails, IP addresses, long digit
  * runs that are phone/account numbers). Pure codegen'd string work in
  * the scan stage: at 100 TB this is one parquet pass, zero shuffle,
  * and composes in front of [[CleanPipeline]] like any other map.
  *
  * The patterns are restricted to the Java∩RE2 common regex subset
  * (character classes, `\b`, `\d`, bounded counts — no lookaround, no
  * backreferences) so the IDENTICAL strings run under DuckDB's RE2 in
  * the gate's oracle.
  */
object PiiScrub {

  /** RFC-ish email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (counted after emails are gone — domains can
    * look quad-ish, digit local-parts cannot double-count).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Digit runs of >= 9 — phone / account / id numbers. Counted LAST:
    * email local parts and IP octets are already redacted, so a run
    * here is a genuine standalone number.
    */
  val PhoneRe = "\\b\\d{9,}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** (n_emails, n_ips, n_phones, scrubbed) — each stage counts on the
    * PREVIOUS stage's output then redacts, so the ordering above is
    * what makes the counts disjoint.
    */
  def scrub(text: Column): (Column, Column, Column, Column) = {
    val nEmails = countMatches(text, EmailRe)
    val t1 = regexp_replace(text, EmailRe, EmailTag)
    val nIps = countMatches(t1, Ipv4Re)
    val t2 = regexp_replace(t1, Ipv4Re, IpTag)
    val nPhones = countMatches(t2, PhoneRe)
    val t3 = regexp_replace(t2, PhoneRe, PhoneTag)
    (nEmails, nIps, nPhones, t3)
  }
}
