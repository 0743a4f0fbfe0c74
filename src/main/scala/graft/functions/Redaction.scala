package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for training-data curation: emails, phone
  * numbers, IPv4 addresses replaced by typed placeholder tokens, plus
  * per-document match counts for pipeline telemetry.
  *
  * The patterns are deliberately restricted to the regex subset whose
  * semantics agree between Java's engine (Spark) and RE2 (the DuckDB
  * oracle): character classes, bounded repetition, no backreferences or
  * lookaround. Redaction is a pure Column expression — a narrow map stage,
  * no shuffle, whole-stage-codegen'd at any corpus size.
  */
object Redaction {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** TPC-H-style international phone: CC-XXX-XXX-XXXX. */
  val phonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** Octet-bounded and word-boundary-anchored: the bare {1,3} form both
    * matched non-IPs (999.999.999.999) and over-redacted INSIDE longer
    * dotted numbers ('10.2.3.4000' → '<IP>00'). \b and this alternation
    * are in the Java∩RE2 subset, and the alternatives are prefix-disjoint,
    * so leftmost-first and leftmost-longest engines pick the same match. */
  val ipv4Pattern: String = {
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
    s"\\b$octet(\\.$octet){3}\\b"
  }

  /** Replace emails, then phones, then IPv4s with placeholder tokens.
    * Email runs first so an IP-looking substring INSIDE a matched address
    * (a1.2.3.4b@x.com) is consumed by the email rule. Note the email
    * pattern requires an alphabetic TLD, so a numeric-host address
    * (user@1.2.3.4) is not an email here — its host is still caught and
    * redacted by the IPv4 rule. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, phonePattern, "<PHONE>")
    regexp_replace(noPhone, ipv4Pattern, "<IP>")
  }

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Pattern))

  /** True when the document contains no detectable PII (cheap pre-filter:
    * a scan + narrow filter that avoids rewriting clean documents). */
  def isClean(text: Column): Column =
    emailCount(text) === 0 && phoneCount(text) === 0 && ipv4Count(text) === 0
}
