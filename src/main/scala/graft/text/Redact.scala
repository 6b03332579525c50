package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect + redact the standard
  * identifier shapes before text reaches a training set. Pure codegen'd
  * `regexp_*` expressions — one narrow projection, composes with scan
  * pushdown, no UDF.
  *
  * The patterns deliberately use only syntax with IDENTICAL semantics in
  * Java regex (Spark) and RE2 (DuckDB/Go tooling): character classes,
  * bounded repetition, `\b` — no lookaround, no backrefs — so the redaction
  * is reproducible across engines and the oracle verifies byte-exact
  * outputs.
  */
object Redact {

  /** email-like: local@domain.tld */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** dotted-quad IPv4 (loose: does not range-check octets — redaction
    * should over-trigger, not under-trigger)
    */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** long digit runs (phone/account/SSN-ish; 7+ digits) */
  val digitRunRe = "\\d{7,}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailRe)).cast("long")
  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(ipv4Re)).cast("long")
  def digitRunCount(text: Column): Column =
    regexp_count(text, lit(digitRunRe)).cast("long")

  /** Redacted text. Application order is part of the contract (and of the
    * oracle): emails first (they contain digits and dots), then IPv4, then
    * bare digit runs — so an email is ONE <EMAIL>, never an <EMAIL> with a
    * <NUM> chewed out of it.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
        lit(ipv4Re), lit("<IP>")),
      lit(digitRunRe), lit("<NUM>"))

  /** true when the text contains any detectable PII shape. */
  def hasPii(text: Column): Column =
    (emailCount(text) + ipv4Count(text) + digitRunCount(text)) > 0
}
