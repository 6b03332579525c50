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

  /** payment-card-shaped runs: 13-19 digits allowing single spaces/dashes
    * between groups. Candidates only — [[luhnValid]] separates real card
    * numbers from arbitrary digit runs (the checksum is what keeps the
    * false-positive rate of card redaction usable: a 16-digit order id has
    * a 1-in-10 chance of passing, a real PAN always passes).
    */
  val cardCandidateRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** All card-shaped candidates in `text`, digits only (separators
    * stripped), ready for [[luhnValid]]. Pure projection.
    */
  def cardCandidates(text: Column): Column =
    // group 0 = whole match (the default group 1 requires a capturing
    // group); null text means zero candidates, not null counts downstream
    transform(
      regexp_extract_all(coalesce(text, lit("")), lit(cardCandidateRe),
        lit(0)),
      c => regexp_replace(c, lit("[^0-9]"), lit("")))

  /** Luhn checksum (ISO/IEC 7812) over a digits-only string: from the
    * rightmost digit, double every second one, fold >9 back by subtracting
    * 9, valid iff the total is divisible by 10. One `aggregate` fold per
    * value — codegen'd, no UDF; the identical closed form is plain SQL in
    * the oracle. Null/empty input is invalid (false), not null.
    */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0L),
      (acc, i) => {
        // i counts from the RIGHT: position n-i+1 in the string
        val d = digits.substr(n - i + 1, lit(1)).cast("long")
        val dd = when(pmod(i.cast("long"), lit(2L)) === 0L,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      })
    coalesce(n >= 13 && n <= 19 && pmod(total, lit(10L)) === 0L, lit(false))
  }

  /** Per-row card detection: candidate count and Luhn-verified count. */
  def cardCounts(text: Column): (Column, Column) = {
    val cands = cardCandidates(text)
    (size(cands).cast("long"),
      size(filter(cands, luhnValid _)).cast("long"))
  }
}
