package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction over text columns — the pre-training
 * scrub pass (C4/Dolma-style, public method). Everything is built-in
 * `regexp_replace`/`split` column expressions: codegen'd, map-only,
 * no shuffle — the shape that survives a 100 TB corpus untouched.
 *
 * Patterns stay inside the Java ∩ RE2 regex subset so the DuckDB
 * oracle runs the identical strings: character classes, bounded
 * repetition, non-capturing groups, ASCII `\b` — no lookaround, no
 * backreferences.
 */
object Pii {

  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"""
  /** US-style 3-3-4 with '-' or '.' separators; `\b`-anchored so it
    * never eats SSN (3-2-4) or IPv4 substrings. Separators must match
    * (555-867-5309 or 555.867.5309, not 555-867.5309) — spelled as an
    * alternation because the shared RE2 subset has no backreferences. */
  val PhoneRe = """\b[0-9]{3}(?:-[0-9]{3}-|\.[0-9]{3}\.)[0-9]{4}\b"""
  val SsnRe = """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"""

  /** Occurrence count via split: n matches cut the string into n+1
    * parts. `limit = -1` keeps trailing empty parts, so a match at the
    * end of the string still counts (mirrors DuckDB's
    * `string_split_regex`). */
  def countMatches(c: Column, pattern: String): Column =
    size(split(c, pattern, -1)) - 1

  /**
   * Redact all four families, most-specific first: email before the
   * numeric families (a dotted numeric domain must be consumed as
   * part of the email, not left for the IP pass), SSN before phone
   * (disjoint shapes today, but the order makes the precedence
   * explicit), phone before IPv4.
   */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "[EMAIL]")
    val s = regexp_replace(e, SsnRe, "[SSN]")
    val p = regexp_replace(s, PhoneRe, "[PHONE]")
    regexp_replace(p, Ipv4Re, "[IP]")
  }

  /** All four families as ONE alternation — the single-pass flag
    * pattern. */
  val AnyRe = s"(?:$EmailRe)|(?:$SsnRe)|(?:$PhoneRe)|(?:$Ipv4Re)"

  /** The `has_pii` flag alone as ONE column expression — for pipelines
    * that only need the boolean on their data card, computed inline in
    * an existing projection instead of joining [[detect]]'s frame back
    * (a needless self-join shuffle).
    *
    * ONE regex pass (`rlike` on the family alternation), not
    * [[detect]]'s seven-pass progressive chain: on a 100 TB corpus
    * where only the flag is needed the progressive counts are pure
    * waste. Equivalent to `detect().has_pii` by construction — the
    * progressive counts are positive iff SOME family matches the raw
    * text (redaction only runs when a family already matched, each
    * count's input differs from the raw text only where an
    * earlier-precedence family consumed a match, and the inserted
    * `[EMAIL]`/`[SSN]`/`[PHONE]` tokens contain no digits or `@`, so
    * they can never complete a new match) — spec-pinned against
    * [[detect]] on the adversarial overlap shapes. */
  def hasPii(c: Column): Column = c.rlike(AnyRe)

  /** Adds per-family counts, a `has_pii` flag, and the redacted text.
    * One projection — no shuffle, no action.
    *
    * Counts are taken on the PROGRESSIVELY-REDACTED text, in
    * [[redact]]'s precedence order: email on the original, SSN after
    * emails are consumed, phone after SSNs, IPv4 after phones. This
    * makes the counts a partition of the text that always agrees with
    * the redacted output — an overlapping match (e.g. a dotted-numeric
    * email domain that also parses as an IPv4) is counted exactly once,
    * as the family that redacts it. */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "[EMAIL]")
    val afterSsn = regexp_replace(afterEmail, SsnRe, "[SSN]")
    val afterPhone = regexp_replace(afterSsn, PhoneRe, "[PHONE]")
    df.withColumns(Map(
      "n_email" -> countMatches(t, EmailRe),
      "n_ssn" -> countMatches(afterEmail, SsnRe),
      "n_phone" -> countMatches(afterSsn, PhoneRe),
      "n_ipv4" -> countMatches(afterPhone, Ipv4Re)))
      .withColumn("has_pii",
        col("n_email") + col("n_ipv4") + col("n_phone") + col("n_ssn") > 0)
      .withColumn("redacted", regexp_replace(afterPhone, Ipv4Re, "[IP]"))
  }
}
