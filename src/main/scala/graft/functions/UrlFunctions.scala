package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus pipelines — the normalization
 * step that makes URL-keyed dedup and per-domain quotas work (the
 * public CCNet / RefinedWeb recipe: a crawl sees the same page as
 * `HTTP://Host.com:80/a?utm_source=x&b=1#frag` and
 * `http://host.com/a?b=1`; without canonicalization URL-exact dedup
 * misses most duplicates and domain caps fragment).
 *
 * Rules (each one a pure `Column` expression over Spark built-ins —
 * map-only, codegen'd, and replayed verbatim by the DuckDB oracle):
 *   1. scheme and host lowercase; 2. fragment dropped; 3. default
 *   ports dropped (http:80, https:443), others kept; 4. empty path
 *   → "/"; 5. query params split on '&', tracking params dropped
 *   (`utm_*`, `fbclid`, `gclid`), the rest sorted byte-wise and
 *   rejoined; an emptied query drops its '?'; 6. percent-encoding
 *   normalized in path and query ([[normalizePercentEncoding]]).
 *
 * Percent-encoding is normalized per RFC 3986 §2.3/§6.2.2
 * ([[normalizePercentEncoding]]): octets for UNRESERVED characters
 * (`A-Z a-z 0-9 - . _ ~`) are decoded, every other escape keeps its
 * `%` but uppercases the hex — so `%41` ≡ `A` and `%2f` ≡ `%2F`
 * collapse into one dedup key, while `%2F` vs `/` correctly stay
 * distinct (a reserved octet is NOT equivalent to its literal).
 *
 * Registrable-domain extraction ([[registrableDomain]]) is
 * longest-suffix match against a CALLER-SUPPLIED suffix snapshot: the
 * public-suffix list is a large moving dataset, so shipping a frozen
 * subset here would silently mis-group `*.co.uk`; callers pass their
 * own PSL snapshot (or any policy set) and get the eTLD+1 grouping
 * key a per-domain quota actually needs — a host-keyed cap lets a
 * megasite with per-user subdomains (`*.blogspot.com`) evade the cap
 * entirely.
 */
object UrlFunctions {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val trackingRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** Lowercased scheme of an absolute URL ('' when not absolute). */
  def urlScheme(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  private def afterScheme(url: Column): Column =
    regexp_replace(url, schemeRe, "")

  private def hostPort(url: Column): Column =
    regexp_extract(afterScheme(url), "^([^/?#]*)", 1)

  /** Lowercased host, port stripped. */
  def urlHost(url: Column): Column =
    lower(regexp_replace(hostPort(url), ":[0-9]+$", ""))

  /**
   * RFC 3986 percent-encoding normalization, as one map-only codegen
   * expression: split on '%'; each piece after the first either
   * decodes its leading hex pair (only when the decoded character is
   * unreserved — reserved octets like `%2F` must stay encoded) or
   * uppercases the hex; invalid escapes (`%G1`, trailing `%`) pass
   * through untouched. Idempotent: decoded output contains no `%`
   * escapes that could decode again, and bare unreserved chars are
   * fixpoints.
   */
  def normalizePercentEncoding(s: Column): Column = {
    val pieces = split(s, "%")
    val fixed = transform(pieces, (p, i) => when(i === 0, p).otherwise {
      val hh = upper(substring(p, 1, 2))
      val code = conv(hh, 16, 10).cast("int")
      val decoded = call_function("char", code)
      val rest = substring(p, 3, 1 << 24)
      when(!p.rlike("^[0-9A-Fa-f]{2}"), concat(lit("%"), p))
        .when(decoded.rlike("^[A-Za-z0-9._~-]$"), concat(decoded, rest))
        .otherwise(concat(lit("%"), hh, rest))
    })
    array_join(fixed, "")
  }

  /**
   * eTLD+1 under a caller-supplied public-suffix snapshot: the longest
   * suffix of `host` (on label boundaries) present in `suffixes`, plus
   * the one label before it. A host with no matching suffix — or that
   * IS a bare suffix — returns unchanged (grouping by the host itself
   * is the conservative fallback; silently merging unknown TLDs would
   * be worse than not merging). The suffix set compiles to a literal
   * array in the plan (a PSL snapshot is ~10k entries — well inside
   * literal/broadcast territory), so the whole thing stays a map-only
   * projection with no join.
   */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "need at least one public suffix")
    val suffixSet = typedlit(suffixes)
    val parts = split(host, "\\.")
    val n = size(parts)
    // k = label count of the longest matching PROPER suffix (k < n so
    // at least one label remains in front of it)
    val ks = transform(sequence(lit(1), n - 1), k =>
      when(array_contains(suffixSet, array_join(slice(parts, -k, k), ".")), k)
        .otherwise(lit(0)))
    val kBest = when(n >= 2, coalesce(array_max(ks), lit(0))).otherwise(lit(0))
    when(kBest > 0, array_join(slice(parts, -(kBest + 1), kBest + 1), "."))
      .otherwise(host)
  }

  /** Canonical form per the object rules; non-absolute inputs (no
    * `scheme://`) pass through trimmed-only, flagged by an empty
    * [[urlScheme]] — garbage in a `url` column should surface in
    * dedup keys, not be silently rewritten. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = urlScheme(u)
    val hp = hostPort(u)
    val host = urlHost(u)
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    // percent-normalize the whole path?query#frag tail ONCE (rule 6):
    // decoded octets are unreserved only — never '?', '#', '/', or
    // '&' — so the path/query/param splits below are unaffected, and
    // the param sort becomes byte-stable across encoding variants
    val rest = normalizePercentEncoding(
      substring(afterScheme(u), length(hp) + 1, lit(1 << 24)))
    val path = regexp_extract(rest, "^([^?#]*)", 1)
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingRe))
    val q = array_join(array_sort(kept), "&")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
