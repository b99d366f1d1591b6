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
 *   rejoined; an emptied query drops its '?'.
 *
 * Deliberately NOT done here: percent-encoding normalization and
 * public-suffix registrable-domain extraction (the PSL is a large
 * moving dataset; shipping a stale subset would silently mis-group
 * `*.co.uk` — callers with a PSL can map [[urlHost]] through it).
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
    val rest = substring(afterScheme(u), length(hp) + 1, lit(1 << 24))
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
