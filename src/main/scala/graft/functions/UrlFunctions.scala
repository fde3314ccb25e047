package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition as pure built-in Column expressions — host, port,
  * path, query, registered domain, TLD. Everything here is
  * `regexp_extract` / array built-ins (codegen'd, no UDF), and every
  * definition has a closed-form twin in any engine with POSIX regexes,
  * so web-curation pipelines built on these are directly oracle-able.
  * Spark's own `parse_url` is deliberately NOT used: its edge semantics
  * (null vs empty, userinfo handling) are engine-specific, while these
  * regexes mean exactly what they say in both engines (both return ''
  * on no-match).
  *
  * The registered-domain rule is the pragmatic two-or-three-label
  * heuristic: take the last two host labels, or the last three when the
  * penultimate label is a well-known second-level registry (co/ac/com/
  * org/net/gov/edu — "site.co.uk" → "site.co.uk", "www.site.com" →
  * "site.com"). A full public-suffix-list lookup is a broadcast join
  * against the PSL table at scale; the heuristic covers the dominant
  * registries without shipping a data file. */
object UrlFunctions {

  /** Hostname: the authority between `scheme://` and the first of
    * `/`, `:`, `?`. */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/:?]+)", 1)

  /** Explicit port digits, '' when absent. */
  def port(url: Column): Column =
    regexp_extract(url, "://[^/:?]+:([0-9]+)", 1)

  /** Path starting at the first `/` after the authority, query excluded;
    * '' when absent. */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-z]+://[^/?]*(/[^?]*)", 1)

  /** Query string after `?` (without the `?`), '' when absent. */
  def query(url: Column): Column =
    regexp_extract(url, "\\?(.*)$", 1)

  /** Last host label ("uk", "com"). */
  def tld(url: Column): Column = {
    val labels = split(host(url), "\\.")
    element_at(labels, -1)
  }

  private val secondLevel = Seq("co", "ac", "com", "org", "net", "gov", "edu")

  /** Registered domain per the two-or-three-label heuristic above. */
  def registeredDomain(url: Column): Column = {
    val labels = split(host(url), "\\.")
    when(size(labels) >= 3 &&
        element_at(labels, -2).isInCollection(secondLevel),
      array_join(slice(labels, -3, 3), "."))
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Canonical URL — the dedup key for URL-keyed web curation (the same
    * crawl page arrives as `HTTP://Site.com/p?b=2&a=1#frag`,
    * `http://site.com:80/p?a=1&b=2&utm_source=feed`, …):
    *
    *   - fragment dropped (never sent to the server);
    *   - scheme and host lowercased (case-insensitive per RFC 3986; path
    *     and query stay case-sensitive and are preserved);
    *   - default ports stripped (`:80` for http, `:443` for https);
    *     explicit non-default ports kept;
    *   - `utm_*` tracking parameters dropped, remaining `k=v` parameters
    *     sorted bytewise (param order is almost never semantic; sorting
    *     makes equal parameter SETS equal strings);
    *   - empty path normalized to `/`.
    *
    * Pure regex/array built-ins end to end (codegen'd, each with a
    * closed-form twin in any POSIX-regex engine). Deliberately NOT done:
    * percent-encoding normalization and trailing-slash collapse — both
    * change semantics on real servers more often than they unify
    * duplicates. */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val hostL = lower(regexp_extract(u, "^[A-Za-z]+://([^/:?]+)", 1))
    val portD = regexp_extract(u, "^[A-Za-z]+://[^/:?]+:([0-9]+)", 1)
    val path0 = regexp_extract(u, "^[A-Za-z]+://[^/?]*(/[^?]*)", 1)
    val q = regexp_extract(u, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val portPart = when(portD === "" ||
        (scheme === "http" && portD === "80") ||
        (scheme === "https" && portD === "443"), lit(""))
      .otherwise(concat(lit(":"), portD))
    val pathPart = when(path0 === "", lit("/")).otherwise(path0)
    val qPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    concat(scheme, lit("://"), hostL, portPart, pathPart, qPart)
  }
}
