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
}
