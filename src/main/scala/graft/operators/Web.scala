package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{UrlFunctions => U}

/** Web-corpus curation by URL — the per-domain bookkeeping every
  * crawl-derived training corpus needs (Common-Crawl-style): decompose
  * document URLs, aggregate quality signals per registered domain, and
  * enforce domain block/allow lists.
  *
  * Scale shapes:
  *  - [[parseUrls]] is a pure narrow projection (regex + array built-ins,
  *    all codegen'd) — zero shuffle, runs inside the scan's stage.
  *  - [[domainStats]] is one hash aggregation keyed by registered domain;
  *    partial aggregation absorbs the per-domain skew of real crawls
  *    (map-side combine means a million-doc domain contributes one row
  *    per task to the exchange, not a million).
  *  - [[domainFilter]] broadcasts the list side — a blocklist is
  *    thousands of rows against a corpus of billions, so the corpus
  *    never shuffles; `LEFT ANTI` + broadcast is the only sane plan and
  *    is pinned by the spec.
  */
object Web {

  /** Decompose `urlCol` into host / registered_domain / tld / port /
    * path / query columns ('' where absent, never null — the regex
    * no-match convention both engines share). */
  def parseUrls(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    df.withColumn("host", U.host(u))
      .withColumn("registered_domain", U.registeredDomain(u))
      .withColumn("tld", U.tld(u))
      .withColumn("port", U.port(u))
      .withColumn("path", U.path(u))
      .withColumn("query", U.query(u))
  }

  /** Per-registered-domain corpus statistics: document count, distinct
    * host count, and the sum of `sizeCol` (an integer quality/volume
    * signal — n_chars, token count). Integer-exact on purpose: corpus
    * aggregates must not depend on float summation order. */
  def domainStats(df: DataFrame, urlCol: String = "url",
      sizeCol: String = "n_chars"): DataFrame =
    parseUrls(df, urlCol)
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col(sizeCol)).as("sum_size"))

  /** Drop documents whose registered domain is on `blockedDomains`.
    * The list broadcasts; the corpus side stays a narrow map + anti
    * join probe. */
  def domainFilter(df: DataFrame, blockedDomains: DataFrame,
      urlCol: String = "url", domainCol: String = "domain"): DataFrame = {
    val withDom = df.withColumn("registered_domain",
      U.registeredDomain(col(urlCol)))
    withDom.join(
        broadcast(blockedDomains
          .select(col(domainCol).as("registered_domain"))),
        Seq("registered_domain"), "left_anti")
      .select(df.columns.map(col): _*)
  }
}
