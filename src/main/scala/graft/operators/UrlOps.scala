package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-curation normalization every
  * URL-level dedup and per-host cap runs first: the same page arrives
  * from a crawl frontier as `HTTP://Host.COM:80/a//b/?utm_source=x#top`
  * and `http://host.com/a/b`, and a corpus that treats those as two
  * documents double-counts it everywhere downstream (dedup keys,
  * [[Sampling.perKeyCap]] host caps, frequency features).
  *
  * Everything here is a composition of codegen'd `regexp_extract` /
  * `regexp_replace` / `when` built-ins — scan-side, no UDF, no shuffle —
  * and every regex avoids lookaround so the SAME character classes run
  * under Java regex (Spark) and RE2 (DuckDB oracle, with its own group
  * syntax). Canonical form:
  *
  *   - scheme and host lowercased (path/query case is PRESERVED — it is
  *     semantically significant)
  *   - default port stripped (`:80` for http, `:443` for https)
  *   - fragment dropped
  *   - tracking params removed (`utm_*`, `gclid`, `fbclid`), `?`
  *     dropped when the query empties
  *   - duplicate path slashes collapsed, trailing slash stripped
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  // rest = path+query, capture stops at '#' (fragment drop for free)
  private val RestRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  /** Lowercased scheme (`""` when the value is not a scheme://… URL). */
  def urlScheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  /** Lowercased host with the scheme's default port stripped — the
    * per-host cap / host-stats key. */
  def urlHost(u: Column): Column = {
    val hp = lower(regexp_extract(u, HostRe, 1))
    val s = urlScheme(u)
    when(s === "http", regexp_replace(hp, ":80$", ""))
      .when(s === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Canonical path: duplicate slashes collapsed, trailing slash
    * stripped (root becomes empty — host-only canonical form). */
  private def canonicalPath(u: Column): Column = {
    val rest = regexp_extract(u, RestRe, 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    regexp_replace(regexp_replace(path, "/{2,}", "/"), "/$", "")
  }

  /** Query string with tracking params removed: the `&`-prefix trick
    * makes every param uniformly `&k=v`, one global replace drops the
    * trackers, then the leading `&` goes. Empty result = no `?` in the
    * canonical URL. */
  private def canonicalQuery(u: Column): Column = {
    val rest = regexp_extract(u, RestRe, 1)
    val q = regexp_extract(rest, "[?](.*)$", 1)
    val stripped = regexp_replace(
      concat(lit("&"), q),
      "&(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*", "")
    when(q === "", lit("")).otherwise(regexp_replace(stripped, "^&", ""))
  }

  /** The full canonical URL (see object doc for the normal form).
    * Non-URL values (no scheme) canonicalize to the empty string —
    * filter on `urlScheme =!= ""` first when the column is mixed. */
  def canonicalUrl(u: Column): Column = {
    val s = urlScheme(u)
    val q = canonicalQuery(u)
    when(s === "", lit(""))
      .otherwise(concat(
        s, lit("://"), urlHost(u), canonicalPath(u),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
