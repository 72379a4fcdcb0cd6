package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RFC 3986 syntax normalization plus the crawl-pipeline extensions every
  * web-corpus dedup applies BEFORE content dedup (canonical-URL collapse
  * is the cheapest dedup tier — it needs no text at all):
  *
  *   - scheme and host lowercase (RFC 3986 §6.2.2.1)
  *   - default port dropped (`:80` for http, `:443` for https)
  *   - fragment dropped (never sent to the server)
  *   - `utm_*` tracking parameters dropped (identical content)
  *   - remaining query parameters sorted (order is almost never
  *     significant server-side; sorting merges permutations)
  *   - single trailing slash stripped from non-root paths; empty path
  *     becomes `/`
  *
  * Pure composition of codegen builtins (regexp + array ops) — no UDF,
  * stays inside whole-stage codegen, and every step is expressible in
  * DuckDB for the oracle. Inputs without a `scheme://` are returned
  * unchanged (not URLs — canonicalization must not invent structure).
  */
object UrlFunctions {

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // (?s): without DOTALL, '(.*)$' cannot cross an embedded line
    // terminator, so any URL with an interior newline (unsanitized crawl
    // fields) extracted rest='' and every such URL collapsed into the
    // single canonical key 'scheme:///' (review r16)
    val rest = regexp_extract(url, "(?s)^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    // userinfo is preserved verbatim (dropping it would merge distinct
    // resources); host parsing must skip it, and a bracketed IPv6
    // literal contains colons that are NOT the port separator
    // (review r16 — '^([^:]*)' over the raw authority returned the
    // userinfo for user:pass@host and '[2001' for IPv6 literals,
    // merging distinct pages)
    val userinfo = regexp_extract(authority, "^([^@/]*@)", 1)
    val hostport = regexp_replace(authority, "^[^@/]*@", "")
    val host = lower(when(hostport.startsWith("["),
      regexp_extract(hostport, "^(\\[[^\\]]*\\])", 1))
      .otherwise(regexp_extract(hostport, "^([^:]*)", 1)))
    val port = when(hostport.startsWith("["),
      regexp_extract(hostport, "^\\[[^\\]]*\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(hostport, "^[^:]*:([0-9]+)$", 1))
    val keepPort = (port =!= "") &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val pathRaw = regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    val pathNoSlash = regexp_replace(pathRaw, "/$", "")
    val path = when(pathNoSlash === "", lit("/")).otherwise(pathNoSlash)
    // anchored through the pre-fragment region: an unanchored '\?([^#]*)'
    // find()-matched a '?' INSIDE the fragment ('/x#a?b=1' resurrected
    // 'b=1' as a query even though the fragment is dropped), splitting a
    // page from its fragment-free spelling and merging it with the
    // genuinely distinct '?b=1' page (review r16)
    val query = regexp_extract(rest, "^[^?#]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val sortedQ = array_join(array_sort(params), "&")
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), userinfo, host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit(""))))
  }
}
