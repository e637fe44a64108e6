package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition for web-corpus curation — the fields behind
  * domain-level filtering, per-site mixing weights, and URL-based
  * dedup/blocklists. All pure column expressions over Spark's native
  * `parse_url` (codegen'd; java.net.URI semantics), so extraction is
  * map-only and survives predicate pushdown around it. Malformed URLs
  * yield nulls rather than failing the scan (one hostile row must not
  * kill a corpus job).
  */
object Urls {

  /** Hostname (`sub.example.com`), or null when unparseable. */
  def host(url: Column): Column = try_parse_url(url, lit("HOST"))

  /** Path component (`/docs/1`); empty for bare-host URLs. */
  def path(url: Column): Column = try_parse_url(url, lit("PATH"))

  /** Value of one query parameter, or null when absent. */
  def queryParam(url: Column, name: String): Column =
    try_parse_url(url, lit("QUERY"), lit(name))

  /** Last two host labels (`example.com`) — the registrable-domain
    * approximation used for site-level grouping when no public-suffix
    * list is shipped. Null when the host has fewer than two labels or
    * the URL is unparseable. */
  def registeredDomain(url: Column): Column = {
    val d = regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)
    when(d =!= "", d)
  }

  /** Canonical URL form for dedup keys and blocklist joins: lowercase
    * scheme+host, fragment stripped, tracking parameters (utm_*,
    * fbclid, gclid) dropped, a left-over bare '?' removed, and the
    * trailing slash of a non-root path trimmed — so the same page
    * reached via campaign links, fragments, and case-variant hosts
    * collapses to ONE key. Pure regexp chain (map-only, codegen'd);
    * deliberately textual rather than parse-and-rebuild so malformed
    * URLs degrade to best-effort cleanup instead of null. */
  def canonicalize(url: Column): Column = {
    // 1. lowercase scheme://host prefix (path/query keep their case)
    val lowered = concat(
      lower(regexp_extract(url, "^([^/]*//[^/?#]*)", 1)),
      regexp_replace(url, "^[^/]*//[^/?#]*", ""))
    // 2. drop the fragment
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // 3. drop tracking params KEEPING their delimiter ($1) so a param
    // sandwiched between kept ones never fuses them ("?a=1&utm=x&b=2"
    // must become "?a=1&b=2", not "?a=1?b=2"); then normalize the
    // runs/strays the removal leaves ("&&"→"&", "?&"→"?", trailing)
    val noTrack = regexp_replace(noFrag,
      "(?i)([?&])(?:utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    val fixedQ = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    // 4. trim the trailing slash (capture-group form — RE2-safe, no
    // lookbehind; a bare-root "https://x.com/" also canonicalizes to
    // the host form, matching URLs written without the slash)
    regexp_replace(fixedQ, "([^/])/$", "$1")
  }
}
