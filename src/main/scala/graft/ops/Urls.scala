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
}
