package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup — the normalization step every
  * web-scale corpus runs before URL-level dedup (the same page is
  * fetched as HTTP/HTTPS, with/without www, with tracking params, in
  * either param order, with or without default ports and trailing
  * slashes). Pure codegen'd string/array work in the scan stage, zero
  * shuffle; the dedup itself is then one groupBy(canonical).
  *
  * Rules (each exactly mirrored by the DuckDB oracle):
  *  - scheme and host lowercase; leading `www.` dropped
  *  - default ports `:443` / `:80` dropped
  *  - trailing slash on the path dropped
  *  - `utm_*` tracking parameters dropped
  *  - surviving query parameters sorted bytewise and rejoined
  */
object UrlCanon {

  def canonicalize(u: Column): Column = {
    val proto = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val rest = regexp_extract(u, "^[A-Za-z]+://(.*)$", 1)
    val host0 = lower(regexp_extract(rest, "^([^/?#]+)", 1))
    val host = regexp_replace(
      regexp_replace(host0, "^www\\.", ""), ":(443|80)$", "")
    val pathq = regexp_extract(rest, "^[^/?#]+([/?#].*)?$", 1)
    val path0 = regexp_extract(pathq, "^([^?#]*)", 1)
    val path = regexp_replace(path0, "/$", "")
    val query = regexp_extract(pathq, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p === ""))
    val sortedQ = array_join(array_sort(params), "&")
    concat(proto, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }
}
