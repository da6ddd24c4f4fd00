package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines: the dedup/statistics
  * key for crawled documents. Two raw URLs that differ only in scheme/
  * host case, default ports, tracking parameters, parameter order, or
  * fragments are the same page — canonicalizing them is the first step
  * of URL-level dedup and per-domain corpus accounting.
  *
  * Everything is codegen'd `regexp_extract`/`regexp_replace`/string
  * expressions over the portable Java∩RE2 regex subset (no lookaround,
  * no backreferences), so the canonical form is replicable byte-for-
  * byte in any engine (DuckDB oracle: `q_url_normalize`). No UDF; a
  * narrow map at 100 TB.
  *
  * Normalization rules (deliberately conservative — nothing lossy
  * beyond the listed removals):
  *  - scheme and host lowercased; userinfo kept out of the host key
  *  - default ports dropped (http:80, https:443); other ports kept
  *  - empty path → "/"
  *  - query: parameters split on '&', tracking params removed (keys
  *    starting with `utm_`, or in {fbclid, gclid, msclkid}), remainder
  *    SORTED (byte order) and re-joined — parameter order is transport
  *    noise; '?' dropped when nothing survives
  *  - fragment dropped
  *  - a string with no `scheme://` prefix is not a URL → null
  */
object UrlFunctions {

  /** Tracking-parameter keys removed by [[normalizeUrl]]. */
  val TrackingKeys: Seq[String] = Seq("fbclid", "gclid", "msclkid")
  val TrackingPrefix: String = "utm_"

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  // the query starts at the first '?' BEFORE any '#': a '?' inside the
  // fragment is fragment content and must be dropped with it
  private val QueryPat = "^[^#?]*\\?([^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemePat, 1))

  /** host:port, lowercased, userinfo stripped. */
  private def hostPort(url: Column): Column =
    lower(regexp_replace(regexp_extract(url, AuthorityPat, 1), "^[^@]*@", ""))

  def host(url: Column): Column = substring_index(hostPort(url), ":", 1)

  /** Explicit port digits, or '' when absent. */
  def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  /** Host with a leading `www.` stripped — the per-domain grouping key. */
  def domain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** Query string with tracking params dropped and the rest sorted.
    * Small per-URL arrays, so the HOF filter/sort stay cheap; the array
    * is built from one regexp_extract, evaluated once per row.
    */
  private def cleanQuery(url: Column): Column = {
    val raw = regexp_extract(url, QueryPat, 1)
    val kept = filter(split(raw, "&"), p => {
      val key = substring_index(p, "=", 1)
      length(p) > 0 && !key.startsWith(TrackingPrefix) &&
        !key.isin(TrackingKeys.map(x => x: Any): _*)
    })
    array_join(array_sort(kept), "&")
  }

  /** Canonical URL (see object doc), or null for a non-URL string. */
  def normalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val prt = port(url)
    val keepPort = prt =!= "" &&
      !(sch === "http" && prt === "80") && !(sch === "https" && prt === "443")
    val rawPath = regexp_extract(url, PathPat, 1)
    val q = cleanQuery(url)
    when(sch === "", lit(null).cast("string")).otherwise(concat(
      sch, lit("://"), host(url),
      when(keepPort, concat(lit(":"), prt)).otherwise(lit("")),
      when(rawPath === "", lit("/")).otherwise(rawPath),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }
}
