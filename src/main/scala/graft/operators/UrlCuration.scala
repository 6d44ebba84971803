package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the first stage of every
  * published crawl-curation pipeline (C4 / CCNet / RefinedWeb all begin
  * with URL normalization, URL-level exact dedup and per-domain caps
  * before any text-quality pass).
  *
  * Everything here is a pure codegen'd Column chain (string regexes over
  * `java.util.regex` via Spark's native `RegExpReplace`/`RegExpExtract`),
  * so canonicalization runs inside whole-stage codegen with zero UDF or
  * shuffle cost — at 100 TB this is a map-only pass that fuses with the
  * scan.
  *
  * Canonical form (documented policy, mirrored by the DuckDB oracles):
  *   - scheme and authority (host[:port]) lowercased; path/query case kept
  *   - a leading `www.` label is stripped
  *   - scheme-default ports dropped (`http://…:80`, `https://…:443`);
  *     any other explicit port survives
  *   - the fragment (`#…`) is dropped
  *   - `utm_*` tracking parameters are dropped; remaining query-string
  *     parameter order is preserved; a now-empty query string drops its `?`
  *   - trailing slashes at the end of the path are dropped, including the
  *     root slash (`http://h/` -> `http://h`) — one host, one spelling
  */
object UrlCuration {

  /** `scheme://authority` prefix, i.e. everything before the path. */
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Lowercase the scheme+authority prefix while leaving the
    * case-sensitive path/query untouched: extract the prefix, lower it,
    * and glue the (prefix-stripped) remainder back on. Both legs are
    * anchored regexes over the same input, so they agree on the split. */
  private def lowerAuthority(u: Column): Column =
    concat(lower(regexp_extract(u, AuthorityRe, 0)),
      regexp_replace(u, AuthorityRe, ""))

  /** Canonicalize one URL (see object doc for the policy). Null-safe:
    * null in, null out (every step is a null-propagating expression). */
  def canonicalize(url: Column): Column = {
    val lowered = lowerAuthority(url)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noWww = regexp_replace(noFrag, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val noDefPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/?#:]+):80(?=[/?#]|$)", "$1"),
      "^(https://[^/?#:]+):443(?=[/?#]|$)", "$1")
    // utm_* strip: the mid-string rule twice (java.util.regex.replaceAll
    // resumes AFTER the consumed separator, so adjacent utm params need a
    // second pass), then the tail rule, then a dangling '?'.
    val utmMid1 = regexp_replace(noDefPort, "([?&])utm_[^&#]*&", "$1")
    val utmMid2 = regexp_replace(utmMid1, "([?&])utm_[^&#]*&", "$1")
    val utmEnd = regexp_replace(utmMid2, "[?&]utm_[^&#]*$", "")
    val noEmptyQ = regexp_replace(utmEnd, "\\?$", "")
    // trailing path slash(es), whether at end-of-URL or just before '?';
    // the [^/:] lookbehind keeps the '//' of a degenerate bare 'scheme://'
    regexp_replace(noEmptyQ, "(?<=[^/:])/+(\\?|$)", "$1")
  }

  /** Registrable host of a CANONICAL URL (lowercased, www-less). */
  def domainOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
}
