package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition for web-corpus curation — the step between a WARC scan
  * and per-domain operators (capping, mixing, reputation lists): group by
  * REGISTERED domain, not hostname, or `a.cdn.example.com` and
  * `b.cdn.example.com` count as different publishers.
  *
  * Pure codegen regexp/array expressions (no UDF). `registeredDomain` has
  * two tiers: the zero-data two-label heuristic plus common second-level
  * labels (`co.uk`-style), and the [[PublicSuffixList]] overload that runs
  * the real publicsuffix.org algorithm (wildcards, exceptions, private
  * platform suffixes) over a pluggable rule file — a bundled snapshot for
  * offline builds, the full Mozilla list verbatim at deployment.
  */
object UrlParts {

  /** Hostname, LOWERCASED (RFC 3986: the host component is
    * case-insensitive — without folding, `BBC.co.uk` and `bbc.co.uk` split
    * one publisher into two domain groups): scheme and protocol-relative
    * `//` prefixes stripped, userinfo stripped, path/query/fragment cut,
    * port removed. Schemeless input ("example.com/path") is tolerated.
    */
  def host(url: Column): Column = {
    val noScheme = regexp_replace(url, "^([A-Za-z][A-Za-z0-9+.-]*:)?//", "")
    val noUser = regexp_replace(noScheme, "^[^/?#@]*@", "")
    val hostPort = regexp_extract(noUser, "^([^/?#]*)", 1)
    // RFC 3986 IP-literal: an IPv6 host is bracketed ("[::1]:8080") — the
    // brackets are delimiters, not part of the host, and the port-strip
    // regex must not see the colons inside them
    val v6 = regexp_extract(hostPort, "^\\[([^\\]]*)\\]", 1)
    lower(when(length(v6) > 0, v6)
      .otherwise(regexp_replace(hostPort, ":[0-9]+$", "")))
  }

  /** True for hosts that are IP addresses, not registrable names: dotted-quad
    * IPv4 and (unbracketed, as [[host]] emits them) colon-bearing IPv6.
    */
  def isIpHost(hostname: Column): Column =
    hostname.rlike("^[0-9]+(\\.[0-9]+){3}$") || hostname.contains(":")

  /** Common second-level registry labels (the `co` of `bbc.co.uk`). */
  val SecondLevelLabels: Seq[String] =
    Seq("co", "com", "net", "org", "gov", "edu", "ac")

  /** Registered domain under a real Public Suffix List — the full-fidelity
    * variant of [[registeredDomain]] (wildcards, exceptions, private
    * platform suffixes like `github.io`). Pass [[PublicSuffixList.snapshot]]
    * for the bundled data, or `PublicSuffixList.fromLines` over the complete
    * Mozilla file at deployment.
    */
  def registeredDomain(hostname: Column, psl: PublicSuffixList.Psl): Column =
    PublicSuffixList.registeredDomainExpr(hostname, psl)

  /** Tracking query parameters dropped by [[canonicalize]] — the
    * click/campaign identifiers that make one page spell a thousand URLs.
    */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)(=|\\z)"

  /** URL canonicalization — the cheapest crawl-dedup tier (CCNet/RefinedWeb
    * dedup by canonical URL before any content hashing): one page, one key.
    *   - fragment stripped (never sent to the server),
    *   - scheme and authority lowercased (RFC 3986 case-insensitivity;
    *     path/query case is preserved — it IS significant),
    *   - default ports stripped (`:80` for http, `:443` for https),
    *   - empty path normalized to "/",
    *   - tracking parameters ([[TrackingParamPattern]]) dropped and the
    *     surviving query parameters SORTED (param order is almost never
    *     significant; unsorted order splits one page into n! keys).
    * Input without a `scheme://` is passed through trimmed and
    * fragment-stripped only (no authority to normalize — protocol-relative
    * and bare-host strings stay verbatim). Dot-segment resolution and
    * percent-encoding normalization are documented out of scope. Pure
    * column expressions (regexp + array ops, the one lambda closes only
    * over its own argument).
    */
  def canonicalize(url: Column): Column = {
    // anchor hygiene: '$' means "before a FINAL line terminator" in Java
    // but "end of text" in RE2 — on input carrying stray terminators the
    // two engines diverge (and a fragment regex that can't cross '\r'
    // breaks idempotence). (?s) + \z have IDENTICAL semantics in both.
    val noFrag = regexp_replace(trim(url), "(?s)#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    // RFC 3986 case-insensitivity covers scheme and HOST only — userinfo
    // (before the last '@') is case-significant and passes verbatim
    val userinfo = regexp_extract(auth, "(?s)^(.*@)", 1)
    val hostport = lower(regexp_replace(auth, "(?s)^.*@", ""))
    val hostPart = concat(userinfo,
      when(scheme === "http", regexp_replace(hostport, ":80\\z", ""))
        .when(scheme === "https", regexp_replace(hostport, ":443\\z", ""))
        .otherwise(hostport))
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "(?s)^[^?]*\\?(.*)", 1)
    val params = filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    // outer trim LAST: stripping "#fragment" can expose a trailing space
    // ("path #f" → "path ") that a re-canonicalization would then trim —
    // trimming the result keeps the function idempotent (fuzz-proven)
    trim(when(scheme === "", noFrag)
      .otherwise(concat(
        scheme, lit("://"), hostPart,
        when(path === "", lit("/")).otherwise(path),
        when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))))
  }

  /** Registered domain of a hostname: last two labels, or last three when
    * the middle one is a registry second-level label. IP-address hosts
    * ([[isIpHost]]) have no registrable labels and pass through verbatim —
    * splitting a dotted quad on '.' would emit a nonsense "0.1" domain.
    */
  def registeredDomain(hostname0: Column): Column = {
    // FQDN trailing dot stripped before label logic (same rule as the PSL
    // tier) — "example.com." must group with "example.com"
    val hostname = regexp_replace(hostname0, "\\.+\\z", "")
    val parts = split(hostname, "\\.")
    val n = size(parts)
    when(isIpHost(hostname) || n <= 2, hostname)
      .otherwise(
        when(element_at(parts, -2).isin(SecondLevelLabels: _*),
          concat_ws(".",
            element_at(parts, -3), element_at(parts, -2), element_at(parts, -1)))
          .otherwise(concat_ws(".", element_at(parts, -2), element_at(parts, -1))))
  }
}
