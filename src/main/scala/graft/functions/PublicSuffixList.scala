package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public Suffix List support for [[UrlParts.registeredDomain]] — the real
  * registrable-domain rules (publicsuffix.org) instead of the two-label
  * heuristic, for crawl curation where `a.github.io` and `b.github.io` are
  * different publishers even though `github.io` looks like one domain.
  *
  * The list is DATA, not logic: [[fromLines]] parses the PSL's own file
  * format (one rule per line, `*.` wildcards, `!` exceptions, `//`
  * comments); [[snapshot]] is the COMPLETE Mozilla list bundled as a
  * classpath resource (public data, MPL 2.0 — the file's own header; this
  * copy is the Debian `publicsuffix` package snapshot). IDN rules, which
  * the list carries as U-labels (`公司.cn`), are additionally indexed
  * under their punycode A-label form (`xn--55qx5d.cn`) so hostnames match
  * in whichever representation the crawl delivered them.
  *
  * Matching follows the published algorithm: an exception rule beats all,
  * otherwise the longest matching rule prevails (a `*.` wildcard matches
  * exactly one extra label), and the default rule is `*` (the bare TLD).
  * The registered domain is the public suffix plus one label; a host that
  * IS a public suffix (or an IP literal) passes through verbatim.
  *
  * Scale shape — two tiers by list size, chosen automatically:
  * curated subsets (≤ [[LiteralMapMaxRules]] rules) compile into map
  * LITERALS probed at the bounded candidate depths — pure codegen, no
  * UDF, the list rides the plan like any other literal. The FULL list
  * does not: Catalyst's map-literal lookup (`GetMapValue`) scans keys
  * linearly, so ~9.4k rules × up-to-5 depth probes would be ~50k string
  * compares per row. Past the threshold the probes move into a
  * deterministic scalar UDF over immutable HashSets (O(1) per probe);
  * for [[snapshot]] the UDF references the singleton STATICALLY, so the
  * closure ships no rule data — each executor loads the resource from its
  * own classpath once. Either tier: per-row evaluation, no join, nothing
  * shuffled.
  */
object PublicSuffixList {

  /** Parsed rule sets: `exact` full-suffix rules, `wildcardParents` the
    * label tails whose children are all suffixes (`*.ck` → "ck"),
    * `exceptions` the carve-outs (`!www.ck` → "www.ck").
    */
  final case class Psl(
      exact: Set[String], wildcardParents: Set[String], exceptions: Set[String]) {
    /** Deepest label count any rule can match (wildcards reach one past
      * their parent) — bounds the candidate suffixes probed per row.
      */
    val maxDepth: Int = {
      def labels(s: String) = s.count(_ == '.') + 1
      val all = exact.map(labels) ++ exceptions.map(labels) ++
        wildcardParents.map(labels(_) + 1)
      if (all.isEmpty) 1 else all.max
    }
    require(maxDepth <= 8, s"rule depth $maxDepth — malformed list?")
  }

  /** Parse PSL-format lines (comments, blanks, `*.`, `!`). Rules are
    * lowercased; anything after whitespace on a line is ignored (the PSL
    * file's own convention). Non-ASCII (IDN) rules are indexed under BOTH
    * their U-label form and their punycode A-label form.
    */
  def fromLines(lines: Iterator[String]): Psl = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    def addForms(b: scala.collection.mutable.Builder[String, Set[String]],
        rule: String): Unit = {
      b += rule
      if (rule.exists(_ >= 0x80))
        try b += java.net.IDN.toASCII(rule).toLowerCase(java.util.Locale.ROOT)
        catch { case _: IllegalArgumentException => () } // unencodable rule: U-form only
    }
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace).toLowerCase(java.util.Locale.ROOT)
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) addForms(exc, line.drop(1))
        else if (line.startsWith("*.")) addForms(wild, line.drop(2))
        else addForms(exact, line)
      }
    }
    Psl(exact.result(), wild.result(), exc.result())
  }

  /** The bundled snapshot — the complete Mozilla list (classpath resource,
    * PSL file format, ~9.4k exact + 107 wildcard + 8 exception rules).
    */
  lazy val snapshot: Psl = {
    val in = getClass.getResourceAsStream("/graft/public-suffix-snapshot.dat")
    require(in != null, "public-suffix snapshot resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Largest rule count still compiled into literal-map codegen probes;
    * larger lists switch to the hash-set UDF tier (GetMapValue scans map
    * literals linearly — see the object Scaladoc).
    */
  val LiteralMapMaxRules = 512

  /** Scala twin of [[registeredDomainExpr]]'s algorithm over immutable
    * HashSets — the UDF tier's kernel, and the differential-test anchor
    * the codegen tier is pinned against (PublicSuffixListSpec runs both
    * tiers over the same host battery).
    */
  def registeredDomainOf(host0: String, psl: Psl): String = {
    if (host0 == null) return null
    val host = host0.replaceAll("\\.+\\z", "")
    if (host.matches("^[0-9]+(\\.[0-9]+){3}$") || host.contains(":")) return host
    val parts = host.split("\\.", -1)
    val n = parts.length
    def suffix(i: Int): String =
      if (n >= i) parts.slice(n - i, n).mkString(".") else null
    var excLen = -1
    var ruleLen = 1
    var i = 1
    while (i <= psl.maxDepth) {
      val s = suffix(i)
      if (s != null) {
        if (psl.exceptions.contains(s)) excLen = i - 1
        if (psl.exact.contains(s)) ruleLen = i
        else if (i >= 2 && psl.wildcardParents.contains(suffix(i - 1))) ruleLen = i
      }
      i += 1
    }
    val psLen = if (excLen >= 0) excLen else ruleLen
    val regLen = psLen + 1
    if (n <= regLen) host else parts.slice(n - regLen, n).mkString(".")
  }

  /** Zero-capture UDF over the static [[snapshot]]: the lambda references
    * the object singleton, so executors resolve the rule sets from their
    * own classpath instead of deserializing ~250 KB of closure per task.
    */
  private lazy val snapshotRegDomainUdf =
    udf((h: String) => registeredDomainOf(h, snapshot))

  /** Registered domain of a (lowercased, unbracketed) hostname column under
    * `psl`. IP hosts and hosts that are themselves a public suffix pass
    * through verbatim. Tier choice (codegen literal maps vs hash-set UDF)
    * is by rule count — see the object Scaladoc.
    */
  def registeredDomainExpr(hostname0: Column, psl: Psl): Column = {
    val nRules = psl.exact.size + psl.wildcardParents.size + psl.exceptions.size
    if (nRules > LiteralMapMaxRules) {
      if (psl eq snapshot) return snapshotRegDomainUdf(hostname0)
      val captured = psl // a non-snapshot large list rides the closure
      val u = udf((h: String) => registeredDomainOf(h, captured))
      return u(hostname0)
    }
    // FQDN form: a trailing dot ("example.com.") is legal in crawls and the
    // PSL algorithm strips it before matching — without this the empty last
    // label misses every rule and the default rule emits the bare suffix
    val hostname = regexp_replace(hostname0, "\\.+\\z", "")
    val parts = split(hostname, "\\.")
    val n = size(parts)
    def inSet(set: Set[String], c: Column): Column =
      if (set.isEmpty) lit(false)
      else element_at(typedLit(set.map(_ -> true).toMap), c).isNotNull
    // last-i-labels suffix candidate (null when the host has < i labels —
    // map lookups on null are null → isNotNull false, so short hosts skip)
    def suffix(i: Int): Column =
      when(n >= i, concat_ws(".", slice(parts, -i, i)))
    // public-suffix length by the PSL algorithm, evaluated longest-first:
    // exceptions win (their suffix is one label SHORTER than the rule),
    // then exact rules, then wildcard children; default rule `*` = 1.
    // foldLeft over ASCENDING depths so the deepest candidate ends up as
    // the outermost when() — i.e. the longest match prevails.
    val depths = 1 to psl.maxDepth
    val excCase = depths.foldLeft(lit(null).cast("int")) { (acc, i) =>
      when(inSet(psl.exceptions, suffix(i)), lit(i - 1)).otherwise(acc)
    }
    val ruleCase = depths.foldLeft(lit(1)) { (acc, i) =>
      val withExact = when(inSet(psl.exact, suffix(i)), lit(i))
      if (i >= 2)
        withExact.otherwise(
          when(inSet(psl.wildcardParents, suffix(i - 1)), lit(i)).otherwise(acc))
      else withExact.otherwise(acc)
    }
    val psLen = coalesce(excCase, ruleCase)
    val regLen = psLen + 1
    when(UrlParts.isIpHost(hostname) || n <= regLen, hostname)
      .otherwise(concat_ws(".", slice(parts, -regLen, regLen)))
  }
}
