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
  * comments), so the full Mozilla list drops in verbatim at deployment.
  * Offline builds ship [[snapshot]], a curated subset bundled as a
  * classpath resource in the same format.
  *
  * Matching follows the published algorithm: an exception rule beats all,
  * otherwise the longest matching rule prevails (a `*.` wildcard matches
  * exactly one extra label), and the default rule is `*` (the bare TLD).
  * The registered domain is the public suffix plus one label; a host that
  * IS a public suffix (or an IP literal) passes through verbatim.
  *
  * Scale shape: [[registeredDomainExpr]] compiles the rule sets into map
  * LITERALS probed at the bounded candidate depths — pure codegen hash
  * lookups per row, no UDF, no join, nothing shuffled; the list rides the
  * plan like any other literal.
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
    * file's own convention).
    */
  def fromLines(lines: Iterator[String]): Psl = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace).toLowerCase(java.util.Locale.ROOT)
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) exc += line.drop(1)
        else if (line.startsWith("*.")) wild += line.drop(2)
        else exact += line
      }
    }
    Psl(exact.result(), wild.result(), exc.result())
  }

  /** The bundled snapshot (classpath resource, PSL file format). */
  lazy val snapshot: Psl = {
    val in = getClass.getResourceAsStream("/graft/public-suffix-snapshot.dat")
    require(in != null, "public-suffix snapshot resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Registered domain of a (lowercased, unbracketed) hostname column under
    * `psl`. IP hosts and hosts that are themselves a public suffix pass
    * through verbatim.
    */
  def registeredDomainExpr(hostname0: Column, psl: Psl): Column = {
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
