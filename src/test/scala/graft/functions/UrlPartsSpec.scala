package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlPartsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(urls: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(
        UrlParts.host(col("url")).as("h"),
        UrlParts.registeredDomain(UrlParts.host(col("url"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("host extraction: scheme, userinfo, port, path, query, fragment") {
    assert(run(Seq(
      "https://www.example.com/path?q=1#f",
      "http://user:pw@example.com:8080/x",
      "ftp://files.example.org",
      "example.com/schemeless/path",
      "https://example.com")) == Seq(
      ("www.example.com", "example.com"),
      ("example.com", "example.com"),
      ("files.example.org", "example.org"),
      ("example.com", "example.com"),
      ("example.com", "example.com")))
  }

  test("case folding and protocol-relative URLs (RFC 3986 host case-insensitivity)") {
    assert(run(Seq(
      "https://WWW.BBC.CO.UK/News", // uppercase must not split the publisher
      "HTTPS://Example.COM/x",
      "//cdn.example.com/asset.js", // protocol-relative crawl href
      "//CDN.Example.ORG:443/y")) == Seq(
      ("www.bbc.co.uk", "bbc.co.uk"),
      ("example.com", "example.com"),
      ("cdn.example.com", "example.com"),
      ("cdn.example.org", "example.org")))
  }

  test("IP-literal hosts: bracketed IPv6 unwrapped, IPv4/IPv6 pass registeredDomain verbatim") {
    assert(run(Seq(
      "http://[::1]:8080/x",                 // brackets are delimiters, not host chars
      "https://[2001:db8::7]/path?q=1",
      "http://192.168.0.1:8080/admin",
      "http://10.0.0.1",
      "http://user@[::1]/y")) == Seq(
      ("::1", "::1"),
      ("2001:db8::7", "2001:db8::7"),
      ("192.168.0.1", "192.168.0.1"), // not split into a nonsense "0.1" domain
      ("10.0.0.1", "10.0.0.1"),
      ("::1", "::1")))
    // version-ish names are NOT dotted quads — label logic still applies
    assert(run(Seq("http://v1.2.archive.example.com")) ==
      Seq(("v1.2.archive.example.com", "example.com")))
  }

  private def runPsl(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlParts.registeredDomain(
        UrlParts.host(col("url")), PublicSuffixList.snapshot).as("d"))
      .collect().map(_.getString(0)).toSeq
  }

  test("PSL registered domain: multi-label suffixes, private domains, defaults") {
    assert(runPsl(Seq(
      "https://www.bbc.co.uk/news",      // co.uk is a rule -> 3 labels
      "https://a.b.c.deep.example.com",  // com -> 2 labels
      "https://alice.github.io/repo",    // private platform suffix
      "https://assets.cdn.blogspot.com",
      "http://sub.example.unknowntld",   // no rule -> default '*' = bare TLD
      "https://localhost/x",             // single label IS the suffix
      "http://192.168.0.1:8080/a")) == Seq(
      "bbc.co.uk",
      "example.com",
      "alice.github.io",
      "cdn.blogspot.com",
      "example.unknowntld",
      "localhost",
      "192.168.0.1"))
  }

  test("PSL wildcard and exception rules (the *.ck / !www.ck pair)") {
    assert(runPsl(Seq(
      "http://shop.a.ck/x",   // *.ck: a.ck is a suffix -> shop.a.ck registers
      "http://www.ck/x",      // exception: www.ck registers under bare ck
      "http://sub.www.ck/x")) == Seq(
      "shop.a.ck",
      "www.ck",
      "www.ck"))
    // a host that IS a public suffix passes through verbatim
    assert(runPsl(Seq("https://co.uk", "https://github.io")) ==
      Seq("co.uk", "github.io"))
  }

  test("shipped snapshot is the FULL Mozilla list (real-list oddities hold)") {
    val psl = PublicSuffixList.snapshot
    assert(psl.exact.size > 9000, s"snapshot looks curated: ${psl.exact.size} rules")
    assert(runPsl(Seq(
      // *.kawasaki.jp wildcard with the !city.kawasaki.jp exception
      "https://a.b.kawasaki.jp/x",      // *.kawasaki.jp -> b.kawasaki.jp is a suffix
      "https://sub.city.kawasaki.jp/x", // exception -> city.kawasaki.jp registers
      // depth-5 exact rule
      "https://bucket.s3.cn-north-1.amazonaws.com.cn/key",
      // IDN rule in punycode form (公司.cn is a U-label rule in the file)
      "http://foo.xn--55qx5d.cn/x")) == Seq(
      "a.b.kawasaki.jp",
      "city.kawasaki.jp",
      "bucket.s3.cn-north-1.amazonaws.com.cn",
      "foo.xn--55qx5d.cn"))
  }

  test("PSL tiers agree: codegen literal-map vs hash-set UDF on one battery") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // small enough for the codegen tier; padding clones push the SAME rules
    // past LiteralMapMaxRules to force the UDF tier
    val rules = Seq("com", "co.uk", "*.ck", "!www.ck", "github.io",
      "s3.cn-north-1.amazonaws.com.cn")
    val small = PublicSuffixList.fromLines(rules.iterator)
    val padded = PublicSuffixList.fromLines(
      (rules ++ (1 to PublicSuffixList.LiteralMapMaxRules).map(i => s"pad$i.zz")).iterator)
    assert(rules.map(_.stripPrefix("!").stripPrefix("*.")).forall(r =>
      small.exact(r) || small.wildcardParents(r) || small.exceptions(r)))
    val hosts = Seq(
      "www.example.com", "bbc.co.uk", "a.b.c.co.uk", "shop.a.ck", "www.ck",
      "sub.www.ck", "alice.github.io", "github.io", "co.uk", "localhost",
      "bare", "x.y.unknown", "192.168.0.1", "bucket.s3.cn-north-1.amazonaws.com.cn",
      "example.com.", "a..b")
    def run(psl: PublicSuffixList.Psl) = hosts.toDF("h")
      .select(PublicSuffixList.registeredDomainExpr(col("h"), psl).as("d"))
      .collect().map(_.getString(0)).toSeq
    val codegen = run(small)
    val viaUdf = run(padded)
    val scalaTwin = hosts.map(PublicSuffixList.registeredDomainOf(_, small))
    assert(codegen == scalaTwin)
    assert(viaUdf == codegen)
  }

  test("PSL parser: comments, blanks, wildcards, exceptions, case folding") {
    val psl = PublicSuffixList.fromLines(Iterator(
      "// comment", "", "  ", "COM", "*.CK", "!www.ck", "co.uk  // trailing"))
    assert(psl.exact == Set("com", "co.uk"))
    assert(psl.wildcardParents == Set("ck"))
    assert(psl.exceptions == Set("www.ck"))
    assert(psl.maxDepth == 2)
    assert(PublicSuffixList.snapshot.exact.contains("co.uk"))
    assert(PublicSuffixList.snapshot.wildcardParents.contains("ck"))
  }

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.toDF("url")
      .select(UrlParts.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalize: every URL spelling of one page maps to one key") {
    // the crawl-dedup property: case, default port, fragment, tracking
    // params and param order all collapse
    val variants = Seq(
      "https://Example.com/a/b?x=1&y=2",
      "HTTPS://EXAMPLE.COM/a/b?y=2&x=1",
      "https://example.com:443/a/b?x=1&y=2#section",
      "https://example.com/a/b?utm_source=tw&y=2&fbclid=z&x=1")
    assert(canon(variants).toSet == Set("https://example.com/a/b?x=1&y=2"))
  }

  test("canonicalize: rules fire individually, path case preserved") {
    assert(canon(Seq(
      "http://a.com:80",             // default port + empty path
      "http://a.com:8080/x",         // non-default port kept
      "https://a.com/CaseSensitive/Path", // path case IS significant
      "https://a.com/x?gclid=1&utm_campaign=2", // tracking-only query drops '?'
      "a.com/x?utm_campaign=1",      // schemeless passthrough
      "//cdn.a.com/asset.js",        // protocol-relative passthrough
      "  https://a.com/x#f  "        // trim + fragment
    )) == Seq(
      "http://a.com/",
      "http://a.com:8080/x",
      "https://a.com/CaseSensitive/Path",
      "https://a.com/x",
      "a.com/x?utm_campaign=1",
      "//cdn.a.com/asset.js",
      "https://a.com/x"))
  }

  test("canonicalize: userinfo case is preserved, host still folds") {
    // RFC 3986: only scheme and host are case-insensitive — credentials
    // differing in case are DIFFERENT resources and must not collapse
    assert(canon(Seq(
      "https://Alice@Example.com/x",
      "https://alice@example.com/x")) ==
      Seq("https://Alice@example.com/x", "https://alice@example.com/x"))
  }

  test("canonicalize: bare tracking keys (no '=') are dropped too") {
    assert(canon(Seq("https://a.com/x?fbclid&b=1")) == Seq("https://a.com/x?b=1"))
  }

  test("registered domain: FQDN trailing dot groups with the dotless host") {
    // both tiers — the PSL algorithm strips a trailing dot before matching
    assert(run(Seq("https://example.com./x")).map(_._2) == Seq("example.com"))
    assert(runPsl(Seq("https://www.bbc.co.uk./news")) == Seq("bbc.co.uk"))
  }

  test("canonicalize is idempotent") {
    val in = Seq(
      "https://WWW.Example.com:443/a?b=2&a=1#f",
      "http://a.com:80", "a.com/x?z=1", "https://a.com/p?utm_source=x")
    val once = canon(in)
    assert(canon(once) == once)
  }

  test("registered domain: two-label default, second-level registry labels") {
    assert(run(Seq(
      "https://www.bbc.co.uk/news",
      "https://a.b.c.deep.example.com",
      "https://example.ac.jp",
      "https://localhost/x",
      "https://a.gov.au")) == Seq(
      ("www.bbc.co.uk", "bbc.co.uk"),
      ("a.b.c.deep.example.com", "example.com"),
      ("example.ac.jp", "example.ac.jp"),
      ("localhost", "localhost"),
      ("a.gov.au", "a.gov.au")))
  }
}
