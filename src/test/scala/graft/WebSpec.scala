package graft

import org.apache.spark.sql.functions._

import graft.ext.Web

/** Specs for the web-curation family: URL component split /
  * canonicalization / registered-domain, and the HTML extraction state
  * machine. Hand-built rows drive the edge cases the fixture corpus
  * can't isolate. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def urls(us: (Long, String)*) = us.toSeq.toDF("doc_id", "url")

  test("urlParse: components land in the right fields") {
    val r = Web.urlParse(urls(
      1L -> "HTTPS://WWW.Alpha.COM:8443/p/7?ref=1&x=2#frag",
      2L -> "http://cdn.bravo.org/p/9")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val a = r(1L)
    assert(a.getAs[String]("scheme") == "HTTPS")
    assert(a.getAs[String]("host") == "WWW.Alpha.COM")
    assert(a.getAs[Long]("port") == 8443L)
    assert(a.getAs[String]("path") == "/p/7")
    assert(a.getAs[String]("query") == "ref=1&x=2")
    assert(a.getAs[String]("fragment") == "frag")
    val b = r(2L)
    assert(b.getAs[Long]("port") == -1L)
    assert(b.getAs[String]("query") == "")
    assert(b.getAs[String]("fragment") == "")
  }

  test("urlParse: a scheme-less string degrades to empty components, not a crash") {
    val r = Web.urlParse(urls(1L -> "not a url at all")).collect().head
    assert(r.getAs[String]("scheme") == "")
    assert(r.getAs[String]("host") == "")
    assert(r.getAs[String]("path") == "")
    assert(r.getAs[Long]("port") == -1L)
  }

  test("htmlExtract: a bare ampersand and an unterminated entity stay literal") {
    val e = extractOne("<p>a & b &unterminated</p>")
    assert(e.extracted == "a & b &unterminated")
  }

  test("urlNormalize: case, default ports, utm params, slash, fragment") {
    val canon = Web.urlNormalize(urls(
      1L -> "HTTPS://WWW.ALPHA.COM:443/p/7?utm_source=a&ref=1#x",
      2L -> "https://www.alpha.com/p/7?ref=1",
      3L -> "http://x.io:443/p/1",   // 443 is NOT http's default: kept
      4L -> "http://x.io:80/p/1",
      5L -> "https://x.io/p/1/",
      6L -> "https://x.io/p/1?utm_campaign=z"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("canon_url")).toMap
    assert(canon(1L) == "https://www.alpha.com/p/7?ref=1")
    assert(canon(1L) == canon(2L))
    assert(canon(3L) == "http://x.io:443/p/1")
    assert(canon(4L) == "http://x.io/p/1")
    assert(canon(5L) == "https://x.io/p/1")
    assert(canon(6L) == "https://x.io/p/1")
  }

  test("urlNormalize is idempotent: canon of a canon is itself") {
    val raw = Web.urlTable(Seq.tabulate(64)(i => (i.toLong, "t")).toDF("doc_id", "text"))
    val once = Web.urlNormalize(raw).select(col("doc_id"), col("canon_url").as("url"))
    val twice = Web.urlNormalize(once)
    assert(twice.filter(col("url") =!= col("canon_url")).count() == 0L)
  }

  test("registeredDomain: multi-label suffix claims three labels; unknown TLD falls back") {
    val r = Web.registeredDomain(urls(
      1L -> "https://www.alpha.co.uk/p/1",
      2L -> "https://alpha.co.uk/p/1",
      3L -> "https://cdn.bravo.com/p/1",
      4L -> "https://x.sub.weirdtld/p/1")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("suffix"), x.getAs[String]("reg_domain"))).toMap
    assert(r(1L) == (("co.uk", "alpha.co.uk")))
    assert(r(2L) == (("co.uk", "alpha.co.uk")))
    assert(r(3L) == (("com", "bravo.com")))
    assert(r(4L) == (("weirdtld", "sub.weirdtld")))
  }

  test("domainScreen: blocklisted eTLD+1 rejected regardless of subdomain") {
    val out = Web.domainScreen(urls(
      1L -> "https://www.delta.co.uk/p/1",
      2L -> "https://delta.co.uk/p/2",
      3L -> "https://delta.com/p/3")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("blocked")).toMap
    assert(out(1L) == 1 && out(2L) == 1 && out(3L) == 0)
  }

  private def extractOne(html: String): Web.ExtractedDoc =
    Web.htmlExtract(Seq(Web.HtmlDoc(1L, html)).toDS()).collect().head

  test("htmlExtract: tags strip, entities decode, unknown entity stays literal") {
    val e = extractOne(
      "<p>&lt;a&gt; &amp; &quot;q&quot; &#39;s &nope; end</p>")
    assert(e.extracted == "<a> & \"q\" 's &nope; end")
  }

  test("htmlExtract: script and style content dropped, title captured raw") {
    val e = extractOne(
      "<html><head><title>my page</title><style>p { x: 1 }</style>" +
        "<script>if (1 < 2) alert('&amp;')</script></head>" +
        "<body><p>body text</p></body></html>")
    assert(e.title == "my page")
    assert(e.extracted == "my page body text")
  }

  test("htmlExtract: anchor chars count decoded non-space chars inside <a> only") {
    val e = extractOne(
      "<p>plain</p><a href=\"/x\">one &amp; two</a><p>tail</p>")
    assert(e.n_links == 1L)
    assert(e.anchor_chars == ("one&two").length.toLong)
    assert(e.content_chars == ("plain" + "one&two" + "tail").length.toLong)
  }

  test("htmlExtract: newline/tab between tag name and attributes still parses the tag") {
    // HTML allows any whitespace before attributes; the r17 name scan
    // stopped only at ' ' so '<a\nhref=..>' went uncounted as an anchor
    val e = extractOne("<p>plain</p><a\nhref=\"/x\">link text</a><p\ttitle=\"t\">tail</p>")
    assert(e.n_links == 1L)
    assert(e.anchor_chars == "linktext".length.toLong)
  }

  test("htmlExtract: whitespace collapses, result trimmed") {
    val e = extractOne("<div>  a  \n b\t</div><div>c</div>  ")
    assert(e.extracted == "a b c")
  }

  test("boilerplateScreen: link farm rejected, long clean page accepted") {
    val clean = "<p>" + ("word " * 40).trim + "</p>"          // 200+ chars, no links
    val farm = "<p>tiny</p>" + "<a href=\"/x\">spam link text here</a>" * 8
    val out = Web.boilerplateScreen(Seq(
        Web.HtmlDoc(1L, clean), Web.HtmlDoc(2L, farm)).toDS())
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("accepted")).toMap
    assert(out(1L) == 1 && out(2L) == 0)
  }

  test("urlDupGroups: four crawl variants collapse to one canonical page") {
    // page key k=8 (k%7 != 0; k%5 = 3 so the page has NO ref query and
    // v2 carries a lone utm_campaign that must vanish wholesale): all
    // four variants share the canon
    val raw = Web.urlTable(Seq.tabulate(4)(i => (32L + i, "t")).toDF("doc_id", "text"))
    val g = Web.urlDupGroups(raw).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("n_docs") == 4L)
    assert(g.head.getAs[Long]("survivor") == 32L)
    assert(g.head.getAs[Long]("n_variants") == 4L)
  }

  test("urlDedupAdd/merge: the group read off any delta split equals the batch") {
    val docs = Seq.tabulate(120)(i => (i.toLong, "t")).toDF("doc_id", "text")
    val raw = Web.urlTable(docs)
    val batch = Web.urlDupGroups(raw).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merged = Web.urlDupGroupsFromState(Web.mergeUrlStates(
      (0 to 3).map(i => Web.urlDedupAdd(
        Web.urlTable(docs.filter(col("doc_id") % 4 === i)))): _*)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged == batch)
  }

  test("domainReputationScreen: domain verdict applies to every page of the domain") {
    val margins = Seq((1L, 10L), (2L, -30L), (3L, 5L)).toDF("doc_id", "margin")
    val out = Web.domainReputationScreen(urls(
      1L -> "https://a.alpha.com/p/1",   // alpha.com: margins 10 + (-30) = -20 -> blocked
      2L -> "https://b.alpha.com/p/2",
      3L -> "https://bravo.io/p/3",      // bravo.io: 5 -> kept
      4L -> "https://bravo.io/p/4"),     // no margin row -> 0; domain still kept
      margins).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept")).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("robotsRules: comments and blanks drop, verbs and prefixes trim") {
    val robots = Seq(("d.com",
      "# comment\n\nUser-agent: *\nDisallow: /a\nAllow:   /a/b\nnoise line\n"))
      .toDF("reg_domain", "robots_txt")
    val rules = Web.robotsRules(robots).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(rules == Set(("Disallow", "/a"), ("Allow", "/a/b")))
  }

  test("robotsScreen: longest prefix wins, equal-length tie goes to Allow, no match allows") {
    val robots = Seq(
      ("alpha.com", "User-agent: *\nDisallow: /p/3\nAllow: /p/3\nDisallow: /p/31\n"))
      .toDF("reg_domain", "robots_txt")
    val out = Web.robotsScreen(urls(
      // k=12 -> path /p/12 on alpha.com (no rule matches -> allowed)
      48L -> "https://www.alpha.com/p/12",
      // path /p/3: Disallow+Allow tie at length 4 -> Allow wins
      49L -> "https://www.alpha.com/p/3",
      // path /p/31: matched by /p/3 (len 4) AND /p/31 (len 5) -> longest
      // is the Disallow -> blocked; the string-prefix hazard is REAL
      50L -> "https://www.alpha.com/p/31"), robots).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("matched_rules"), r.getAs[Int]("allowed"))).toMap
    assert(out(48L) == ((0L, 1)))
    assert(out(49L) == ((2L, 1)))
    assert(out(50L) == ((3L, 0)))
  }

  test("mirrorGroups: syndicated text found across domains, single-domain dups excluded") {
    // docs 0 and 400 share text and live on different domains (k=0 ->
    // alpha.com vs k=100 -> alpha.net: name (100/4)%5=0, suffix
    // (100/20)%6=5); docs 8 and 9 share text on the SAME page key
    // (k=2 -> alpha.com) -> single-domain group, excluded
    val docs = Seq(
      (0L, "shared syndicated words here", "en", "s", 28L),
      (400L, "shared syndicated words here", "en", "s", 28L),
      (8L, "same domain duplicate text", "en", "s", 26L),
      (9L, "same domain duplicate text", "en", "s", 26L),
      (5L, "unique content lives here", "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g = Web.mirrorGroups(docs, Web.urlTable(docs)).collect()
    assert(g.length == 1, g.mkString(";"))
    assert(g.head.getAs[Long]("n_docs") == 2L)
    assert(g.head.getAs[Long]("n_domains") == 2L)
    assert(g.head.getAs[Long]("survivor") == 0L)
  }

  test("urlDupGroups: a real :8080 port splits its variant off the group") {
    // page key k=0 (k%7 == 0): v1 carries :8080 and must NOT merge
    val raw = Web.urlTable(Seq.tabulate(4)(i => (i.toLong, "t")).toDF("doc_id", "text"))
    val g = Web.urlDupGroups(raw).collect().sortBy(_.getAs[Long]("n_docs"))
    assert(g.length == 2)
    assert(g.head.getAs[Long]("n_docs") == 1L)   // the :8080 crawl
    assert(g.last.getAs[Long]("n_docs") == 3L)
  }
}
