package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization + registrable domain ([[UrlOps]]) and the
  * domain-curation pipeline ([[graft.pipelines.WebCuration]]). */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(Tuple1(url)).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  private def domain(host: String): String =
    Seq(Tuple1(host)).toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).head().getString(0)

  test("canonicalization: case, www, port-free host, slash, fragment") {
    assert(canon("HTTPS://WWW.Example.COM/") == "https://example.com")
    assert(canon("https://example.com/a/b/") == "https://example.com/a/b")
    assert(canon("https://example.com/a#frag") == "https://example.com/a")
    // identical resources under different raw spellings converge
    assert(canon("HTTP://WWW.Site.ORG/x/?b=2&a=1#z") ==
           canon("http://site.org/x?a=1&b=2"))
  }

  test("tracking parameters drop; survivors sort; bare ? disappears") {
    assert(canon("https://e.com/p?utm_source=a&utm_medium=b") ==
      "https://e.com/p")
    assert(canon("https://e.com/p?gclid=1&z=9&fbclid=2&a=3") ==
      "https://e.com/p?a=3&z=9")
    assert(canon("https://e.com/p?ref=hn&msclkid=7&mc_cid=8&mc_eid=9") ==
      "https://e.com/p")
    // UTM prefix is case-insensitive, real params keep their case
    assert(canon("https://e.com/p?UTM_Source=x&Q=1") ==
      "https://e.com/p?Q=1")
  }

  test("null and hostless inputs yield null (quarantine contract)") {
    assert(canon(null) == null)
    assert(canon("not a url at all") == null)
    assert(canon("/relative/path?a=1") == null)
  }

  test("registrable domain: plain TLD, generic SLD under ccTLD, edge shapes") {
    assert(domain("example.com") == "example.com")
    assert(domain("a.b.example.com") == "example.com")
    assert(domain("site.co.uk") == "site.co.uk")
    assert(domain("blog.site.co.uk") == "site.co.uk")
    assert(domain("shop.com.au") == "shop.com.au")
    assert(domain("x.gov.br") == "x.gov.br")
    // 2-label host whose FIRST label is a generic SLD keyword: no
    // third label exists, so it stays as-is
    assert(domain("co.uk") == "co.uk")
    // generic SLD under a LONG TLD is a real 2-label domain, not a
    // suffix ('com' under .org is just a name)
    assert(domain("com.org") == "com.org")
    assert(domain("localhost") == "localhost")
  }

  test("registrable domain: output is lowercased on every path") {
    // general path lowercases; the bare-suffix and single-label early
    // returns must too, or a raw host column splits one logical
    // domain into case-variant grouping keys
    assert(domain("WWW.Example.COM") == "example.com")
    assert(domain("FOO.CK") == "foo.ck")       // bare *.ck suffix
    assert(domain("CO.UK") == "co.uk")         // bare exact suffix
    assert(domain("LOCALHOST") == "localhost") // single label
  }

  test("registrable domain: PSL multi-label, wildcard, exception, private rules") {
    // prefecture suffixes: hokkaido.jp is a public suffix, so the
    // prefecture government's own host groups at pref.hokkaido.jp —
    // the case the two-label arithmetic gets one level coarse
    assert(domain("www.pref.hokkaido.jp") == "pref.hokkaido.jp")
    assert(domain("city.sapporo.hokkaido.jp") == "sapporo.hokkaido.jp")
    assert(domain("x.co.jp") == "x.co.jp")
    // designated-city wildcard: every label under kawasaki.jp is a
    // suffix EXCEPT the city government itself (!city.kawasaki.jp)
    assert(domain("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
    assert(domain("ward.city.kawasaki.jp") == "city.kawasaki.jp")
    // *.ck with !www.ck
    assert(domain("shop.biz.ck") == "shop.biz.ck")
    assert(domain("sub.www.ck") == "www.ck")
    // private-section hosting platforms: subdomains are independent
    // registrants and must not collapse into the platform apex
    assert(domain("alice.github.io") == "alice.github.io")
    assert(domain("deep.alice.github.io") == "alice.github.io")
    assert(domain("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    assert(domain("key.bucket.s3.amazonaws.com") ==
           "key.bucket.s3.amazonaws.com")
    // approx form agrees on the common shapes it was built for
    val approx = Seq("a.b.example.com", "blog.site.co.uk", "shop.com.au")
      .toDF("h")
      .select(UrlOps.registrableDomainApprox(col("h")).as("a"),
              UrlOps.registrableDomain(col("h")).as("p"))
      .collect()
    approx.foreach(r => assert(r.getString(0) == r.getString(1)))
    // SQL registration via GraftExtensions
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql(
        "SELECT registrable_domain('www.pref.hokkaido.jp')")
      .head().getString(0) == "pref.hokkaido.jp")
  }

  private def surt(url: String): String = {
    val r = Seq(Tuple1(url)).toDF("url")
      .select(UrlOps.surtKey(col("url"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("surt key: reversal, lowercase fold, www strip, query sort, null") {
    assert(surt("http://news.beta.example/p?B=2&a=1") ==
      "example,beta,news)/p?a=1&b=2")
    assert(surt("HTTPS://WWW.Alpha.Example/Dir/") == "example,alpha)/dir")
    assert(surt("http://x.example/a?utm_source=s&k=1") ==
      "example,x)/a?k=1")
    assert(surt("not a url") == null)
    assert(surt(null) == null)
  }

  test("surt sort makes every domain and subdomain subtree contiguous") {
    val urls = Seq(
      "http://news.beta.example/2", "http://alpha.example/x",
      "http://beta.example/1", "http://www.alpha.example/y",
      "http://gamma.example/z", "http://beta.example/0")
    val sorted = urls.map(u => (surt(u), u)).sortBy(_._1)
    // every key sharing a domain prefix is adjacent after the sort
    val prefixes = sorted.map(_._1.takeWhile(_ != ')'))
    val runs = prefixes.foldLeft(List.empty[String]) {
      case (acc, p) if acc.headOption.contains(p) => acc
      case (acc, p) => p :: acc
    }
    assert(runs.length == runs.distinct.length,
      s"a domain's rows split into non-adjacent runs: $sorted")
    // and the beta subtree (beta + news.beta) is itself one range
    assert(prefixes.filter(_.startsWith("example,beta")).length == 3)
    val betaIdx = prefixes.zipWithIndex
      .filter(_._1.startsWith("example,beta")).map(_._2)
    assert(betaIdx == (betaIdx.min to betaIdx.max).toList)
  }

  test("resolvePageIdentity: a chain crossing all three signal kinds collapses") {
    import graft.pipelines.WebCuration
    def resp(url: String, status: Int, location: String,
             body: String) =
      ("response", url, status, location,
       if (body == null) Array.empty[Byte] else body.getBytes("UTF-8"))
    // d canonicalizes to c, c redirects to b, b's body equals a's:
    // {a,b,c,d} is ONE identity although no single signal links d→a.
    // e is signal-less and must self-identify.
    val crawl = Seq(
      resp("http://x.example/a", 200, null, "<p>shared body</p>"),
      resp("http://x.example/b", 200, null, "<p>shared body</p>"),
      resp("http://x.example/c", 301, "/b", null),
      resp("http://x.example/d", 200, null,
        """<html><head><link rel="canonical" href="/c"></head>
          |<body>unique d</body></html>""".stripMargin),
      resp("http://x.example/e", 200, null, "<p>loner</p>")
    ).toDF("warc_type", "target_uri", "http_status", "http_location",
           "body")
    val got = WebCuration.resolvePageIdentity(crawl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for (u <- Seq("a", "b", "c", "d"))
      assert(got(s"http://x.example/$u") == "http://x.example/a",
        s"$u should collapse to a: $got")
    assert(got("http://x.example/e") == "http://x.example/e")
  }

  test("capPerDomain keeps best-k per domain deterministically") {
    val docs = Seq(
      (1L, "a.com", 100L), (2L, "a.com", 300L), (3L, "a.com", 200L),
      (4L, "b.com", 50L), (5L, "b.com", 50L), (6L, "b.com", 50L))
      .toDF("doc_id", "domain", "n_chars")
    val kept = graft.pipelines.WebCuration
      .capPerDomain(docs, maxDocs = 2)
      .select("doc_id", "domain_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // a.com: 300 (id 2) then 200 (id 3); b.com ties break by id: 4, 5
    assert(kept == Map(2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
  }

  test("dedupByCanonicalUrl keeps one best doc per URL; null URLs all survive") {
    val docs = Seq(
      (1L, "https://a.com/x", 100L), (2L, "https://a.com/x", 300L),
      (3L, "https://a.com/y", 10L),
      (4L, null.asInstanceOf[String], 1L),
      (5L, null.asInstanceOf[String], 2L))
      .toDF("doc_id", "canonical_url", "n_chars")
    val kept = graft.pipelines.WebCuration.dedupByCanonicalUrl(docs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // URL a.com/x: best quality wins (id 2); y unique; nulls never collide
    assert(kept == Seq(2L, 3L, 4L, 5L))
    // composes with the canonicalizer: raw spellings of one resource
    // (case, www, tracking params, fragment) collapse to one survivor
    val raw = Seq(
      (10L, "HTTPS://WWW.E.COM/p?utm_source=x&a=1", 5L),
      (11L, "https://e.com/p/?a=1#frag", 9L),
      (12L, "https://e.com/q", 1L))
      .toDF("doc_id", "url", "n_chars")
    val survivors = graft.pipelines.WebCuration.dedupByCanonicalUrl(
        graft.pipelines.WebCuration.withUrlColumns(raw))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(11L, 12L))
  }

  test("dropBlockedDomains: literal-set and anti-join paths agree") {
    val docs = Seq((1L, "a.com"), (2L, "bad.com"), (3L, "c.org"))
      .toDF("doc_id", "domain")
    val block = Seq("bad.com", "worse.net")
    val small = graft.pipelines.WebCuration
      .dropBlockedDomains(docs, block)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val large = graft.pipelines.WebCuration
      .dropBlockedDomains(docs, block, broadcastThreshold = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(small == Seq(1L, 3L) && large == small)
    // the small path compiles to a map-only filter: no join, no
    // exchange in the plan
    val plan = graft.pipelines.WebCuration.dropBlockedDomains(docs, block)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }
}
