package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap XML parsing vectors: entity decode, CDATA, tolerance for
  * malformed/truncated entries, both document kinds.
  */
class SitemapSpec extends AnyFunSuite {

  test("urlset: locs with entities decode, lastmod optional, order kept") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.example.org/p?x=1&amp;y=2</loc><lastmod>2024-01-01</lastmod></url>
        |  <url><loc> https://a.example.org/q </loc></url>
        |</urlset>""".stripMargin
    val es = Sitemap.parse(xml)
    assert(es == Vector(
      Sitemap.Entry("url", "https://a.example.org/p?x=1&y=2", "2024-01-01"),
      Sitemap.Entry("url", "https://a.example.org/q", "")))
  }

  test("CDATA loc passes raw bytes through without entity decode") {
    val xml = "<urlset><url><loc><![CDATA[https://a/b?x=1&y=2&amp;z]]></loc></url></urlset>"
    assert(Sitemap.parse(xml).head.loc == "https://a/b?x=1&y=2&amp;z")
  }

  test("numeric character references decode; unknown entities pass through") {
    assert(Sitemap.decode("a&#47;b&#x2F;c") == "a/b/c")
    assert(Sitemap.decode("a&bogus;b&ampX") == "a&bogus;b&ampX")
  }

  test("sitemapindex yields kind=sitemap for nested files") {
    val xml =
      """<sitemapindex><sitemap><loc>https://a/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
        |<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    assert(Sitemap.parse(xml) == Vector(
      Sitemap.Entry("sitemap", "https://a/s1.xml", "2024-02-01"),
      Sitemap.Entry("sitemap", "https://a/s2.xml", "")))
  }

  test("tolerance: missing loc skipped, truncated trailing entry skipped, non-sitemap empty") {
    val xml = "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>https://ok/1</loc></url><url><loc>https://trunc"
    assert(Sitemap.parse(xml).map(_.loc) == Vector("https://ok/1"))
    assert(Sitemap.parse("<html><body>not a sitemap</body></html>").isEmpty)
    assert(Sitemap.parse(null).isEmpty)
    assert(Sitemap.parse("").isEmpty)
  }

  test("prefix collision: <urlset> open tag is not matched as a <url> entry") {
    // a urlset whose ONLY <url...> prefix occurrence is the container itself
    assert(Sitemap.parse("<urlset attr=\"x\"></urlset>").isEmpty)
    // attributes on entry tags are tolerated
    val es = Sitemap.parse("<urlset><url data-k=\"v\"><loc>https://a/1</loc></url></urlset>")
    assert(es.map(_.loc) == Vector("https://a/1"))
  }
}
