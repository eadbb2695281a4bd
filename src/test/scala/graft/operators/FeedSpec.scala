package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RSS 2.0 / Atom feed parsing vectors: link extraction (text vs href
  * attribute), rel preference, CDATA/entity decode, published fallback,
  * skip rules for linkless and truncated items.
  */
class FeedSpec extends AnyFunSuite {

  test("RSS: items in order, entity + CDATA titles decode, guid/pubDate captured") {
    val xml =
      """<rss version="2.0"><channel>
        |<item><title>A &amp; B</title><link>https://x/1</link>
        |  <pubDate>2024-01-01</pubDate><guid>g1</guid></item>
        |<item><title><![CDATA[C & D]]></title><link>https://x/2</link></item>
        |</channel></rss>""".stripMargin
    val got = Feed.parse(xml)
    assert(got == Vector(
      Feed.Item("rss", 0, "A & B", "https://x/1", "2024-01-01", "g1"),
      Feed.Item("rss", 1, "C & D", "https://x/2", "", "")))
  }

  test("Atom: href attribute, rel=alternate preferred over self, published falls back to updated") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>T1</title>
        |  <link rel="self" href="https://x/self.xml"/>
        |  <link rel="alternate" href="https://x/a/1"/>
        |  <published>2024-02-02T00:00:00Z</published><id>i1</id></entry>
        |<entry><title>T2</title><link href="https://x/a/2"/>
        |  <updated>2024-03-03T00:00:00Z</updated><id>i2</id></entry>
        |</feed>""".stripMargin
    val got = Feed.parse(xml)
    assert(got == Vector(
      Feed.Item("atom", 0, "T1", "https://x/a/1", "2024-02-02T00:00:00Z", "i1"),
      Feed.Item("atom", 1, "T2", "https://x/a/2", "2024-03-03T00:00:00Z", "i2")))
  }

  test("Atom: only rel=self links means the self href is still better than nothing") {
    val xml = """<feed><entry><title>T</title><link rel="self" href="https://x/s"/></entry></feed>"""
    assert(Feed.parse(xml).map(_.link) == Vector("https://x/s"))
  }

  test("linkless items are skipped; a truncated trailing item is dropped") {
    val xml =
      """<rss><channel>
        |<item><title>no link</title></item>
        |<item><link>https://x/ok</link></item>
        |<item><link>https://x/truncated""".stripMargin
    assert(Feed.parse(xml).map(_.link) == Vector("https://x/ok"))
  }

  test("null / non-feed input yields no items") {
    assert(Feed.parse(null).isEmpty)
    assert(Feed.parse("<html><body>nope</body></html>").isEmpty)
  }
}
