package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 parser/matcher vectors: group selection, longest-match
  * precedence, wildcard + anchor matching, noise tolerance.
  */
class RobotsSpec extends AnyFunSuite {

  private def decide(txt: String, agent: String, path: String): Boolean =
    Robots.allowed(Robots.rulesFor(txt, agent).map(r => (r.allow, r.pattern)), path)

  test("simple disallow prefix") {
    val txt = "User-agent: *\nDisallow: /private/\n"
    assert(!decide(txt, "anybot", "/private/x"))
    assert(decide(txt, "anybot", "/public/x"))
  }

  test("longest match wins: longer Allow overrides shorter Disallow") {
    val txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
    assert(!decide(txt, "bot", "/a/x"))
    assert(decide(txt, "bot", "/a/b/x"))
  }

  test("tie between Allow and Disallow of equal length: Allow wins") {
    val txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    assert(decide(txt, "bot", "/dir/x"))
  }

  test("specific agent group beats the * group") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nAllow: /\n"
    assert(decide(txt, "graftbot", "/anything"))
    assert(decide(txt, "GraftBot/1.2", "/anything")) // product-token prefix, case-insensitive
    assert(!decide(txt, "otherbot", "/anything"))
  }

  test("consecutive UA lines share one group") {
    val txt = "User-agent: abot\nUser-agent: bbot\nDisallow: /x/\n"
    assert(!decide(txt, "abot", "/x/1"))
    assert(!decide(txt, "bbot", "/x/1"))
    assert(decide(txt, "cbot", "/x/1")) // no matching group → all allowed
  }

  test("a UA line after rules starts a NEW group") {
    val txt = "User-agent: abot\nDisallow: /a/\nUser-agent: bbot\nDisallow: /b/\n"
    assert(!decide(txt, "abot", "/a/1"))
    assert(decide(txt, "abot", "/b/1"))
    assert(!decide(txt, "bbot", "/b/1"))
  }

  test("empty Disallow matches nothing (allows everything)") {
    val txt = "User-agent: *\nDisallow:\n"
    assert(decide(txt, "bot", "/any"))
  }

  test("comments and unknown fields are ignored") {
    val txt = "# header\nUser-agent: * # inline\nCrawl-delay: 10\nSitemap: https://x/s.xml\nDisallow: /q/\n"
    assert(!decide(txt, "bot", "/q/1"))
    assert(decide(txt, "bot", "/r/1"))
  }

  test("wildcard * in the middle of a pattern") {
    val txt = "User-agent: *\nDisallow: /a/*/c\n"
    assert(!decide(txt, "bot", "/a/bb/c"))
    assert(!decide(txt, "bot", "/a/bb/cd")) // unanchored: prefix-of-longer still matches
    assert(decide(txt, "bot", "/a/bb/d"))
  }

  test("$ anchor requires an end match") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\n"
    assert(!decide(txt, "bot", "/docs/x.pdf"))
    assert(decide(txt, "bot", "/docs/x.pdfs"))
    assert(decide(txt, "bot", "/docs/x.html"))
  }

  test("$ anchor without wildcard: exact path only") {
    val txt = "User-agent: *\nDisallow: /exact$\n"
    assert(!decide(txt, "bot", "/exact"))
    assert(decide(txt, "bot", "/exact/sub"))
  }

  test("anchored last segment must sit after the middle segments") {
    val txt = "User-agent: *\nDisallow: /a*b*c$\n"
    assert(!decide(txt, "bot", "/a-b-c"))
    assert(!decide(txt, "bot", "/a-b-x-c"))
    assert(decide(txt, "bot", "/a-c-b")) // c before b: middle order violated
  }

  test("groups with equal specificity merge") {
    val txt = "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nDisallow: /b/\n"
    assert(!decide(txt, "bot", "/a/1"))
    assert(!decide(txt, "bot", "/b/1"))
  }

  test("corpus hosts match the oracle CASE") {
    // graftbot agent: h%5==0 denied everywhere; even h denied on /g/ except
    // h%3==0 re-allows /g/x1; odd non-multiples allowed
    for (h <- 0 until 11; i <- 0 until 4) {
      val expect =
        if (h % 5 == 0) false
        else if (h % 2 == 0) h % 3 == 0 && i == 1
        else true
      val got = decide(graft.spark.Pages.renderRobots(h), "graftbot", s"/g/x$i")
      assert(got == expect, s"h=$h i=$i expect=$expect got=$got")
    }
  }

  test("sitemap discovery: file-wide directives harvested in order, case-folded, comment-stripped") {
    val txt = "User-agent: *\nDisallow: /x/\n" +
      "Sitemap: https://a.example.com/s1.xml\n" +
      "sitemap: https://a.example.com/s2.xml # refreshed daily\n" +
      "SITEMAP: https://a.example.com/s3.xml\n" +
      "# sitemap: https://a.example.com/commented-out.xml\n"
    assert(Robots.sitemapsOf(txt) == Vector(
      "https://a.example.com/s1.xml",
      "https://a.example.com/s2.xml",
      "https://a.example.com/s3.xml"))
    // directives do NOT leak into the rule groups
    assert(decide(txt, "bot", "/x/1") == false)
    assert(decide(txt, "bot", "/ok") == true)
    // corpus: only h%4==0 hosts declare sitemaps, two each
    for (h <- 0 until 11) {
      val got = Robots.sitemapsOf(graft.spark.Pages.renderRobots(h))
      if (h % 4 == 0) assert(got.length == 2 && got.forall(_.contains(s"site$h.example.com")))
      else assert(got.isEmpty)
    }
  }

  test("crawl-delay: agent-selected group wins, * fallback, default on absent/non-numeric") {
    val txt = "User-agent: *\nCrawl-delay: 5\nDisallow: /q/\n\n" +
      "User-agent: graftbot\nCrawl-delay: 9\nDisallow: /\n"
    assert(Robots.crawlDelaySeconds(txt, "graftbot") == 9L)
    assert(Robots.crawlDelaySeconds(txt, "otherbot") == 5L)
    // selected group without a delay → default, even when ANOTHER group has one
    val noDelay = "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(Robots.crawlDelaySeconds(noDelay, "graftbot", defaultS = 3L) == 3L)
    // non-numeric values ignored; first valid declaration wins
    val messy = "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 4\nCrawl-delay: 2\n"
    assert(Robots.crawlDelaySeconds(messy, "anybot") == 4L)
    assert(Robots.crawlDelaySeconds("", "anybot", defaultS = 2L) == 2L)
    // all-digit but Long-overflowing garbage must fall through, not throw
    val huge = "User-agent: *\nCrawl-delay: 99999999999999999999\n"
    assert(Robots.crawlDelaySeconds(huge, "anybot", defaultS = 6L) == 6L)
  }

  test("crawl-delay: fractional seconds (Bing/Yandex form) round UP; zero honored") {
    def d(v: String, dflt: Long = 1L) =
      Robots.crawlDelaySeconds(s"User-agent: *\nCrawl-delay: $v\n", "anybot", dflt)
    assert(d("0.5") == 1L)   // honored by ceiling, never shortened
    assert(d("2.5") == 3L)
    assert(d("4.0") == 4L)   // .0 fraction is exact, no round-up
    assert(d("0") == 0L)     // a declared zero is a real value, not the default
    assert(d("0.0") == 0L)
    assert(d(".5", dflt = 7L) == 7L)     // no integer part → not the accepted form
    assert(d("1.2.3", dflt = 7L) == 7L)  // two dots → garbage
    assert(d("2.x", dflt = 7L) == 7L)    // non-digit fraction → garbage
  }

  test("crawl-delay over the corpus robots matches the oracle CASE") {
    (0 until 11).foreach { h =>
      val want = if (h % 5 == 0) 9L else (h % 7 + 1).toLong
      assert(Robots.crawlDelaySeconds(graft.spark.Pages.renderRobots(h), "graftbot") == want,
        s"host $h")
    }
  }
}
