package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Image-capture vectors: (src, alt) pairs ride the output row in document
  * order; src-less placeholders skipped; first src/alt attribute wins.
  */
class ImgCaptureSpec extends AnyFunSuite {

  private def imgs(html: String): (Vector[String], Vector[String]) = {
    val r = Extractor.extractString(html)
    (r.imgSrcs, r.imgAlts)
  }

  test("src + alt captured in document order") {
    val (s, a) = imgs("<p>x<img src=\"/a.jpg\" alt=\"one\">y<img src=\"/b.png\" alt=\"two\">z</p>")
    assert(s == Vector("/a.jpg", "/b.png"))
    assert(a == Vector("one", "two"))
  }

  test("missing alt becomes empty string, parallel arrays stay aligned") {
    val (s, a) = imgs("<img src=\"/a.jpg\"><img src=\"/b.jpg\" alt=\"b\">")
    assert(s == Vector("/a.jpg", "/b.jpg"))
    assert(a == Vector("", "b"))
  }

  test("src-less img is not captured") {
    val (s, a) = imgs("<img alt=\"lazy\"><img src=\"/real.jpg\">")
    assert(s == Vector("/real.jpg"))
    assert(a == Vector(""))
  }

  test("first src attribute wins on duplicates") {
    val (s, _) = imgs("<img src=\"/first.jpg\" src=\"/second.jpg\">")
    assert(s == Vector("/first.jpg"))
  }

  test("images inside boilerplate subtrees are still captured (like links)") {
    val (s, _) = imgs("<nav><img src=\"/logo.svg\" alt=\"logo\"></nav><p>content text</p>")
    assert(s == Vector("/logo.svg"))
  }

  test("corpus page matches its closed form") {
    val docId = 3L // k = 3 images, alt on 0 and 2
    val (s, a) = imgs(graft.spark.Pages.renderMedia(docId))
    assert(s == Vector("https://img.example.org/i3_0.jpg",
      "https://img.example.org/i3_1.jpg", "https://img.example.org/i3_2.jpg"))
    assert(a == Vector("pic 0 of 3", "", "pic 2 of 3"))
  }

  test("corpus page with doc_id % 4 == 0 has no images") {
    val (s, a) = imgs(graft.spark.Pages.renderMedia(4L))
    assert(s.isEmpty && a.isEmpty)
  }

  private def og(html: String): (Vector[String], Vector[String]) = {
    val r = Extractor.extractString(html)
    (r.ogProps, r.ogVals)
  }

  test("og pairs captured in document order, property case-folded, char-refs decoded") {
    val (p, v) = og("<head><meta property=\"OG:Title\" content=\"A &amp; B\">" +
      "<meta property=\"og:image\" content=\"/i.jpg\"></head><p>x</p>")
    assert(p == Vector("og:title", "og:image"))
    assert(v == Vector("A & B", "/i.jpg"))
  }

  test("og repeats kept; non-og property and content-less og skipped") {
    val (p, v) = og("<meta property=\"og:image\" content=\"/1.jpg\">" +
      "<meta property=\"twitter:card\" content=\"summary\">" +
      "<meta property=\"og:nope\">" +
      "<meta property=\"og:image\" content=\"/2.jpg\">")
    assert(p == Vector("og:image", "og:image"))
    assert(v == Vector("/1.jpg", "/2.jpg"))
  }

  test("og capture does not steal the robots capture on the same page") {
    val r = Extractor.extractString("<meta property=\"og:title\" content=\"t\">" +
      "<meta name=\"robots\" content=\"noindex\"><p>x</p>")
    assert(r.metaRobots == "noindex" && r.ogProps == Vector("og:title"))
  }

  test("corpus og block: title always, two og:image on doc_id % 3 == 0") {
    val (p0, v0) = og(graft.spark.Pages.renderMedia(6L))
    assert(p0 == Vector("og:title", "og:image", "og:image"))
    assert(v0 == Vector("M 6 & co",
      "https://img.example.org/og6_0.jpg", "https://img.example.org/og6_1.jpg"))
    val (p1, _) = og(graft.spark.Pages.renderMedia(7L))
    assert(p1 == Vector("og:title"))
  }
}
