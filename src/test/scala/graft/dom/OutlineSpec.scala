package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Document outline: collectHeadings() off the FINAL arena tree, plus the
  * §"in body" h1–h6 start rule (current-node heading pops — headings never
  * nest directly).
  */
class OutlineSpec extends AnyFunSuite {

  private def headings(html: String): Vector[(Int, Int, String)] = {
    val sink = new ExtractSink
    Extractor.extractInto(html.getBytes(java.nio.charset.StandardCharsets.UTF_8), sink)
    sink.collectHeadings()
  }

  test("explicit headings in document order with levels") {
    val r = headings("<h1>a</h1><p>x</p><h2>b</h2><h3>c</h3>")
    assert(r == Vector((0, 1, "a"), (1, 2, "b"), (2, 3, "c")))
  }

  test("implied heading end: a heading start pops a current-node heading") {
    val r = headings("<body><h1>a<h2>b</h2><p>t</p>")
    assert(r == Vector((0, 1, "a"), (1, 2, "b")))
  }

  test("chain of implied ends") {
    val r = headings("<h1>a<h2>b<h2>c<h6>d")
    assert(r == Vector((0, 1, "a"), (1, 2, "b"), (2, 2, "c"), (3, 6, "d")))
  }

  test("spec-exact: an open formatting element keeps the outer heading open") {
    // current node at <h2> is <b>, not a heading → no pop; h2 nests
    val r = headings("<h1>a<b>c<h2>d")
    assert(r == Vector((0, 1, "acd"), (1, 2, "d")))
  }

  test("formatting inside a heading concatenates") {
    assert(headings("<h2>a<b>b</b>c</h2>") == Vector((0, 2, "abc")))
  }

  test("paragraph content after an explicit close stays out of the heading") {
    val r = headings("<h2>head</h2><p>body text here</p>")
    assert(r == Vector((0, 2, "head")))
  }

  test("a p start does NOT close a heading (spec: p nests inside)") {
    val r = headings("<h2>head<p>inner</p></h2>")
    assert(r == Vector((0, 2, "headinner")))
  }

  test("no headings → empty, cheap") {
    assert(headings("<p>plain</p>").isEmpty)
  }

  test("corpus page matches its closed form") {
    val docId = 7L // k = 7%3+1 = 2 h2 sections; odd → one h3
    val r = headings(graft.spark.Pages.renderOutline(docId))
    assert(r == Vector((0, 1, "t7"), (1, 2, "s0d7"), (2, 2, "s1d7"), (3, 3, "x7")))
  }

  test("corpus page, even id — no h3") {
    val docId = 6L // k = 6%3+1 = 1
    val r = headings(graft.spark.Pages.renderOutline(docId))
    assert(r == Vector((0, 1, "t6"), (1, 2, "s0d6")))
  }
}
