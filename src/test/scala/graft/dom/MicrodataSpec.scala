package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** schema.org microdata harvest off the final tree: WHATWG value-attribute
  * rules, nearest-enclosing-item scoping, nested items as item:<ord>,
  * multi-token itemprop fan-out, stray props dropped.
  */
class MicrodataSpec extends AnyFunSuite {

  private def md(html: String): Vector[(Int, String, String, String)] = {
    val sink = new ExtractSink
    Extractor.extractInto(html.getBytes("UTF-8"), sink)
    sink.collectMicrodata()
  }

  test("basic item: text value, itemtype carried, ordinal 0") {
    val rows = md("""<div itemscope itemtype="https://schema.org/Book">
      |<span itemprop="name">Dune</span></div>""".stripMargin)
    assert(rows == Vector((0, "https://schema.org/Book", "name", "Dune")))
  }

  test("value-attribute rules: meta/content, a/href, data/value, img/src, time/datetime") {
    val rows = md("""<div itemscope itemtype="T">
      |<meta itemprop="count" content="42">
      |<a itemprop="url" href="/x">click</a>
      |<data itemprop="price" value="9">nine</data>
      |<img itemprop="image" src="i.jpg">
      |<time itemprop="when" datetime="2020-01-02">then</time>
      |<time itemprop="when2">text fallback</time>
      |</div>""".stripMargin)
    assert(rows.map(r => (r._3, r._4)) == Vector(
      ("count", "42"), ("url", "/x"), ("price", "9"), ("image", "i.jpg"),
      ("when", "2020-01-02"), ("when2", "text fallback")))
  }

  test("nested item: parent prop is item:<child ord>, child props use child ord") {
    val rows = md("""<div itemscope itemtype="A"><span itemprop="t">x</span>
      |<div itemprop="author" itemscope itemtype="P"><b itemprop="name">Ann</b></div>
      |</div><p itemscope itemtype="B"><i itemprop="k">v</i></p>""".stripMargin)
    assert(rows.contains((0, "A", "author", "item:1")))
    assert(rows.contains((1, "P", "name", "Ann")))
    assert(rows.contains((2, "B", "k", "v")))
  }

  test("multi-token itemprop fans out; stray prop outside any item drops") {
    val rows = md("""<span itemprop="lost">x</span>
      |<div itemscope><span itemprop="a b">y</span></div>""".stripMargin)
    assert(rows == Vector((0, "", "a", "y"), (0, "", "b", "y")))
  }

  test("text value accumulates across formatting children") {
    val rows = md("""<div itemscope><p itemprop="d">one <b>two</b> three</p></div>""")
    assert(rows == Vector((0, "", "d", "one two three")))
  }
}
