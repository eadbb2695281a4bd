package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-text capture: `anchors` is parallel to `links`, carrying the text
  * the extractor sees inside each captured <a href> — across formatting
  * children, adoption-agency clones, and reconstruction re-opens. Links in
  * blacklisted subtrees keep "" (their text never enters the content buffer).
  */
class AnchorTextSpec extends AnyFunSuite {

  private def ex(html: String): ExtractResult = Extractor.extractString(html)

  test("plain link text") {
    val r = ex("<p><a href=\"x\">hello</a> world</p>")
    assert(r.links == Vector("x"))
    assert(r.anchors == Vector("hello"))
  }

  test("formatting children accumulate into one anchor") {
    val r = ex("<p><a href=\"x\">a<b>b</b>c</a></p>")
    assert(r.anchors == Vector("abc"))
  }

  test("href-less <a> captures nothing; later links keep their index") {
    val r = ex("<p><a>plain</a><a href=\"y\">t</a></p>")
    assert(r.links == Vector("y"))
    assert(r.anchors == Vector("t"))
    assert(r.text == "plaint")
  }

  test("adoption agency: text in the furthest-block clone still counts") {
    // </a> is implied across the div; the agency clones the a around the
    // div's children — both halves belong to the same source link
    val r = ex("<a href=\"x\">one<div>two</div></a>tail")
    assert(r.links == Vector("x"))
    assert(r.anchors == Vector("onetwo"))
    assert(r.text == "onetwotail")
  }

  test("reconstruction across an implied <p> close re-joins the anchor") {
    val r = ex("<p><a href=\"x\">one<p>two</a>after")
    assert(r.links == Vector("x"))
    assert(r.anchors == Vector("onetwo"))
  }

  test("nested <a> runs the agency first: two separate anchors") {
    val r = ex("<p><a href=\"1\">one<a href=\"2\">two</a></p>")
    assert(r.links == Vector("1", "2"))
    assert(r.anchors == Vector("one", "two"))
  }

  test("blacklisted subtree: link captured, anchor empty") {
    val r = ex("<nav><a href=\"m\">menu</a></nav><p>body text here</p>")
    assert(r.links == Vector("m"))
    assert(r.anchors == Vector(""))
    assert(r.text == "body text here")
  }

  test("multiple links in document order") {
    val r = ex("<p><a href=\"a\">A</a> mid <a href=\"b\">B</a></p>")
    assert(r.links == Vector("a", "b"))
    assert(r.anchors == Vector("A", "B"))
  }

  test("text outside any link is not attributed") {
    val r = ex("<p>before<a href=\"x\">in</a>after</p>")
    assert(r.anchors == Vector("in"))
  }

  test("fostered link text inside a table still attributes to its link") {
    // a-in-table is fostered before the table; the anchor text rides along
    val r = ex("<table><a href=\"x\">fostered</a><tr><td>cell</td></tr></table>")
    assert(r.links == Vector("x"))
    assert(r.anchors == Vector("fostered"))
  }
}
