package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Layout parse: collectTables() reads structured cells off the FINAL arena
  * tree — implied ends, section transparency, nesting, fostering.
  */
class TableExtractSpec extends AnyFunSuite {

  private def cells(html: String): Vector[(Int, Int, Int, String)] = {
    val sink = new ExtractSink
    Extractor.extractInto(html.getBytes(java.nio.charset.StandardCharsets.UTF_8), sink)
    sink.collectTables()
  }

  test("explicit rows and cells") {
    val r = cells("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>")
    assert(r == Vector((0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 0, "c"), (0, 1, 1, "d")))
  }

  test("implied tr/td ends produce the same grid") {
    val r = cells("<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    assert(r == Vector((0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 0, "c"), (0, 1, 1, "d")))
  }

  test("thead/tbody are transparent; th counts as a cell") {
    val r = cells("<table><thead><tr><th>h1</th><th>h2</th></tr></thead>" +
      "<tbody><tr><td>v1</td><td>v2</td></tr></tbody></table>")
    assert(r == Vector((0, 0, 0, "h1"), (0, 0, 1, "h2"), (0, 1, 0, "v1"), (0, 1, 1, "v2")))
  }

  test("formatting inside a cell concatenates into the cell text") {
    val r = cells("<table><tr><td>a<b>b</b>c</td></tr></table>")
    assert(r == Vector((0, 0, 0, "abc")))
  }

  test("nested table: own index; outer cell text includes inner text") {
    val r = cells("<table><tr><td>out<table><tr><td>in</td></tr></table></td></tr></table>")
    assert(r.contains((0, 0, 0, "outin")))
    assert(r.contains((1, 0, 0, "in")))
    assert(r.length == 2)
    // the inner table's row must NOT surface as an outer row
    assert(!r.exists(c => c._1 == 0 && c._2 > 0))
  }

  test("fostered text leaves the table — it belongs to no cell") {
    val r = cells("<table>stray<tr><td>cell</td></tr></table>")
    assert(r == Vector((0, 0, 0, "cell")))
  }

  test("no tables → empty, cheap") {
    assert(cells("<p>plain text</p>").isEmpty)
  }

  test("two sibling tables index in document order") {
    val r = cells("<table><tr><td>t0</td></tr></table><table><tr><td>t1</td></tr></table>")
    assert(r == Vector((0, 0, 0, "t0"), (1, 0, 0, "t1")))
  }

  test("empty cells keep their column index") {
    val r = cells("<table><tr><td></td><td>x</td></tr></table>")
    assert(r == Vector((0, 0, 0, ""), (0, 0, 1, "x")))
  }

  test("corpus page matches its closed form") {
    val docId = 7L // 2 rows × 3... doc 7: rows = 7%3+1 = 2, cols = 7%2+2 = 3
    val r = cells(graft.spark.Pages.renderTable(docId))
    val expect = for { row <- 0 until 2; c <- 0 until 3 }
      yield (0, row, c, s"r${row}c${c}d$docId")
    assert(r == expect.toVector)
  }
}
