package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Markdown render of the final tree: hand-pinned vectors per construct —
  * headings, paragraphs, lists (nested + ordered), links (through the
  * span→outLinks pairing), emphasis, code, pre, blockquote, tables,
  * blacklisted-subtree elision.
  */
class MarkdownSpec extends AnyFunSuite {

  private def md(html: String): String = {
    val sink = new ExtractSink
    Extractor.extractCpsInto(graft.core.RefTokenizer.codepoints(html), sink)
    sink.collectMarkdown()
  }

  test("headings + paragraphs block structure") {
    assert(md("<h1>Title</h1><p>para one</p><h2>Sub</h2><p>tail</p>") ==
      "# Title\n\npara one\n\n## Sub\n\ntail")
  }

  test("implied heading ends (the h1-h6 pop rule) still render in order") {
    assert(md("<h1>t<h2>s0<h2>s1</h2><p>intro</p>") ==
      "# t\n\n## s0\n\n## s1\n\nintro")
  }

  test("unordered lists nest with 2-space indent") {
    assert(md("<ul><li>a</li><li>b<ul><li>c</li></ul></li></ul>") ==
      "- a\n- b\n  - c")
  }

  test("ordered lists count per level") {
    assert(md("<ol><li>x</li><li>y</li></ol>") == "1. x\n2. y")
  }

  test("links render [text](href) via the captured outLink") {
    assert(md("<p>see <a href=\"https://example.com/x\">the docs</a> now</p>") ==
      "see [the docs](https://example.com/x) now")
  }

  test("emphasis and inline code") {
    assert(md("<p><b>bold</b> and <i>it</i> and <code>f(x)</code></p>") ==
      "**bold** and *it* and `f(x)`")
  }

  test("pre renders fenced") {
    assert(md("<pre>line1\nline2</pre>") == "```\nline1\nline2\n```")
  }

  test("blockquote prefix") {
    assert(md("<blockquote>quoted words</blockquote>") == "> quoted words")
  }

  test("tables render pipe rows with a separator after the header row") {
    assert(md("<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>") ==
      "| h1 | h2 |\n| --- | --- |\n| a | b |")
  }

  test("blacklisted subtrees contribute nothing") {
    assert(md("<p>keep</p><script>drop()</script><style>p{}</style>") == "keep")
  }

  test("deterministic: rerun byte-identical on a composite page") {
    val html = "<h1>T</h1><ul><li><a href=\"/x\">l</a></li></ul><table><tr><td>c</td></tr></table>"
    assert(md(html) == md(html))
    assert(md(html) == "# T\n\n- [l](/x)\n\n| c |\n| --- |")
  }
}
