package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** `<script type="application/ld+json">` capture vectors: MIME essence
  * matching (case-insensitive, ;parameters dropped, whitespace trimmed),
  * rawtext fidelity (char-refs NOT decoded inside script), document order
  * across head/body, negative probes (js/typeless scripts), EOF-truncated
  * blocks, and the blacklist invariant (ld content never reaches the text).
  */
class JsonLdSpec extends AnyFunSuite {

  private def lds(html: String): Vector[String] = Extractor.extractString(html).jsonLd

  test("basic block captured raw, document order across head and body") {
    val r = Extractor.extractString(
      "<head><script type=\"application/ld+json\">{\"a\":1}</script></head>" +
        "<body><p>t</p><script type=\"application/ld+json\">{\"b\":2}</script></body>")
    assert(r.jsonLd == Vector("{\"a\":1}", "{\"b\":2}"))
  }

  test("MIME essence: mixed case, surrounding whitespace, ;parameter all match") {
    assert(lds("<script type=\" Application/LD+JSON; charset=utf-8\">{\"x\":0}</script><p>t</p>")
      == Vector("{\"x\":0}"))
    assert(lds("<script type=\"APPLICATION/LD+JSON\">{}</script><p>t</p>") == Vector("{}"))
  }

  test("non-ld scripts never capture: js, typeless, module, prefix-extended") {
    assert(lds("<script type=\"text/javascript\">var x=1;</script>" +
      "<script>f()</script><script type=module>g()</script>" +
      "<script type=\"application/ld+json2\">{}</script><p>t</p>") == Vector.empty)
  }

  test("char-refs stay RAW inside the block (script is rawtext)") {
    assert(lds("<script type=\"application/ld+json\">{\"h\":\"M &amp; co\"}</script><p>t</p>")
      == Vector("{\"h\":\"M &amp; co\"}"))
  }

  test("tag-lookalike text inside the block survives until the real end tag") {
    assert(lds("<script type=\"application/ld+json\">{\"s\":\"a <b> c\"}</script><p>t</p>")
      == Vector("{\"s\":\"a <b> c\"}"))
  }

  test("EOF inside an open block keeps the partial content") {
    assert(lds("<p>t</p><script type=\"application/ld+json\">{\"trunc\":tr")
      == Vector("{\"trunc\":tr"))
  }

  test("ld content is blacklisted: never part of extracted text") {
    val r = Extractor.extractString(
      "<body><p>keep</p><script type=\"application/ld+json\">{\"leak\":1}</script></body>")
    assert(r.jsonLd == Vector("{\"leak\":1}"))
    assert(!r.text.contains("leak") && !r.mainText.contains("leak"))
  }

  test("absent declaration yields empty vector") {
    assert(lds("<p>no structured data</p>") == Vector.empty)
  }
}
