package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** `<link rel=canonical href>` capture vectors: rel is a space-separated
  * token list matched ASCII-case-insensitively; first canonical wins;
  * rel-less / href-less / non-canonical links never capture.
  */
class CanonicalSpec extends AnyFunSuite {

  private def canon(html: String): String = Extractor.extractString(html).canonical

  test("plain rel=canonical captures the href") {
    assert(canon("<head><link rel=\"canonical\" href=\"https://c.example/x\"></head><p>t</p>")
      == "https://c.example/x")
  }

  test("rel token list + case folding: 'alternate CANONICAL' counts") {
    assert(canon("<link href=\"https://c.example/y\" rel=\"alternate CANONICAL\"><p>t</p>")
      == "https://c.example/y")
  }

  test("first canonical wins over later declarations") {
    // quoted values: the reference's Q1 quirk splatters UNQUOTED attr
    // values into per-char attributes (byte-fidelity contract), so like
    // base-href capture, canonical capture sees quoted declarations
    assert(canon("<link rel=\"canonical\" href=\"/first\"><link rel=\"canonical\" href=\"/second\"><p>t</p>")
      == "/first")
  }

  test("non-canonical rels and attribute-less links never capture") {
    assert(canon("<link rel=stylesheet href=/a.css><link rel=canonicalish href=/b><link href=/c><link rel=canonical><p>t</p>") == "")
  }

  test("substring token does not match: 'canonical' must be a whole token") {
    assert(canon("<link rel=\"notcanonical xcanonical\" href=/no><p>t</p>") == "")
  }

  test("absent declaration yields empty string") {
    assert(canon("<p>no links here</p>") == "")
  }
}
