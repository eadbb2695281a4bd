package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** `<html lang>` capture vectors: first html tag CARRYING lang wins (the
  * spec merges missing attributes from later <html> tags onto the root, so
  * a lang-less first tag still picks up a later declaration); value
  * lowercased (BCP-47 compares case-insensitively); empty values never
  * capture.
  */
class DeclaredLangSpec extends AnyFunSuite {

  private def dl(html: String): String = Extractor.extractString(html).declaredLang

  test("plain lang attribute captures lowercased") {
    assert(dl("<html lang=\"EN\"><body><p>t</p></body></html>") == "en")
  }

  test("region subtag keeps the hyphen, lowercased") {
    assert(dl("<html lang=\"de-DE\"><body><p>t</p></body></html>") == "de-de")
  }

  test("first declaration wins over a later one") {
    assert(dl("<html lang=\"es\"><body><p>t</p></body></html><html lang=\"fr\">") == "es")
  }

  test("lang-less first html tag picks up a later declaration (spec attr merge)") {
    assert(dl("<html class=x><body><p>t</p><html lang=\"fr\">") == "fr")
  }

  test("empty lang value never captures; a later real one does") {
    assert(dl("<html lang=\"\"><body><p>t</p><html lang=\"zh\">") == "zh")
  }

  test("unquoted value splatters per the pinned Q1 quirk — nothing captures") {
    // byte-fidelity contract: the reference flushes attr builders on every
    // attr_value_unquoted entry, so <html lang=en> yields {lang,""} plus
    // per-char empty-name attrs; the declaration never materializes.
    assert(dl("<html lang=en><body><p>t</p></body></html>") == "")
  }

  test("no declaration anywhere yields empty") {
    assert(dl("<body><p>t</p></body>") == "")
  }

  test("lang on a non-html element is not a document declaration") {
    assert(dl("<html><body><p lang=fr>t</p></body></html>") == "")
  }

  test("capture never alters extracted text or token accounting") {
    val a = Extractor.extractString("<html lang=en><body><p>same text here</p></body></html>")
    val b = Extractor.extractString("<html><body><p>same text here</p></body></html>")
    assert(a.text == b.text && a.mainText == b.mainText && a.nTokens == b.nTokens)
  }
}
