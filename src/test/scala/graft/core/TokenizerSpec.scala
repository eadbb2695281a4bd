package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Per-state vectors for the reachable handler groups (SURVEY §2.2 A-D).
  * Expected values hand-traced from /root/reference/tokenizer/tokenizer.v.
  */
class TokenizerSpec extends AnyFunSuite {
  private def toks(html: String): Vector[Tok] = RefTokenizer.tokenize(html).toks.toVector
  private def text(html: String): String = RefTokenizer.tokenize(html).charText
  private val eofG = TEof(Tok.EofGenericName, Tok.EofGenericMsg)

  private def chars(s: String): Vector[Tok] = s.codePoints().toArray.toVector.map(TChar(_))

  test("data: plain text emits one char token per char + generic EOF") {
    assert(toks("hi") == chars("hi") :+ eofG)
  }

  test("data: NUL becomes U+FFFD with parse error") {
    val s = RefTokenizer.tokenize("a\u0000b")
    assert(s.charText == "a�b")
    assert(s.errors.contains("unexpected_null_character"))
  }

  test("tag_open/tag_name: simple start tag, name lowercased") {
    assert(toks("<DiV>") == Vector(TTag(true, "div", false, Vector.empty), eofG))
  }

  test("end_tag_open: simple end tag") {
    assert(toks("</div>") == Vector(TTag(false, "div", false, Vector.empty), eofG))
  }

  test("tag_open: '<' before non-tag char re-emitted as text") {
    assert(text("a<1b") == "a<1b")
  }

  test("tag_open EOF: lone '<' at EOF emits '<' + eof_before_tag_name token") {
    assert(toks("<") == Vector(TChar('<'), TEof(Tok.EofBeforeTagNameName, Tok.EofBeforeTagNameMsg)))
  }

  test("end_tag_open EOF: '</' emits both chars + eof_before_tag_name") {
    assert(toks("</") == Vector(TChar('<'), TChar('/'), TEof(Tok.EofBeforeTagNameName, Tok.EofBeforeTagNameMsg)))
  }

  test("end_tag_open: '</>' is missing_end_tag_name, nothing emitted") {
    val s = RefTokenizer.tokenize("</>x")
    assert(s.toks.toVector == chars("x") :+ eofG)
    assert(s.errors.contains("missing_end_tag_name"))
  }

  test("attributes: double- and single-quoted values") {
    assert(toks("""<a href="x" id='y'>""") ==
      Vector(TTag(true, "a", false, Vector("href" -> "x", "id" -> "y")), eofG))
  }

  test("attributes: valueless attribute before '>' is LOST (no flush site)") {
    // after_attr_name '>' emits without flushing the pending builder
    assert(toks("""<a href="x" disabled>""") ==
      Vector(TTag(true, "a", false, Vector("href" -> "x")), eofG))
  }

  test("attributes: char reference in quoted value") {
    assert(toks("""<a href="x&amp;y">""") ==
      Vector(TTag(true, "a", false, Vector("href" -> "x&y")), eofG))
  }

  test("self-closing tag") {
    assert(toks("<br/>") == Vector(TTag(true, "br", true, Vector.empty), eofG))
  }

  test("self_closing_start_tag: stray '/' mid-tag re-enters before_attr_name") {
    val s = RefTokenizer.tokenize("<a / b>")
    assert(s.errors.contains("unexpected_solidus_in_tag"))
    // 'b' becomes an attr name; lost at '>' (no flush) — tag has no attrs
    assert(s.toks.toVector == Vector(TTag(true, "a", false, Vector.empty), eofG))
  }

  test("named char ref with semicolon resolves") {
    assert(text("&amp;") == "&")
    assert(text("x&lt;y") == "x<y")
  }

  test("named char ref: legacy no-semicolon form in data context") {
    // &ampx: loop sees 'a','m','p' then 'x' with ref="amp" a key → match,
    // missing_semicolon error, '&' emitted, then 'x' continues as data
    val s = RefTokenizer.tokenize("&ampx")
    assert(s.charText == "&x")
    assert(s.errors.contains("missing_semicolon_after_char_reference"))
  }

  test("named char ref: multi-codepoint replacement (acE;)") {
    assert(text("&acE;") == new String(Character.toChars(0x223e)) + new String(Character.toChars(0x333)))
  }

  test("named char ref: astral-plane replacement (zscr;)") {
    assert(text("&zscr;") == new String(Character.toChars(0x1d4cf)))
  }

  test("unknown named ref: raw text flushed; EOF path re-reads final ';' (Q20)") {
    val s = RefTokenizer.tokenize("&xyzzy;")
    assert(s.charText == "&xyzzy;;")
  }

  test("ambiguous ampersand ';' reports unknown_named_char_reference") {
    val s = RefTokenizer.tokenize("&zq;;x")
    assert(s.charText == "&zq;;x")
    assert(s.errors.contains("unknown_named_char_reference"))
  }

  test("hex char reference") {
    assert(text("&#x41;z") == "AzAz") // Q5 fall-through duplicates the tail
  }

  test("hex char reference without semicolon (no Q5 double-emit)") {
    val s = RefTokenizer.tokenize("&#x41 z")
    assert(s.charText == "A z")
    assert(s.errors.contains("missing_semicolon_after_char_reference"))
  }

  test("numeric ref out of range → U+FFFD") {
    val s = RefTokenizer.tokenize("&#x110000 ")
    assert(s.charText == "� ")
    assert(s.errors.contains("char_reference_outside_unicode_range"))
  }

  test("numeric ref surrogate → U+FFFD") {
    val s = RefTokenizer.tokenize("&#xD800 ")
    assert(s.charText == "� ")
    assert(s.errors.contains("surrogate_char_reference"))
  }

  test("C1 control ref remapped via windows-1252 table") {
    // &#x80 → euro sign (terminator ' ' is whitespace → control check skipped? no:
    // Q17 tests the TERMINATOR for whitespace — ' ' IS whitespace so remap skipped)
    val s1 = RefTokenizer.tokenize("&#x80 ")
    assert(s1.charText == "\u0080 ")
    // terminator 'x' is not whitespace → remap applies
    val s2 = RefTokenizer.tokenize("&#x80x")
    assert(s2.charText == "€x")
    assert(s2.errors.contains("control_char_reference"))
  }

  test("absence of digits in numeric ref flushes raw") {
    val s = RefTokenizer.tokenize("&#z")
    assert(s.charText == "&#z")
    assert(s.errors.contains("absence_of_digits_in_num_char_reference"))
  }

  test("doctype: simple") {
    assert(toks("<!DOCTYPE html>") ==
      Vector(TDoctype("html", Tok.Missing, Tok.Missing, false), eofG))
  }

  test("doctype: missing name '>' forces quirks") {
    val s = RefTokenizer.tokenize("<!DOCTYPE>")
    assert(s.toks.toVector == Vector(TDoctype(Tok.Missing, Tok.Missing, Tok.Missing, true), eofG))
    assert(s.errors.contains("missing_doctype_name"))
  }

  test("comment: six/seven-dash comments reach comment_end and are emitted") {
    // <!------> : start-dash → comment (Q16) → end_dash → comment_end '-'
    // appends (write-back present) → comment_end '>' emits
    assert(toks("<!------>") == Vector(TComment(""), eofG))
    // seven dashes: comment_end '-' appends once (write-back present)
    assert(toks("<!------->") == Vector(TComment("-"), eofG))
  }

  test("comment: five-dash comment is NEVER emitted (falls back to data)") {
    // comment_end_dash '>' loses the dash (Q7a) and re-enters .comment, whose
    // else branch falls off → run restarts .data; '>' becomes a char
    assert(toks("<!----->") == Vector(eofG))
  }

  test("comment leak: body chars fall back to data, comment token lost") {
    // do_state_comment's else branch has no self-transition (ref :1770-1772)
    assert(toks("<!--x-->") == chars("-->") :+ eofG)
  }

  test("comment: abrupt close '<!-->'") {
    val s = RefTokenizer.tokenize("<!-->")
    assert(s.toks.toVector == Vector(TComment(""), eofG))
    assert(s.errors.contains("abrupt_closing_of_empty_comment"))
  }

  test("markup_declaration_open: CDATA always takes the bogus path") {
    val s = RefTokenizer.tokenize("<![CDATA[x]]>y")
    assert(s.errors.contains("cdata_in_html_content"))
    // bogus_comment consumes 'x' into "[CDATA[x" then falls off → restart data
    assert(s.charText == "]]>y")
  }

  test("bogus comment via <!x: the reconsumed '!' is swallowed, rest leaks as data") {
    // markup_declaration_open consumed nothing, so reconsume re-exposes the
    // '!' from tag_open — bogus_comment eats '!' then falls off → data
    assert(toks("<!>a") == chars(">a") :+ eofG)
    assert(toks("<!xabc>") == chars("xabc>") :+ eofG)
  }

  test("bogus comment IS emitted when first consumed char is '>' (CDATA path, no reconsume)") {
    assert(toks("<![CDATA[>y") == Vector(TComment("[CDATA["), TChar('y'), eofG))
  }

  test("look_ahead case-insensitive doctype") {
    assert(toks("<!doctype html>") ==
      Vector(TDoctype("html", Tok.Missing, Tok.Missing, false), eofG))
  }

  test("eof in tag name") {
    assert(toks("<div") == Vector(TEof(Tok.EofInTagName, Tok.EofInTagMsg)))
  }

  test("eof in quoted attr value") {
    assert(toks("""<a href="x""") == Vector(TEof(Tok.EofInTagName, Tok.EofInTagMsg)))
  }

  test("before_attr_name '=': attr named '=' starts building") {
    val s = RefTokenizer.tokenize("<a ==x>")
    assert(s.errors.contains("unexpected_equals_sign_before_attr_name"))
    // name "=", then '=' → before_attr_value, 'x' unquoted: Q1 splatter
    val t = s.toks.head.asInstanceOf[TTag]
    assert(t.attrs == Vector("=" -> "", "" -> "x"))
  }
}
