package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.Extractor

/** One fixture per quirk from the ledger (SURVEY §2.4 Q1-Q20 + audit finds).
  * These guard against "accidentally implementing the WHATWG spec" instead of
  * the reference's actual behavior.
  */
class QuirkSpec extends AnyFunSuite {
  private def toks(html: String): Vector[Tok] = RefTokenizer.tokenize(html).toks.toVector
  private def text(html: String): String = RefTokenizer.tokenize(html).charText
  private val eofG = TEof(Tok.EofGenericName, Tok.EofGenericMsg)
  private def chars(s: String): Vector[Tok] = s.codePoints().toArray.toVector.map(TChar(_))

  test("Q1: unquoted attr values splatter into per-char attributes") {
    // attr_value_unquoted flushes builders on EVERY entry (ref :1498-1504)
    assert(toks("<a href=xy>") ==
      Vector(TTag(true, "a", false, Vector("href" -> "", "" -> "x", "" -> "y")), eofG))
  }

  test("Q1b: char-ref return into unquoted value splatters too") {
    // <a href=a&amp;b> : entry flush per char + per return from char_reference
    val t = toks("<a href=a&amp;b>").head.asInstanceOf[TTag]
    assert(t.attrs == Vector("href" -> "", "" -> "a", "" -> "&", "" -> "b"))
  }

  test("Q3: open_tags pushed only by attributeless start tags closed in tag_name") {
    // (observable only through rcdata-family is_appropriate in extract mode;
    // here we assert the machine survives and tags emit normally)
    assert(toks("<b><i x=1></i></b>").count(_.isInstanceOf[TTag]) == 4)
  }

  test("Q4: decimal char refs accumulate base-16") {
    assert(text("&#65; ") == "e ") // 6*16+5 = 0x65 = 'e'
    // decimal ';' branch HAS a return (ref :2904-2907), no Q5 double-emit
    assert(text("&#10;x") == "\u0010x") // 1*16+0 = 0x10
  }

  test("Q5: hex ref with ';' re-emits after the tail unwinds") {
    assert(text("&#x41;z") == "AzAz")
    // nested: two hex refs → continuations replay LIFO with the LIVE
    // char_ref_code (0x42 by unwind time), re-reading the final ';' twice
    assert(text("&#x41;&#x42;") == "ABB;B;")
  }

  test("Q6: named refs match the SHORTEST prefix in the table") {
    assert(text("&notin;") == "¬in;") // &not matched, "in;" literal
  }

  test("Q6b: attr no-semicolon bail peeks one char too far right") {
    // spec looks at the char right after the matched name; reference peeks
    // offset 1 from the cursor (one further). With "&ampx=" inside an attr:
    // next_char is '=', not 'x' … bail keeps raw text
    val t = toks("""<a href="&ampx=1">""").head.asInstanceOf[TTag]
    assert(t.attrs == Vector("href" -> "&ampx=1"))
  }

  test("Q7a: comment_end_dash drops the dash (no write-back)") {
    // <!-- -a--> : ' ' goes to comment (start->else), then falls off? No —
    // trace: comment_start ' ' → comment(reconsume) → comment ' ' append →
    // FALL OFF → data. Use a shape that stays in comment machinery:
    // <!-----a--> : start '-', start_dash '-' → comment, '-' → end_dash,
    // '-' → comment_end, '-' → append '-', comment_end 'a' → Q7b '--' lost →
    // comment(reconsume) → 'a' appended, fall off → data leaks "-->"
    val s = RefTokenizer.tokenize("<!-----a-->")
    assert(s.charText == "-->")
    assert(s.toks.toVector == chars("-->") :+ eofG) // comment never emitted
  }

  test("Q8: bogus_doctype '>' emits doctype + mid-stream EOF, then restarts data") {
    assert(toks("<!DOCTYPE x y>abc") == Vector(
      TDoctype("x", Tok.Missing, Tok.Missing, false), // quirks flag lost (copy, :2076-2079)
      eofG
    ) ++ chars("abc") :+ eofG)
  }

  test("Q9: system id accumulates onto the missing sentinel") {
    // PPUBLIC: doubled first letter defeats the consumed-char look_ahead skew
    val s = RefTokenizer.tokenize("<!DOCTYPE html PPUBLIC \"p\"\"s\">")
    val d = s.toks.collectFirst { case d: TDoctype => d }.get
    assert(d.publicId == "p")
    assert(d.systemId == Tok.Missing + "s")
  }

  test("Q10/Q13: wrong EOF error codes in doctype name states") {
    val s1 = RefTokenizer.tokenize("<!DOCTYPE html")
    assert(s1.errors.contains("unexpected_null_character")) // Q10: eof in doctype_name
    val s2 = RefTokenizer.tokenize("<!DOCTYPE ")
    assert(s2.errors.contains("missing_doctype_name")) // Q13: eof in before_doctype_name
  }

  test("Q11: EOF after public id carries the name constant as msg") {
    val s = RefTokenizer.tokenize("<!DOCTYPE html PPUBLIC \"p\"")
    // after_doctype_public_identifier EOF → TEof(name, name)
    assert(s.toks.contains(TEof(Tok.EofInDoctypeName, Tok.EofInDoctypeName)))
  }

  test("Q12: doctype name NOT case-folded") {
    assert(toks("<!DOCTYPE HTML>") ==
      Vector(TDoctype("HTML", Tok.Missing, Tok.Missing, false), eofG))
  }

  test("Q14: trailing '&' never terminates → step budget flags the row") {
    assertThrows[StepBudgetExceeded] {
      val sink = new CollectingSink
      new RefTokenizer(RefTokenizer.codepoints("abc&"), sink).run()
    }
  }

  test("EOF in attr_name also never terminates (attr_name/after_attr_name cycle)") {
    assertThrows[StepBudgetExceeded] {
      val sink = new CollectingSink
      new RefTokenizer(RefTokenizer.codepoints("<a x"), sink).run()
    }
  }

  test("Q16: comment_start_dash '-' goes to .comment, not comment_end") {
    // "<!--- x-->" : start '-', start_dash '-' → comment, ' ' appended, falls
    // off → data leaks "x-->"
    assert(text("<!--- x-->") == "x-->")
  }

  test("Q18: EOF in bogus comment drops the pending comment") {
    assert(toks("<![CDATA[") == Vector(eofG)) // comment "[CDATA[" lost
  }

  test("Q20: EOF paths with reconsume re-process the final char") {
    // before_attr_name EOF → after_attr_name(reconsume) re-reads ' ' → ws →
    // after_attr_name reads EOF → eof_in_tag
    assert(toks("<a ") == Vector(TEof(Tok.EofInTagName, Tok.EofInTagMsg)))
  }

  test("PUBLIC keyword can only match with a doubled first letter") {
    // after_doctype_name consumes a char BEFORE look_ahead (ref :2043, :2066)
    val ok = RefTokenizer.tokenize("<!DOCTYPE html PPUBLIC \"pid\">")
    val d = ok.toks.collectFirst { case d: TDoctype => d }.get
    assert(d.publicId == "pid")
    // properly-spelled PUBLIC falls into bogus_doctype (Q8 shape)
    val bad = RefTokenizer.tokenize("<!DOCTYPE html PUBLIC \"pid\">x")
    assert(bad.errors.contains("invalid_char_sequence_after_doctype_name"))
    val db = bad.toks.collectFirst { case d: TDoctype => d }.get
    assert(db.publicId == Tok.Missing) // never parsed
  }

  test("doctype public id EOF emits TWO EOF tokens (:2197 switches to .data)") {
    val s = RefTokenizer.tokenize("<!DOCTYPE html PPUBLIC \"abc")
    val eofs = s.toks.collect { case e: TEof => e }
    assert(eofs.size == 2)
    assert(eofs(0) == TEof(Tok.EofInDoctypeName, Tok.EofInDoctypeMsg))
    assert(eofs(1) == eofG)
  }

  test("'<?' panics the reference (bad cast) → flagged, not crashed") {
    assertThrows[VCastPanic] {
      val sink = new CollectingSink
      new RefTokenizer(RefTokenizer.codepoints("<?xml version=\"1.0\"?>"), sink).run()
    }
    // the kernel wrapper converts it to a flagged row
    val (t, truncated) = Extractor.fidelityText("<?x>".getBytes("UTF-8"))
    assert(truncated)
  }

  test("fidelity: script content tokenizes in DATA state (raw states unreachable)") {
    val s = RefTokenizer.tokenize("<script>if(a<b){}</script>")
    val tags = s.toks.collect { case t: TTag => t }
    // "<b){}</..." accretes into a spurious start tag named "b){}<"
    assert(tags.exists(t => t.isStart && t.name.startsWith("b)")))
  }

  test("extract mode: script content stays character data and is elided") {
    val r = Extractor.extractString("<html><body><script>if(a<b){x()}</script><p>hello main text</p></body></html>")
    assert(r.text == "hello main text")
    assert(r.mainText == "hello main text")
  }

  test("extract mode: rawtext style content elided, rcdata title elided via head") {
    val r = Extractor.extractString(
      "<html><head><title>T</title><style>p{color:red}</style></head><body><p>body text here</p></body></html>")
    assert(r.text == "body text here")
  }

  test("extract mode: rcdata char refs resolve inside textarea content") {
    val r = Extractor.extractString("<body><textarea>a&amp;b</textarea><p>content text</p></body>")
    assert(r.text == "a&bcontent text")
  }

  test("extract mode: boilerplate link farms dropped from mainText by density") {
    val nav = (1 to 8).map(i => s"""<li><a href="/$i">l$i</a></li>""").mkString
    val r = Extractor.extractString(
      s"<body><ul>$nav</ul><p>This is the long main paragraph of the page with enough text.</p></body>")
    assert(r.text.contains("l1"))
    assert(!r.mainText.contains("l1"))
    assert(r.mainText.contains("long main paragraph"))
  }

  test("extract mode: spans cover the full text exactly") {
    val r = Extractor.extractString("<body><p>ab</p><div>cd<a href='/'>e</a></div></body>")
    assert(r.text == "abcde")
    assert(r.spans.map(s => r.text.substring(s.start, s.end)).mkString == "abcde")
    assert(r.spans.forall(s => s.path.nonEmpty))
  }
}
