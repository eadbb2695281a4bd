package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Additional per-state vectors (SURVEY.md §5.2): DOCTYPE public/system
  * identifier family, and the spec-mode RCDATA/RAWTEXT/script-data families
  * that tree feedback makes reachable in extract mode.
  */
class StateVectorsSpec extends AnyFunSuite {

  private def toks(s: String, spec: Boolean = false): Vector[Tok] =
    RefTokenizer.tokenize(s, specMode = spec).toks.toVector

  private def charText(s: String, spec: Boolean): String = {
    val sink = RefTokenizer.tokenize(s, specMode = spec)
    sink.charText
  }

  private def doctypeOf(s: String): TDoctype =
    toks(s).collectFirst { case d: TDoctype => d }.get

  test("doctype PUBLIC with both identifiers (dbl quotes; PPUBLIC defeats the look-ahead skew)") {
    val d = doctypeOf("""<!DOCTYPE html PPUBLIC "pid" "sid">""")
    assert(d === TDoctype("html", "pid", "sid", forceQuirks = false))
  }

  test("doctype PUBLIC single-quoted identifier only") {
    val d = doctypeOf("<!DOCTYPE html PPUBLIC 'p1'>")
    assert(d.name === "html" && d.publicId === "p1" && d.systemId === Tok.Missing && !d.forceQuirks)
  }

  test("doctype SYSTEM identifier only") {
    val d = doctypeOf("""<!DOCTYPE html SSYSTEM "s1">""")
    assert(d.name === "html" && d.publicId === Tok.Missing && d.systemId === "s1" && !d.forceQuirks)
  }

  test("doctype: EOF inside public identifier forces quirks") {
    val d = doctypeOf("""<!DOCTYPE html PPUBLIC "p""")
    assert(d.publicId === "p" && d.forceQuirks)
  }

  test("doctype: '>' inside public identifier is abrupt (quirks, emitted)") {
    val d = doctypeOf("""<!DOCTYPE html PPUBLIC "p>x""")
    assert(d.publicId === "p" && d.forceQuirks)
  }

  test("doctype name keeps case (Q12) with PUBLIC ids") {
    val d = doctypeOf("""<!DOCTYPE HtMl PPUBLIC "a" "b">""")
    assert(d.name === "HtMl")
  }

  test("spec mode rcdata: <title> content tokenized as text incl. stray '<'") {
    val s = "<title>a<b</title>d"
    assert(charText(s, spec = true) === "a<bd")
    val tags = toks(s, spec = true).collect { case t: TTag => (t.isStart, t.name) }
    assert(tags === Vector((true, "title"), (false, "title")))
  }

  test("spec mode rawtext: <style> content raw, end tag closes") {
    val s = "<style>p{a:b}</style>x"
    assert(charText(s, spec = true) === "p{a:b}x")
  }

  test("spec mode rawtext: inappropriate end tag does not close") {
    val s = "<style>a</div>b</style>"
    assert(charText(s, spec = true) === "a</div>b")
  }

  test("spec mode script data: escaped (comment-like) section") {
    val s = "<script><!--alert(1)--></script>"
    assert(charText(s, spec = true) === "<!--alert(1)-->")
    val tags = toks(s, spec = true).collect { case t: TTag => (t.isStart, t.name) }
    assert(tags === Vector((true, "script"), (false, "script")))
  }

  test("spec mode script data: double-escape terminates and closes") {
    val s = "<script><!--<script>x</script>y--></script>z"
    val ts = toks(s, spec = true)
    assert(ts.last.isInstanceOf[TEof])
    val tags = ts.collect { case t: TTag => (t.isStart, t.name) }
    assert(tags.head === ((true, "script")) && tags.last === ((false, "script")))
    assert(charText(s, spec = true).endsWith("z"))
  }

  test("spec mode plaintext: everything after <plaintext> is text") {
    val s = "<plaintext></anything>x"
    assert(charText(s, spec = true) === "</anything>x")
  }

  test("spec mode comment with lt-sign family: <!--a<!-b-->") {
    val cs = toks("<!--a<!-b-->", spec = true).collect { case c: TComment => c.data }
    assert(cs === Vector("a<!b")) // Q7a: the '-' before 'b' is lost (copy, no write-back)
  }

  test("spec mode nested-comment path: <!--x<!--y-->") {
    // comment_lt_sign_bang_dash_dash on non-'>' reports nested_comment, then comment_end
    val sink = RefTokenizer.tokenize("<!--x<!--y-->rest", specMode = true)
    assert(sink.errors.contains("nested_comment") || sink.toks.exists(_.isInstanceOf[TComment]))
  }

  test("unquoted attr value terminates at '>' and whitespace") {
    val tags = toks("<a x=1 y=2>").collect { case t: TTag => t }
    assert(tags.head.name === "a")
    // Q1 splatter shape: flush-per-entry produces per-char attrs; exact shape
    // guarded by QuirkSpec — here just termination + tag emission
    assert(tags.head.isStart)
  }

  test("after_attr_name: '<a x >' emits tag, pending attr lost") {
    val tags = toks("<a x >").collect { case t: TTag => t }
    assert(tags.size === 1 && tags.head.attrs.isEmpty)
  }
}
