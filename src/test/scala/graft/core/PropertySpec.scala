package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.dom.Extractor

/** ScalaCheck properties (SURVEY §5.2.3). The generator mirrors the corpus
  * rules: no trailing '&', no EOF inside a tag (both are reference
  * non-termination bugs, budget-guarded and excluded from byte-compare).
  */
class PropertySpec extends AnyFunSuite {
  /** Deterministic sample stream (seed fixed; no scalatestplus in the
    * offline cache, so we drive Gen directly). */
  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }


  private val tagFreeText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ',', '!', '?', '\n', '\t'),
      1 -> Gen.oneOf[String]("é", "ß", "中", new String(Character.toChars(0x1f600)))
    ).map(_.toString)).map(_.mkString)

  private val htmlish: Gen[String] = {
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val attr = for { n <- word; v <- word } yield s""" $n="$v""""
    val piece: Gen[String] = Gen.frequency(
      6 -> tagFreeText,
      2 -> (for {
        t <- Gen.oneOf("p", "div", "span", "li", "em", "b", "i", "a", "table",
          "tr", "td", "ul", "dl", "dt", "dd", "svg", "head", "body", "title", "nav")
        a <- attr
      } yield s"<$t$a>"),
      2 -> Gen.oneOf("p", "div", "span", "li", "em", "b", "i", "a", "table",
        "tr", "td", "ul", "head", "body", "title").map(t => s"</$t>"),
      1 -> Gen.oneOf("&amp;", "&lt;", "&notin;", "&#x41;", "&#65;", "&xyz;"),
      1 -> Gen.oneOf("<!-- c -->", "<!DOCTYPE html>", "<!------>", "<![CDATA[x]]>")
    )
    Gen.listOf(piece).map(_.mkString)
  }

  test("tokenizer terminates within the step budget on generator inputs") {
    forAll(htmlish) { html =>
      val s = new CollectingSink
      new RefTokenizer(RefTokenizer.codepoints(html), s).run() // throws on budget breach
      assert(s.toks.nonEmpty) // at least an EOF token
    }
  }

  test("tag-free input round-trips as character tokens exactly") {
    forAll(tagFreeText) { t =>
      val clean = t.replace("&", "").replace("<", "")
      assert(RefTokenizer.tokenize(clean).charText == clean)
    }
  }

  test("determinism: two runs produce identical token vectors") {
    forAll(htmlish) { html =>
      assert(RefTokenizer.tokenize(html).toks == RefTokenizer.tokenize(html).toks)
    }
  }

  test("extract mode terminates and spans tile the text") {
    forAll(htmlish) { html =>
      val r = Extractor.extractString(html)
      assert(!r.truncated)
      val rebuilt = r.spans.map(s => r.text.substring(s.start, s.end)).mkString
      assert(rebuilt == r.text)
      assert(r.mainText.length <= r.text.length)
    }
  }

  test("extract main text is a subsequence of full text (block concat order)") {
    forAll(htmlish) { html =>
      val r = Extractor.extractString(html)
      val kept = r.spans.filter(_.kept).map(s => r.text.substring(s.start, s.end)).mkString
      assert(kept == r.mainText)
    }
  }

  test("spans are sorted, disjoint, non-empty, and anchored under /html/body") {
    forAll(htmlish) { html =>
      val r = Extractor.extractString(html)
      var prevEnd = 0
      r.spans.foreach { s =>
        assert(s.start == prevEnd && s.end > s.start,
          s"span tiling broken at $s (prevEnd=$prevEnd)")
        prevEnd = s.end
        assert(s.path.startsWith("/html/body"), s"span path outside body: ${s.path}")
      }
      assert(prevEnd == r.text.length)
    }
  }

  test("tree construction is deterministic and partition-independent per page") {
    forAll(htmlish) { html =>
      val a = Extractor.extractString(html)
      val b = Extractor.extractString(html)
      assert(a.spans == b.spans && a.text == b.text && a.mainText == b.mainText)
    }
  }

  test("raw-bytes fuzz: arbitrary binary through the full decode+extract path never crashes") {
    // exercises charset sniffing (invalid UTF-8 → meta prescan → cp1252),
    // BOM handling, and the tokenizer on adversarial input — the crawl
    // reality where bodies can be images or garbage mislabeled as html
    val sink = new graft.dom.ExtractSink
    var seed = 0xFADEDL
    val mix = new graft.spark.Mix(seed)
    (0 until 300).foreach { k =>
      val n = mix.nextInt(4096)
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = (mix.next() & 0xff).toByte; i += 1 }
      // occasionally prefix with a BOM or meta declaration
      val input = mix.nextInt(4) match {
        case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ b
        case 1 => "<meta charset=shift_jis>".getBytes ++ b
        case 2 => Array[Byte](0xff.toByte, 0xfe.toByte) ++ b
        case _ => b
      }
      val r = graft.dom.Extractor.extractInto(input, sink)
      assert(r.text != null && r.spans != null) // terminated, produced a result
    }
  }

  test("arena stays a consistent tree under tag soup (adoption-agency surgery invariant)") {
    // the adoption agency detaches/moves/clones arena nodes mid-document;
    // after any input, every child list must be acyclic, parent-consistent,
    // and lastChild-accurate — the invariant the surgery must preserve
    forAll(htmlish, 200) { html =>
      val sink = new graft.dom.ExtractSink
      Extractor.extractCpsInto(RefTokenizer.codepoints(html), sink)
      val a = sink.arena
      val n = a.size
      var id = 0
      while (id < n) {
        var c = a.firstChild(id)
        var last = -1
        var steps = 0
        while (c >= 0) {
          assert(a.parent(c) == id, s"child $c of node $id has parent ${a.parent(c)} in:\n$html")
          last = c
          c = a.nextSibling(c)
          steps += 1
          assert(steps <= n, s"cycle in child list of node $id in:\n$html")
        }
        if (a.firstChild(id) >= 0)
          assert(a.lastChild(id) == last, s"stale lastChild for node $id in:\n$html")
        id += 1
      }
    }
  }
}
