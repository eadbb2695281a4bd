package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  test("render/extract round-trips plain and FlateDecode streams") {
    val text = "the quick brown fox jumps over the lazy dog and keeps going with more than twelve words here"
    assert(Pdf.extractText(Pdf.render(1, text, flate = false)) === text)
    assert(Pdf.extractText(Pdf.render(2, text, flate = true)) === text)
  }

  test("PDF string escapes and balanced parens round-trip") {
    val tricky = "parens (nested (deep)) and backslash \\ plus close ) alone"
    assert(Pdf.extractText(Pdf.render(3, tricky)) === tricky)
  }

  test("TJ arrays and ' operator are extracted, foreign operators drop their operands") {
    val cs = "BT /F1 12 Tf (ignored-by-Tf-no...) 1 0 0 1 72 720 Tm [(a b) -250 (c)] TJ (d) ' ET"
      .getBytes("ISO-8859-1")
    val pdf = ("x << /Length " + cs.length + " >>\nstream\n").getBytes("ISO-8859-1") ++ cs ++
      "\nendstream".getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf) === "a b c d")
  }

  test("zip-bomb content stream is capped: bounded memory, prefix text survives") {
    // a stream deflating ~190 MB of zeros into ~KBs: uncapped inflation
    // would balloon task memory; the cap must stop at 64 MB and the text
    // BEFORE the bomb must still extract
    val textPart = "BT (hello before the bomb) Tj ET\n".getBytes("ISO-8859-1")
    val bomb = new Array[Byte](190 << 20) // zeros compress ~1000:1
    val payload = textPart ++ bomb
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val comp = out.toByteArray
    assert(comp.length < (1 << 21), s"fixture should compress small: ${comp.length}")
    val pdf = (s"%PDF-1.4\n4 0 obj << /Length ${comp.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ comp ++ "\nendstream\n%%EOF\n".getBytes("ISO-8859-1")
    val got = Pdf.extractText(pdf)
    assert(got == "hello before the bomb", s"prefix text must survive the cap: '$got'")
  }

  test("malformed input never crashes, yields empty") {
    assert(Pdf.extractText(Array[Byte](1, 2, 3)) === "")
    assert(Pdf.extractText("stream\n(((((".getBytes) === "")
    assert(Pdf.extractText("<< /Filter /FlateDecode >> stream\nnot-zlib\nendstream".getBytes) === "")
  }

  test("generated file is structurally a PDF (header, xref, trailer)") {
    val b = new String(Pdf.render(7, ("word " * 30).trim), "ISO-8859-1")
    assert(b.startsWith("%PDF-1.4"))
    assert(b.contains("xref") && b.contains("trailer") && b.endsWith("%%EOF\n"))
    assert(b.contains("/Type /Catalog") && b.contains("/MediaBox"))
  }
}
