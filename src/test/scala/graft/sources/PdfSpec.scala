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
