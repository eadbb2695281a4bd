package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class CharsetSniffSpec extends AnyFunSuite {

  test("label normalization maps WHATWG aliases") {
    assert(CharsetSniff.normalizeLabel("UTF-8") === "utf-8")
    assert(CharsetSniff.normalizeLabel(" utf8 ") === "utf-8")
    assert(CharsetSniff.normalizeLabel("ISO-8859-1") === "windows-1252") // WHATWG folds latin1 into 1252
    assert(CharsetSniff.normalizeLabel("Latin1") === "windows-1252")
    assert(CharsetSniff.normalizeLabel("Shift-JIS") === "Shift_JIS")
    assert(CharsetSniff.normalizeLabel("GB2312") === "GBK")
    assert(CharsetSniff.normalizeLabel("no-such-charset") === null)
    assert(CharsetSniff.normalizeLabel(null) === null)
  }

  test("content-type charset parameter parsing") {
    assert(CharsetSniff.charsetFromContentType("text/html; charset=utf-8") === "utf-8")
    assert(CharsetSniff.charsetFromContentType("text/html;charset=\"windows-1252\"") === "windows-1252")
    assert(CharsetSniff.charsetFromContentType("text/html; charset = shift_jis ;x=y") === "shift_jis")
    assert(CharsetSniff.charsetFromContentType("text/html") === null)
    // a quote terminates an unquoted value (meta content="...charset=x")
    assert(CharsetSniff.charsetFromContentType("content=\"text/html; charset=shift_jis\"") === "shift_jis")
  }

  test("meta prescan finds charset and http-equiv forms, skips comments") {
    def pre(s: String) = CharsetSniff.metaPrescan(s.getBytes(UTF_8))
    assert(pre("<html><head><meta charset=\"windows-1252\"><title>t</title>") === "windows-1252")
    assert(pre("<html><head><META CHARSET=UTF-8>") === "utf-8")
    assert(pre("<head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=shift_jis\">") === "Shift_JIS")
    assert(pre("<head><!-- <meta charset=utf-8> --><meta charset=koi8-r>") === "KOI8-R")
    assert(pre("<head><title>no meta here</title>") === null)
    // beyond the 1024-byte prescan window → not seen
    assert(pre(("x" * 1100) + "<meta charset=utf-8>") === null)
  }

  test("strict utf-8 validation") {
    assert(CharsetSniff.isValidUtf8("plain ascii".getBytes(UTF_8)))
    assert(CharsetSniff.isValidUtf8("héllo 日本 😀".getBytes(UTF_8)))
    assert(!CharsetSniff.isValidUtf8(Array(0xc3.toByte))) // truncated 2-byte
    assert(!CharsetSniff.isValidUtf8(Array(0xe9.toByte, 0x20))) // cp1252 é + space
    assert(!CharsetSniff.isValidUtf8(Array(0xc0.toByte, 0xaf.toByte))) // overlong '/'
    assert(!CharsetSniff.isValidUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte))) // surrogate
    assert(!CharsetSniff.isValidUtf8(Array(0xf5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte))) // > U+10FFFF
  }

  test("windows-1252 decode uses the WHATWG table (euro, dashes, C1 holes)") {
    assert(CharsetSniff.cp1252(0x80.toByte) === 0x20ac) // €
    assert(CharsetSniff.cp1252(0x97.toByte) === 0x2014) // em dash
    assert(CharsetSniff.cp1252(0x81.toByte) === 0x81) // unassigned → C1 control
    assert(CharsetSniff.cp1252(0xe9.toByte) === 0xe9) // é (latin-1 range)
    val bytes = Array[Byte]('a', 0x93.toByte, 'b', 0x94.toByte, 0x80.toByte)
    assert(new String(CharsetSniff.fromCp1252(bytes), UTF_8) === "a“b”€")
  }

  test("toUtf8 resolution order: BOM > declared > meta > validate > 1252") {
    val asUtf8 = "héllo".getBytes(UTF_8)
    // valid utf-8, nothing declared → identity BY REFERENCE
    assert(CharsetSniff.toUtf8(asUtf8, null) eq asUtf8)
    // utf-8 BOM → stripped
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ asUtf8
    assert(new String(CharsetSniff.toUtf8(bom, null), UTF_8) === "héllo")
    // BOM outranks a (wrong) declared charset
    assert(new String(CharsetSniff.toUtf8(bom, "shift_jis"), UTF_8) === "héllo")
    // declared windows-1252
    val cp = "café—ok".getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(new String(CharsetSniff.toUtf8(cp, "iso-8859-1"), UTF_8) === "café—ok")
    // declared shift_jis
    val sj = "日本語".getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(new String(CharsetSniff.toUtf8(sj, "shift_jis"), UTF_8) === "日本語")
    // nothing declared, not valid utf-8 → windows-1252 fallback
    assert(new String(CharsetSniff.toUtf8(Array[Byte]('x', 0xe9.toByte), null), UTF_8) === "xé")
    // meta prescan wins over the 1252 fallback
    val metaSj = ("<meta charset=shift_jis><p>".getBytes(UTF_8)) ++ "カナ".getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(new String(CharsetSniff.toUtf8(metaSj, null), UTF_8) === "<meta charset=shift_jis><p>カナ")
    // utf-16le with BOM
    val u16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++ "hi".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(new String(CharsetSniff.toUtf8(u16, null), UTF_8) === "hi")
  }

  test("unknown declared label falls through to sniffing") {
    val asUtf8 = "ünïcode".getBytes(UTF_8)
    assert(new String(CharsetSniff.toUtf8(asUtf8, "x-klingon"), UTF_8) === "ünïcode")
    assert(new String(CharsetSniff.toUtf8(Array[Byte]('y', 0x97.toByte), "x-klingon"), UTF_8) === "y—")
  }

  test("kernel decode entry: BOM skip and 1252 fallback on malformed utf-8") {
    import graft.dom.{Extractor, ExtractSink}
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "<p>x</p>".getBytes(UTF_8)
    assert(Extractor.extractInto(bom, new ExtractSink).text === "x")
    val cp = "<p>café—y</p>".getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(Extractor.extractInto(cp, new ExtractSink).text === "café—y")
    val metaSj = "<html><head><meta charset=shift_jis></head><body><p>日本語</p></body></html>"
      .getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(Extractor.extractInto(metaSj, new ExtractSink).text === "日本語")
  }
}
