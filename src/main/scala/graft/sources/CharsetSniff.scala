package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset detection + UTF-8 normalization for the crawl-ingest path.
  *
  * Real Common Crawl is ~5-10% non-UTF-8 (windows-1252, shift_jis, gb2312,
  * ...); a CC-native engine has to resolve the encoding per record or it
  * extracts mojibake. Resolution order follows the WHATWG Encoding sniffing
  * algorithm's certainty ranking:
  *
  *   1. byte-order mark (overrides everything, per spec);
  *   2. the transport layer (HTTP `Content-Type: ...; charset=`);
  *   3. `<meta charset>` / `<meta http-equiv=content-type>` prescan over the
  *      first 1024 bytes (the spec's prescan window);
  *   4. UTF-8 if the bytes validate as UTF-8 (strict check — UTF-8 false
  *      positives on legacy encodings are statistically negligible);
  *   5. windows-1252, the spec-blessed legacy fallback.
  *
  * `toUtf8` transcodes to UTF-8 so every downstream stage (kernel byte mode,
  * parquet storage, dedup hashing) sees one encoding; already-valid UTF-8
  * (the dominant case) is returned by reference — zero copies, zero
  * allocation on the hot ingest path.
  *
  * Everything here is deterministic: windows-1252 uses the WHATWG table
  * verbatim (not the JDK decoder), other encodings use JDK decoders pinned
  * to REPLACE semantics.
  */
object CharsetSniff {

  /** WHATWG windows-1252: 0x80-0x9F mappings (rest of the high half is
    * identity to Latin-1). Five bytes (81 8D 8F 90 9D) map to the C1
    * controls, per the spec's index.
    */
  private val cp1252High: Array[Char] =
    ("\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021" +
     "\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f" +
     "\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014" +
     "\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178").toCharArray

  /** windows-1252 byte → codepoint (WHATWG index). */
  def cp1252(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80 || u >= 0xa0) u else cp1252High(u - 0x80)
  }

  /** WHATWG label → canonical name (subset covering the labels that occur at
    * crawl frequency; unknown labels return null and fall through to
    * validate-then-1252). Canonical names are JDK-resolvable except
    * "windows-1252", which we decode ourselves.
    */
  def normalizeLabel(label: String): String = {
    if (label == null) return null
    label.trim.toLowerCase match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "windows-1252" | "cp1252" | "x-cp1252" | "iso-8859-1" | "iso8859-1" |
           "iso_8859-1" | "latin1" | "l1" | "ascii" | "us-ascii" |
           "ansi_x3.4-1968" | "iso-ir-100" | "cp819" => "windows-1252"
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" | "ms932" |
           "windows-31j" | "csshiftjis" => "Shift_JIS"
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" => "EUC-JP"
      case "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" | "chinese" | "csgb2312" |
           "csiso58gb231280" | "x-gbk" => "GBK" // WHATWG maps the gb2312 labels to GBK
      case "gb18030" => "GB18030"
      case "big5" | "big5-hkscs" | "cn-big5" | "x-x-big5" => "Big5"
      case "euc-kr" | "windows-949" | "korean" | "ks_c_5601-1987" | "csksc56011987" => "EUC-KR"
      case "iso-8859-2" | "latin2" => "ISO-8859-2"
      case "iso-8859-15" | "latin9" => "ISO-8859-15"
      case "windows-1250" | "cp1250" => "windows-1250"
      case "windows-1251" | "cp1251" => "windows-1251"
      case "windows-1254" | "cp1254" | "iso-8859-9" | "latin5" => "windows-1254"
      case "koi8-r" | "koi8" | "koi" => "KOI8-R"
      case "utf-16le" | "utf-16" => "UTF-16LE" // WHATWG: bare utf-16 label means LE
      case "utf-16be" => "UTF-16BE"
      case _ => null
    }
  }

  /** `charset=` parameter of a Content-Type value, or null. */
  def charsetFromContentType(ct: String): String = {
    if (ct == null) return null
    val lower = ct.toLowerCase
    val i = lower.indexOf("charset")
    if (i < 0) return null
    var j = i + 7
    while (j < ct.length && (ct.charAt(j) == ' ' || ct.charAt(j) == '\t')) j += 1
    if (j >= ct.length || ct.charAt(j) != '=') return null
    j += 1
    while (j < ct.length && (ct.charAt(j) == ' ' || ct.charAt(j) == '\t')) j += 1
    var quote = 0.toChar
    if (j < ct.length && (ct.charAt(j) == '"' || ct.charAt(j) == '\'')) { quote = ct.charAt(j); j += 1 }
    val start = j
    while (j < ct.length && {
      val c = ct.charAt(j)
      if (quote != 0) c != quote
      // unquoted value: a quote also terminates (meta `content="...charset=x"`
      // feeds the attribute's closing quote into this scan)
      else c != ';' && c != ' ' && c != '\t' && c != '>' && c != '/' && c != '"' && c != '\''
    }) j += 1
    if (j > start) ct.substring(start, j) else null
  }

  /** `<meta charset>` / `<meta http-equiv=content-type content="...">`
    * prescan over the first `limit` bytes (WHATWG §13.2.3.2, simplified:
    * each `<meta ...>` region is scanned for a charset, comments are
    * skipped). Returns a canonical name or null.
    */
  def metaPrescan(bytes: Array[Byte], limit: Int = 1024): String = {
    val n = math.min(bytes.length, limit)
    // the prescan region is treated as Latin-1: byte == char for the ASCII
    // markup we are looking for, and no multi-byte legacy encoding puts a
    // spurious "<meta" inside a multi-byte sequence's ASCII-range trail bytes
    val s = new String(bytes, 0, n, StandardCharsets.ISO_8859_1).toLowerCase
    var i = 0
    while (i < s.length) {
      val cm = s.indexOf("<!--", i)
      val mt = s.indexOf("<meta", i)
      if (mt < 0) return null
      if (cm >= 0 && cm < mt) {
        val end = s.indexOf("-->", cm + 4)
        if (end < 0) return null
        i = end + 3
      } else {
        val end = s.indexOf('>', mt + 5)
        val tag = if (end < 0) s.substring(mt) else s.substring(mt, end)
        // direct `charset=` attribute, or charset inside a content attribute
        val label = charsetFromContentType(tag)
        if (label != null) {
          val norm = normalizeLabel(stripQuotes(label))
          if (norm != null) return norm
        }
        if (end < 0) return null
        i = end + 1
      }
    }
    null
  }

  private def stripQuotes(v: String): String = {
    var s = v.trim
    if (s.length >= 2 && (s.head == '"' || s.head == '\'') && s.last == s.head)
      s = s.substring(1, s.length - 1)
    s
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates, max
    * U+10FFFF). One branchy pass, ~GB/s — negligible against ingest I/O.
    */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 >= 0xa0) return false // surrogate
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  /** Resolve the encoding for a page body (see object doc for the order).
    * Returns a canonical name; "utf-8" means "leave the bytes alone".
    */
  def resolve(body: Array[Byte], declaredLabel: String): String = {
    if (body.length >= 3 && (body(0) & 0xff) == 0xef && (body(1) & 0xff) == 0xbb &&
      (body(2) & 0xff) == 0xbf) return "utf-8-bom"
    if (body.length >= 2 && (body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
      return "utf-16le-bom"
    if (body.length >= 2 && (body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
      return "utf-16be-bom"
    val declared = normalizeLabel(declaredLabel)
    if (declared != null) return declared
    val meta = metaPrescan(body)
    if (meta != null) return meta
    if (isValidUtf8(body)) "utf-8" else "windows-1252"
  }

  /** Normalize a page body to UTF-8 bytes. Valid UTF-8 input (with no BOM)
    * is returned BY REFERENCE — the dominant-case fast path. The BOM, when
    * present, is stripped (it is an encoding signature, not content).
    */
  def toUtf8(body: Array[Byte], declaredLabel: String): Array[Byte] =
    resolve(body, declaredLabel) match {
      case "utf-8-bom" => java.util.Arrays.copyOfRange(body, 3, body.length)
      case "utf-16le-bom" => viaJdk(body, 2, StandardCharsets.UTF_16LE)
      case "utf-16be-bom" => viaJdk(body, 2, StandardCharsets.UTF_16BE)
      case "UTF-16LE" => viaJdk(body, 0, StandardCharsets.UTF_16LE)
      case "UTF-16BE" => viaJdk(body, 0, StandardCharsets.UTF_16BE)
      case "utf-8" =>
        // declared utf-8 with invalid bytes keeps JDK replacement semantics
        // downstream (the kernel's own malformed-UTF-8 path) — per spec,
        // a declared encoding is not second-guessed
        body
      case "windows-1252" => fromCp1252(body)
      case jdkName =>
        try viaJdk(body, 0, Charset.forName(jdkName))
        catch { case _: Exception => fromCp1252(body) } // no such JDK charset → legacy fallback
    }

  /** windows-1252 → UTF-8 via the WHATWG table. Pure-ASCII input returns by
    * reference.
    */
  def fromCp1252(body: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < body.length && body(i) >= 0) i += 1
    if (i == body.length) return body
    val sb = new java.lang.StringBuilder(body.length + 16)
    var j = 0
    while (j < body.length) { sb.append(cp1252(body(j)).toChar); j += 1 }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Decode `body[from..)` with a JDK charset (malformed input → U+FFFD,
    * matching browser decoder behavior) and re-encode as UTF-8.
    */
  private def viaJdk(body: Array[Byte], from: Int, cs: Charset): Array[Byte] = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val chars = dec.decode(java.nio.ByteBuffer.wrap(body, from, body.length - from))
    chars.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Decode to codepoints with the resolve order but NO declared label — the
    * kernel-side entry for pages that arrive outside the WARC path. Returns
    * null when the input is valid UTF-8 (caller keeps its own fast path).
    */
  def decodeFallback(body: Array[Byte]): Array[Int] = {
    val utf8 = toUtf8(body, null)
    if (utf8 eq body) null
    else {
      val s = new String(utf8, StandardCharsets.UTF_8)
      val out = new Array[Int](s.codePointCount(0, s.length))
      var i = 0; var k = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out(k) = cp; k += 1
        i += Character.charCount(cp)
      }
      out
    }
  }
}
