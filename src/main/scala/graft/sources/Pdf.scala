package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Minimal PDF text extraction — the north rule's "PDF/layout parse" leg.
  *
  * This is a REAL parser for the subset that carries text (not a stub):
  * content streams are located by the `stream`/`endstream` framing,
  * FlateDecode filters are inflated with `java.util.zip.Inflater` (PDF
  * Flate is zlib), and the text shows through the PDF text operators:
  * `(string) Tj`, `(string) '`, and `[(s1) n (s2)] TJ` arrays, with full
  * PDF string-escape handling (\\ \( \) \n \r \t \b \f, octal \ddd, and
  * balanced unescaped parentheses). Strings emitted by consecutive text
  * operators are joined with single spaces — the layout convention the
  * fixture generator (`render`) writes, so extract(render(text)) == text
  * byte-for-byte and the whole path is DuckDB-oracle-checkable.
  *
  * Out of scope (documented): CID/Type0 composite fonts with hex strings,
  * cross-reference streams, object streams, encryption — the long tail a
  * production deployment delegates to a full PDF library; the Spark-side
  * plumbing (binary column in, text column out, narrow codegen-friendly
  * map) is identical either way.
  */
object Pdf {

  /** Render one deterministic single-page PDF carrying `text` (split into
    * 12-word lines, one Tj per line). `flate = true` compresses the content
    * stream (FlateDecode), exercising the inflate path.
    */
  def render(docId: Long, text: String, flate: Boolean = false): Array[Byte] = {
    val lines =
      if (text.isEmpty) Array.empty[String]
      else text.split(' ').grouped(12).map(_.mkString(" ")).toArray
    val content = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.foreach { l => sb.append('(').append(escape(l)).append(") Tj 0 -14 Td\n") }
      sb.append("ET\n")
      sb.toString.getBytes(ISO_8859_1)
    }
    val streamBytes = if (flate) deflate(content) else content
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val objs = Array(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      null, // the stream object is assembled separately
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val out = new java.io.ByteArrayOutputStream(streamBytes.length + 1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](objs.length + 1)
    w(s"%PDF-1.4\n%âãÏÓ\n")
    for (i <- objs.indices) {
      offsets(i + 1) = out.size()
      if (i == 3) {
        w(s"4 0 obj << /Length ${streamBytes.length}$filter >>\nstream\n")
        out.write(streamBytes)
        w("\nendstream\nendobj\n")
      } else w(s"${i + 1} 0 obj ${objs(i)} endobj\n")
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    for (i <- objs.indices) w(f"${offsets(i + 1)}%010d 00000 n \n")
    w(s"trailer << /Size ${objs.length + 1} /Root 1 0 R /ID [($docId) ($docId)] >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Decompression is CAPPED at 64 MB per stream: a crafted zip-bomb
    * content stream (KBs of deflate inflating to GBs) must cost a task a
    * bounded buffer, not an executor OOM — the prefix is still parsed, so
    * legitimate text before the cap survives (crawl-robustness policy).
    */
  private val maxInflate = 64 << 20

  private def inflate(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, from, until - from)
      val out = new java.io.ByteArrayOutputStream(math.min((until - from) * 3 + 64, maxInflate))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput() && out.size() < maxInflate)
        out.write(buf, 0, inf.inflate(buf))
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => Array.emptyByteArray }
    finally inf.end()
  }

  /** All content streams of the document, decoded. */
  private def contentStreams(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val s = new String(pdf, ISO_8859_1)
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i >= 0 && i < s.length) {
      val k = s.indexOf("stream", i)
      if (k < 0) i = -1
      else {
        // dict region: backtrack to the nearest "<<" (good enough for the
        // framing; a wrong guess only mis-reads the Filter flag)
        val dictStart = s.lastIndexOf("<<", k)
        val dict = if (dictStart >= 0) s.substring(dictStart, k) else ""
        var dataStart = k + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end < 0) i = -1
        else {
          var dataEnd = end
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val decoded =
            if (dict.contains("/FlateDecode")) inflate(pdf, dataStart, dataEnd)
            else java.util.Arrays.copyOfRange(pdf, dataStart, dataEnd)
          out += decoded
          i = end + "endstream".length
        }
      }
    }
    out.result()
  }

  /** Extract the text operators' strings, single-space-joined. Malformed
    * input yields "" — never a crash (crawl-robustness policy, same as the
    * WARC parser).
    */
  def extractText(pdf: Array[Byte]): String = {
    val parts = Seq.newBuilder[String]
    contentStreams(pdf).foreach { cs =>
      val s = new String(cs, ISO_8859_1)
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '(') {
          val (str, next) = pdfString(s, i)
          pending += str
          i = next
        } else if (c.isLetter || c == '\'' || c == '"') {
          // operator token: flush pending strings on a text-showing operator,
          // drop them on anything else (they fed a non-text operator)
          val start = i
          while (i < s.length && (s.charAt(i).isLetter || s.charAt(i) == '\'' ||
            s.charAt(i) == '"' || s.charAt(i) == '*')) i += 1
          s.substring(start, i) match {
            case "Tj" | "TJ" | "'" | "\"" =>
              parts ++= pending; pending.clear()
            case _ => pending.clear()
          }
        } else i += 1 // digits, brackets, slashes, whitespace, signs
      }
    }
    parts.result().filter(_.nonEmpty).mkString(" ")
  }

  /** Parse one PDF literal string starting at `start` ('('): returns the
    * unescaped value and the index after the closing ')'.
    */
  private def pdfString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var n = 0; i += 1
            while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
            }
            sb.append((v & 0xff).toChar)
          case other => sb.append(other); i += 2 // spec: drop the backslash
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }
}
