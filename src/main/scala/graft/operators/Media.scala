package graft.operators

import org.apache.spark.sql.DataFrame

/** Real multimodal metadata: image FORMAT + DIMENSIONS parsed from the
  * container's magic bytes — pure JVM, no codec dependency, the decode an
  * img2dataset-style pipeline needs to filter/bucket media before ever
  * paying for a pixel decode. Replaces the declared length-derived stub
  * (round-4 "What's missing #1").
  *
  * Formats (all public container specs):
  *   - PNG  (RFC 2083): 8-byte signature, IHDR width/height big-endian at
  *     offsets 16/20.
  *   - JPEG (ITU T.81 / JFIF): marker scan to the first SOFn frame header
  *     (C0–CF minus C4/C8/CC), height/width big-endian at +5/+7.
  *   - GIF  (87a/89a): logical screen width/height little-endian at 6/8.
  *   - WebP (RIFF): `VP8 ` lossy (14-bit LE dims after the 9D 01 2A sync),
  *     `VP8L` lossless (14-bit fields of the 32-bit LE word after the 2F
  *     signature, stored minus one), `VP8X` extended (24-bit LE canvas
  *     dims minus one).
  *
  * The Spark surface is a narrow partition-preserving typed map over a
  * BINARY column — no shuffle, batch-friendly; undecodable payloads yield
  * a NULL-dimension row (never an exception in a task).
  */
object Media {

  /** (format, width, height) from container magic bytes; None = not a
    * recognized image container (or truncated before its header).
    */
  def imageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le24(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def ascii(i: Int, s: String) =
      b.length >= i + s.length && s.indices.forall(k => b(i + k) == s.charAt(k).toByte)

    if (b.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG") &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        ascii(12, "IHDR"))
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // marker scan: skip entropy-less segments to the first SOFn
      var i = 2
      while (i + 9 < b.length) {
        if (u8(i) != 0xff) return None // lost marker sync — corrupt
        var j = i
        while (j < b.length && u8(j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val m = u8(j)
        if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (j + 8 >= b.length) return None
          return Some(("jpeg", be16(j + 6), be16(j + 4)))
        } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 1 // standalone marker
        } else if (m == 0xd9 || m == 0xda) {
          return None // end / entropy stream before any SOF
        } else {
          if (j + 2 >= b.length) return None
          i = j + 1 + 2 + (be16(j + 1) - 2) // segment: marker + len(incl.)
        }
      }
      None
    }
    else if (b.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a")))
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 25 && ascii(0, "RIFF") && ascii(8, "WEBP")) {
      if (ascii(12, "VP8 ") && b.length >= 30 &&
          u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a)
        Some(("webp", le16(26) & 0x3fff, le16(28) & 0x3fff))
      else if (ascii(12, "VP8L") && b.length >= 25 && u8(20) == 0x2f) {
        val bits = u8(21).toLong | (u8(22).toLong << 8) |
          (u8(23).toLong << 16) | (u8(24).toLong << 24)
        Some(("webp", ((bits & 0x3fff) + 1).toInt, (((bits >> 14) & 0x3fff) + 1).toInt))
      } else if (ascii(12, "VP8X") && b.length >= 30)
        Some(("webp", le24(24) + 1, le24(27) + 1))
      else None
    }
    else None
  }

  /** Deterministic REAL encoded images per doc: format rotates by
    * doc_id % 4 (png/jpeg/gif via the JDK's ImageIO encoders — genuine
    * files a browser opens; webp as a hand-built VP8L container, no JDK
    * writer exists), dimensions closed-form in doc_id so the oracle knows
    * exactly what each byte blob must decode to. Output (doc_id, img
    * BINARY) — the fixture generator for the multimodal leg.
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 16 + (id % 24).toInt
        val bytes = (id % 4) match {
          case 0 => encodeImageIO(w, h, id, "png")
          case 1 => encodeImageIO(w, h, id, "jpeg")
          case 2 => encodeImageIO(w, h, id, "gif")
          case _ => webpLossless(w, h)
        }
        (id, bytes)
      }
    }.toDF("doc_id", "img")
  }

  private def encodeImageIO(w: Int, h: Int, seed: Long, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (seed * 2654435761L).toInt & 0xffffff
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb ^ (x * 31 + y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** Minimal valid VP8L (lossless WebP) container: RIFF/WEBP wrapper, 2F
    * signature, the 32-bit LE dimension word ((w−1) | (h−1)<<14, alpha 0,
    * version 0). Header-complete per the public spec; payload truncated
    * (only the header is under test — no JDK WebP encoder exists).
    */
  def webpLossless(w: Int, h: Int): Array[Byte] = {
    val bits = ((w - 1) & 0x3fff) | (((h - 1) & 0x3fff) << 14)
    val chunk = Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    ascii("RIFF"); le32(4 + 8 + chunk.length + (chunk.length & 1))
    ascii("WEBP"); ascii("VP8L"); le32(chunk.length); out.write(chunk)
    if ((chunk.length & 1) == 1) out.write(0) // RIFF even-size padding
    out.toByteArray
  }

  /** (doc_id, format, width, height) decoded from a BINARY `img` column —
    * one narrow typed pass, nulls for undecodable payloads.
    */
  def imageMeta(imgs: DataFrame): DataFrame = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.select("doc_id", "img").as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        imageHeader(bytes) match {
          case Some((f, w, h)) => (id, f, w, h)
          case None => (id, null.asInstanceOf[String], -1, -1)
        }
      }.toDF("doc_id", "format", "width", "height")
  }
}
