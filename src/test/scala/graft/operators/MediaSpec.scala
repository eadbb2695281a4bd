package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Real image-header decode: JDK-encoded PNG/JPEG/GIF bytes and spec-exact
  * WebP containers parse to their true dimensions; corrupt/truncated bytes
  * degrade to None, never throw.
  */
class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def enc(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("PNG/JPEG/GIF: genuinely encoded bytes decode to their true dimensions") {
    for ((w, h) <- Seq((1, 1), (17, 23), (640, 480), (300, 1))) {
      assert(Media.imageHeader(enc(w, h, "png")) == Some(("png", w, h)))
      assert(Media.imageHeader(enc(w, h, "jpeg")) == Some(("jpeg", w, h)))
      assert(Media.imageHeader(enc(w, h, "gif")) == Some(("gif", w, h)))
    }
  }

  test("WebP: VP8L container round-trips; VP8 lossy and VP8X vectors parse per spec") {
    for ((w, h) <- Seq((1, 1), (16384, 16384), (99, 1234)))
      assert(Media.imageHeader(Media.webpLossless(w, h)) == Some(("webp", w, h)))
    // hand-built VP8 (lossy) header: sync 9D 01 2A then 14-bit LE dims
    def vp8(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
      def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      ascii("RIFF"); le32(22); ascii("WEBP"); ascii("VP8 "); le32(10)
      out.write(Array[Byte](0, 0, 0)) // frame tag
      out.write(0x9d); out.write(0x01); out.write(0x2a)
      out.write(w & 0xff); out.write((w >> 8) & 0x3f)
      out.write(h & 0xff); out.write((h >> 8) & 0x3f)
      out.toByteArray
    }
    assert(Media.imageHeader(vp8(550, 368)) == Some(("webp", 550, 368)))
    // VP8X extended: 24-bit LE canvas dims minus one
    def vp8x(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
      def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      def le24(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff) }
      ascii("RIFF"); le32(22); ascii("WEBP"); ascii("VP8X"); le32(10)
      le32(0) // flags + reserved
      le24(w - 1); le24(h - 1)
      out.toByteArray
    }
    assert(Media.imageHeader(vp8x(16777216, 2)) == Some(("webp", 16777216, 2)))
  }

  test("corrupt and truncated payloads degrade to None, never throw") {
    assert(Media.imageHeader(Array[Byte]()) == None)
    assert(Media.imageHeader("not an image at all, just text".getBytes("UTF-8")) == None)
    val png = enc(20, 10, "png")
    assert(Media.imageHeader(png.take(12)) == None) // cut before IHDR
    val jpg = enc(20, 10, "jpeg")
    assert(Media.imageHeader(jpg.take(4)) == None) // cut before any SOF
    // a JPEG whose marker sync is destroyed mid-scan
    val broken = jpg.clone(); broken(2) = 0x00
    assert(Media.imageHeader(broken) == None)
    assert(Media.imageHeader("RIFF????WEBPJUNK".getBytes("US-ASCII")) == None)
  }

  test("distributed imageMeta over the synthetic corpus matches the generator closed-form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Media.imageMeta(Media.syntheticImages(docs)).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got.size == 500)
    got.foreach { case (id, (f, w, h)) =>
      val wantF = (id % 4) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "webp" }
      assert(f == wantF && w == 16 + (id % 32).toInt && h == 16 + (id % 24).toInt,
        s"doc $id decoded ($f, $w, $h)")
    }
  }
}
