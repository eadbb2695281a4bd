package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Pages, PageRow}

/** WARC round-trip: pages → archive files → re-ingest → byte-identical html
  * and timestamps; extraction over the re-ingested corpus equals the direct
  * path.
  */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
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

  test("record serializer round-trips through the parser") {
    val body = "<p>hi</p>".getBytes("UTF-8")
    val rec = Warc.record("https://x/y", 1609459200000L, body)
    val rows = Warc.parse(rec).toVector
    assert(rows.size === 1)
    assert(rows.head.url === "https://x/y")
    assert(rows.head.warc_ts.getTime === 1609459200000L)
    assert(java.util.Arrays.equals(rows.head.html, body))
  }

  test("multi-record file parses all records in order") {
    val r1 = Warc.record("u1", 1000L, "abc".getBytes)
    val r2 = Warc.record("u2", 2000L, "defg".getBytes)
    val both = r1 ++ r2
    val rows = Warc.parse(both).toVector
    assert(rows.map(_.url) === Vector("u1", "u2"))
    assert(rows.map(r => new String(r.html)) === Vector("abc", "defg"))
  }

  test("CC-shaped gzip file: member-per-record, HTTP headers stripped, non-response records skipped") {
    val body = "<html><body><p>real page</p></body></html>".getBytes("UTF-8")
    val members = Seq(
      Warc.record("urn:warcinfo", 1000L, "software: graft-test".getBytes("UTF-8"), http = false, warcType = "warcinfo"),
      Warc.record("https://x/page", 999L, "GET /page HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("UTF-8"), http = false, warcType = "request"),
      Warc.record("https://x/page", 1609459200000L, body, http = true)
    )
    val bos = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(m); gz.finish()
    }
    bos.close()
    val rows = Warc.parseFile(bos.toByteArray).toVector
    assert(rows.size === 1)
    assert(rows.head.url === "https://x/page")
    assert(rows.head.warc_ts.getTime === 1609459200000L)
    assert(java.util.Arrays.equals(rows.head.html, body))
  }

  test("spark gzip round-trip (CC layout) preserves every page byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz").toString
    val pages = Pages.synthesize(spark, sfDir)
    Warc.write(pages, dir, gzip = true, http = true)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.nonEmpty)
    val back = Warc.read(spark, dir)
    val ss = spark
    import ss.implicits._
    val a = pages.map(p => (p.url, java.util.Arrays.hashCode(p.html))).collect().sortBy(_._1)
    val b = back.map(p => (p.url, java.util.Arrays.hashCode(p.html))).collect().sortBy(_._1)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
  }

  test("rerun into a dirty dir with fewer partitions leaves no stale records") {
    val dir = java.nio.file.Files.createTempDirectory("warcdirty").toString
    val pages = Pages.synthesize(spark, sfDir)
    Warc.write(pages.repartition(8), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc")) === 8)
    Warc.write(pages.repartition(2), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc")) === 2)
    assert(Warc.read(spark, dir).count() === 500L)
  }

  test("spark write/read round-trip preserves every page byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toString
    val pages = Pages.synthesize(spark, sfDir)
    Warc.write(pages, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc"))
    assert(files.nonEmpty)
    val back = Warc.read(spark, dir)
    val ss = spark
    import ss.implicits._
    val a = pages.map(p => (p.url, java.util.Arrays.hashCode(p.html), p.warc_ts.getTime))
      .collect().sortBy(_._1)
    val b = back.map(p => (p.url, java.util.Arrays.hashCode(p.html), p.warc_ts.getTime))
      .collect().sortBy(_._1)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
  }
}
