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
