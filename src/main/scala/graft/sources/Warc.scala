package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.PageRow
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Minimal WARC/1.0 source + sink — Common Crawl's native container format,
  * so the engine can ingest real crawl archives without a conversion step.
  *
  * Read path: `binaryFile` datasource (one task per archive file — exactly
  * how production Common-Crawl jobs parallelize, since WARC members are
  * gzip-concatenated per file and not arbitrarily splittable; CC files are
  * ~1 GB, well under the datasource's 2 GB ceiling) → per-file record parse
  * in a narrow flatMap.
  *
  * Record layout written/parsed (uncompressed WARC/1.0, `response` records):
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Target-URI: <url>\r\n
  *   WARC-Date: <ISO-8601>\r\n
  *   Content-Length: <n>\r\n
  *   \r\n
  *   <n body bytes>\r\n\r\n
  *
  * (Real CC `response` records wrap an HTTP response; stripping HTTP headers
  * is a TODO — the fixture writer emits the html payload as the block.)
  */
object Warc {

  /** Serialize one record. */
  def record(url: String, tsMillis: Long, body: Array[Byte]): Array[Byte] = {
    val date = java.time.Instant.ofEpochMilli(tsMillis).toString
    val header =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\nWARC-Date: $date\r\nContent-Length: ${body.length}\r\n\r\n"
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + body.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write pages as .warc files, one per partition (executors write via
    * java.nio against the shared filesystem; on a cluster this targets a
    * shared mount/HDFS-backed local dir — the layout matches what a crawler
    * would hand us).
    */
  def write(pages: Dataset[PageRow], dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    // Clear stale part files first: a previous run with MORE partitions would
    // leave higher-numbered part-NNNNN.warc files that read() re-ingests,
    // silently duplicating pages.
    scala.util.Using.resource(java.nio.file.Files.list(d)) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".warc"))
        .foreach(java.nio.file.Files.delete)
    }
    pages.foreachPartition { (it: Iterator[PageRow]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.warc")
      val os = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path))
      try it.foreach(p => os.write(record(p.url, p.warc_ts.getTime, p.html)))
      finally os.close()
    }
  }

  /** Parse one WARC file's bytes into PageRows. */
  def parse(bytes: Array[Byte]): Iterator[PageRow] = new Iterator[PageRow] {
    private var pos = 0
    private var nextRow: PageRow = advance()

    private def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      val s = new String(bytes, start, pos - start, UTF_8)
      pos = math.min(pos + 2, bytes.length)
      s
    }

    private def advance(): PageRow = {
      while (pos < bytes.length) {
        // seek record start
        val l0 = line()
        if (l0 == "WARC/1.0") {
          var url: String = null
          var date: String = null
          var len = -1
          var h = line()
          while (h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) {
              val k = h.substring(0, i).trim
              val v = h.substring(i + 1).trim
              k match {
                case "WARC-Target-URI" => url = v
                case "WARC-Date" => date = v
                case "Content-Length" => len = v.toInt
                case _ => ()
              }
            }
            h = line()
          }
          if (url != null && len >= 0 && pos + len <= bytes.length) {
            val body = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
            pos += len + 4 // trailing \r\n\r\n
            val ts = new java.sql.Timestamp(
              if (date != null) java.time.Instant.parse(date).toEpochMilli else 0L)
            return PageRow(url, ts, body, null, null)
          }
        }
      }
      null
    }

    def hasNext: Boolean = nextRow != null
    def next(): PageRow = { val r = nextRow; nextRow = advance(); r }
  }

  /** Read a directory of .warc files as the pages table. */
  def read(spark: SparkSession, dir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.warc")
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parse))
  }
}
