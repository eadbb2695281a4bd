package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.PageRow
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** WARC/1.0 source + sink — Common Crawl's native container format, so the
  * engine can ingest real crawl archives without a conversion step.
  *
  * Read path: `binaryFile` datasource (one task per archive file — exactly
  * how production Common-Crawl jobs parallelize, since WARC members are
  * gzip-concatenated per file and not arbitrarily splittable; CC files are
  * ~1 GB, well under the datasource's 2 GB ceiling) → STREAMING per-file
  * record parse (executor memory stays O(record), never O(inflated file)):
  *
  *   - plain `.warc` and gzipped `.warc.gz` both supported; the CC layout
  *     (each record its own gzip member, members concatenated) decompresses
  *     transparently through `GZIPInputStream`, which continues across
  *     member boundaries;
  *   - only `WARC-Type: response` records yield pages (warcinfo / request /
  *     metadata records are skipped, as in real CC files);
  *   - a response block starting with `HTTP/` has its HTTP response headers
  *     stripped — the page html is the entity body, as CC stores it.
  *
  * Record layout written (WARC/1.0 `response` records, CC-shaped):
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Target-URI: <url>\r\n
  *   WARC-Date: <ISO-8601>\r\n
  *   Content-Length: <n>\r\n          (length of the HTTP block)
  *   \r\n
  *   HTTP/1.1 200 OK\r\n ... \r\n\r\n <html bytes>
  *   \r\n\r\n
  */
object Warc {

  /** HTTP response wrapper around the page bytes (what a crawler stores). */
  def httpBlock(body: Array[Byte]): Array[Byte] = {
    val h = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](h.length + body.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out
  }

  /** Serialize one record. `http = true` wraps the body in an HTTP response
    * block (the Common-Crawl shape); `http = false` stores the raw body (the
    * round-1 fixture shape, still parsed).
    */
  def record(url: String, tsMillis: Long, body: Array[Byte], http: Boolean = false,
      warcType: String = "response"): Array[Byte] = {
    val block = if (http) httpBlock(body) else body
    val date = java.time.Instant.ofEpochMilli(tsMillis).toString
    val header =
      s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $url\r\nWARC-Date: $date\r\nContent-Length: ${block.length}\r\n\r\n"
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + block.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(block, 0, out, h.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write pages as .warc / .warc.gz files, one per partition (executors
    * write via java.nio against the shared filesystem; on a cluster this
    * targets a shared mount — for object stores route through the Hadoop FS
    * API instead). `gzip = true` writes each record as its OWN gzip member
    * (CC layout: members are independently seekable/decompressable).
    * Clears stale part files first so a rerun with fewer partitions cannot
    * leave orphans that read() would re-ingest.
    */
  def write(pages: Dataset[PageRow], dir: String, gzip: Boolean = false, http: Boolean = false): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    scala.util.Using.resource(java.nio.file.Files.list(d)) { s =>
      s.iterator().asScala
        .filter { p => val n = p.getFileName.toString; n.endsWith(".warc") || n.endsWith(".warc.gz") }
        .foreach(java.nio.file.Files.delete)
    }
    pages.foreachPartition { (it: Iterator[PageRow]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val ext = if (gzip) "warc.gz" else "warc"
      val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.$ext")
      val os = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path), 1 << 16)
      try it.foreach { p =>
        val rec = record(p.url, p.warc_ts.getTime, p.html, http)
        if (gzip) {
          val gz = new java.util.zip.GZIPOutputStream(os)
          gz.write(rec)
          gz.finish() // member trailer only; the file stream stays open
        } else os.write(rec)
      }
      finally os.close()
    }
  }

  /** Streaming record parse; `in` must already be decompressed. */
  def parseStream(in: java.io.InputStream): Iterator[PageRow] = new Iterator[PageRow] {
    private val bin = new java.io.BufferedInputStream(in, 1 << 16)
    private var nextRow: PageRow = advance()

    /** Next CRLF-terminated line (terminator dropped), or null at EOF. */
    private def line(): String = {
      val sb = new java.lang.StringBuilder(64)
      var c = bin.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = bin.read()
      }
      sb.toString
    }

    private def advance(): PageRow = {
      var l0 = line()
      while (l0 != null) {
        if (l0.startsWith("WARC/")) {
          var typ: String = null
          var url: String = null
          var date: String = null
          var len = -1
          var h = line()
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) {
              val k = h.substring(0, i).trim
              val v = h.substring(i + 1).trim
              k match {
                case "WARC-Type" => typ = v
                case "WARC-Target-URI" => url = v
                case "WARC-Date" => date = v
                // malformed length → skip the record, never kill the task
                case "Content-Length" => len = v.toIntOption.getOrElse(-1)
                case _ => ()
              }
            }
            h = line()
          }
          if (len >= 0) {
            val block = bin.readNBytes(len)
            if (block.length == len && (typ == null || typ == "response") && url != null) {
              val body = stripHttpHeaders(block)
              val ts = new java.sql.Timestamp(
                if (date != null) java.time.Instant.parse(date).toEpochMilli else 0L)
              return PageRow(url, ts, body, null, null)
            }
          }
        }
        l0 = line()
      }
      null
    }

    def hasNext: Boolean = nextRow != null
    def next(): PageRow = { val r = nextRow; nextRow = advance(); r }
  }

  /** CC response blocks wrap the page in an HTTP response; the html is the
    * entity body after the header terminator. Raw blocks pass through.
    */
  def stripHttpHeaders(block: Array[Byte]): Array[Byte] = {
    if (block.length < 5 || block(0) != 'H' || block(1) != 'T' || block(2) != 'T' ||
      block(3) != 'P' || block(4) != '/') return block
    var i = 0
    while (i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' && block(i + 2) == '\r' && block(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(block, i + 4, block.length)
      i += 1
    }
    block
  }

  /** Legacy whole-array entry (fixtures); delegates to the stream parser. */
  def parse(bytes: Array[Byte]): Iterator[PageRow] =
    parseStream(new java.io.ByteArrayInputStream(bytes))

  /** Decompressing entry: gzip magic → multi-member GZIPInputStream. */
  def parseFile(bytes: Array[Byte]): Iterator[PageRow] = {
    val in: java.io.InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 1 << 16)
      else new java.io.ByteArrayInputStream(bytes)
    parseStream(in)
  }

  /** Read a directory of .warc / .warc.gz files as the pages table. */
  def read(spark: SparkSession, dir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.warc*")
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseFile))
  }
}
