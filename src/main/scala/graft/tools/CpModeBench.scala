package graft.tools

/** Single-thread kernel throughput: byte mode (pure-ASCII pages) vs
  * codepoint mode (same pages + one non-ASCII char → wholesale fallback).
  * Decides whether a per-segment mixed mode is worth the complexity.
  */
object CpModeBench {
  def main(args: Array[String]): Unit = {
    val docs = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text", "lang", "source").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      spark.stop()
      d
    }
    val reps = 40 // ~45 MB per timed pass
    val ascii = Array.tabulate(docs.length * reps) { k =>
      val (id, t, l, s) = docs(k % docs.length)
      graft.spark.Pages.render(id, k / docs.length, t, l, s).getBytes("UTF-8")
    }
    val nonAscii = Array.tabulate(docs.length * reps) { k =>
      val (id, t, l, s) = docs(k % docs.length)
      graft.spark.Pages.render(id, k / docs.length, t + " café", l, s).getBytes("UTF-8")
    }
    val sink = new graft.dom.ExtractSink
    def run(pages: Array[Array[Byte]], label: String): Unit = {
      // warm-up + best of 3
      (0 until 2).foreach(_ => pages.foreach(p => graft.dom.Extractor.extractInto(p, sink)))
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        pages.foreach(p => graft.dom.Extractor.extractInto(p, sink))
        (System.nanoTime() - t0) / 1e9
      }.min
      val mb = pages.map(_.length.toLong).sum / 1048576.0
      println(f"CPMODE $label ${mb / best}%.1f MB/s (${mb}%.1f MB in $best%.2f s)")
    }
    run(ascii, "byte-mode  ")
    run(nonAscii, "cp-mode    ")
  }
}
