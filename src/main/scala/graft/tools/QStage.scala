package graft.tools

/** Stage-by-stage timing of the exact q_warc_roundtrip path. */
object QStage {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"QSTAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val warcDir = s"${System.getProperty("java.io.tmpdir")}/graft_warc_${sfDir.hashCode.toHexString}"
    (1 to 2).foreach { i =>
      t(s"write$i (incl synth)") {
        graft.sources.Warc.write(graft.spark.Pages.synthesize(spark, sfDir), warcDir, gzip = true, http = true)
      }
      t(s"read-count$i") { graft.sources.Warc.read(spark, warcDir).toDF().count() }
      t(s"read-extract$i") {
        graft.spark.ExtractJob.extract(graft.sources.Warc.read(spark, warcDir), "warc", 32).toDF().count()
      }
    }
    spark.stop()
  }
}
