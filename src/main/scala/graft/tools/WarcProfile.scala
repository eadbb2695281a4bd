package graft.tools

import org.apache.spark.sql.SparkSession

/** Component timing for the WARC round-trip path (write / read / extract),
  * to localize regressions the aggregate bench can't attribute.
  */
object WarcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/warc_profile"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val variants = sys.env.getOrElse("SPARK_GRAFT_VARIANTS", "100").toInt
    val pages = t("synthesize+persist") {
      val p = graft.spark.Pages.synthesize(spark, sfDir, variants)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    (1 to 2).foreach { i =>
      t(s"write$i") { graft.sources.Warc.write(pages, dir, gzip = true, http = true) }
      t(s"read$i") { graft.sources.Warc.read(spark, dir).toDF().selectExpr("sum(length(html))").collect() }
      t(s"readBinary$i") { graft.sources.Warc.readViaBinaryFile(spark, dir).toDF().selectExpr("sum(length(html))").collect() }
      t(s"extract$i") { graft.spark.ExtractJob.extract(graft.sources.Warc.read(spark, dir), "wp", 32).toDF().count() }
    }
    spark.stop()
  }
}
