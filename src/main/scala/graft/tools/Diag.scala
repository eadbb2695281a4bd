package graft.tools

import org.apache.spark.sql.functions._

/** One-off phase diagnosis over an existing chunked pages table. */
object Diag {
  def main(args: Array[String]): Unit = {
    val pagesDir = args(0)
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def chunk0 = spark.read.parquet(pagesDir).where(col("chunk") === 0)
      .select("url", "warc_ts", "html", "text", "lang").as[graft.spark.PageRow]
    time("read+count")(chunk0.toDF().count())
    time("read+sum(len(html))")(chunk0.toDF().selectExpr("sum(length(html))").collect())
    time("extract+count")(graft.spark.ExtractJob.extract(chunk0, "d", 32).toDF().count())
    time("extract+count again")(graft.spark.ExtractJob.extract(chunk0, "d", 32).toDF().count())
    time("extract+write")(graft.spark.ExtractJob.extract(chunk0, "d", 32)
      .write.mode("overwrite").parquet("/tmp/diag_out"))
    time("read-extracted+count")(spark.read.parquet("/tmp/diag_out").count())
    spark.stop()
  }
}
