package graft.tools

/** Micro-bench for CollapseHtmlKernelCalls: 3-call projection with the rule
  * OFF (3 parses/page) vs ON (1 parse/page) over the sf corpus.
  *
  *   sbt "runMain graft.tools.FusionBench /root/testdata/sf0.1"
  */
object FusionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HtmlFunctions.register(spark)
    graft.spark.Pages.synthesize(spark, sfDir).toDF()
      .write.mode("overwrite").parquet("/tmp/graft_fusion_bench")
    spark.read.parquet("/tmp/graft_fusion_bench").createOrReplaceTempView("fb")
    val sql = "SELECT sum(length(html_main_text(html)) + length(html_title(html)) + length(html_lang(html))) FROM fb"
    def time(label: String): Double = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); spark.sql(sql).collect(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"FUSION $label $best%.2f s (best of 3)")
      best
    }
    val off = time("rule-off")
    graft.functions.HtmlFunctions.registerRule(spark)
    val on = time("rule-on")
    println(f"FUSION speedup ${off / on}%.2fx")
    spark.stop()
  }
}
