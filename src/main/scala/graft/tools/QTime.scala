package graft.tools

/** Time individual contract queries: runMain graft.tools.QTime <sfDir> q1 q2 ...
  * (each run twice; both times printed).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"QTIME $q pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
