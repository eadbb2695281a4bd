package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println(s"ENTRY rows=${df.count()} cols=${df.columns.mkString(",")}")
    spark.stop()
  }
}
