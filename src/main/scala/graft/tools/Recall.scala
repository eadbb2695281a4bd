package graft.tools

/** Prints ANN recall vs brute force for the approximate operators (the two
  * rows-only contract queries) — run to re-check flake margins after tuning:
  *   sbt "runMain graft.tools.Recall /root/testdata/sf0.001"
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Bench.mkSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = graft.operators.Ann.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val a = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      exact.count(a.contains).toDouble / exact.size
    }
    println(f"RECALL lsh=${recall(graft.operators.Ann.lshTopK(emb))}%.3f ivf=${recall(graft.operators.Ann.ivfTopK(emb))}%.3f ivfpq=${recall(graft.operators.Ann.ivfPqTopK(emb))}%.3f")
    spark.stop()
  }
}
