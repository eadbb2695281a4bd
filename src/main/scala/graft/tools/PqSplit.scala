package graft.tools

import org.apache.spark.sql.SparkSession

/** IVF-PQ cost/recall split across the refine knob (TODO round-4/5 item:
  * "measure ADC vs refine cost split"): times ivfPqTopK at refine factors
  * 1/4/16 against the brute-force ground truth. refine=1 approximates the
  * pure-ADC floor (the shortlist is barely re-ranked); the deltas above it
  * are what the exact-refine join costs, and the recall column shows what
  * that buys. Usage: runMain graft.tools.PqSplit <sfDir>
  */
object PqSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()

    val truth = graft.operators.Ann.bruteForceTopK(emb, nQueries = 20, k = 10)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet

    def once(refine: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val got = graft.operators.Ann.ivfPqTopK(emb, nQueries = 20, k = 10,
        refine = refine, nHint = n)
        .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, got.intersect(truth).size.toDouble / truth.size)
    }
    once(4) // warm
    val rows = Seq(1, 4, 16).map { rf =>
      val (sec, rec) = Seq(once(rf), once(rf)).minBy(_._1) match { case p => p }
      f""""refine_$rf":{"sec":$sec%.3f,"recall":$rec%.3f}"""
    }
    println(s"""{"metric":"ivfpq_split","n":$n,${rows.mkString(",")}}""")
    spark.stop()
  }
}
