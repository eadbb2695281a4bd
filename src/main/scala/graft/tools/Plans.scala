package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the load-bearing queries so plan
  * regressions (lost pushdown, surprise shuffles, missed broadcasts) are
  * visible:  sbt "runMain graft.tools.Plans /root/testdata/sf0.001"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q_filter_orders", "q_join_region", "q1_agg", "q_extract_roundtrip",
      "q_dedup_exact", "q_ann_cosine", "q_dedup_minhash", "q_dedup_simhash",
      "q_embed_near_dups", "q_extract_spans")) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
