package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing for dsirWeights: which pass dominates. */
object DsirDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DSIR $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val bucket = s"CAST(conv(substr(md5(bg), 1, 8), 16, 10) AS BIGINT) % 256"
    val bg = docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "lang",
        "CASE WHEN size(ws) < 2 THEN array() ELSE transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1])) END AS bgs")
      .selectExpr("doc_id", "lang", "explode(bgs) AS bg")
    // alternative: posexplode the word array, concat neighbors — no
    // higher-order functions, everything codegen'd
    val bg2 = docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "lang", "ws", "posexplode(ws) AS (pos, w1)")
      .where("pos < size(ws) - 1")
      .selectExpr("doc_id", "lang", "concat(w1, ' ', ws[pos + 1]) AS bg")
    (1 to 2).foreach { i =>
      t(s"explode-count$i") { bg.count() }
      t(s"posexplode-count$i") { bg2.count() }
      t(s"posexplode-bucket$i") { bg2.selectExpr(s"$bucket AS bkt").groupBy("bkt").count().collect() }
      t(s"bucket-count$i") { bg.selectExpr(s"$bucket AS bkt").groupBy("bkt").count().collect() }
      t(s"md5-only$i") { bg.selectExpr("md5(bg) AS m").selectExpr("max(m)").collect() }
      t(s"conv-only$i") { bg.selectExpr(s"$bucket AS bkt").selectExpr("max(bkt)").collect() }
      t(s"full$i") { graft.operators.TextOps.dsirWeights(
        docs.select("doc_id", "text"), docs.where("lang='en'").select("text")).count() }
    }
    spark.stop()
  }
}
