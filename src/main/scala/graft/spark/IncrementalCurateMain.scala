package graft.spark

import org.apache.spark.sql.SparkSession

/** The continuous-curation composition as a spark-submit surface: crawl
  * drops arrive as micro-batches through the REAL exactly-once streaming
  * sink (foreachBatch → appendBatch on the RAW catalog table), and the
  * incremental curation loop runs after every batch — changelog window in,
  * integer-exact gates, digest-companion-deduped append to CURATED,
  * crash-replayable watermark. One JSON line per drop plus a final summary.
  *
  * Usage: runMain graft.spark.IncrementalCurateMain [sfDir] [rootDir] [drops]
  */
object IncrementalCurateMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val root = if (args.length > 1) args(1) else "/tmp/graft_inccur_main"
    val nDrops = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rootP = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(rootP))
      java.nio.file.Files.walk(rootP).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    val cat = new ParquetSnapshotCatalog(root)
    // drops collected once up front: the drive simulates a crawl feed, so
    // each batch must be a literal row set, not a re-planned query
    val drops = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", s"doc_id % $nDrops AS drop")
      .as[(Long, String, Long)].collect().groupBy(_._3)

    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val t0 = System.nanoTime()
    (0 until nDrops).foreach { d =>
      mem.addData(drops(d.toLong).map(r => (r._1, r._2)).toSeq: _*)
      // each drop is one AvailableNow run resuming the shared checkpoint —
      // the production "scheduled batch over a stream source" pattern; the
      // trigger terminates itself after draining the new offsets
      val sink = graft.streaming.ExtractStream.catalogSink(
        mem.toDF().toDF("doc_id", "text"), cat, "raw", s"$root/ckpt")
      sink.processAllAvailable()
      sink.stop()
      val (n, a) = IncrementalCurate.runOnce(spark, cat, "raw", "cur")
      println(s"""{"metric":"curate_drop","drop":$d,"window_rows":$n,"appended":$a}""")
    }
    val curated = cat.read(spark, "cur").count()
    val raw = cat.read(spark, "raw").count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"incremental_curate","drops":$nDrops,"raw_docs":$raw,"curated_docs":$curated,"raw_snapshots":${cat.snapshots("raw").size},"wall_sec":$wall%.2f}""")
    spark.stop()
  }
}
