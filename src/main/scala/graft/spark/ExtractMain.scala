package graft.spark

import org.apache.spark.sql.SparkSession

/** The production job entrypoint (spark-submit target):
  *
  *   spark-submit --class graft.spark.ExtractMain app.jar \
  *     <sfDir> <outDir> <runId> [chunks=4] [partitionsPerChunk=32] [variants=1]
  *
  * Synthesizes (or at a real deployment: scans) the pages table, runs the
  * chunked resumable extraction, commits each chunk's data + lineage, then
  * commits the final snapshot into the ParquetSnapshotCatalog. Re-running
  * with the same runId resumes: completed chunks (those with lineage rows)
  * are skipped.
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val runId = args(2)
    val chunks = if (args.length > 3) args(3).toInt else 4
    val parts = if (args.length > 4) args(4).toInt else 32
    val variants = if (args.length > 5) args(5).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.currentTimeMillis()
    val pages = Pages.synthesize(spark, sfDir, variants)
    ExtractJob.runChunked(pages, outDir, runId, chunks, parts)
    val data = spark.read.parquet(s"$outDir/data")
    val docs = data.count()
    val cat = new ParquetSnapshotCatalog(outDir)
    val snap = cat.commit(data, "extracted")
    val lineage = spark.read.parquet(s"$outDir/lineage")
    val bytes = lineage.selectExpr("sum(bytes)").collect()(0).getLong(0)
    val ms = System.currentTimeMillis() - t0
    println(f"EXTRACT_MAIN done runId=$runId snapshot=$snap docs=$docs bytes=$bytes wall_ms=$ms docs_per_sec=${docs * 1000.0 / ms}%.1f mb_per_sec=${bytes / 1048576.0 * 1000.0 / ms}%.2f")
    spark.stop()
  }
}
