package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the DSv2 connector's per-file reader against Spark's native
  * vectorized parquet scan on the same data — the question is whether the
  * parquet-hadoop Group-materializing read path is a 100 TB bottleneck.
  *
  *   sbt "runMain graft.tools.ReaderBench /root/testdata/sf0.1"
  *
  * Three shapes × both readers, interleaved best-of-3:
  *   full   — all columns, full table count+hash
  *   narrow — one long column aggregated (column pruning)
  *   text   — the wide string column (the extraction-pipeline shape)
  */
object ReaderBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"${System.getProperty("java.io.tmpdir")}/graft_rdbench"
    val rootP = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(rootP))
      java.nio.file.Files.walk(rootP).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    val cat = new graft.spark.ParquetSnapshotCatalog(root)
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") * mult + col("rep")).drop("rep")
      .repartition(16)
    cat.commit(docs, "d")
    val nativePath = s"$root/native"
    docs.write.mode("overwrite").parquet(nativePath)

    def viaCat = spark.read.format("graft-catalog")
      .option("root", root).option("table", "d").load()
    def viaNative = spark.read.parquet(nativePath)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame => Long)] = Seq(
      ("full", df => df.select(sum(length(col("text"))), sum(col("doc_id")), count(lit(1)))
        .collect()(0).getLong(2)),
      ("narrow", df => df.agg(sum(col("doc_id"))).collect()(0).getLong(0)),
      ("text", df => df.select(sum(length(col("text")))).collect()(0).getLong(0)))

    val res = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (pass <- 1 to 3; (name, f) <- shapes; (src, df) <- Seq("cat" -> viaCat, "native" -> viaNative)) {
      val (t, v) = time(f(df))
      val k = s"$name/$src"
      if (t < res(k)) res(k) = t
      if (pass == 1) println(f"  pass1 $k%-14s $t%7.3f s (v=$v)")
    }
    println("best-of-3:")
    shapes.foreach { case (n, _) =>
      val c = res(s"$n/cat"); val p = res(s"$n/native")
      println(f"  $n%-7s cat=$c%7.3f s  native=$p%7.3f s  ratio=${c / p}%5.2fx")
    }
    spark.stop()
  }
}
