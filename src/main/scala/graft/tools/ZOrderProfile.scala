package graft.tools

/** Stage-by-stage timing of the exact q_zorder path — where do its bench
  * seconds go (commit, quantiles, shift probe, rewrite, stats, probes)?
  */
object ZOrderProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"ZPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_zprof_$pass"
      val rootP = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(rootP))
        java.nio.file.Files.walk(rootP).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      val cat = new graft.spark.ParquetSnapshotCatalog(root)
      val e = spark.read.parquet(s"$sfDir/events.parquet")
        .selectExpr("event_id", "user_id", "event_type")
      t(s"p$pass commit") { cat.commit(e, "t") }
      t(s"p$pass compactZOrder") { cat.compactZOrder(spark, "t", Seq("event_id", "user_id"), nFiles = 16) }
      // replicate compactZOrder's internal phases on the SAME table state
      // (post-rewrite data, same row count) to see where its seconds go
      locally {
        import org.apache.spark.sql.functions.{expr, approx_count_distinct}
        val cur = t(s"p$pass int-read") { val d = cat.read(spark, "t"); d.count(); d }
        val probs = (1 until 256).map(_.toDouble / 256).toArray
        val bounds = t(s"p$pass int-quantiles") {
          Seq("event_id", "user_id").map(c => cur.stat.approxQuantile(c, probs, 0.001))
        }
        val withB = Seq("event_id", "user_id").zip(bounds).zipWithIndex.foldLeft(cur) {
          case (d, ((c, bs), i)) =>
            val arr = bs.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
            d.withColumn(s"_zb$i", expr(s"size(filter($arr, b -> CAST(`$c` AS DOUBLE) >= b))"))
        }
        val zTerms = for (i <- 0 until 2; j <- 0 until 8)
          yield s"shiftleft(CAST(shiftright(_zb$i, $j) & 1 AS BIGINT), ${j * 2 + i})"
        val withZv = withB.withColumn("_zv", expr(zTerms.mkString(" + ")))
        t(s"p$pass int-acd") {
          val cand = (0 to 12).reverse
          withZv.agg(
            approx_count_distinct(expr(s"shiftright(_zv, ${cand.head})")).as("d0"),
            cand.tail.map(s => approx_count_distinct(expr(s"shiftright(_zv, $s)")).as(s"d$s")): _*).head()
        }
        t(s"p$pass int-rewrite") {
          withZv.withColumn("_zf", expr("shiftright(_zv, 4)"))
            .repartitionByRange(16, org.apache.spark.sql.functions.col("_zf"))
            .sortWithinPartitions("_zv")
            .drop("_zv", "_zf", "_zb0", "_zb1")
            .write.mode("overwrite").parquet(s"$root/_proftmp")
        }
        t(s"p$pass int-stats") {
          spark.read.parquet(s"$root/_proftmp")
            .groupBy(org.apache.spark.sql.functions.input_file_name())
            .agg(org.apache.spark.sql.functions.min("event_id"),
              org.apache.spark.sql.functions.max("event_id"),
              org.apache.spark.sql.functions.min("user_id"),
              org.apache.spark.sql.functions.max("user_id"),
              org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
            .collect()
        }
      }
      t(s"p$pass probe-event") {
        cat.readPruned(spark, "t", "event_id", "100", "250")
          .where("event_id BETWEEN 100 AND 250").count()
      }
      t(s"p$pass probe-user") {
        cat.readPruned(spark, "t", "user_id", "40", "45")
          .where("user_id BETWEEN 40 AND 45").count()
      }
    }
    spark.stop()
  }
}
