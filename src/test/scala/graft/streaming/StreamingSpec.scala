package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Structured-Streaming extraction: landing-dir parquet → kernel → parquet
  * sink, exactly-once via checkpoint; plus the watermarked window agg.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graftstream").toString

  test("streaming extraction drains a landing dir and matches the batch kernel") {
    val in = tmp(); val out = tmp(); val ckpt = tmp()
    graft.spark.Pages.synthesize(spark, sfDir).toDF()
      .write.mode("overwrite").parquet(in)
    val q = ExtractStream.run(spark, in, out, ckpt)
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() === 500)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("concat('https://example.com/', lang, '/', source, '/doc', doc_id, '/v0') as url", "text")
    assert(got.join(docs, "url").where(col("main_text") =!= col("text")).count() === 0)
    // restart with same checkpoint: no new input → no duplicate output
    val q2 = ExtractStream.run(spark, in, out, ckpt)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(out).count() === 500)
  }

  test("watermarked window agg equals the batch groupBy on the events table") {
    val batch = ExtractStream.eventCounts(spark.read.parquet(s"$sfDir/events.parquet"))
      .collect().map(_.toSeq).sortBy(_.toString())
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(expr("unix_timestamp(date_trunc('HOUR', ts))").as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("sum_value_cents"))
      .collect().map(_.toSeq).sortBy(_.toString())
    assert(batch.toSeq === expected.toSeq)
  }
}
