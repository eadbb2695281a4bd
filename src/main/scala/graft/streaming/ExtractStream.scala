package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.spark.{PageRow, Extracted}

/** Structured-Streaming surface of the engine. The batch path
  * (ExtractJob + chunk resume) is the production 100 TB story per
  * BASELINE.json's north rule; this module covers the continuous-ingest
  * shape: a crawler keeps appending page files to a landing directory and
  * extraction keeps up incrementally, exactly-once via the streaming
  * checkpoint. The kernel is the same sequential oracle — stateless per row,
  * so the streaming plan is a narrow map with file-source parallelism.
  */
object ExtractStream {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  /** Landing-dir parquet stream → extraction → parquet sink. `AvailableNow`
    * drains the backlog then stops (use `Trigger.ProcessingTime` for a
    * long-lived job).
    */
  def run(spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream.schema(pageSchema).parquet(inDir).as[PageRow]
    extractStream(pages)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The streaming extraction transform (also used on MemoryStream in tests). */
  def extractStream(pages: Dataset[PageRow]): Dataset[Extracted] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val sink = new graft.dom.ExtractSink
      it.map { p =>
        val r = graft.dom.Extractor.extractInto(p.html, sink)
        Extracted(p.url, p.lang, r.mainText, r.text, r.spans, r.errors,
          r.spans.length, r.nTokens, r.nTags, r.nErrors, r.truncated,
          p.html.length.toLong)
      }
    }
  }

  /** Watermarked tumbling-window event aggregation (the streaming-analytics
    * operator family: event-time window + late-data bound + partial aggs).
    * Works on a streaming OR batch events Dataset — semantics match
    * SparkEntry's batch q_events_window oracle.
    */
  def eventCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("sum_value_cents"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value_cents"))
}
