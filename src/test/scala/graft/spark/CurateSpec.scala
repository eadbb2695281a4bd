package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: WARC ingest → extract → features →
  * quality floor → exact + near-dup dedup → curated parquet. Asserts the
  * invariants a downstream training job relies on.
  */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var outDir: String = _
  private var report: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outDir = java.nio.file.Files.createTempDirectory("curate").toString
    report = CurateMain.run(spark, sfDir, outDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pipeline runs end-to-end and reports sane stage counts") {
    assert(report.contains("\"metric\":\"curate\""))
    assert(report.contains("\"docs_in\":500"))
    assert(report.contains("\"after_blocklist\":"))
    assert(report.contains("\"after_gopher\":"))
    assert(report.contains("\"after_repetition\":"))
    assert(report.contains("\"contaminated\":"))
    // the synthetic corpus carries no emails/phone shapes — the PII scrub
    // must be a byte-level no-op (also protects the content contract below)
    assert(report.contains("\"pii_docs\":0"))
  }

  test("curated output: nonempty, no duplicate texts, quality floor holds") {
    val out = spark.read.parquet(s"$outDir/curated.parquet")
    val n = out.count()
    assert(n > 0 && n <= 500)
    assert(out.select("text").distinct().count() === n, "exact duplicates survived")
    assert(out.where(col("n_tokens") < 20).count() === 0L, "quality floor violated")
    assert(out.where(col("n_tokens") < 50).count() === 0L, "gopher word floor violated")
    // curated text must be the extraction output verbatim (content contract)
    val bad = out.join(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("text").as("orig")),
      col("text") === col("orig"), "left_anti").count()
    assert(bad === 0L, s"$bad curated rows whose text is not a source document text")
  }
}
