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

  test("single-pass report: the whole pipeline fires a bounded job count") {
    // the round-3 review found 8 separate count() actions each re-deriving
    // its stage; the report is now ONE aggregation over a doc-keyed flags
    // frame and the working set is persisted. Count Spark jobs over a full
    // re-run (AQE materializes each exchange as its own job, so the floor
    // is plan-shaped, not action-shaped): the old sequential-count shape
    // measured 153 jobs at this sf, the folded shape 97 — pin the
    // regression boundary between them.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val dir2 = java.nio.file.Files.createTempDirectory("curate2").toString
      val rep2 = CurateMain.run(spark, sfDir, dir2)
      // listener events are async — drain before reading the counter
      Thread.sleep(1000)
      val n = jobs.get()
      info(s"pipeline jobs: $n")
      assert(n > 0 && n < 120, s"job count regressed: $n (report should be one aggregation; old shape = 153)")
      // and the re-run reproduces the stage counts bit-for-bit
      assert(rep2.replaceAll("\"out\":\"[^\"]*\"", "").replaceAll("\"wall_sec\":[0-9.]+", "")
        === report.replaceAll("\"out\":\"[^\"]*\"", "").replaceAll("\"wall_sec\":[0-9.]+", ""))
    } finally spark.sparkContext.removeSparkListener(listener)
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
