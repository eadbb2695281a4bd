package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** The incremental curation loop: windowed changelog reads, gate
  * composition, companion-backed exactly-once appends, and the
  * crash-replays-are-no-ops watermark contract.
  */
class IncrementalCurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 60 distinct 6-char alpha-ish words — passes every gate. */
  private def goodText(id: Long): String =
    (0 until 60).map(w => f"w${id}%02dax$w%02d").mkString(" ")

  test("exactly-once incremental curation across drops, replays, and a watermark crash") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("inccur").toString
    val cat = new ParquetSnapshotCatalog(root)
    // drop 1: 10 passing docs + 2 that fail the token floor
    val drop1 = (1L to 10L).map(i => (i, goodText(i))) ++
      Seq((11L, "short doc"), (12L, "also short"))
    cat.append(drop1.toDF("doc_id", "text"), "raw")
    val rawSnap1 = cat.currentSnapshot("raw").get
    assert(IncrementalCurate.runOnce(spark, cat, "raw", "cur") === ((12L, 10L)))
    // drop 2: 10 fresh passing docs + an exact replay of doc 1's text
    // under a new id — the companion must reject it
    val drop2 = (21L to 30L).map(i => (i, goodText(i))) :+ (999L, goodText(1L))
    cat.append(drop2.toDF("doc_id", "text"), "raw")
    assert(IncrementalCurate.runOnce(spark, cat, "raw", "cur") === ((11L, 10L)),
      "only the window is processed; the replayed text is rejected")
    // nothing new → nothing read, nothing appended
    assert(IncrementalCurate.runOnce(spark, cat, "raw", "cur") === ((0L, 0L)))
    // crash-sim: the watermark write was lost (crash between append and
    // putMeta) — the whole drop-2 window replays and the digest companion
    // makes every row a no-op
    cat.putMeta("cur", IncrementalCurate.watermarkKey, rawSnap1.toString)
    assert(IncrementalCurate.runOnce(spark, cat, "raw", "cur") === ((11L, 0L)),
      "a replayed window must append nothing")
    // final table: the 20 passing docs exactly once, original ids
    val cur = cat.read(spark, "cur").select("doc_id").as[Long].collect().sorted
    assert(cur === ((1L to 10L) ++ (21L to 30L)).toArray)
    assert(cat.read(spark, "cur").select("text").distinct().count() === 20)
  }
}
