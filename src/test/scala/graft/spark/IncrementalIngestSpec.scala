package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Incremental-append dedup invariants: cross-drop duplicates never
  * re-land, re-dropping is idempotent, within-drop dups keep the first
  * arrival, the fast-append preserves time travel, and a crash between the
  * data commit and the companion commit is detected and repaired (the
  * companion can lag, never lead — duplicates are recoverable, lost rows
  * are not).
  */
class IncrementalIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def freshCat(name: String): (ParquetSnapshotCatalog, String) = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ingest_spec_$name"
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    (new ParquetSnapshotCatalog(root), root)
  }

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private def ids(cat: ParquetSnapshotCatalog, table: String = "t"): Set[Long] =
    cat.read(spark, table).select("doc_id").collect().map(_.getLong(0)).toSet

  test("cross-drop duplicates never re-land; fresh texts do") {
    val (cat, _) = freshCat("cross")
    val (_, n1) = IncrementalIngest.appendDeduped(spark, cat, "t", df(1L -> "aa", 2L -> "bb"))
    val (_, n2) = IncrementalIngest.appendDeduped(spark, cat, "t", df(10L -> "aa", 11L -> "cc"))
    assert(n1 == 2 && n2 == 1)
    assert(ids(cat) == Set(1L, 2L, 11L))
  }

  test("re-dropping the same batch is idempotent (0 appended, snapshot unchanged)") {
    val (cat, _) = freshCat("idem")
    val (s1, _) = IncrementalIngest.appendDeduped(spark, cat, "t", df(1L -> "aa", 2L -> "bb"))
    val (s2, n2) = IncrementalIngest.appendDeduped(spark, cat, "t", df(1L -> "aa", 2L -> "bb"))
    assert(n2 == 0 && s2 == s1)
    assert(ids(cat) == Set(1L, 2L))
  }

  test("within-drop duplicate texts keep the first arrival (min doc_id)") {
    val (cat, _) = freshCat("indrop")
    val (_, n) = IncrementalIngest.appendDeduped(spark, cat, "t",
      df(5L -> "same", 3L -> "same", 7L -> "other"))
    assert(n == 2)
    assert(ids(cat) == Set(3L, 7L))
  }

  test("fast-append preserves time travel: the prior snapshot still reads its own rows") {
    val (cat, _) = freshCat("tt")
    val (s1, _) = IncrementalIngest.appendDeduped(spark, cat, "t", df(1L -> "aa"))
    IncrementalIngest.appendDeduped(spark, cat, "t", df(2L -> "bb"))
    val old = cat.readSnapshot(spark, "t", s1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(old == Set(1L) && ids(cat) == Set(1L, 2L))
  }

  test("crash between data and companion commits: lag detected, repaired, dedup stays exact") {
    val (cat, _) = freshCat("crash")
    IncrementalIngest.appendDeduped(spark, cat, "t", df(1L -> "aa"))
    // crash-sim: the data commit of a second drop lands, the companion
    // commit never does (data-first ordering — the recoverable direction)
    cat.append(df(2L -> "bb"), "t")
    // next drop: repair rebuilds the companion from the table, so "bb"
    // (companion-missing) must still be rejected and "cc" admitted
    val (_, n) = IncrementalIngest.appendDeduped(spark, cat, "t", df(20L -> "bb", 21L -> "cc"))
    assert(n == 1)
    assert(ids(cat) == Set(1L, 2L, 21L))
  }
}
