package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** Storage-partitioned joins (Iceberg SPJ shape): two catalog tables
  * written exact-clustered on the same identity transform join with ZERO
  * shuffle — the scans report `KeyGroupedPartitioning`, Spark aligns
  * equal-keyed partitions, and `EnsureRequirements` inserts no exchange.
  * The shuffle that dominates a 100 TB fact-to-fact join simply never
  * happens.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _
  private def cat = new ParquetSnapshotCatalog(root)

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graftspj").toFile.getAbsolutePath
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val langs = Seq("en", "de", "fr", "ja")
  private def docsDf(n: Int) = {
    val ss = spark; import ss.implicits._
    (0 until n).map(i => (i.toLong, langs(i % 4), s"text $i")).toDF("id", "lang", "text")
  }
  private def statsDf() = {
    val ss = spark; import ss.implicits._
    langs.zipWithIndex.map { case (l, i) => (l, i * 100L) }.toDF("lang", "boost")
  }

  private def read(t: String): DataFrame =
    spark.read.format("graft-catalog").option("root", root).option("table", t).load()

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange"))

  test("equal-keyed exact-clustered tables join with ZERO exchange; rows match the shuffle join") {
    cat.commitPartitionedExact(docsDf(80), "a", IdentityTransform("lang"))
    cat.commitPartitionedExact(statsDf(), "b", IdentityTransform("lang"))
    val j = read("a").join(read("b"), "lang").selectExpr("id", "lang", "boost")
    assert(exchanges(j) == 0, j.queryExecution.executedPlan.toString)
    val rows = j.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected = (0 until 80).map { i =>
      (i.toLong, langs(i % 4), (i % 4) * 100L)
    }.toSet
    assert(rows == expected)
  }

  test("keyed groupBy on the partition column also needs no exchange") {
    val g = read("a").groupBy("lang").count()
    assert(exchanges(g) == 0, g.queryExecution.executedPlan.toString)
    assert(g.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      langs.map(_ -> 20L).toMap)
  }

  test("range-clustered layout (commitPartitioned) does NOT claim key grouping — join shuffles, rows stay right") {
    cat.commitPartitioned(docsDf(80), "c", IdentityTransform("lang"))
    cat.commitPartitionedExact(statsDf(), "d", IdentityTransform("lang"))
    val j = read("c").join(read("d"), "lang")
    // partitionValuesAt must refuse a layout that cannot pin one value per
    // file… unless range clustering happened to produce it; assert on the
    // PLANNING SURFACE, not the plan
    val pinned = cat.partitionValuesAt("c", cat.currentSnapshot("c").get)
    if (pinned.isEmpty) assert(exchanges(j) > 0)
    assert(j.count() == 80)
  }

  test("SPJ composes with row-level deletes (tombstoned rows vanish, still zero exchange)") {
    cat.commitPartitionedExact(docsDf(40), "e", IdentityTransform("lang"), statsCols = Seq("id"))
    cat.deleteWhere("e", "id", Seq("0", "1"))
    cat.deleteMatching(spark, "e", "id = 2")
    val j = read("e").join(read("b"), "lang").selectExpr("id", "boost")
    assert(exchanges(j) == 0, j.queryExecution.executedPlan.toString)
    assert(j.collect().map(_.getLong(0)).toSet == (3 until 40).map(_.toLong).toSet)
  }

  test("one side missing a partition value still aligns (pushPartValues padding)") {
    val ss = spark; import ss.implicits._
    cat.commitPartitionedExact(
      Seq(("en", 1L), ("de", 2L)).toDF("lang", "v"), "f", IdentityTransform("lang"))
    val j = read("a").join(read("f"), "lang").selectExpr("id", "v")
    assert(exchanges(j) == 0, j.queryExecution.executedPlan.toString)
    assert(j.count() == 40) // only en+de rows of a match
  }
}
