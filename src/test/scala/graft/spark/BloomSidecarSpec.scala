package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Per-file Bloom-filter sidecars: point lookups on a NON-clustered column
  * open ~1 file instead of the table, with prune-proofs by deletion and the
  * absent-key case opening ZERO files.
  */
class BloomSidecarSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String = {
    val d = Files.createTempDirectory("graftbloom").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def urls(from: Int, until: Int) = {
    val ss = spark; import ss.implicits._
    (from until until).map(i => (s"https://example.com/doc$i", i.toLong)).toDF("url", "v")
      .repartition(8) // urls scattered arbitrarily across files — the bloom's whole point
  }

  test("lookup on a non-clustered column: bloom keeps ~1 of 8 files — prune-proof by deleting the rest") {
    val root = tmp()
    val cat = new ParquetSnapshotCatalog(root)
    cat.commitWithBloom(urls(0, 400), "t", "url", bits = 8192)

    val target = "https://example.com/doc123"
    val all = cat.filesWithAddOrder("t", cat.currentSnapshot("t").get).map(_._1)
    val kept = cat.pruneFilesByBloom("t", "url", target)
    assert(kept.size < all.size, s"bloom kept ${kept.size} of ${all.size}")

    val hit = cat.readBloomLookup(spark, "t", "url", target).collect()
    assert(hit.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((target, 123L)))

    all.filterNot(kept.toSet).foreach(f => Files.delete(java.nio.file.Paths.get(f)))
    val hit2 = cat.readBloomLookup(spark, "t", "url", target).collect()
    assert(hit2.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((target, 123L)))
  }

  test("absent key: every file pruned, the lookup answers empty from metadata alone") {
    val root = tmp()
    val cat = new ParquetSnapshotCatalog(root)
    cat.commitWithBloom(urls(0, 400), "t", "url", bits = 8192)
    val kept = cat.pruneFilesByBloom("t", "url", "https://example.com/never-crawled")
    assert(kept.isEmpty, s"expected zero candidate files, got ${kept.size}")
    assert(cat.readBloomLookup(spark, "t", "url", "https://example.com/never-crawled").count() == 0)
  }

  test("appendWithBloom carries filters forward: lookups from both drops, each drop pays only its files") {
    val root = tmp()
    val cat = new ParquetSnapshotCatalog(root)
    cat.commitWithBloom(urls(0, 200), "t", "url", bits = 8192)
    cat.appendWithBloom(urls(200, 400), "t", "url", bits = 8192)

    Seq(("https://example.com/doc42", 42L), ("https://example.com/doc357", 357L)).foreach {
      case (u, v) =>
        val got = cat.readBloomLookup(spark, "t", "url", u).collect()
        assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((u, v)))
        val all = cat.filesWithAddOrder("t", cat.currentSnapshot("t").get).map(_._1)
        assert(cat.pruneFilesByBloom("t", "url", u).size < all.size)
    }
  }

  test("no sidecar → conservative keep; takedowns apply through the bloom-pruned read") {
    val root = tmp()
    val cat = new ParquetSnapshotCatalog(root)
    cat.commit(urls(0, 100), "t") // plain commit, no bloom
    val all = cat.filesWithAddOrder("t", cat.currentSnapshot("t").get).map(_._1)
    assert(cat.pruneFilesByBloom("t", "url", "https://example.com/doc5").toSet == all.toSet)

    val root2 = tmp()
    val cat2 = new ParquetSnapshotCatalog(root2)
    cat2.commitWithBloom(urls(0, 100), "t", "url", bits = 8192)
    cat2.deleteWhere("t", "url", Seq("https://example.com/doc5"))
    assert(cat2.readBloomLookup(spark, "t", "url", "https://example.com/doc5").count() == 0)
    assert(cat2.readBloomLookup(spark, "t", "url", "https://example.com/doc6").count() == 1)
  }
}
