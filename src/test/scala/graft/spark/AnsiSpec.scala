package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Every contract query must survive a session with ANSI mode ON (Spark 4's
  * default): an external driver invoking SparkEntry.queries with its own
  * session must not hit wrapping-arithmetic or implicit-cast failures.
  * (Round-1 minhash relied on wrapping 64-bit multiplication and threw here;
  * the xxhash64 permutation family fixed it — this spec keeps it fixed.)
  */
class AnsiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "true") // the point of this spec
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.GraftSqlExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("all contract queries complete under spark.sql.ansi.enabled=true") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        assert(fn(spark, sfDir).count() >= 0L)
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, s"ANSI-mode failures:\n${failures.mkString("\n")}")
  }
}
