package graft.tools

import java.nio.file.{Files, Paths}

/** Regenerates the checked-in golden hashes (FIXTURES.md §3): for every
  * sf0.001 document, render the variant-0 page and record
  * sha256(main_text) / sha256(full_text) / sha256(fidelity_text) from the
  * SEQUENTIAL oracle kernel (no Spark). Run only when extraction semantics
  * intentionally change:
  *
  *   sbt "runMain graft.tools.GoldenGen"
  */
object GoldenGen {
  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  /** (url, mainSha, fullSha, fidSha) rows for one sf dir, oracle-only. */
  def rows(sfDir: String): Seq[String] = {
    // read documents.parquet via parquet-hadoop already on the classpath
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
    val out = docs.sortBy(_.getLong(0)).map { r =>
      val (id, text, lang, source) = (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      val html = graft.spark.Pages.render(id, 0, text, lang, source)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val ex = graft.dom.Extractor.extract(html)
      val (fid, _) = graft.dom.Extractor.fidelityText(html)
      s"${graft.spark.Pages.urlOf(id, 0, lang, source)}\t${sha256(ex.mainText)}\t${sha256(ex.text)}\t${sha256(fid)}"
    }.toSeq
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val target = Paths.get("src/test/resources/golden/sha256_sf0.001.tsv")
    Files.createDirectories(target.getParent)
    Files.writeString(target, rows(sfDir).mkString("", "\n", "\n"))
    println(s"wrote $target")
  }
}
