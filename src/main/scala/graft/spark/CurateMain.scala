package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Warc
import graft.operators.{Dedup, TextOps}

/** End-to-end training-data curation pipeline — the composed product
  * surface: crawl archive in, curated text corpus out.
  *
  *   WARC ingest (charset-normalized, streaming DSv2 reader)
  *     → extraction kernel (tokenizer + tree construction + boilerplate
  *       strip; narrow mapPartitions, lineage rows on the side)
  *     → URL blocklist gate (UT1-style category lists, broadcast domain
  *       rules + codegen'd path keywords — the cheapest filter, first)
  *     → text features (token count, language ID)
  *     → quality floor (n_tokens ≥ minTokens)
  *     → Gopher rule gate (word-count/word-length bounds, symbol ratios,
  *       alphabetic-word fraction — the integer-exact conjunction)
  *     → repetition floor (Gopher-style: top-word fraction ≤ maxTopWordFrac)
  *     → PII scrub (emails/phones → typed placeholders; a byte-level no-op
  *       on clean text — the content contract survives)
  *     → exact dedup (md5 keeper per text)
  *     → MinHash/LSH near-dup removal (verified Jaccard ≥ 0.6, connected
  *       components over the pair set; each cluster keeps its min doc_id)
  *     → decontamination (drop docs sharing an 8-word n-gram with the
  *       held-out eval slice; eval grams broadcast)
  *     → curated parquet + one JSON report line with per-stage counts.
  *
  * Every stage is one of the engine's tested operators; the composition
  * adds no new shuffles beyond each operator's own (extraction is narrow;
  * dedup stages key on doc_id/digests). At 100 TB each stage is exactly
  * this plan with more partitions.
  *
  * Usage: runMain graft.spark.CurateMain [sfDir] [outDir]
  * (the sf documents table stands in for a crawl drop — it is written as a
  * CC-shaped .warc.gz landing dir first, so the REAL ingest path is what
  * runs end-to-end).
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_curate"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val report = run(spark, sfDir, outDir)
    println(report)
    spark.stop()
  }

  /** Runs the pipeline; returns the JSON report line. */
  def run(spark: SparkSession, sfDir: String, outDir: String, minTokens: Int = 20,
          maxTopWordFrac: Double = 0.2): String = {
    val n = spark.sparkContext.defaultParallelism
    val t0 = System.nanoTime()

    // 1. simulated crawl drop: CC-shaped gzip-member WARC landing dir
    val warcDir = s"$outDir/warc_in"
    Warc.write(Pages.synthesize(spark, sfDir), warcDir, gzip = true, http = true)

    // 2. ingest (charset-normalized) + extract
    val extracted = ExtractJob.extract(Warc.read(spark, warcDir), "curate", n)
      .toDF().persist()
    val nIn = extracted.count()

    // 2a. URL blocklist gate (UT1 shape) — the cheapest filter runs FIRST,
    // before any text touches a shuffle: registrable-domain rules broadcast,
    // path keywords codegen'd. The stub list blocks one source path; a real
    // deployment broadcasts the public category lists.
    val blockRules = spark.createDataFrame(Seq(("blocked.example", "ads")))
      .toDF("reg_domain", "category")
    val allowed = graft.operators.UrlOps.blocklistGate(
      extracted.selectExpr("xxhash64(url) AS doc_id", "url"),
      blockRules, Seq("/src7/" -> "blocklist"))
      .where(col("verdict") === "keep").select("doc_id")

    // 3. features over the extracted main text
    val docs = extracted.selectExpr("url", "xxhash64(url) AS doc_id", "main_text AS text")
      .join(allowed, "doc_id")
    val nAllowed = docs.count()
    val feats = docs
      .selectExpr("url", "doc_id", "text", s"${TextOps.tokensExpr} AS n_tokens")
      .join(docs.selectExpr(TextOps.langIdSelect: _*), "doc_id")

    // 4. quality floor
    val quality = feats.where(col("n_tokens") >= minTokens)
    val nQuality = quality.count()

    // 4a. Gopher rule gate: zero-shuffle projection, joined on doc_id so the
    // gate composes with the other keeper sets
    val gopherOk = TextOps.gopherRules(docs)
      .where(col("gopher_pass") === 1).select("doc_id")
    val qualityGopher = quality.join(gopherOk, "doc_id")
    val nGopher = qualityGopher.count()

    // 4b. repetition floor (Gopher-style): pages dominated by one token go
    val repOk = TextOps.repetitionStats(docs)
      .where(col("top_word_frac") <= maxTopWordFrac)
      .select("doc_id")
    val qualityRep = qualityGopher.join(repOk, "doc_id")
    val nRep = qualityRep.count()

    // 4c. PII scrub: text becomes the redacted clean_text (byte-identical
    // on clean pages); per-doc counts feed the report
    val scrubbed = qualityRep.drop("text")
      .join(TextOps.redactPii(qualityRep), "doc_id")
      .withColumnRenamed("clean_text", "text")
    val nPii = scrubbed.where(col("n_emails") + col("n_phones") > 0).count()

    // 5. exact-dedup keepers (md5 digest shuffle, partial aggs)
    val keepers = Dedup.exact(docs).select(col("keeper_id").as("doc_id"))

    // 6. near-dup losers: connected components over the verified pair set —
    // each cluster keeps its minimum doc_id (pairwise id_b-drops mishandle
    // A~B~C chains: they could drop B twice and keep C)
    val losers = Dedup.connectedComponents(Dedup.nearDupPairs(docs))
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val nLosers = losers.count()

    // 7. decontamination against the held-out eval slice (stand-in: the
    // pmod-50 corpus slice; production passes an external benchmark table)
    val evalTexts = docs.where(pmod(col("doc_id"), lit(50)) === 0).select("text")
    val contaminated = Dedup.contaminationHits(
      docs.where(pmod(col("doc_id"), lit(50)) =!= 0), evalTexts).select("doc_id")
    val nContam = contaminated.count()

    val curated = scrubbed
      .join(keepers, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select("url", "doc_id", "pred_lang", "n_tokens", "text")
    curated.write.mode("overwrite").parquet(s"$outDir/curated.parquet")
    val nOut = spark.read.parquet(s"$outDir/curated.parquet").count()
    extracted.unpersist()
    val wall = (System.nanoTime() - t0) / 1e9
    f"""{"metric":"curate","docs_in":$nIn,"after_blocklist":$nAllowed,"after_quality":$nQuality,"after_gopher":$nGopher,"after_repetition":$nRep,"pii_docs":$nPii,"near_dup_losers":$nLosers,"contaminated":$nContam,"docs_out":$nOut,"out":"$outDir/curated.parquet","wall_sec":$wall%.2f}"""
  }
}
