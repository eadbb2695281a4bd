package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{Pages, ExtractJob, PageRow}
import graft.operators.{Dedup, Ann, TextOps}
import graft.dom.Extractor

/** Driver contract (see builder prompt + SURVEY.md §7). Each `queries` entry
  * is one operator of the engine; where ANSI SQL can express the same
  * computation, `oracleSql` carries a DuckDB-runnable equivalent over the
  * same parquet tables — outputs restricted to integers/strings plus
  * single-division doubles so the driver's value-hash compare is bit-stable.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Pages → extraction, 1 variant per doc (the correctness-path corpus). */
  private def extracted(s: SparkSession, dir: String) = {
    val n = s.sparkContext.defaultParallelism
    ExtractJob.extract(Pages.synthesize(s, dir), runId = "verify", numPartitions = n)
  }

  /** Flagship: the full extraction pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    extracted(spark, "/root/testdata/sf0.001").toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction core -------------------------------------------------
    "q_extract_roundtrip" -> ((s, dir) =>
      extracted(s, dir).select("url", "main_text")),
    "q_extract_stats" -> ((s, dir) =>
      extracted(s, dir).select("url", "n_spans", "n_tokens", "n_tags", "n_errors", "bytes_in")),
    "q_extract_spans" -> ((s, dir) =>
      // the north star's span-offsets output: offsets/paths/kept flags ride
      // the Extracted row; the oracle checks count, boundary offsets, and
      // kept-length == content length per url
      extracted(s, dir).toDF().selectExpr(
        "url",
        "CAST(size(spans) AS INT) AS n_spans",
        "CAST(spans[0].start AS INT) AS first_start",
        "CAST(element_at(spans, -1).end AS INT) AS last_end",
        "CAST(aggregate(filter(spans, x -> x.kept), 0, (a, x) -> a + (x.end - x.start)) AS INT) AS kept_len",
        "CAST(size(errors) AS INT) AS n_errs")),
    "q_warc_roundtrip" -> ((s, dir) => {
      // source-format path: pages → WARC archive files → re-ingest → extract
      val warcDir = s"${System.getProperty("java.io.tmpdir")}/graft_warc_${dir.hashCode.toHexString}"
      graft.sources.Warc.write(Pages.synthesize(s, dir), warcDir)
      val n = s.sparkContext.defaultParallelism
      ExtractJob.extract(graft.sources.Warc.read(s, warcDir), "warc", n)
        .toDF().select("url", "main_text")
    }),
    "q_pipeline_quality" -> ((s, dir) =>
      // composition: extraction kernel → token/char features → per-lang agg
      extracted(s, dir).toDF()
        .selectExpr("lang",
          "CAST(length(main_text) AS BIGINT) AS nc",
          "CAST(length(main_text) - length(replace(main_text, ' ', '')) + 1 AS BIGINT) AS nt")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nc").as("sum_chars"), sum("nt").as("sum_tokens"))),
    "q_sql_extract" -> ((s, dir) => {
      // SQL surface: native Catalyst expression (graft.functions) over a view
      graft.functions.HtmlFunctions.register(s)
      Pages.synthesize(s, dir).toDF().createOrReplaceTempView("graft_pages")
      s.sql("SELECT url, html_main_text(html) AS main_text FROM graft_pages")
    }),
    "q_tokenize_fidelity" -> ((s, dir) => {
      import s.implicits._
      Pages.synthesize(s, dir).mapPartitions { it =>
        it.map { p =>
          val (txt, truncated) = Extractor.fidelityText(p.html)
          (p.url, txt.length.toLong, truncated)
        }
      }.toDF("url", "fidelity_len", "truncated")
    }),
    // ---- relational stages (scan/filter/agg/join — Catalyst-native) ------
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("bigint")).as("sum_price_cents"),
          count(lit(1)).as("n_rows"))),
    "q_filter_orders" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .where(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")),
    "q_join_region" -> ((s, dir) =>
      s.read.parquet(s"$dir/nation.parquet")
        .join(broadcast(s.read.parquet(s"$dir/region.parquet")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"))),
    "q_cust_orders" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("bigint")).as("sum_price_cents"))),
    "q_lang_stats" -> ((s, dir) =>
      docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))),
    "q_events_window" -> ((s, dir) =>
      graft.streaming.ExtractStream.eventCounts(s.read.parquet(s"$dir/events.parquet"))),
    "q_top_orders" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")),
    "q_rollup_docs" -> ((s, dir) =>
      docs(s, dir).rollup("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("total_chars"))),
    "q_set_ops" -> ((s, dir) => {
      // set operators: planted ids EXCEPT originals ∪ INTERSECT overlap
      val base = docs(s, dir).select("doc_id")
      val shifted = docs(s, dir).where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 250L).as("doc_id"))
      shifted.except(base).withColumn("op", lit("new"))
        .unionAll(shifted.intersect(base).withColumn("op", lit("overlap")))
    }),
    // ---- dedup family ----------------------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Dedup.withPlantedDups(docs(s, dir), every = 7, dropWords = 0))),
    "q_dedup_jaccard" -> ((s, dir) => Dedup.adjacentJaccard(docs(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(docs(s, dir))),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhash(docs(s, dir))),
    "q_embed_near_dups" -> ((s, dir) =>
      Ann.cosineNearDups(s.read.parquet(s"$dir/embeddings.parquet"))),
    // ---- similarity search ----------------------------------------------
    "q_ann_cosine" -> ((s, dir) =>
      Ann.bruteForceTopK(s.read.parquet(s"$dir/embeddings.parquet"))),
    "q_ann_lsh" -> ((s, dir) =>
      Ann.lshTopK(s.read.parquet(s"$dir/embeddings.parquet"))),
    "q_embed_dims" -> ((s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"))),
    // ---- text analysis ---------------------------------------------------
    "q_text_quality" -> ((s, dir) => docs(s, dir).selectExpr(TextOps.qualitySelect: _*)),
    "q_lang_id" -> ((s, dir) => docs(s, dir).selectExpr(TextOps.langIdSelect: _*)),
    "q_fingerprint" -> ((s, dir) => TextOps.fingerprint(docs(s, dir))),
    "q_multimodal_meta" -> ((s, dir) => TextOps.multimodalMeta(docs(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q_extract_roundtrip" ->
      """SELECT 'https://example.com/' || lang || '/' || source || '/doc' || CAST(doc_id AS VARCHAR) || '/v0' AS url,
        |       text AS main_text
        |FROM documents""".stripMargin,
    "q_warc_roundtrip" ->
      """SELECT 'https://example.com/' || lang || '/' || source || '/doc' || CAST(doc_id AS VARCHAR) || '/v0' AS url,
        |       text AS main_text
        |FROM documents""".stripMargin,
    "q_extract_spans" ->
      """SELECT 'https://example.com/' || lang || '/' || source || '/doc' || CAST(doc_id AS VARCHAR) || '/v0' AS url,
        |       CAST(1 AS INTEGER) AS n_spans, CAST(0 AS INTEGER) AS first_start,
        |       CAST(length(text) AS INTEGER) AS last_end,
        |       CAST(length(text) AS INTEGER) AS kept_len,
        |       CAST(0 AS INTEGER) AS n_errs
        |FROM documents""".stripMargin,
    "q_pipeline_quality" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q_sql_extract" ->
      """SELECT 'https://example.com/' || lang || '/' || source || '/doc' || CAST(doc_id AS VARCHAR) || '/v0' AS url,
        |       text AS main_text
        |FROM documents""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_orders" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0",
    "q_join_region" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_cust_orders" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_rollup_docs" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,
    "q_set_ops" ->
      """WITH shifted AS (SELECT doc_id + 250 AS doc_id FROM documents WHERE doc_id % 3 = 0),
        |base AS (SELECT doc_id FROM documents)
        |SELECT doc_id, 'new' AS op FROM (SELECT doc_id FROM shifted EXCEPT SELECT doc_id FROM base)
        |UNION ALL
        |SELECT doc_id, 'overlap' AS op FROM (SELECT doc_id FROM shifted INTERSECT SELECT doc_id FROM base)""".stripMargin,
    "q_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS keeper_id,
        |       CAST(count(*) AS BIGINT) AS n_copies
        |FROM all_docs GROUP BY md5(text)""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH wx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |w AS (SELECT DISTINCT doc_id, w FROM wx),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw FROM w GROUP BY doc_id),
        |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        |      FROM w a JOIN w b ON b.doc_id = a.doc_id + 1 AND b.w = a.w
        |      GROUP BY a.doc_id, b.doc_id)
        |SELECT i.id_a, i.id_b, i.inter, na.nw + nb.nw - i.inter AS uni,
        |       CAST(i.inter AS DOUBLE) / (na.nw + nb.nw - i.inter) AS jaccard
        |FROM i JOIN n na ON na.doc_id = i.id_a JOIN n nb ON nb.doc_id = i.id_b""".stripMargin,
    "q_ann_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT q.vec_id AS vec_id, e.vec_id AS nbr_id,
        |             list_cosine_similarity(q.emb, e.emb) AS sim
        |      FROM e q JOIN e ON q.vec_id < 20 AND e.vec_id <> q.vec_id),
        |r AS (SELECT vec_id, nbr_id,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id) AS rank
        |      FROM p)
        |SELECT vec_id, CAST(rank AS INTEGER) AS rank, nbr_id FROM r WHERE rank <= 10""".stripMargin,
    "q_embed_dims" ->
      "SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim FROM embeddings",
    "q_text_quality" ->
      s"SELECT ${TextOps.qualitySelect.mkString(", ")} FROM documents",
    "q_lang_id" ->
      s"SELECT ${TextOps.langIdSelect.mkString(", ")} FROM documents",
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        |       CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
        |       CAST(octet_length(encode(text)) // 64 AS BIGINT) AS fake_frames
        |FROM documents""".stripMargin
  )
}
