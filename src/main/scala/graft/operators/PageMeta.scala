package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Article-level page hygiene over the EXTRACTION OUTPUT ROW — operators
  * that resolve what a page declares about itself without ever re-parsing
  * the html (the kernel already captured og:* pairs, raw JSON-LD blocks,
  * title and main text onto the row; at 100 TB a second parse pass is the
  * cost you design away). Both are pure zero-shuffle codegen-friendly
  * projections and every rule replays bit-exactly in DuckDB.
  */
object PageMeta {

  /** Publication-date resolution — the article-corpus timestamp every
    * news/temporal-filtering pipeline needs (dataset freshness cuts,
    * dedup-keep-latest, time-sliced training mixes). Sources in priority
    * order (explicit meta beats structured data beats url pattern — the
    * trafilatura/Go-html-date consensus):
    *
    *   1. `og:published_time` meta content (the kernel's og capture)
    *   2. JSON-LD `"datePublished"` — first block declaring one
    *   3. a `/YYYY/MM/DD/` url path segment
    *
    * Output: (url, pub_date 'yyyy-mm-dd…' string or NULL, date_source in
    * {'og','jsonld','url'} or NULL). The date string is reported as
    * declared — validation/normalization is a downstream concern (a wrong
    * declared date is a data fact, not a parse failure). The meta arm
    * checks the STANDARD `article:published_time` property first (the
    * form WordPress/Yoast emit and htmldate/trafilatura read first), then
    * the og:-namespaced variant some sites use; the JSON-LD match is
    * whitespace-tolerant (pretty-printed blocks are the common case).
    */
  def pubDates(extracted: DataFrame): DataFrame = {
    def metaArm(prop: String) =
      s"CASE WHEN array_position(og_props, '$prop') > 0 " +
        s"THEN element_at(og_vals, CAST(array_position(og_props, '$prop') AS INT)) END"
    val og = s"coalesce(${metaArm("article:published_time")}, ${metaArm("og:published_time")})"
    // first JSON-LD block declaring the key (optional whitespace around
    // the colon); value = the quoted string
    val ldPat = "\"datePublished\"\\\\s*:\\\\s*\"([^\"]*)\""
    val ldBlock = s"element_at(filter(json_ld, b -> b rlike '$ldPat'), 1)"
    val ld = s"CASE WHEN $ldBlock IS NOT NULL THEN regexp_extract($ldBlock, '$ldPat', 1) END"
    val u = "nullif(replace(regexp_extract(url, '/(20[0-9]{2}/[0-9]{2}/[0-9]{2})/', 1), '/', '-'), '')"
    extracted.selectExpr(
      "url",
      s"coalesce($og, $ld, $u) AS pub_date",
      s"CASE WHEN $og IS NOT NULL THEN 'og' WHEN $ld IS NOT NULL THEN 'jsonld' " +
        s"WHEN $u IS NOT NULL THEN 'url' END AS date_source")
  }

  /** Soft-404 detection — the crawl-hygiene gate for pages served HTTP 200
    * that are really error pages (the status code is a lie on a large
    * fraction of hosts; every production crawler filters these before the
    * corpus sees them). Rule, integer-exact and pinned:
    *
    *   titleMarker: lowercased title contains 'not found' or 'error 404',
    *                or STARTS with '404' — a bare '%404%' contains-match
    *                would flag legitimate titles ("Peugeot 404 review",
    *                this corpus's own "Story 404"), so the numeric form
    *                only fires in the error-page positions
    *   bodyMarker:  lowercased main text contains 'not found' /
    *                'no longer available' / 'does not exist'
    *   soft404   = titleMarker OR (word count < 40 AND bodyMarker)
    *
    * The word-count guard is what makes the body rule safe: a long article
    * MENTIONING "not found" is content, a 10-word apology stub is not.
    * Output: (url, title, n_words, soft404_reason in {'title','stub_body'}
    * or NULL, is_soft404).
    */
  def soft404(extracted: DataFrame): DataFrame = {
    val titleM = "(lower(title) LIKE '%not found%' OR lower(title) LIKE '%error 404%' " +
      "OR lower(title) LIKE '404%')"
    val bodyM = "(lower(main_text) LIKE '%not found%' OR lower(main_text) LIKE '%no longer available%' " +
      "OR lower(main_text) LIKE '%does not exist%')"
    val words = "size(split(main_text, ' '))"
    extracted.selectExpr(
      "url", "title",
      s"CAST($words AS INT) AS n_words",
      s"CASE WHEN $titleM THEN 'title' WHEN $words < 40 AND $bodyM THEN 'stub_body' END AS soft404_reason")
      .withColumn("is_soft404", expr("soft404_reason IS NOT NULL"))
  }
}
