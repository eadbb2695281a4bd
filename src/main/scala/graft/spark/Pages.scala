package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page row — the input-table shape mandated by
  * BASELINE.json `input_hint`: (url:string, warc_ts:timestamp, html:binary,
  * text:string, lang:string).
  */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic splitmix64 PRNG — seeded per (doc_id, variant) so page
  * synthesis is reproducible on any executor, any partitioning, any run
  * (never Math.random / wall clock).
  */
final class Mix(seed0: Long) {
  private var s: Long = seed0
  def next(): Long = {
    s += 0x9e3779b97f4a7c15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** uniform in [0, n) */
  def nextInt(n: Int): Int = {
    val x = next() & Long.MaxValue
    (x % n).toInt
  }
}

/** Synthesizes the Common-Crawl-style pages table from the driver-provided
  * `documents.parquet` payloads — deterministic from (doc_id, variant), fully
  * distributed (generation happens inside the executors' map, never a driver
  * loop; at 10^12 docs this is a narrow map over the document scan).
  *
  * Contract that makes extraction DuckDB-verifiable: the ONLY character data
  * outside boilerplate-stripped subtrees (head/script/style/nav/footer, plus
  * comments/doctype) is the document's `text`, placed in a single `<p>` with
  * zero added whitespace. So `Extractor.extract(html).mainText == text`
  * byte-for-byte, and the oracle is a plain SELECT over documents.
  *
  * Boilerplate varies per page: nav/footer link farms, nested div wrappers
  * (occasionally 200 deep — the "deeply nested" skew case of the north star),
  * attribute blobs (occasionally 64 KiB — the "megabyte attribute blob" skew
  * case), unquoted attributes, comments. None of it touches the content
  * contract above.
  */
object Pages {

  /** HTML for one page. Never emits `&` (reference quirk Q14 non-termination
    * and the char-ref quirk family are exercised by unit fixtures, not the
    * corpus — SURVEY.md §5.3) and never emits whitespace between tags outside
    * stripped subtrees.
    */
  def render(docId: Long, variant: Int, text: String, lang: String, source: String): String = {
    val rng = new Mix(docId * 1000003L + variant * 7919L + 42L)
    val sb = new java.lang.StringBuilder(text.length + 2048)
    sb.append("<!DOCTYPE html><html lang=\"").append(lang).append("\"><head>")
    sb.append("<meta charset=\"utf-8\"><title>Doc ").append(docId).append(" - ").append(source).append("</title>")
    sb.append("<style>body{margin:0;font-family:serif}.w{padding:0}</style>")
    sb.append("<script type=\"text/javascript\">var n=1;if(n<2){n=n+1;}</script>")
    sb.append("</head><body>")
    // nav link farm (blacklisted subtree — stripped whole)
    sb.append("<nav id=\"top\"><ul>")
    val nLinks = 3 + rng.nextInt(8)
    var i = 0
    while (i < nLinks) {
      sb.append("<li><a href=\"/cat/").append(rng.nextInt(100))
        .append("\">Section ").append(i).append(" link text</a></li>")
      i += 1
    }
    sb.append("</ul></nav>")
    // occasional megabyte-class attribute blob (size skew; value never reaches text)
    val blob = rng.nextInt(41) == 0
    if (blob) {
      sb.append("<div data-blob=\"")
      val n = 4096 + rng.nextInt(61440)
      var j = 0
      while (j < n) { sb.append(('a' + (j % 26)).toChar); j += 1 }
      sb.append("\">")
    }
    // nested div wrappers (occasionally pathological depth — recursion-depth skew)
    val depth = if (rng.nextInt(29) == 0) 200 else rng.nextInt(9)
    i = 0
    while (i < depth) { sb.append("<div class=\"w\">"); i += 1 }
    // the content contract: text verbatim in one <p>, unquoted attr exercised
    sb.append("<article><p class=main id=\"p").append(docId).append("\">")
    sb.append(text)
    sb.append("</p></article>")
    i = 0
    while (i < depth) { sb.append("</div>"); i += 1 }
    if (blob) sb.append("</div>")
    sb.append("<!-- generated variant ").append(variant).append(" seed ").append(docId).append(" -->")
    sb.append("<footer><div class=\"foot\">")
    val nFoot = 2 + rng.nextInt(4)
    i = 0
    while (i < nFoot) {
      sb.append("<a href=\"/legal/").append(i).append("\">Legal ").append(i).append("</a>")
      i += 1
    }
    // tree-construction stressors INSIDE the stripped subtree: a table with
    // stray (fostered) text and implied row ends, plus misnested formatting —
    // every page now drives the foster-parenting / reconstruction machinery
    // through the oracle-checked path without touching the content contract
    // (footer is blacklisted, so none of this reaches text or spans)
    sb.append("<table>x").append(rng.nextInt(10))
      .append("<tr><td>c1<td><b><i>c2</b>tail</i><tr><td>c3</table>")
    sb.append("<p><b>mis").append(rng.nextInt(10)).append("</p><p>nested</p>")
    sb.append("</div></footer></body></html>")
    sb.toString
  }

  def urlOf(docId: Long, variant: Int, lang: String, source: String): String =
    s"https://example.com/$lang/$source/doc$docId/v$variant"

  /** Fully deterministic minimal page — NO rng — so the kernel's token/tag/
    * byte accounting has a closed form expressible as a DuckDB oracle:
    *   n_tags    = 12
    *   n_tokens  = 15 + digits(doc_id) + length(text)
    *               (doctype + 12 tags + eof + title "D<id>" chars + text chars)
    *   bytes_in  = plainOverhead + digits(doc_id) + length(lang) + utf8(text)
    * Used by the q_extract_stats / q_tokenize_fidelity contract queries; the
    * rng-rich `render` corpus stays the input for the roundtrip/span queries.
    */
  def renderPlain(docId: Long, text: String, lang: String): String =
    s"""<!DOCTYPE html><html lang="$lang"><head><title>D$docId</title></head><body><article><p>$text</p></article></body></html>"""

  /** Byte overhead of renderPlain beyond digits(doc_id)+len(lang)+utf8(text). */
  val plainOverhead: Int =
    renderPlain(7, "", "xx").getBytes(java.nio.charset.StandardCharsets.UTF_8).length - 1 - 2

  /** Deterministic link-bearing page: (doc_id % 5 + 1) anchors with
    * closed-form hrefs, so the outlink-capture path (link graph) has a
    * generate_series-expressible DuckDB oracle.
    */
  def renderLinks(docId: Long): String = {
    val k = (docId % 5 + 1).toInt
    val sb = new java.lang.StringBuilder(256)
    sb.append("<!DOCTYPE html><html><head><title>L").append(docId).append("</title>")
    if (docId % 2 == 1) sb.append("<meta name=\"robots\" content=\"noindex,nofollow\">")
    // every third page declares a <base href> — relative links resolve
    // against it instead of the page url
    if (docId % 3 == 0)
      sb.append("<base href=\"https://cdn").append(docId % 5).append(".example.org/dir/\">")
    // every fourth page declares a canonical; pairs of pages share one
    // (docId div 8), so canonical dedup has real clusters. Spelling varies:
    // docId%8==0 plain; docId%8==4 href-first + multi-token uppercase rel
    // (the link-type token rule) — both must capture
    if (docId % 4 == 0) {
      val canon = s"https://example.com/links/canon${docId / 8}"
      if (docId % 8 == 0)
        sb.append("<link rel=\"canonical\" href=\"").append(canon).append("\">")
      else
        sb.append("<link href=\"").append(canon).append("\" rel=\"alternate CANONICAL\">")
    }
    sb.append("</head><body><p>intro text for doc ").append(docId).append("</p>")
    var i = 0
    while (i < k) {
      sb.append("<a href=\"https://ext").append((docId + i) % 7)
        .append(".example.net/p/").append(i).append("\">link ").append(i).append("</a>")
      i += 1
    }
    // one root-relative and one path-relative link per page (the
    // resolution operator's closed-form fixtures)
    sb.append("<a href=\"/rel/").append(docId).append("\">r</a>")
    sb.append("<a href=\"sub/page").append(docId).append("\">s</a>")
    sb.append("</body></html>")
    sb.toString
  }

  /** Deterministic multi-host graph page: the page lives on
    * site{doc_id % 11}.example.com and carries (doc_id % 4 + 1) absolute
    * links to closed-form sibling hosts — the host-graph (PageRank) oracle
    * input. Distinct from renderLinks, whose pages all share one host.
    */
  def renderGraph(docId: Long): String = {
    val k = (docId % 4 + 1).toInt
    val sb = new java.lang.StringBuilder(192)
    sb.append("<!DOCTYPE html><html><head><title>G").append(docId)
      .append("</title></head><body><p>graph doc ").append(docId).append("</p>")
    var i = 0
    while (i < k) {
      sb.append("<a href=\"https://site").append((docId * 3 + i * 5) % 11)
        .append(".example.com/g/x").append(i).append("\">g").append(i).append("</a>")
      i += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** The deterministic graph-page corpus (host-rank-oracle input). */
  def synthesizeGraphPages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderGraph(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://site${docId % 11}.example.com/g/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** Deterministic table page: one (doc_id % 3 + 1) × (doc_id % 2 + 2) table
    * with closed-form cell text, written with IMPLIED tr/td ends — the
    * layout-parse (structured table extraction) oracle input drives the
    * tree-construction machinery, not just the tokenizer.
    */
  def renderTable(docId: Long): String = {
    val rows = (docId % 3 + 1).toInt
    val cols = (docId % 2 + 2).toInt
    val sb = new java.lang.StringBuilder(256)
    sb.append("<!DOCTYPE html><html><head><title>T").append(docId)
      .append("</title></head><body><p>intro ").append(docId).append("</p><table>")
    var r = 0
    while (r < rows) {
      sb.append("<tr>")
      var c = 0
      while (c < cols) {
        sb.append("<td>r").append(r).append("c").append(c).append("d").append(docId)
        c += 1
      }
      r += 1
    }
    sb.append("</table></body></html>")
    sb.toString
  }

  /** Deterministic outline page: an h1 + (doc_id % 3 + 1) h2 sections + (odd
    * ids) one h3, written with IMPLIED heading ends (`<h1>t5<h2>s0d5<h2>…`) so
    * the heading-pop tree-construction rule — not just the tokenizer — drives
    * the closed-form oracle.
    */
  def renderOutline(docId: Long): String = {
    val k = (docId % 3 + 1).toInt
    val sb = new java.lang.StringBuilder(192)
    sb.append("<!DOCTYPE html><html><head><title>O").append(docId)
      .append("</title></head><body><h1>t").append(docId)
    var s = 0
    while (s < k) { sb.append("<h2>s").append(s).append("d").append(docId); s += 1 }
    sb.append("</h2><p>intro ").append(docId).append("</p>")
    if (docId % 2 == 1)
      sb.append("<h3>x").append(docId).append("</h3><p>tail ").append(docId).append("</p>")
    sb.append("</body></html>")
    sb.toString
  }

  /** Deterministic robots.txt for host site{h}.example.com — closed-form
    * rules whose longest-match decision the q_robots_filter oracle encodes
    * as a CASE: `*` group disallows /g/ on even hosts, re-allows the longer
    * /g/x1 on multiples of 3; a graftbot-specific group disallows everything
    * on multiples of 5 (specific group beats `*`). Noise lines (comments,
    * crawl-delay, mixed-case fields, empty disallow) exercise the parser.
    */
  def renderRobots(h: Int): String = {
    val sb = new java.lang.StringBuilder(128)
    sb.append("# robots for site").append(h).append("\n")
    sb.append("User-AGENT: *\n")
    sb.append("Crawl-delay: ").append(h % 7 + 1).append("\n") // ignored by rule groups, read by crawlDelays
    if (h % 2 == 0) sb.append("Disallow: /g/\n")
    if (h % 3 == 0) sb.append("Allow: /g/x1\n")
    sb.append("Disallow:\n") // empty pattern: matches nothing
    // sitemap DISCOVERY directives (file-wide per RFC 9309 / sitemaps.org;
    // mixed case + trailing comment exercise the parser); ignored by the
    // rule groups, harvested by Robots.sitemapDirectives
    if (h % 4 == 0) {
      sb.append("Sitemap: https://site").append(h).append(".example.com/sitemap.xml\n")
      sb.append("sitemap: https://site").append(h).append(".example.com/sitemap-news.xml # daily\n")
    }
    if (h % 5 == 0) sb.append("\nUser-agent: graftbot\nCrawl-delay: 9\nDisallow: /\n")
    sb.toString
  }

  /** Deterministic media page: (doc_id % 4) figures each carrying an
    * <img src> (alt on even indices only) + one src-less lazy-load
    * placeholder that must NOT be captured — the image-caption-pair oracle
    * input.
    */
  def renderMedia(docId: Long): String = {
    val k = (docId % 4).toInt
    val sb = new java.lang.StringBuilder(256)
    sb.append("<!DOCTYPE html><html><head><title>M").append(docId).append("</title>")
    // Open Graph block: title always; og:image on docId%3==0 (TWICE — sites
    // repeat og:image and the capture must keep both); content attr carries
    // a char-ref so the attribute-decode path is exercised
    sb.append("<meta property=\"OG:title\" content=\"M ").append(docId).append(" &amp; co\">")
    if (docId % 3 == 0) {
      sb.append("<meta property=\"og:image\" content=\"https://img.example.org/og").append(docId).append("_0.jpg\">")
      sb.append("<meta property=\"og:image\" content=\"https://img.example.org/og").append(docId).append("_1.jpg\">")
    }
    sb.append("<meta property=\"twitter:card\" content=\"summary\">") // non-og: ignored
    sb.append("<meta property=\"og:nocontent\">") // content-less: skipped
    // JSON-LD block #1 (head) on even ids: schema.org Article. The &amp;
    // stays RAW — script is rawtext, char-refs are never decoded inside it.
    if (docId % 2 == 0)
      sb.append("<script type=\"application/ld+json\">{\"@type\":\"Article\",\"headline\":\"M ")
        .append(docId).append(" &amp; co\",\"wordCount\":").append(docId % 7).append("}</script>")
    sb.append("</head><body><p>media doc ").append(docId).append("</p>")
    // negative probes: plain/typeless scripts must NOT be captured (and,
    // being blacklisted, never reach the extracted text either)
    sb.append("<script type=\"text/javascript\">var m=").append(docId).append(";</script>")
    sb.append("<script>ignore()</script>")
    // JSON-LD block #2 (body) on multiples of 5: MIME-essence matching —
    // mixed case, surrounding whitespace and a ;parameter must all match
    if (docId % 5 == 0)
      sb.append("<script type=\" Application/LD+JSON; charset=utf-8\">{\"@type\":\"Product\",\"sku\":\"P")
        .append(docId).append("\"}</script>")
    var i = 0
    while (i < k) {
      sb.append("<figure><img src=\"https://img.example.org/i").append(docId)
        .append("_").append(i).append(".jpg\"")
      if (i % 2 == 0) sb.append(" alt=\"pic ").append(i).append(" of ").append(docId).append("\"")
      sb.append("><figcaption>cap ").append(i).append("</figcaption></figure>")
      i += 1
    }
    sb.append("<img alt=\"lazy placeholder\"></body></html>")
    sb.toString
  }

  /** The deterministic media-page corpus (image-capture-oracle input). */
  def synthesizeMediaPages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderMedia(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://example.com/media/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** Deterministic article page for the publication-date / soft-404
    * operators — every signal a closed form of docId:
    *  - STANDARD article:published_time meta on docId%3==0 (2022-mm-dd)
    *  - JSON-LD datePublished on docId%4==0 (2023-mm-dd; PRETTY-PRINTED —
    *    whitespace around the colon, the common real-world form)
    *  - /2021/mm/dd/ url date on docId%5==0 (built by the synthesizer)
    *  - soft-404 shape on docId%9==0 (404 title + apology stub body)
    *  - hard negative on docId%9==5 (LONG body that mentions 'not found')
    *  - hard negative on docId%9==4 (legitimate title CONTAINING '404')
    *  - short-but-clean page on docId%9==7 (stub length, no marker)
    */
  def renderArticle(docId: Long): String = {
    val mm = f"${1 + docId % 12}%02d"
    val dd = f"${1 + docId % 28}%02d"
    val sb = new java.lang.StringBuilder(512)
    sb.append("<!DOCTYPE html><html><head><title>")
    if (docId % 9 == 0) sb.append("Page Not Found - site")
    else if (docId % 9 == 4) sb.append("Racer 404 profile ").append(docId)
    else sb.append("Story ").append(docId)
    sb.append("</title>")
    if (docId % 3 == 0)
      sb.append("<meta property=\"article:published_time\" content=\"2022-")
        .append(mm).append("-").append(dd).append("\">")
    if (docId % 4 == 0)
      sb.append("<script type=\"application/ld+json\">{\"@type\": \"NewsArticle\", \"datePublished\": \"2023-")
        .append(mm).append("-").append(dd)
        .append("\", \"author\": \"A").append(docId % 5).append("\"}</script>")
    sb.append("</head><body><p>")
    if (docId % 9 == 0) sb.append("The page you requested was not found.")
    else if (docId % 9 == 7) sb.append("tiny page ").append(docId)
    else {
      sb.append("story body ").append(docId)
      var i = 0
      while (i < 45) { sb.append(" w").append(i); i += 1 }
      if (docId % 9 == 5) sb.append(" an archived copy was not found here")
    }
    sb.append("</p></body></html>")
    sb.toString
  }

  /** The deterministic article corpus (pub-date / soft-404 oracle input). */
  def synthesizeArticlePages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val mm = f"${1 + docId % 12}%02d"
        val dd = f"${1 + docId % 28}%02d"
        val url =
          if (docId % 5 == 0) s"https://news.example.com/2021/$mm/$dd/doc$docId"
          else s"https://news.example.com/story/doc$docId"
        val html = renderArticle(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(url, new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** Deterministic microdata page: one schema.org Article item (text,
    * href, content, datetime and multi-token prop values), a nested Person
    * on docId%3==0 (the flat-triple `item:<ord>` encoding), an Offer with a
    * `<data value>` price on docId%2==0, and a stray itemprop OUTSIDE any
    * itemscope that must be dropped. Every value is a closed form of docId
    * — the oracle replays the whole harvest.
    */
  def renderMicrodata(docId: Long): String = {
    val sb = new java.lang.StringBuilder(512)
    sb.append("<!DOCTYPE html><html><head><title>MD").append(docId).append("</title></head><body>")
    sb.append("<div itemscope itemtype=\"https://schema.org/Article\">")
    sb.append("<span itemprop=\"headline\">Art ").append(docId).append("</span>")
    sb.append("<a itemprop=\"url\" href=\"https://example.com/md/").append(docId).append("\">self</a>")
    sb.append("<meta itemprop=\"wordCount\" content=\"").append(docId % 7).append("\">")
    sb.append("<time itemprop=\"datePublished\" datetime=\"2021-01-").append(10 + docId % 19)
      .append("\">a while ago</time>")
    sb.append("<span itemprop=\"genre keywords\">g").append(docId % 4).append("</span>")
    if (docId % 3 == 0) {
      sb.append("<div itemprop=\"author\" itemscope itemtype=\"https://schema.org/Person\">")
      sb.append("<span itemprop=\"name\">P").append(docId % 5).append("</span></div>")
    }
    sb.append("</div>")
    if (docId % 2 == 0)
      sb.append("<p itemscope itemtype=\"https://schema.org/Offer\"><data itemprop=\"price\" value=\"")
        .append(docId % 100).append("\">around that much</data></p>")
    sb.append("<span itemprop=\"stray\">ignored ").append(docId).append("</span>")
    sb.append("</body></html>")
    sb.toString
  }

  /** The deterministic microdata-page corpus (microdata-harvest-oracle input). */
  def synthesizeMicrodataPages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderMicrodata(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://example.com/md/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** The deterministic outline-page corpus (heading-oracle input). */
  def synthesizeOutlinePages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderOutline(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://example.com/outline/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** The deterministic table-page corpus (layout-parse-oracle input). */
  def synthesizeTablePages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderTable(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://example.com/tables/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** The deterministic link-page corpus (link-graph-oracle input). */
  def synthesizeLinkPages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .repartition(parts)
      .as[(Long, String)]
      .map { case (docId, lang) =>
        val html = renderLinks(docId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(s"https://example.com/links/doc$docId",
          new java.sql.Timestamp(1609459200000L + docId * 1000L), html, null, lang)
      }
  }

  /** The deterministic plain-page corpus (stats-oracle input). */
  def synthesizePlain(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .repartition(parts)
      .as[(Long, String, String, String)]
      .map { case (docId, text, lang, source) =>
        val html = renderPlain(docId, text, lang).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(urlOf(docId, 0, lang, source), new java.sql.Timestamp(1609459200000L + docId * 1000L), html, text, lang)
      }
  }

  /** The pages Dataset: one row per (document, variant). `variants` > 1 scales
    * the corpus for benchmarking (url differs per variant; text payload is the
    * doc's). Narrow transformation — no shuffle.
    */
  def synthesize(spark: SparkSession, sfDir: String, variants: Int = 1, numPartitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    // Shuffle the SMALL side: repartitioning the compact documents table costs
    // ~nothing and gives the downstream narrow synthesis+extraction map full
    // parallelism — never shuffle the rendered html corpus itself.
    val parts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism * 4
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .repartition(parts)
      .as[(Long, String, String, String)]
    docs.flatMap { case (docId, text, lang, source) =>
      (0 until variants).iterator.map { v =>
        val html = render(docId, v, text, lang, source).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        PageRow(urlOf(docId, v, lang, source), new java.sql.Timestamp(1609459200000L + docId * 1000L + v), html, text, lang)
      }
    }
  }
}
