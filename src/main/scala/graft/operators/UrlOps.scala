package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-frontier / url-dedup key every
  * CC-scale pipeline needs before url-level dedup and politeness
  * partitioning: lowercase scheme+host, strip default ports, resolve
  * dot-segments (RFC 3986 §5.2.4), drop fragments, sort query params
  * (stable for duplicate keys). Non-absolute inputs pass through
  * untouched. Pure per-row function → a narrow zero-shuffle map.
  */
object UrlOps {

  def canonicalize(url: String): String = {
    val hIdx = url.indexOf('#')
    val noFrag = if (hIdx >= 0) url.substring(0, hIdx) else url
    val sIdx = noFrag.indexOf("://")
    if (sIdx < 0) return url // relative / opaque: leave untouched
    val qIdx = noFrag.indexOf('?')
    val (base, query) =
      if (qIdx >= 0) (noFrag.substring(0, qIdx), noFrag.substring(qIdx + 1))
      else (noFrag, null)
    val scheme = base.substring(0, sIdx).toLowerCase
    val rest = base.substring(sIdx + 3)
    val pIdx = rest.indexOf('/')
    val (auth, path0) = if (pIdx >= 0) (rest.substring(0, pIdx), rest.substring(pIdx)) else (rest, "/")
    // host[:port]
    val cIdx = auth.lastIndexOf(':')
    var host = auth
    var port = ""
    if (cIdx >= 0 && cIdx + 1 < auth.length && auth.substring(cIdx + 1).forall(_.isDigit)) {
      host = auth.substring(0, cIdx)
      port = auth.substring(cIdx + 1)
    }
    host = host.toLowerCase
    val defPort = (scheme == "http" && port == "80") || (scheme == "https" && port == "443")
    val portPart = if (port.isEmpty || defPort) "" else ":" + port
    // dot-segment resolution (".." never climbs past the root)
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    path0.split('/').foreach {
      case "" | "."  => ()
      case ".."      => if (segs.nonEmpty) segs.remove(segs.length - 1)
      case s         => segs += s
    }
    val trailingSlash = path0.endsWith("/") || path0.endsWith("/.") || path0.endsWith("/..")
    val path = "/" + segs.mkString("/") + (if (trailingSlash && segs.nonEmpty) "/" else "")
    val q =
      if (query == null || query.isEmpty) ""
      else "?" + query.split('&').filter(_.nonEmpty)
        .sortBy(p => p.takeWhile(_ != '=')).mkString("&") // stable for dup keys
    scheme + "://" + host + portPart + path + q
  }

  /** RFC 3986 §5 reference resolution for the link graph: absolute hrefs
    * pass through; scheme-relative, root-relative, and relative paths
    * resolve against the base (page url or `<base href>`). Fragments-only
    * and empty hrefs resolve to the base itself.
    */
  def resolve(base: String, href: String): String = {
    if (href == null || href.isEmpty) return canonicalize(base)
    if (href.startsWith("#")) return canonicalize(base)
    if (href.contains("://")) return canonicalize(href)
    val sIdx = base.indexOf("://")
    if (sIdx < 0) return href // non-absolute base: give the href back
    val scheme = base.substring(0, sIdx)
    val rest = base.substring(sIdx + 3)
    val pIdx = rest.indexOf('/')
    val auth = if (pIdx >= 0) rest.substring(0, pIdx) else rest
    if (href.startsWith("//")) return canonicalize(scheme + ":" + href)
    if (href.startsWith("/")) return canonicalize(scheme + "://" + auth + href)
    val basePath0 = if (pIdx >= 0) rest.substring(pIdx) else "/"
    val basePath = { val q = basePath0.indexOf('?'); if (q >= 0) basePath0.substring(0, q) else basePath0 }
    // query-only reference: base path kept, query replaced (RFC 3986 §5.3)
    if (href.startsWith("?")) return canonicalize(scheme + "://" + auth + basePath + href)
    // relative path: replace everything after the base path's last '/'
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    canonicalize(scheme + "://" + auth + dir + href)
  }

  /** (doc_id, url) → (doc_id, canon_url): narrow typed map, no shuffle. */
  def canonicalizeUrls(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("doc_id", "url").as[(Long, String)]
      .mapPartitions(_.map { case (id, u) => (id, canonicalize(u)) })
      .toDF("doc_id", "canon_url")
  }

  /** UT1-style URL blocklist gate — the curation stage every public web
    * pipeline (C4, RefinedWeb, FineWeb) runs before touching page content:
    * drop documents whose URL matches a category blocklist.
    *
    * The public lists are keyed at the REGISTRABLE-DOMAIN level (UT1 ships
    * `domains` files per category), so matching is one equi-join on the
    * last-two-labels domain — and the list (a few million rows ≈ tens of
    * MB) is exactly the broadcast-side shape: the 10^12-row crawl never
    * shuffles. Path-keyword rules (the lists' `urls` files reduced to
    * substring patterns) are a codegen'd CASE over the parsed path — zero
    * extra plan cost. Precedence mirrors UT1 usage: domain rule beats
    * keyword rule beats keep.
    *
    * Output: (doc_id, url, reg_domain, verdict) where verdict is the
    * blocking category or 'keep'.
    */
  def blocklistGate(
      urls: DataFrame,
      domainRules: DataFrame, // (reg_domain, category)
      pathKeywords: Seq[(String, String)]): DataFrame = {
    val parsed = urls.selectExpr(
      "doc_id", "url",
      "parse_url(url, 'HOST') AS host",
      "parse_url(url, 'PATH') AS path")
      .withColumn("reg_domain",
        expr("array_join(slice(split(host, '[.]'), -2, 2), '.')"))
    val kwVerdict = pathKeywords.reverse.foldLeft(lit(null).cast("string")) {
      case (els, (kw, cat)) => when(col("path").contains(kw), lit(cat)).otherwise(els)
    }
    parsed
      .join(broadcast(domainRules.withColumnRenamed("category", "dom_cat")),
        Seq("reg_domain"), "left")
      .select(col("doc_id"), col("url"), col("reg_domain"),
        coalesce(col("dom_cat"), kwVerdict, lit("keep")).as("verdict"))
  }

  /** Leakage-safe train/validation split by HOST: every document of a host
    * lands in the same split, so template near-duplicates, mirrored pages
    * and boilerplate shared within a site can never leak from train into
    * validation — the split-by-source rule every web-corpus eval setup
    * needs (split by row and your held-out loss is contaminated by
    * same-site near-dups). Production keys on the registrable domain
    * (blocklistGate's extraction); any key column works.
    *
    * The split is a pure function of the host — md5 bucket ∈ [0, 1000),
    * 'val' below `valPermille` — so it is reproducible across runs,
    * engines and corpus growth (a host keeps its split as new pages
    * arrive). Codegen'd zero-shuffle projection; the md5 spelling is the
    * repo's standard cross-engine bucket (Sketch.bucketSql idiom), so the
    * oracle replays it bit-exactly.
    */
  def hostSplit(urls: DataFrame, hostCol: String = "host", valPermille: Int = 100): DataFrame =
    urls.withColumn("bucket",
        expr(s"CAST(conv(substr(md5($hostCol), 1, 8), 16, 10) AS BIGINT) % 1000"))
      .withColumn("split",
        expr(s"CASE WHEN bucket < $valPermille THEN 'val' ELSE 'train' END"))

  /** Multi-label public suffixes the [[registrableDomainExpr]] heuristic
    * recognizes — a deterministic subset of the Mozilla Public Suffix List
    * covering the structurally common country-code second-level registries.
    * Deployment swaps in the full PSL as a resource; the EXPRESSION SHAPE
    * (suffix test → label count) is what this pins, and the subset is
    * enough for per-domain capping/stats to stop conflating `a.co.uk`
    * with `b.co.uk` under suffix `co.uk`.
    */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz", "ac.nz",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "org.br", "net.br", "gov.br",
    "com.cn", "org.cn", "net.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "org.za", "co.kr", "or.kr", "ac.kr",
    "com.pl", "com.ua", "com.vn", "co.th", "co.id")

  /** REGISTRABLE DOMAIN (eTLD+1) of a host column — the key per-domain
    * caps, host statistics and politeness actually need: `a.shop.co.uk`
    * and `b.shop.co.uk` are ONE registrant (`shop.co.uk`), while
    * `a.co.uk` and `b.co.uk` are TWO (`co.uk` is a public suffix, not a
    * domain). Pure codegen'd SQL (split + element_at + one IN) — no UDF,
    * no join; the suffix rule: a listed multi-label suffix, or a 2-letter
    * ccTLD whose second-to-last label is a generic registry word, keeps
    * THREE labels; everything else keeps two; one- and two-label hosts
    * pass through.
    */
  def registrableDomainExpr(host: String): String = {
    val set = multiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    val l = s"split($host, '\\\\.')"
    s"""CASE
       | WHEN size($l) <= 2 THEN $host
       | WHEN concat_ws('.', element_at($l, -2), element_at($l, -1)) IN ($set)
       |   OR (length(element_at($l, -1)) = 2
       |       AND element_at($l, -2) IN ('com','co','org','net','ac','gov','edu','or','ne','go'))
       | THEN concat_ws('.', element_at($l, -3), element_at($l, -2), element_at($l, -1))
       | ELSE concat_ws('.', element_at($l, -2), element_at($l, -1))
       |END""".stripMargin.replace("\n", " ")
  }

  /** `registrable_domain` appended from `hostCol` — zero-shuffle. */
  def registrableDomains(df: DataFrame, hostCol: String = "host"): DataFrame =
    df.withColumn("registrable_domain", expr(registrableDomainExpr(hostCol)))

  /** SURT key (Sort-friendly URI Reordering Transform) — the canonical key
    * of the web-archival world: CDX indexes, OpenWayback/pywb lookups and
    * Common Crawl's own index are all keyed on it. Reversing the host's
    * labels (`com,example)/path`) makes one registrant's urls a CONTIGUOUS
    * byte range, so "everything under example.com" becomes a prefix scan —
    * exactly the access shape [[graft.spark.PageCatalog]]'s LIKE-prefix
    * file pruning and a url-sorted table layout serve at 100 TB.
    *
    * Deterministic subset pinned here (the pywb `default` canonicalizer's
    * shape): lowercase; scheme and fragment dropped; one leading `www.`
    * stripped; host labels reversed and comma-joined; `)` separator; path
    * (default `/`); query keys sorted byte-wise with empty params dropped,
    * behind `?`. Ports are dropped with the scheme (parse_url HOST). A
    * non-absolute url (no host) keys NULL — callers filter or pass through.
    *
    * Pure codegen'd SQL (parse_url + split/reverse/sort_array) — no UDF,
    * zero shuffle, and every step replays bit-exactly in DuckDB.
    */
  def surtKeyExpr(url: String): String = {
    val host = s"lower(parse_url($url, 'HOST'))"
    val bare = s"CASE WHEN $host LIKE 'www.%' THEN substring($host, 5) ELSE $host END"
    val rev = s"array_join(reverse(split($bare, '[.]')), ',')"
    val path = s"CASE WHEN parse_url($url, 'PATH') IS NULL OR parse_url($url, 'PATH') = '' THEN '/' ELSE lower(parse_url($url, 'PATH')) END"
    val q = s"lower(parse_url($url, 'QUERY'))"
    val qj = s"array_join(sort_array(filter(split($q, '&'), x -> x <> '')), '&')"
    val qs = s"CASE WHEN $q IS NULL OR $qj = '' THEN '' ELSE concat('?', $qj) END"
    s"CASE WHEN $host IS NULL THEN NULL ELSE concat($rev, ')', $path, $qs) END"
  }

  /** `surt` appended from `urlCol` — zero-shuffle codegen'd projection. */
  def surtKeys(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("surt", expr(surtKeyExpr(urlCol)))

  /** Incoming ANCHOR-TEXT profile per link TARGET — the classic web-search
    * document-expansion signal (the anchors pointing AT a page describe it
    * better than its own text; search engines have indexed targets under
    * their incoming anchors since the first link-analysis papers). For each
    * target: total in-links, distinct anchor phrasings, and the TOP anchor
    * by (count desc, anchor asc) — deterministic argmax, so the DuckDB
    * window replay is bit-exact.
    *
    * Scale shape: one (target, anchor) partial-agged COUNT shuffle (the
    * corpus's anchor strings collapse to counts before anything wide),
    * then the total, the phrasing count and the argmax all ride ONE
    * target-keyed exchange (two Window nodes over the same key; the
    * row_number ≤ 1 form is WindowGroupLimit-eligible, so a mega-target's
    * anchor inventory streams instead of materializing per task).
    */
  def anchorTargets(edges: DataFrame, targetCol: String = "target",
                    anchorCol: String = "anchor"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = edges.groupBy(targetCol, anchorCol).agg(count(lit(1)).as("n"))
    val byT = Window.partitionBy(targetCol)
    val ranked = Window.partitionBy(targetCol).orderBy(col("n").desc, col(anchorCol))
    counts
      .withColumn("n_links", sum("n").over(byT))
      .withColumn("n_anchors", count(lit(1)).over(byT))
      .withColumn("__rn", row_number().over(ranked))
      .where("__rn = 1")
      .select(col(targetCol), col("n_links"), col("n_anchors"),
        col(anchorCol).as("top_anchor"), col("n").as("top_anchor_n"))
  }

  /** PER-DOMAIN FREQUENCY CAP (the C4/RefinedWeb domain-balancing step):
    * keep at most `cap` documents per domain, best-ranked first (rank
    * desc, id asc ties) — a handful of mega-hosts otherwise dominate any
    * crawl-derived corpus. One hash shuffle on the domain; the rank filter
    * is a row_number ≤ k, which Spark's WindowGroupLimit rewrite executes
    * as a streaming per-group TOP-K (each task keeps k rows per group, not
    * the group) — the 10⁹-page host never materializes or fully sorts
    * inside a task (plan-guarded in DomainCapSpec).
    */
  def domainCap(docs: DataFrame, cap: Int, domainCol: String = "host",
                rankCol: String = "quality", idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"domainCap: cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol)).orderBy(col(rankCol).desc, col(idCol))
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") <= cap).drop("__rn")
  }
}
