package graft.operators

import org.apache.spark.sql.DataFrame

/** RSS 2.0 / Atom feed parsing — the third leg of crawl-frontier
  * discovery (robots.txt = permission, sitemap.xml = inventory, feeds =
  * FRESHNESS: what changed since the last crawl). A fetch scheduler polls
  * feeds between full sitemap walks and enqueues only the new items.
  *
  * Both formats through one parser:
  *   - RSS 2.0: `<channel><item>` with `<title>`, `<link>` (text content),
  *     `<pubDate>`, `<guid>` → fmt "rss"
  *   - Atom: `<feed><entry>` with `<title>`, `<link href="..."/>`
  *     (attribute, `rel="alternate"` or unqualified preferred),
  *     `<published>` (falling back to `<updated>`), `<id>` → fmt "atom"
  *
  * Same tolerances as [[Sitemap]] (whose bounded index-scan helpers this
  * reuses): attributes anywhere, CDATA + entity decode, items missing a
  * link skipped, truncated trailing items skipped. O(bytes) per document,
  * zero regex — and the operator is a narrow per-row flatMap: zero
  * shuffle at any corpus size.
  */
object Feed {

  final case class Item(fmt: String, idx: Int, title: String, link: String,
                        published: String, guid: String)

  /** The raw `<name ...>` tag heads inside [from, until), in order —
    * what Atom link-attribute extraction scans. */
  private def tagHeads(s: String, name: String, from: Int, until: Int): Vector[String] = {
    val probe = "<" + name
    val out = Vector.newBuilder[String]
    var i = from
    var go = true
    while (go) {
      val j = s.indexOf(probe, i)
      if (j < 0 || j >= until) go = false
      else {
        val after = j + probe.length
        val boundary = after < s.length &&
          (s.charAt(after) == '>' || s.charAt(after) == '/' ||
            Character.isWhitespace(s.charAt(after)))
        val gt = s.indexOf('>', j)
        if (gt < 0 || gt >= until) go = false
        else {
          if (boundary) out += s.substring(j, gt + 1)
          i = gt + 1
        }
      }
    }
    out.result()
  }

  /** `attr="v"` / `attr='v'` value in a raw tag head, decoded; null if
    * absent. */
  private def attrOf(tag: String, attr: String): String = {
    val probe = attr + "="
    var i = tag.indexOf(probe)
    while (i >= 0) {
      val before = tag.charAt(i - 1)
      if (Character.isWhitespace(before)) {
        val q = tag.charAt(i + probe.length)
        if (q == '"' || q == '\'') {
          val end = tag.indexOf(q, i + probe.length + 1)
          if (end < 0) return null
          return Sitemap.decode(tag.substring(i + probe.length + 1, end))
        }
      }
      i = tag.indexOf(probe, i + 1)
    }
    null
  }

  /** Parse one feed document into its items, document order. */
  def parse(xml: String): Vector[Item] = {
    if (xml == null) return Vector.empty
    val atom = Sitemap.tagOpen(xml, "feed", 0) >= 0 && Sitemap.tagOpen(xml, "rss", 0) < 0
    val (childName, fmt) = if (atom) ("entry", "atom") else ("item", "rss")
    var pos = Sitemap.tagOpen(xml, if (atom) "feed" else "channel", 0)
    if (pos < 0) return Vector.empty
    val out = Vector.newBuilder[Item]
    var idx = 0
    var go = true
    while (go) {
      val cStart = Sitemap.tagOpen(xml, childName, pos)
      if (cStart < 0) go = false
      else {
        val cClose = xml.indexOf("</" + childName + ">", cStart)
        if (cClose < 0) go = false // truncated trailing item: skip
        else {
          val title = Option(Sitemap.textOf(xml, "title", cStart, cClose)).getOrElse("")
          val link =
            if (atom) {
              val heads = tagHeads(xml, "link", cStart, cClose)
              val hrefs = heads.map(h => (attrOf(h, "rel"), attrOf(h, "href")))
              hrefs.collectFirst { case (rel, href) if href != null &&
                  (rel == null || rel == "alternate") => href }
                .orElse(hrefs.collectFirst { case (_, href) if href != null => href })
                .orNull
            } else Sitemap.textOf(xml, "link", cStart, cClose)
          val published =
            if (atom) Option(Sitemap.textOf(xml, "published", cStart, cClose))
              .getOrElse(Option(Sitemap.textOf(xml, "updated", cStart, cClose)).getOrElse(""))
            else Option(Sitemap.textOf(xml, "pubDate", cStart, cClose)).getOrElse("")
          val guid =
            if (atom) Option(Sitemap.textOf(xml, "id", cStart, cClose)).getOrElse("")
            else Option(Sitemap.textOf(xml, "guid", cStart, cClose)).getOrElse("")
          if (link != null && link.nonEmpty) {
            out += Item(fmt, idx, title, link, published, guid)
            idx += 1
          }
          pos = cClose + childName.length + 3
        }
      }
    }
    out.result()
  }

  /** Corpus form: one row per discovered item, document order preserved
    * via idx. Narrow flatMap — zero shuffle.
    */
  def parseFeeds(feeds: DataFrame, urlCol: String = "url",
                 xmlCol: String = "xml"): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.selectExpr(s"`$urlCol` AS u", s"`$xmlCol` AS x").as[(String, String)]
      .flatMap { case (u, x) =>
        parse(x).map(i => (u, i.fmt, i.idx, i.title, i.link, i.published, i.guid))
      }
      .toDF("feed_url", "fmt", "idx", "title", "link", "published", "guid")
  }
}
