package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap protocol (sitemaps.org XML) parsing — the crawl-frontier
  * DISCOVERY side that complements the Robots compliance gate: a crawl
  * pipeline reads robots.txt for permission and sitemap.xml for the url
  * inventory, then schedules fetches from the filtered union.
  *
  * Both document kinds are handled:
  *   - `<urlset>`: `<url>` entries with `<loc>` (required) and optional
  *     `<lastmod>` → kind "url"
  *   - `<sitemapindex>`: `<sitemap>` entries (nested sitemap files) →
  *     kind "sitemap"
  *
  * Tolerances a crawl-scale parser needs: attributes on any tag,
  * whitespace around values, XML entity decode (named + numeric),
  * CDATA-wrapped locs, entries missing `<loc>` skipped, truncated
  * trailing entries skipped — all via bounded forward index scanning
  * (no regex, no backtracking, no DOM allocation; O(bytes) per doc).
  */
object Sitemap {

  final case class Entry(kind: String, loc: String, lastmod: String)

  /** Index just after the `>` of the next `<name ...>` open tag at/after
    * `from`, or -1. A prefix collision (`<urlset` when probing `url`) is
    * rejected by requiring `>` or whitespace right after the name.
    */
  private[operators] def tagOpen(s: String, name: String, from: Int): Int = {
    val probe = "<" + name
    var i = from
    while (i < s.length) {
      val j = s.indexOf(probe, i)
      if (j < 0) return -1
      val after = j + probe.length
      if (after < s.length && (s.charAt(after) == '>' || Character.isWhitespace(s.charAt(after)))) {
        val gt = s.indexOf('>', after)
        return if (gt < 0) -1 else gt + 1
      }
      i = j + 1
    }
    -1
  }

  /** Decoded text content of the first `<name>` element between `from`
    * and `until`, or null if absent/unclosed in that window.
    */
  private[operators] def textOf(s: String, name: String, from: Int, until: Int): String = {
    val start = tagOpen(s, name, from)
    if (start < 0 || start > until) return null
    val close = s.indexOf("</" + name + ">", start)
    if (close < 0 || close > until) return null
    decode(s.substring(start, close).trim)
  }

  /** Entity decode (named amp/lt/gt/quot/apos + numeric dec/hex) or raw
    * CDATA unwrap. Unknown/malformed references pass through literally —
    * the tolerant choice for crawl data.
    */
  private[operators] def decode(t0: String): String = {
    if (t0.startsWith("<![CDATA[") && t0.endsWith("]]>"))
      return t0.substring(9, t0.length - 3)
    if (t0.indexOf('&') < 0) return t0
    val sb = new StringBuilder(t0.length)
    var i = 0
    while (i < t0.length) {
      val c = t0.charAt(i)
      if (c == '&') {
        val semi = t0.indexOf(';', i + 1)
        val rep: String =
          if (semi > i && semi - i <= 10) {
            val ent = t0.substring(i + 1, semi)
            ent match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case e if e.length > 2 && (e.charAt(0) == '#') && (e.charAt(1) == 'x' || e.charAt(1) == 'X') =>
                try String.valueOf(Character.toChars(Integer.parseInt(e.substring(2), 16)))
                catch { case _: Exception => null }
              case e if e.length > 1 && e.charAt(0) == '#' =>
                try String.valueOf(Character.toChars(Integer.parseInt(e.substring(1))))
                catch { case _: Exception => null }
              case _ => null
            }
          } else null
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse one sitemap document into its entries, document order. */
  def parse(xml: String): Vector[Entry] = {
    if (xml == null) return Vector.empty
    val (container, childName, kind) =
      if (tagOpen(xml, "sitemapindex", 0) >= 0) ("sitemapindex", "sitemap", "sitemap")
      else ("urlset", "url", "url")
    var pos = tagOpen(xml, container, 0)
    if (pos < 0) return Vector.empty
    val out = Vector.newBuilder[Entry]
    var go = true
    while (go) {
      val cStart = tagOpen(xml, childName, pos)
      if (cStart < 0) go = false
      else {
        val cClose = xml.indexOf("</" + childName + ">", cStart)
        val cEnd = if (cClose < 0) xml.length else cClose
        val loc = textOf(xml, "loc", cStart, cEnd)
        if (loc != null && loc.nonEmpty) {
          val lm = textOf(xml, "lastmod", cStart, cEnd)
          out += Entry(kind, loc, if (lm == null) "" else lm)
        }
        pos = if (cClose < 0) xml.length else cClose + childName.length + 3
        if (pos >= xml.length) go = false
      }
    }
    out.result()
  }

  /** Distributed form: (doc_id, host, xml) → one row per entry, document
    * order. A narrow typed flatMap — ZERO shuffle; at crawl scale this is
    * one streaming pass over the sitemap fetch results, and the output
    * feeds `Robots.filterFrontier` for the fetch schedule.
    */
  def parseSitemaps(sitemaps: DataFrame): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col("doc_id"), col("host"), col("xml")).as[(Long, String, String)]
      .flatMap { case (id, h, xml) =>
        parse(xml).zipWithIndex.map { case (e, i) => (id, h, i, e.kind, e.loc, e.lastmod) }
      }
      .toDF("doc_id", "host", "entry_idx", "kind", "loc", "lastmod")
  }
}
