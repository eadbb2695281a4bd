package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) parsing + crawl-frontier filtering —
  * the compliance gate every crawl pipeline runs before fetch scheduling.
  *
  * Parser semantics implemented (all RFC 9309):
  *   - groups: one or more `User-agent:` lines followed by Allow/Disallow
  *     rules; consecutive UA lines share one group; groups with the same
  *     selected specificity merge.
  *   - group selection: longest matching product-token prefix of the
  *     caller's agent wins; `*` matches any agent at specificity 0; no
  *     matching group → everything allowed.
  *   - rule match: byte-wise path prefix with `*` wildcards and a `$`
  *     end anchor.
  *   - decision: the longest (octet-length) matching pattern wins; on a
  *     tie Allow wins; no matching rule → allowed. Empty patterns match
  *     nothing (an empty `Disallow:` allows everything).
  *   - unknown fields (crawl-delay, sitemap, …) and `#` comments ignored.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** One parsed group: selected-agent specificity + the group's directive
    * lines (lowercased field, raw value) in order. The ONE group scanner
    * behind [[rulesFor]] and [[crawlDelaySeconds]] — comment stripping,
    * consecutive-UA stacking and the specificity rule live exactly once.
    */
  private final case class Group(var spec: Int,
      directives: scala.collection.mutable.ArrayBuffer[(String, String)])

  private def parseGroups(txt: String, agent: String): Vector[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var inUa = false // currently accumulating consecutive UA lines
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    txt.split('\n').foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          if (field == "user-agent") {
            if (!inUa) {
              cur = Group(-1, scala.collection.mutable.ArrayBuffer.empty)
              groups += cur
              inUa = true
            }
            val uaLc = value.toLowerCase(java.util.Locale.ROOT)
            val s =
              if (uaLc == "*") 0
              else if (agentLc.startsWith(uaLc)) uaLc.length
              else -1
            if (s > cur.spec) cur.spec = s
          } else {
            inUa = false
            if (cur != null) cur.directives += ((field, value))
          }
        }
      }
    }
    groups.toVector
  }

  private def selectedGroups(txt: String, agent: String): Vector[Group] = {
    val groups = parseGroups(txt, agent)
    val best = groups.foldLeft(-1)((m, g) => math.max(m, g.spec))
    if (best < 0) Vector.empty else groups.filter(_.spec == best)
  }

  /** Rules of the group(s) selected for `agent` (case-insensitive). */
  def rulesFor(txt: String, agent: String): Vector[Rule] =
    selectedGroups(txt, agent).flatMap(_.directives.collect {
      case (f, v) if (f == "allow" || f == "disallow") && v.nonEmpty =>
        Rule(f == "allow", v)
    })

  /** `Crawl-delay:` of the group selected for `agent` — the de-facto
    * politeness field real crawlers honor (not in RFC 9309, but Bing/
    * Yandex document it and every large crawler reads it). Group selection
    * is EXACTLY [[rulesFor]]'s: longest product-token match wins over `*`;
    * among the selected group(s), the first declared `digits[.digits]`
    * delay wins (Bing/Yandex accept fractional seconds — `0.5`, `2.5`;
    * rounded UP to the next whole second, the politeness-safe direction);
    * absent or non-numeric → `defaultS`. This is what turns a robots fetch
    * into the per-host politeness policy [[graft.operators.Crawl.fetchSchedule]]
    * consumes.
    */
  def crawlDelaySeconds(txt: String, agent: String, defaultS: Long = 1L): Long =
    selectedGroups(txt, agent).iterator
      .flatMap(_.directives.iterator.collect {
        case (f, v) if f == "crawl-delay" => parseDelay(v)
      }.flatten.take(1))
      .nextOption().getOrElse(defaultS)

  /** `digits[.digits]` → seconds rounded UP (ceil — a fractional delay is
    * honored, never shortened). ASCII-digit gate THEN toLongOption: a
    * 20-digit run is all digits but overflows Long — it must fall through
    * to the default, never throw inside a Spark task (and Char.isDigit
    * would admit non-ASCII Unicode digits). Garbage / empty → None.
    */
  private def parseDelay(v: String): Option[Long] = {
    val dot = v.indexOf('.')
    val (intPart, fracPart) =
      if (dot >= 0) (v.substring(0, dot), v.substring(dot + 1)) else (v, "")
    val asciiDigits = (s: String) => s.forall(c => c >= '0' && c <= '9')
    if (intPart.isEmpty || !asciiDigits(intPart) || !asciiDigits(fracPart)) None
    else intPart.toLongOption.flatMap { whole =>
      val roundUp = fracPart.exists(_ != '0')
      if (roundUp && whole == Long.MaxValue) None
      else Some(if (roundUp) whole + 1 else whole)
    }
  }

  /** (host, robots_txt) → (host, crawl_delay_s): narrow zero-shuffle map —
    * the robots corpus becomes the politeness-policy table directly.
    */
  def crawlDelays(robots: org.apache.spark.sql.DataFrame, agent: String,
                  defaultS: Long = 1L): org.apache.spark.sql.DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host"), col("robots_txt")).as[(String, String)]
      .map { case (h, t) => (h, crawlDelaySeconds(t, agent, defaultS)) }
      .toDF("host", "crawl_delay_s")
  }

  /** `Sitemap:` directives of a robots.txt — RFC 9309 treats them as an
    * extension outside any user-agent group (they apply file-wide, and real
    * crawlers harvest them as the primary sitemap-DISCOVERY channel before
    * ever fetching /sitemap.xml blind). Absolute URLs per the sitemaps.org
    * protocol; comments stripped; document order kept.
    */
  def sitemapsOf(txt: String): Vector[String] =
    txt.split('\n').iterator.flatMap { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toVector

  /** Per-host sitemap discovery over a (host, robots_txt) frame: one narrow
    * map, (host, sitemap_url, pos) out — the feed the [[Sitemap]] parser
    * then expands into the crawl frontier.
    */
  def sitemapDirectives(robots: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select("host", "robots_txt").as[(String, String)]
      .flatMap { case (h, txt) =>
        sitemapsOf(txt).zipWithIndex.map { case (u, i) => (h, u, i) }
      }
      .toDF("host", "sitemap_url", "pos")
  }

  /** RFC 9309 path match: literal prefix with `*` wildcards, `$` anchor.
    * Middle segments match greedy-leftmost; the final segment matches
    * anywhere after them (unanchored) or exactly at the end (`$`).
    */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var idx = parts(0).length
    val lastIdx = parts.length - 1
    var k = 1
    while (k < lastIdx) {
      val part = parts(k)
      if (part.nonEmpty) {
        val at = path.indexOf(part, idx)
        if (at < 0) return false
        idx = at + part.length
      }
      k += 1
    }
    if (lastIdx == 0) { if (anchored) path.length == idx else true }
    else {
      val last = parts(lastIdx)
      if (last.isEmpty) true // trailing '*': any suffix, anchored or not
      else if (anchored) path.endsWith(last) && path.length - last.length >= idx
      else path.indexOf(last, idx) >= 0
    }
  }

  /** Most-specific-rule decision over a parsed rule set. */
  def allowed(rules: Seq[(Boolean, String)], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val (al, pat) = rules(i)
      if (matches(pat, path)) {
        val l = pat.length
        if (l > bestLen || (l == bestLen && al)) { bestLen = l; bestAllow = al }
      }
      i += 1
    }
    bestAllow
  }

  /** Frontier filter: `frontier(url)` ⋈ `robots(host, robots_txt)` →
    * (url, host, allowed 0/1).
    *
    * Scale shape: robots are parsed ONCE per host row in a narrow typed map
    * (the compiled rule set — not the text — flows into the join); the join
    * is keyed by host (the robots side is host-cardinality — ~10^8 rows at
    * crawl scale, far too big to broadcast safely — so both sides shuffle
    * on the key once). Hosts with no robots row default to allowed (RFC:
    * unreachable robots.txt on a 2xx-less host ⇒ no restrictions).
    */
  def robotsFilter(frontier: DataFrame, robots: DataFrame, agent: String): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val parsed = robots.select(col("host"), col("robots_txt")).as[(String, String)]
      .map { case (h, t) => (h, rulesFor(t, agent).map(r => (r.allow, r.pattern))) }
      .toDF("host", "rules")
    frontier
      .selectExpr("url", "parse_url(url, 'HOST') AS host", "parse_url(url, 'PATH') AS path")
      .join(parsed, Seq("host"), "left")
      .as[(String, String, String, Option[Seq[(Boolean, String)]])]
      .map { case (host, url, path, rules) =>
        val ok = rules match {
          case Some(rs) => allowed(rs, if (path == null) "/" else path)
          case None => true
        }
        (url, host, if (ok) 1 else 0)
      }
      .toDF("url", "host", "allowed")
  }
}
