package graft.dom

import graft.core._

/** One contiguous text run in the extracted text, with its DOM anchor.
  * Offsets are Java char (UTF-16 code unit) offsets into the full text.
  */
final case class Span(start: Int, end: Int, path: String, block: Int, link: Boolean, kept: Boolean)

final case class ExtractResult(
    text: String, // all in-content character tokens (boilerplate subtrees elided)
    mainText: String, // density-filtered main content
    spans: Vector[Span],
    nTokens: Long,
    nTags: Long,
    nErrors: Int,
    errors: Vector[String],
    truncated: Boolean,
    stateHits: Array[Long]
)

object ExtractConfig {
  /** Subtrees whose character data is never content. */
  val blacklist: Set[String] = Set(
    "script", "style", "template", "noscript", "head", "svg", "math",
    "nav", "footer", "aside", "form", "iframe", "object", "applet",
    "select", "option", "button", "datalist"
  )
  /** Void elements (never pushed on the open stack). */
  val voids: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr"
  )
  /** Block-level grouping for text-density scoring. */
  val blocks: Set[String] = Set(
    "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "section", "article", "main", "body", "table",
    "ul", "ol", "tr", "dd", "dt", "figcaption", "summary"
  )
  /** A start of any of these auto-closes an open <p> (minimal implied-end
    * subset of WHATWG §13.2.6.4.7). */
  val closesP: Set[String] = Set(
    "p", "div", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "blockquote", "pre", "section", "article", "main", "dl"
  )
  val minBlockTextLen = 8
  val maxLinkDensity = 0.5
}

/** Flat DOM arena: nodes are appended, never moved; parent/child indices only
  * (north star: "lightweight DOM arena (flat node array with parent/child
  * indices)"). Element text is not stored here — spans index into the
  * extracted text buffer instead.
  */
final class Arena {
  // flat primitive arrays (no boxing on the per-tag hot path), grown 2×
  private var cap = 64
  var name: Array[String] = new Array[String](cap) // null for text nodes
  var parent: Array[Int] = new Array[Int](cap)
  var firstChild: Array[Int] = new Array[Int](cap)
  var nextSibling: Array[Int] = new Array[Int](cap)
  var lastChild: Array[Int] = new Array[Int](cap)
  private var n = 0

  def clear(): Unit = { java.util.Arrays.fill(name.asInstanceOf[Array[AnyRef]], 0, n, null); n = 0 }

  private def grow(): Unit = {
    cap *= 2
    name = java.util.Arrays.copyOf(name, cap)
    parent = java.util.Arrays.copyOf(parent, cap)
    firstChild = java.util.Arrays.copyOf(firstChild, cap)
    nextSibling = java.util.Arrays.copyOf(nextSibling, cap)
    lastChild = java.util.Arrays.copyOf(lastChild, cap)
  }

  def add(nm: String, par: Int): Int = {
    if (n == cap) grow()
    val id = n
    name(id) = nm; parent(id) = par; firstChild(id) = -1; nextSibling(id) = -1; lastChild(id) = -1
    n += 1
    if (par >= 0) {
      if (firstChild(par) < 0) firstChild(par) = id
      else nextSibling(lastChild(par)) = id
      lastChild(par) = id
    }
    id
  }
  def size: Int = n
}

/** Streams extract-mode tokenizer events into the arena + text buffer and
  * applies boilerplate-strip + text-density heuristics. All heuristics are
  * deterministic; no wall clock, no randomness.
  */
final class ExtractSink extends TokenSink {
  import ExtractConfig._
  import scala.collection.mutable.ArrayBuffer

  val arena = new Arena
  private var root = arena.add("#root", -1)

  // open-element stack (parallel arrays)
  private val stkNode = ArrayBuffer(root)
  private val stkName = ArrayBuffer("#root")
  private var skipDepth = 0 // >0 → inside blacklisted subtree
  private var linkDepth = 0
  private var blockTop = root // nearest open block node

  private val text = new java.lang.StringBuilder
  private val spans = ArrayBuffer.empty[Span]
  // current run
  private var runStart = -1
  private var runOwner = root
  private var runBlock = root
  private var runLink = false
  private var runPath = ""

  var nTokens = 0L
  var nTags = 0L
  val errors = ArrayBuffer.empty[String]

  /** caller-reused UTF-8 decode buffer (see Extractor.extractInto) */
  var decodeBuf: Array[Int] = new Array[Int](8192)

  /** Reuse across rows (per-partition kernel): clears all state, keeps the
    * grown buffers' capacity — the per-row allocation win at 10^12 docs.
    */
  def reset(): Unit = {
    arena.clear()
    root = arena.add("#root", -1)
    stkNode.clear(); stkNode += root
    stkName.clear(); stkName += "#root"
    skipDepth = 0; linkDepth = 0; blockTop = root
    text.setLength(0)
    spans.clear()
    runStart = -1; runOwner = root; runBlock = root; runLink = false; runPath = ""
    nTokens = 0L; nTags = 0L
    errors.clear()
  }

  private def closeRun(): Unit = {
    if (runStart >= 0 && text.length > runStart) {
      spans += Span(runStart, text.length, runPath, runBlock, runLink, kept = true)
    }
    runStart = -1
  }

  private def pathOf(): String = {
    val sb = new java.lang.StringBuilder
    var i = 1
    while (i < stkName.length) {
      sb.append('/').append(stkName(i))
      i += 1
    }
    sb.append('#').append(stkNode(stkName.length - 1))
    sb.toString
  }

  private def startRunIfNeeded(): Unit = {
    if (runStart < 0) {
      runStart = text.length
      runOwner = stkNode(stkNode.length - 1)
      runBlock = blockTop
      runLink = linkDepth > 0
      runPath = pathOf()
    }
  }

  override def char(cp: Int): Unit = {
    nTokens += 1
    if (skipDepth == 0) {
      startRunIfNeeded()
      text.appendCodePoint(cp)
    }
  }

  override def chars(src: Array[Int], from: Int, until: Int): Unit = {
    if (until <= from) return
    nTokens += until - from
    if (skipDepth == 0) {
      startRunIfNeeded()
      var i = from
      while (i < until) { text.appendCodePoint(src(i)); i += 1 }
    }
  }

  override def charsAscii(src: Array[Byte], from: Int, until: Int): Unit = {
    if (until <= from) return
    nTokens += until - from
    if (skipDepth == 0) {
      startRunIfNeeded()
      var i = from
      while (i < until) { text.append(src(i).toChar); i += 1 }
    }
  }

  private def recomputeBlockTop(): Unit = {
    var i = stkName.length - 1
    while (i > 0 && !blocks.contains(stkName(i))) i -= 1
    blockTop = stkNode(i)
  }

  private def popTo(idx: Int): Unit = {
    // pop stack entries above and including idx
    var i = stkName.length - 1
    while (i >= idx) {
      val nm = stkName(i)
      if (blacklist.contains(nm)) skipDepth -= 1
      if (nm == "a") linkDepth -= 1
      stkName.remove(i)
      stkNode.remove(i)
      i -= 1
    }
    recomputeBlockTop()
  }

  override def tag(isStart: Boolean, name: String, selfClosing: Boolean, attrs: Vector[(String, String)]): Unit = {
    nTokens += 1
    nTags += 1
    closeRun()
    if (isStart) {
      if (closesP.contains(name)) {
        // minimal implied end: a new block closes an open <p>
        val i = stkName.lastIndexOf("p")
        if (i > 0) popTo(i)
      }
      if (name == "li") {
        val i = stkName.lastIndexOf("li")
        if (i > 0) popTo(i)
      }
      val par = stkNode(stkNode.length - 1)
      val id = arena.add(name, par)
      if (!selfClosing && !voids.contains(name)) {
        stkNode += id
        stkName += name
        if (blacklist.contains(name)) skipDepth += 1
        if (name == "a") linkDepth += 1
        if (blocks.contains(name)) blockTop = id
      }
    } else {
      val i = stkName.lastIndexOf(name)
      if (i > 0) popTo(i) // unmatched end tags ignored
    }
  }

  override def comment(data: String): Unit = { nTokens += 1; closeRun() } // elided
  override def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit = {
    nTokens += 1; closeRun()
  }
  override def eof(name: String, msg: String): Unit = { nTokens += 1; closeRun() }
  override def parseError(code: String): Unit = errors += code

  /** Finalize: text-density scoring per block → mainText. */
  def result(truncated: Boolean, stateHits: Array[Long]): ExtractResult = {
    closeRun()
    val full = text.toString
    // per-block totals
    val totalLen = scala.collection.mutable.HashMap.empty[Int, Int]
    val linkLen = scala.collection.mutable.HashMap.empty[Int, Int]
    spans.foreach { s =>
      val n = s.end - s.start
      totalLen.update(s.block, totalLen.getOrElse(s.block, 0) + n)
      if (s.link) linkLen.update(s.block, linkLen.getOrElse(s.block, 0) + n)
    }
    def keepBlock(b: Int): Boolean = {
      val t = totalLen.getOrElse(b, 0)
      val l = linkLen.getOrElse(b, 0)
      t >= minBlockTextLen && l.toDouble <= maxLinkDensity * t
    }
    // append straight from the text builder (no second full-copy); when every
    // span is kept (the common page), mainText IS full — skip the copy.
    val allKept = spans.forall(s => keepBlock(s.block))
    val main = new java.lang.StringBuilder(if (allKept) 0 else full.length)
    val finalSpans = spans.map { s =>
      val kept = keepBlock(s.block)
      if (kept && !allKept) main.append(text, s.start, s.end)
      s.copy(kept = kept)
    }
    val mainStr = if (allKept) full else main.toString
    ExtractResult(full, mainStr, finalSpans.toVector, nTokens, nTags,
      errors.length, errors.toVector, truncated, stateHits)
  }
}

/** Per-document extraction entry point: html bytes → extracted text + spans.
  * This is the single-node "oracle"; the Spark kernel calls exactly this per
  * row, so Spark(k partitions) ≡ oracle by construction.
  */
object Extractor {
  /** Extract mode (production): spec tree-feedback tokenizer. */
  def extract(html: Array[Byte]): ExtractResult = extractCps(RefTokenizer.decodeUtf8(html))

  def extractString(html: String): ExtractResult = extractCps(RefTokenizer.codepoints(html))

  def extractCps(cps: Array[Int]): ExtractResult = extractCpsInto(cps, new ExtractSink)

  /** Kernel entry with a caller-owned (reusable) sink: resets it, runs the
    * tokenizer, finalizes. One sink per partition → per-row allocations drop
    * to the tokenizer registers + output row.
    */
  def extractCpsInto(cps: Array[Int], sink: ExtractSink): ExtractResult = {
    sink.reset()
    val tk = new RefTokenizer(cps, sink, specMode = true)
    var truncated = false
    try tk.run()
    catch {
      case _: StepBudgetExceeded => truncated = true; sink.errors += "STEP_BUDGET_EXCEEDED"
      case _: VCastPanic => truncated = true; sink.errors += "V_CAST_PANIC"
    }
    sink.result(truncated, tk.stateHits)
  }

  /** Reusable variant of `extract` for per-partition loops: both the decode
    * buffer (sink-owned, grown once) and the sink's internal buffers are
    * reused across rows — per-row allocation drops to tokenizer registers +
    * the output row itself.
    */
  def extractInto(html: Array[Byte], sink: ExtractSink): ExtractResult = {
    // pure-ASCII page (the dominant web case): bytes ARE codepoints — skip
    // the 4× Int expansion entirely and run the kernel in byte mode
    var i = 0
    while (i < html.length && html(i) >= 0) i += 1
    if (i == html.length) {
      sink.reset()
      runGuarded(new RefTokenizer(null, sink, specMode = true, binput = html), sink)
    } else {
      if (sink.decodeBuf.length < html.length)
        sink.decodeBuf = new Array[Int](math.max(html.length, sink.decodeBuf.length * 2))
      val n = RefTokenizer.decodeUtf8Into(html, sink.decodeBuf)
      if (n < 0) extractCpsInto(RefTokenizer.decodeUtf8(html), sink) // malformed → JDK semantics
      else {
        sink.reset()
        runGuarded(new RefTokenizer(sink.decodeBuf, sink, specMode = true, inputLenIn = n), sink)
      }
    }
  }

  private def runGuarded(tk: RefTokenizer, sink: ExtractSink): ExtractResult = {
    var truncated = false
    try tk.run()
    catch {
      case _: StepBudgetExceeded => truncated = true; sink.errors += "STEP_BUDGET_EXCEEDED"
      case _: VCastPanic => truncated = true; sink.errors += "V_CAST_PANIC"
    }
    sink.result(truncated, tk.stateHits)
  }

  /** Fidelity mode: the raw reference-semantics character stream (text =
    * concatenated CharacterToken data, nothing elided). Defines the
    * byte-compare fixture layer.
    */
  def fidelityText(html: Array[Byte]): (String, Boolean) = {
    val sink = new CollectingSink
    val tk = new RefTokenizer(RefTokenizer.decodeUtf8(html), sink, specMode = false)
    var truncated = false
    try tk.run()
    catch {
      case _: StepBudgetExceeded => truncated = true
      case _: VCastPanic => truncated = true
    }
    (sink.charText, truncated)
  }

  /** Fidelity run into a caller-reused sink (no token materialization, byte
    * mode for pure-ASCII pages). Returns the truncated flag.
    */
  def fidelityInto(html: Array[Byte], sink: TokenSink): Boolean = {
    var i = 0
    while (i < html.length && html(i) >= 0) i += 1
    val tk =
      if (i == html.length) new RefTokenizer(null, sink, specMode = false, binput = html)
      else new RefTokenizer(RefTokenizer.decodeUtf8(html), sink, specMode = false)
    try { tk.run(); false }
    catch {
      case _: StepBudgetExceeded => true
      case _: VCastPanic => true
    }
  }
}
