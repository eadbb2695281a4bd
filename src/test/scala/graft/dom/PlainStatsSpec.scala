package graft.dom

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.Pages
import graft.core.FidelityCountSink

/** Guards the closed-form accounting that the q_extract_stats /
  * q_tokenize_fidelity DuckDB oracles assert:
  *   n_tags   = 12
  *   n_tokens = 15 + digits(doc_id) + length(text)
  *   bytes_in = plainOverhead + digits + length(lang) + utf8(text)
  *   fidelity_len = 1 + digits + length(text)
  */
class PlainStatsSpec extends AnyFunSuite {

  private val cases = Seq(
    (7L, "hello world this is a plain document body", "en"),
    (123L, "alpha beta gamma delta epsilon zeta eta theta", "de"),
    (999999L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es")
  )

  test("extract-mode stats match the closed form") {
    for ((id, text, lang) <- cases) {
      val html = Pages.renderPlain(id, text, lang).getBytes("UTF-8")
      val r = Extractor.extract(html)
      val digits = id.toString.length
      assert(r.nTags == 12L, s"nTags for doc $id")
      assert(r.nTokens == 15L + digits + text.length, s"nTokens for doc $id")
      assert(r.spans.length == 1 && r.spans.head.start == 0 && r.spans.head.end == text.length)
      assert(r.nErrors == 0)
      assert(r.mainText == text)
      assert(html.length == Pages.plainOverhead + digits + lang.length + text.getBytes("UTF-8").length)
    }
  }

  test("fidelity-mode char count matches the closed form") {
    for ((id, text, lang) <- cases) {
      val html = Pages.renderPlain(id, text, lang).getBytes("UTF-8")
      val sink = new FidelityCountSink
      val truncated = Extractor.fidelityInto(html, sink)
      assert(!truncated)
      assert(sink.nChars == 1L + id.toString.length + text.length, s"fidelity_len for doc $id")
      // and the reusable counting sink agrees with the materializing path
      assert(sink.nChars == Extractor.fidelityText(html)._1.length.toLong)
    }
  }
}
