package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.{Extractor, ExtractSink}

/** Single-thread kernel throughput probe (run manually:
  * `sbt "testOnly graft.core.KernelBenchSpec"`). Not a correctness test —
  * prints MB/sec so regressions in the hot loop are visible.
  */
class KernelBenchSpec extends AnyFunSuite {
  test("kernel single-thread throughput") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 20).trim
    val html = graft.spark.Pages.render(7L, 0, text, "en", "src1")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // production path: per-partition reused sink + decode buffer
    val sink = new ExtractSink
    // warm-up
    var i = 0
    while (i < 2000) { Extractor.extractInto(html, sink); i += 1 }
    val n = 5000
    val t0 = System.nanoTime()
    i = 0
    while (i < n) { Extractor.extractInto(html, sink); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = n.toLong * html.length / 1048576.0
    info(f"page=${html.length} bytes; $mb%.1f MB in $sec%.2f s = ${mb / sec}%.1f MB/s single-thread")
    assert(mb / sec > 1.0)
  }
}
