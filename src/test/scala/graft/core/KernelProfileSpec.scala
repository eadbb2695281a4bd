package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.{Extractor, ExtractSink}

/** Manual profiling harness: stage-by-stage MB/s so optimization effort goes
  * where the time is. Run: sbt "testOnly graft.core.KernelProfileSpec"
  */
class KernelProfileSpec extends AnyFunSuite {

  private final class NullSink extends TokenSink {
    var n = 0L
    def char(cp: Int): Unit = n += 1
    def tag(isStart: Boolean, name: String, selfClosing: Boolean, attrs: Vector[(String, String)]): Unit = n += 1
    def comment(data: String): Unit = n += 1
    def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit = n += 1
    def eof(name: String, msg: String): Unit = n += 1
    def parseError(code: String): Unit = ()
  }

  test("stage breakdown") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 60).trim
    val html = graft.spark.Pages.render(7L, 0, text, "en", "src1")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val mbPer = html.length / 1048576.0
    def bench(label: String, reps: Int)(f: () => Unit): Unit = {
      var i = 0; while (i < reps) { f(); i += 1 } // warm
      val t0 = System.nanoTime(); i = 0
      while (i < reps) { f(); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"$label%-28s ${reps * mbPer / sec}%8.1f MB/s")
    }
    val buf = new Array[Int](html.length + 16)
    val nullSink = new NullSink
    val sink = new ExtractSink
    val reps = 3000
    bench("decode-only", reps) { () => RefTokenizer.decodeUtf8Into(html, buf); () }
    val n = RefTokenizer.decodeUtf8Into(html, buf)
    bench("tokenize(null-sink)", reps) { () =>
      new RefTokenizer(buf, nullSink, specMode = true, inputLenIn = n).run()
    }
    bench("tokenize+extract-sink", reps) { () =>
      sink.reset()
      new RefTokenizer(buf, sink, specMode = true, inputLenIn = n).run()
    }
    bench("full extractInto", reps) { () => Extractor.extractInto(html, sink); () }
    assert(true)
  }
}
