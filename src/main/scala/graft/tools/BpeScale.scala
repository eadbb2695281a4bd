package graft.tools

import org.apache.spark.sql.SparkSession

/** Production-k BPE wall-clock measurement — the honesty check on
  * bpeTrainDriver's "k=32,000 is a driver loop" claim: synthesizes a
  * realistic vocabulary (Zipf-weighted pseudo-words; vocab size and k from
  * args), runs the driver trainer, prints one JSON line with the timings
  * split into the distributed collapse vs the driver merge loop.
  *
  * Usage: runMain graft.tools.BpeScale [vocabWords] [k]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val vocabWords = if (args.length > 0) args(0).toInt else 50000
    val k = if (args.length > 1) args(1).toInt else 32000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic Zipf-ish corpus: word i appears ~ N/(i+1) times; words
    // are 4-12 lowercase chars with natural digraph reuse (prefix sharing)
    val rng = new scala.util.Random(0xC0FFEE)
    val letters = "etaoinshrdlucmfwypvbgkjqxz" // frequency-ordered
    val words = (0 until vocabWords).map { _ =>
      val len = 4 + rng.nextInt(9)
      (0 until len).map { _ =>
        // skewed letter draw (quadratic) gives natural pair frequencies
        val r = rng.nextDouble(); letters(((r * r) * 26).toInt.min(25))
      }.mkString
    }
    // one doc per word batch, counts via repetition within the text
    val docs = words.zipWithIndex.map { case (w, i) =>
      val reps = math.max(1, vocabWords / (i + 1) / 10)
      (i.toLong, (Seq.fill(math.min(reps, 200))(w)).mkString(" "))
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val (merges, vocab) = graft.operators.TextOps.bpeTrainDriver(docs, k)
    val wall = (System.nanoTime() - t0) / 1e9
    val avgToks = vocab.map(_._2.split('·').count(_.nonEmpty)).sum.toDouble / vocab.length
    println(f"""{"metric":"bpe_scale","vocab_words":${vocab.length},"k":$k,"merges":${merges.length},"wall_sec":$wall%.1f,"avg_tokens_per_word":$avgToks%.2f}""")
    spark.stop()
  }
}
