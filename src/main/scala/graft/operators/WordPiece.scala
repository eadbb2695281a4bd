package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece vocabulary induction (Schuster & Nakajima 2012; the BERT
  * tokenizer family) — the THIRD tokenizer trainer next to BPE and
  * unigram-LM, differing from BPE in exactly one place: the merge argmax is
  * the LIKELIHOOD-RATIO score
  *
  *     score(a, b) = count(ab) / (count(a) · count(b))
  *
  * (the pair that most exceeds its unigram-independence expectation — a
  * rare-but-always-together pair beats a frequent-but-incidental one),
  * where count(·) is the symbol's weighted frequency under the CURRENT
  * segmentation, recomputed as merges land. Everything else — the one
  * distributed (word, cnt) collapse, the driver merge loop with incremental
  * pair/symbol counts, the two-pass leftmost-non-overlap replace — is the
  * proven BPE machinery ([[TextOps.bpeTrainDriver]]).
  *
  * Determinism contract: scores compare as EXACT RATIONALS by cross-
  * multiplication (BigInt — no float argmax anywhere), ties break on
  * (lhs, rhs) ascending; the DuckDB oracle replays the same comparison in
  * HUGEINT, so the whole trainer is bit-replayable.
  *
  * Scale shape: identical to production BPE — the corpus collapses once
  * with the partial-agged distributed shuffle (the vocabulary table is MBs
  * by Heaps' law), each merge is an O(occurrences) driver update through
  * the inverted index, and encode is a broadcast vocab join (k never enters
  * the plan).
  */
object WordPiece {

  /** Train `k` merges; returns (merges, vocab) where merges carry the full
    * rational evidence (iter, lhs, rhs, c_pair, c_lhs, c_rhs) and vocab is
    * (word, interpunct symbol string) after all merges.
    */
  def trainDriver(docs: DataFrame, k: Int):
      (Array[(Int, String, String, Long, Long, Long)], Array[(String, String)]) = {
    import scala.collection.mutable
    val vocab0 = docs
      .selectExpr("explode(split(text, ' ')) AS word")
      .where("word RLIKE '^[a-z]+$'")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .selectExpr("cnt", "concat('·', regexp_replace(word, '(.)', '$1·')) AS s")
      .collect()
    val cnts = vocab0.map(_.getLong(0))
    val syms = vocab0.map(_.getString(1))
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val symCnt = mutable.HashMap.empty[String, Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def parts(s: String): Array[String] = s.split('·').filter(_.nonEmpty)
    def eachPair(s: String)(f: ((String, String)) => Unit): Unit = {
      val p = parts(s); var i = 0
      while (i < p.length - 1) { f((p(i), p(i + 1))); i += 1 }
    }
    def eachSym(s: String)(f: String => Unit): Unit = parts(s).foreach(f)
    def retract(w: Int): Unit = {
      eachPair(syms(w)) { p =>
        val nv = pairCnt(p) - cnts(w)
        if (nv == 0L) pairCnt.remove(p) else pairCnt(p) = nv
      }
      eachSym(syms(w)) { a =>
        val nv = symCnt(a) - cnts(w)
        if (nv == 0L) symCnt.remove(a) else symCnt(a) = nv
      }
    }
    def admit(w: Int): Unit = {
      eachPair(syms(w)) { p =>
        pairCnt(p) = pairCnt.getOrElse(p, 0L) + cnts(w)
        occ.getOrElseUpdate(p, mutable.BitSet.empty) += w
      }
      eachSym(syms(w))(a => symCnt(a) = symCnt.getOrElse(a, 0L) + cnts(w))
    }
    syms.indices.foreach(admit)
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    var iter = 1
    var done = false
    while (iter <= k && !done) {
      // argmax over score(a,b) = c/(sa·sb) as an exact rational; ties on
      // (lhs, rhs) ascending — bit-replayable in HUGEINT by the oracle
      var best: (String, String) = null
      var bestC, bestSa, bestSb = 0L
      pairCnt.foreach { case (p, c) =>
        val sa = symCnt(p._1); val sb = symCnt(p._2)
        val better =
          if (best == null) true
          else {
            val l = BigInt(c) * BigInt(bestSa) * BigInt(bestSb)
            val r = BigInt(bestC) * BigInt(sa) * BigInt(sb)
            l > r || (l == r && (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          }
        if (better) { best = p; bestC = c; bestSa = sa; bestSb = sb }
      }
      if (best == null) done = true
      else {
        merges += ((iter, best._1, best._2, bestC, bestSa, bestSb))
        val pat = s"·${best._1}·${best._2}·"
        val rep = s"·${best._1}${best._2}·"
        occ.remove(best).foreach(_.foreach { w =>
          if (syms(w).contains(pat)) {
            retract(w)
            syms(w) = syms(w).replace(pat, rep).replace(pat, rep)
            admit(w)
          }
        })
        iter += 1
      }
    }
    (merges.toArray, syms.map(s => (s.replace("·", ""), s)))
  }

  /** The merge table (iter, lhs, rhs, c, sa, sb) — every argmax carries its
    * full rational evidence so the oracle can verify the SCORE, not just
    * the winner. */
  def wordPieceMerges(docs: DataFrame, k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = trainDriver(docs, k)
    if (merges.isEmpty)
      spark.createDataFrame(Seq((1, "", "", 0L, 0L, 0L)))
        .toDF("iter", "lhs", "rhs", "c", "sa", "sb").where(lit(false))
    else spark.createDataFrame(merges.toSeq).toDF("iter", "lhs", "rhs", "c", "sa", "sb")
  }

  /** Per-doc token counts under the trained segmentation: the final word →
    * token-count table broadcasts onto the exploded word stream — one
    * broadcast join + one doc-keyed partial-agged sum, k absent from the
    * plan (the production encode shape q_bpe_encode already plan-guards).
    */
  def wordPieceEncode(docs: DataFrame, k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val (_, vocab) = trainDriver(docs, k)
    val vocabDf = spark.createDataFrame(
      vocab.toSeq.map { case (w, s) => (w, s.split('·').count(_.nonEmpty).toLong) })
      .toDF("word", "toks")
    docs.selectExpr("doc_id", "explode(split(text, ' ')) AS word")
      .where("word RLIKE '^[a-z]+$'")
      .join(broadcast(vocabDf), Seq("word"))
      .groupBy("doc_id")
      .agg(sum("toks").as("wp_tokens"), count(lit(1)).as("n_words"))
  }
}
