package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece family),
  * completing the tokenizer pair next to BPE in [[TextOps]]: where BPE
  * GROWS a vocabulary by greedy pair merges, the unigram model SHRINKS a
  * large seed vocabulary by EM — each word is a segmentation lattice, the
  * E-step computes expected piece counts by forward–backward over that
  * lattice, the M-step re-normalizes, and pruning rounds drop the
  * lowest-probability multi-char pieces until the target size (single
  * characters are never pruned, so every word stays segmentable — the
  * open-vocabulary contract).
  *
  * Division of labor (the production split proven out by BPE here):
  *
  *   - TRAINING is ONE distributed job — the corpus collapses to its
  *     vocab-sized (word, cnt) table (Heaps' law: ~10^6 rows at 100 TB) —
  *     then a driver loop. EM iterations touch pieces × word-lattices,
  *     never the corpus.
  *   - ENCODING is distributed: the DISTINCT-word table segments on the
  *     executors under a broadcast piece-cost map (Viterbi per word), and
  *     the resulting word → tokens table broadcast-joins back onto the
  *     word stream; one partial-agged doc-keyed sum. The corpus is read
  *     once; k/vocab never appears in the plan.
  *
  * Determinism: Viterbi runs on INTEGER costs packed as cost·2^20 + ntok,
  * so the minimization is lexicographic (total cost, then token count) —
  * a total order with no float ties. The closed-form variant
  * ([[closedFormCosts]]) derives whole-bit surprisal costs that a DuckDB
  * oracle re-derives exactly (q_unigram_encode replays the ENTIRE
  * pipeline — piece inventory, costs, 12-position DP — bit-for-bit);
  * the EM-trained variant carries integer micro-nat costs rounded once
  * from the final probabilities.
  */
object Unigram {

  /** Tokens occupy the low 20 bits of a packed DP value; costs the rest.
    * Worst case: 24 positions × cost ≤ 2^26 micro-nats → ≤ 2^51 packed.
    */
  val Shift = 20
  val TokMask: Long = (1L << Shift) - 1L

  /** Cost of a single character absent from the piece inventory (the
    * frozen-tokenizer cross-corpus case): ~e^-38 — worse than any real
    * piece, but finite, so OOV words still segment.
    */
  val UnkCost = 38_000_000L

  /** Viterbi segmentation of one word under integer piece costs,
    * minimizing (Σcost, ntok) lexicographically via the packed value
    * Σ(cost·2^20 + 1). `cost(piece)` returns -1 for unknown pieces;
    * unknown SINGLE characters fall back to [[UnkCost]] so the DP never
    * dead-ends. Returns the packed optimum: tokens = v & TokMask,
    * cost = v >> Shift.
    */
  def viterbiPacked(word: String, cost: String => Long, maxPieceLen: Int): Long = {
    val n = word.length
    val Inf = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    java.util.Arrays.fill(dp, Inf)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      val lm = math.min(maxPieceLen, j)
      var l = 1
      while (l <= lm) {
        if (dp(j - l) < Inf) {
          var c = cost(word.substring(j - l, j))
          if (c < 0 && l == 1) c = UnkCost
          if (c >= 0) {
            val cand = dp(j - l) + (c << Shift) + 1L
            if (cand < dp(j)) dp(j) = cand
          }
        }
        l += 1
      }
      j += 1
    }
    dp(n)
  }

  // ------------------------------------------------------------------
  // Closed-form piece inventory (the oracle-replayable encode)
  // ------------------------------------------------------------------

  /** The word stream both engines agree on: lowercase-alpha words of
    * length ≤ 12 (the oracle's DP unrolls 12 positions).
    */
  val MaxWordLen = 12

  /** Closed-form piece costs over `docs`: pieces are every single
    * character of the word stream plus every substring of length 2..3
    * occurring ≥ `minCnt` times (stream-weighted); cost = whole-bit
    * surprisal `bitlen(TOT div c)` with TOT the kept-piece occurrence
    * total — the same integer-log2 trick as BM25's idf, chosen because
    * ln() is not bit-exact cross-engine. The substring explosion runs on
    * the VOCAB-SIZED (word, cnt) table, not the corpus — two partial-agged
    * shuffles into a piece-bounded key space.
    */
  def closedFormCosts(docs: DataFrame, minCnt: Long = 50L,
                      maxPieceLen: Int = 3): Map[String, Long] = {
    val wcnt = docs
      .selectExpr("explode(split(text, ' ')) AS word")
      .where(s"word RLIKE '^[a-z]+$$' AND length(word) <= $MaxWordLen")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val occ = (1 to maxPieceLen).map { l =>
      wcnt.where(s"length(word) >= $l")
        .selectExpr("cnt", s"explode(sequence(1, length(word) - $l + 1)) AS i", "word")
        .selectExpr(s"substring(word, i, $l) AS piece", "cnt")
    }.reduce(_ unionAll _)
      .groupBy("piece").agg(sum("cnt").as("c"))
      .where(s"length(piece) = 1 OR c >= $minCnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tot = occ.map(_._2).sum
    occ.map { case (p, c) => p -> (64L - java.lang.Long.numberOfLeadingZeros(tot / c)) }.toMap
  }

  /** Per-document token/cost totals under a frozen integer-cost piece
    * inventory: distinct words segment on the executors (broadcast cost
    * map, Viterbi each), the word → (toks, bits) table broadcast-joins
    * back onto the stream, ONE doc-keyed partial-agged sum. Output
    * `(doc_id, uni_tokens, cost_bits, n_words)`.
    */
  def encodeWithCosts(docs: DataFrame, costs: Map[String, Long],
                      maxPieceLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(costs)
    val words = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS word")
      .where(s"word RLIKE '^[a-z]+$$' AND length(word) <= $MaxWordLen")
    val segmented = words.select("word").distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        val f: String => Long = s => m.getOrElse(s, -1L)
        it.map { w =>
          val v = viterbiPacked(w, f, maxPieceLen)
          (w, v & TokMask, v >> Shift)
        }
      }.toDF("word", "toks", "bits")
    words.join(broadcast(segmented), Seq("word"))
      .groupBy("doc_id")
      .agg(sum("toks").as("uni_tokens"), sum("bits").as("cost_bits"),
        count(lit(1)).as("n_words"))
      .selectExpr("doc_id", "CAST(uni_tokens AS BIGINT) AS uni_tokens",
        "CAST(cost_bits AS BIGINT) AS cost_bits",
        "CAST(n_words AS BIGINT) AS n_words")
  }

  /** The oracle-checked contract query: closed-form costs + Viterbi
    * encode, end to end.
    */
  def unigramEncodeClosedForm(docs: DataFrame, minCnt: Long = 50L): DataFrame =
    encodeWithCosts(docs, closedFormCosts(docs, minCnt), maxPieceLen = 3)

  // ------------------------------------------------------------------
  // EM trainer (driver loop over the collected vocab table)
  // ------------------------------------------------------------------

  /** One trained piece: probability and its integer Viterbi cost
    * (micro-nats, `round(-1e6·ln p)`, floored at 1).
    */
  final case class Piece(piece: String, prob: Double) {
    /** Capped at 60 nats (≈ e^-60) so a vanishing probability can never
      * overflow the packed DP shift.
      */
    def cost: Long =
      math.max(1L, math.min(60_000_000L, math.round(-1e6 * math.log(prob))))
  }

  /** SentencePiece-style trainer. Seeds with all single characters plus
    * the `seedSize` highest-(count·len) substrings of length
    * 2..`maxPieceLen`; alternates `emIters` EM sweeps with prune rounds
    * that keep the `shrink` fraction of multi-char pieces (by expected
    * probability, ties by piece) until ≤ `vocabSize` pieces remain, then
    * runs one final EM sweep. Single characters are never pruned.
    *
    * E-step per (word, cnt): log-domain forward–backward over the
    * segmentation lattice; expected count of the piece occurrence
    * spanning (i, j] is cnt·exp(α_i + ln p + β_j − α_n). M-step:
    * p = E[c] / ΣE[c].
    *
    * Everything after the ONE distributed (word, cnt) collapse is driver
    * arithmetic over vocab-sized arrays — the BPE-trainer scale shape.
    */
  def unigramTrainDriver(docs: DataFrame, vocabSize: Int,
                         maxPieceLen: Int = 6, seedSize: Int = 2000,
                         emIters: Int = 2, shrink: Double = 0.75): Array[Piece] = {
    val vocab0 = docs
      .selectExpr("explode(split(text, ' ')) AS word")
      .where("word RLIKE '^[a-z]+$' AND length(word) <= 24")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(vocab0, vocabSize, maxPieceLen, seedSize, emIters, shrink)
  }

  /** The driver loop itself, factored for specs/tools. */
  def trainFromWordCounts(vocab0: Array[(String, Long)], vocabSize: Int,
                          maxPieceLen: Int = 6, seedSize: Int = 2000,
                          emIters: Int = 2, shrink: Double = 0.75): Array[Piece] = {
    import scala.collection.mutable
    // ---- seed: chars (protected) + top substrings by count·len ----
    val chars = mutable.LinkedHashSet.empty[String]
    val subCnt = mutable.HashMap.empty[String, Long]
    vocab0.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        chars += w.substring(i, i + 1)
        var l = 2
        val lm = math.min(maxPieceLen, w.length - i)
        while (l <= lm) {
          val s = w.substring(i, i + l)
          subCnt(s) = subCnt.getOrElse(s, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val seeds = subCnt.toArray
      .sortBy { case (s, c) => (-c * s.length, s) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    var pieces: Array[String] = (chars.toArray ++ seeds).sorted
    // initial probs ∝ occurrence count (chars get their own counts)
    val charCnt = mutable.HashMap.empty[String, Long]
    vocab0.foreach { case (w, c) =>
      w.foreach(ch => { val s = ch.toString; charCnt(s) = charCnt.getOrElse(s, 0L) + c })
    }
    def cnt0(p: String): Double =
      (if (p.length == 1) charCnt.getOrElse(p, 1L) else subCnt(p)).toDouble
    var logp: mutable.HashMap[String, Double] = {
      val tot = pieces.map(cnt0).sum
      mutable.HashMap(pieces.map(p => p -> math.log(cnt0(p) / tot)): _*)
    }

    def logsumexp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

    /** One EM sweep over the word table; returns the new logp map. */
    def emSweep(): mutable.HashMap[String, Double] = {
      val exp = mutable.HashMap.empty[String, Double]
      vocab0.foreach { case (w, c) =>
        val n = w.length
        val al = Array.fill(n + 1)(Double.NegativeInfinity); al(0) = 0.0
        val be = Array.fill(n + 1)(Double.NegativeInfinity); be(n) = 0.0
        var j = 1
        while (j <= n) {
          var l = 1; val lm = math.min(maxPieceLen, j)
          while (l <= lm) {
            logp.get(w.substring(j - l, j)).foreach { lp =>
              al(j) = logsumexp(al(j), al(j - l) + lp)
            }
            l += 1
          }
          j += 1
        }
        var i = n - 1
        while (i >= 0) {
          var l = 1; val lm = math.min(maxPieceLen, n - i)
          while (l <= lm) {
            logp.get(w.substring(i, i + l)).foreach { lp =>
              be(i) = logsumexp(be(i), lp + be(i + l))
            }
            l += 1
          }
          i -= 1
        }
        val z = al(n)
        if (z != Double.NegativeInfinity) {
          i = 0
          while (i < n) {
            var l = 1; val lm = math.min(maxPieceLen, n - i)
            while (l <= lm) {
              val s = w.substring(i, i + l)
              logp.get(s).foreach { lp =>
                val post = math.exp(al(i) + lp + be(i + l) - z)
                if (post > 0) exp(s) = exp.getOrElse(s, 0.0) + c * post
              }
              l += 1
            }
            i += 1
          }
        }
      }
      // chars keep a floor so prune/encode never orphan a character
      chars.foreach(s => exp(s) = math.max(exp.getOrElse(s, 0.0), 1e-9))
      val tot = exp.values.sum
      mutable.HashMap(exp.toSeq.map { case (p, c) => p -> math.log(c / tot) }: _*)
    }

    // ---- prune loop ----
    var guard = 0
    while (pieces.length > vocabSize && guard < 64) {
      var it = 0
      while (it < emIters) { logp = emSweep(); it += 1 }
      val multi = pieces.filter(p => p.length > 1 && logp.contains(p))
      val keepN = math.max(vocabSize - chars.size,
        math.min(multi.length - 1, (multi.length * shrink).toInt))
      val kept = multi
        .sortBy(p => (-logp(p), p))
        .take(math.max(0, keepN))
      pieces = (chars.toArray ++ kept).sorted
      logp = logp.filter { case (p, _) => pieces.contains(p) }
      // re-normalize the surviving mass
      val tot = logp.values.map(math.exp).sum
      logp = logp.map { case (p, lp) => p -> (lp - math.log(tot)) }
      guard += 1
    }
    logp = emSweep()
    // a kept piece whose expected count underflowed to 0 gets an e^-69
    // floor — still ranked, never a NoSuchElement or an infinite cost
    pieces.map(p => Piece(p, math.exp(logp.getOrElse(p, -69.0))))
      .sortBy(p => (-p.prob, p.piece))
  }

  /** Encode a corpus under a FROZEN trained tokenizer (the cross-corpus
    * production case): integer micro-nat costs from the final
    * probabilities, OOV single chars at [[UnkCost]]. Output
    * `(doc_id, uni_tokens, n_words)`.
    */
  def unigramEncodeWith(docs: DataFrame, model: Array[Piece]): DataFrame = {
    val maxLen = if (model.isEmpty) 1 else model.map(_.piece.length).max
    val costs = model.map(p => p.piece -> p.cost).toMap
    encodeWithCosts(docs, costs, maxLen)
      .drop("cost_bits")
  }
}
