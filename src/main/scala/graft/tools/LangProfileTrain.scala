package graft.tools

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Deterministic trainer for the shipped Cavnar–Trenkle language profiles
  * (`resources/graft/lang_profiles.tsv`): builds a synthetic multilingual
  * corpus from per-language FUNCTION-WORD pools (the high-frequency closed
  * class that dominates any real sample of a language — which is exactly
  * why character-n-gram profiles work: Cavnar & Trenkle 1994, "N-Gram-Based
  * Text Categorization"), counts character trigrams per language, and keeps
  * the top `profileK` by (count DESC, trigram ASC). No RNG — the corpus is
  * a fixed arithmetic schedule, so retraining reproduces the resource
  * byte-for-byte.
  *
  * The real `documents` table cannot train this (its lang labels decorate
  * one shared vocabulary — zero textual signal by construction); the specs
  * hold out a differently-scheduled corpus from the same pools and require
  * 100% accuracy there, while the contract oracle replays the full scoring
  * algorithm bit-exactly over the real table (where predicting 'en' for
  * English-function-word text is the CORRECT answer).
  *
  * Usage: runMain graft.tools.LangProfileTrain [outPath]
  */
object LangProfileTrain {

  val profileK = 40

  /** Per-language function-word pools (public linguistic knowledge). */
  val pools: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu", "auf", "für"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "for", "with", "that", "this", "are"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "por", "con", "una"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "un", "une", "que", "pour", "dans", "est"),
    "zh" -> Seq("的", "一", "是", "不", "了", "在", "人", "有", "我", "他", "这", "中"))

  /** Deterministic sentence `i` of language `lang` — `words` pool words on
    * a fixed arithmetic schedule (seed varies the schedule for held-out
    * corpora; no RNG anywhere).
    */
  def sentence(lang: String, i: Long, nWords: Int = 40, seed: Long = 1L): String = {
    val pool = pools.find(_._1 == lang).get._2
    (0 until nWords).map { j =>
      pool(((i * 7 + j * 13 + seed * 31) % pool.size).toInt.abs)
    }.mkString(" ")
  }

  /** Character trigrams of a text (all positions; texts shorter than 3
    * chars contribute themselves) — the exact extraction the operator and
    * the oracle use.
    */
  def trigrams(text: String): Seq[String] =
    if (text.length < 3) Seq(text)
    else (0 to text.length - 3).map(i => text.substring(i, i + 3))

  /** (lang, rank, trigram) profile rows over `docsPerLang` scheduled
    * sentences per language.
    */
  def train(docsPerLang: Int = 200, seed: Long = 1L): Seq[(String, Int, String)] =
    pools.flatMap { case (lang, _) =>
      val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
      (0 until docsPerLang).foreach { i =>
        trigrams(sentence(lang, i.toLong, seed = seed)).foreach(t => counts(t) += 1)
      }
      counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(profileK)
        .zipWithIndex.map { case ((t, _), r) => (lang, r + 1, t) }
    }

  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0)
      else "src/main/resources/graft/lang_profiles.tsv"
    val rows = train()
    val tsv = rows.map { case (l, r, t) => s"$l\t$r\t$t" }.mkString("", "\n", "\n")
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), tsv.getBytes("UTF-8"))
    println(s"[lang-profile-train] wrote ${rows.size} rows to $out")
  }
}
