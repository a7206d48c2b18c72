package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north star,
  * repo:BASELINE.json): token counting, quality scoring, language ID,
  * document fingerprinting. All pure built-in-expression transforms —
  * codegen'd, shuffle-free, linear scans at any scale.
  */
object TextOps {

  /** Lowercased whitespace tokens. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — a cheap deterministic proxy for tokenizer
    * counts (real BPE needs a vocab; this is the standard pre-estimate).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Whitespace token count. */
  def wordCount(text: Column): Column = size(words(text))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Quality features + a composite score in [0,1]:
    * 0.5·stopword-ratio-signal + 0.5·length-signal. Heuristics follow the
    * C4/Gopher-style cheap filters (length, stopword density); the exact
    * formula is arbitrary but deterministic and monotone in both signals.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val w  = words(text)
    val wc = size(w)
    val stops = size(filter(w, t => t.isInCollection(stopwords)))
    val stopRatio  = stops.cast("double") / wc.cast("double")
    val avgWordLen = (length(regexp_replace(trim(text), "\\s+", ""))).cast("double") / wc.cast("double")
    val score = round(least(stopRatio * 5.0, lit(1.0)) * 0.5 +
                      least(wc.cast("double") / 100.0, lit(1.0)) * 0.5, 4)
    Seq(
      "word_count"   -> wc,
      "stop_count"   -> stops,
      "stop_ratio"   -> round(stopRatio, 6),
      "avg_word_len" -> round(avgWordLen, 6),
      "quality_score" -> score)
  }

  /** Per-language indicator stopwords for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with fixed preference order on ties.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "des", "est", "et"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Per-language marker-hit counts, as (colName, expr). */
  def langScores(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    langMarkers.map { case (lang, marks) =>
      s"score_$lang" -> size(filter(w, t => t.isInCollection(marks)))
    }
  }

  /** Predicted language: argmax of marker counts, ties broken by the
    * fixed order en > de > es > fr > zh; all-zero → 'und' (undetermined).
    */
  def langPredict(text: Column): Column = {
    val scores = langScores(text).map(_._2)
    val allZero = scores.reduce(_ + _) === 0
    val Seq(en, de, es, fr, zh) = scores
    when(allZero, "und")
      .when(en >= de && en >= es && en >= fr && en >= zh, "en")
      .when(de >= es && de >= fr && de >= zh, "de")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
  }

  /** Canonical-form fingerprint: lowercase, strip non-alphanumerics to
    * single spaces, collapse whitespace, md5. Two docs differing only in
    * case/punctuation/spacing collide — the standard cheap near-exact
    * dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))
}
