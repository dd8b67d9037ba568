package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis expressions for training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, and document
  * fingerprinting. Pure Catalyst expressions (codegen'd, no UDFs) so
  * they run inside whole-stage codegen at any scale — and are
  * mirrorable in the SQL oracle.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(split(text, " "))

  /** Regex token count — a BPE-ish lexer class. */
  def tokenCountRegex(text: Column, pattern: String = "[a-z0-9]+"): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?,;:]"), lit(0)))

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  private def countIn(text: Column, words: Seq[String]): Column =
    size(F.filter(split(text, " "), w => w.isInCollection(words)))

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = DefaultStopwords): Column =
    Num.safeDiv(countIn(text, stopwords).cast(DoubleType),
      tokenCountWs(text).cast(DoubleType))

  /** Mean word length: (chars excluding separators) / word count —
    * one pass, no explode.
    */
  def meanWordLength(text: Column): Column =
    Num.safeDiv(length(regexp_replace(text, " ", "")).cast(DoubleType),
      tokenCountWs(text).cast(DoubleType))

  /** Composite quality score ∈ [0,1]: length saturation + stopword
    * presence (the heuristic-quality-signal shape used by pretraining
    * filters; weights are illustrative and deterministic).
    */
  def qualityScore(text: Column, nChars: Column): Column =
    least(lit(1.0), nChars.cast(DoubleType) / 400.0) * 0.5 +
      least(lit(1.0), stopwordRatio(text) * 5.0) * 0.5

  /** Per-language stopword marker lists for the language-ID
    * heuristic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "is", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "es", "y", "las"))

  /** Marker-count score for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    countIn(text, markers)

  /** Heuristic language-ID: argmax of marker counts, first-listed
    * language wins ties, "und" (undetermined) when no marker hits.
    */
  def langId(text: Column,
      markers: Seq[(String, Seq[String])] = LangMarkers): Column = {
    val scores = markers.map { case (l, m) => l -> langScore(text, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** 64-bit-ish document fingerprint: rolling polynomial hash over
    * per-word hashes (md5-prefix ints), mod 1e9+7 — deterministic and
    * reproducible in any engine with a fold primitive.
    */
  def fingerprint(text: Column): Column =
    F.aggregate(split(text, " "), lit(0L),
      (acc, w) =>
        (acc * 31 + conv(substring(md5(w), 1, 8), 16, 10).cast(LongType))
          % 1000000007L)
}
