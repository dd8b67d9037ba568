// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the function-registry surface
// (SparkSession.sessionState, classic.ExpressionUtils) is
// private[sql] — the standard packaging for a native function library
// that wants a SQL-callable face.
package org.apache.spark.sql.graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable registration of the graft function library, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works for pure-SQL
  * users — the whole library stays usable without touching the Scala
  * API. Two entry points:
  *
  *   - config `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     registers at session build time (the [[GraftExtensions]] class);
  *   - [[GraftFunctions.register]] injects into an already-running
  *     session.
  *
  * The native Catalyst expressions (graft_cosine / graft_dot) register
  * directly; the composition-style functions (text stats, language-ID,
  * fingerprint) register through the Column ↔ Expression bridge — the
  * registered builder returns the SAME expression tree the Scala API
  * builds, so SQL callers get identical semantics, codegen, and
  * pushdown behavior.
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  private def fixedArity(name: String, n: Int)(f: Seq[Expression] => Expression): Builder =
    (children: Seq[Expression]) => {
      if (children.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${children.length}")
      f(children)
    }

  /** Bridge a Column-composition function into a FunctionBuilder: wrap
    * the child expressions as Columns, apply the library function, and
    * EAGERLY convert the composed node tree back to a Catalyst
    * expression. The lazy wrapper (`ExpressionUtils.expression`) is not
    * enough here: the SQL analyzer never runs the column-node converter
    * on a builder's return value, so an unconverted ColumnNodeExpression
    * would survive analysis and explode at codegen.
    */
  private def viaColumns(name: String, n: Int)(f: Seq[Column] => Column): Builder =
    fixedArity(name, n) { children =>
      ColumnNodeToExpressionConverter(f(children.map(ExpressionUtils.column)).node)
    }

  private def entry(name: String, builder: Builder, usage: String)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage,
        "", "", "", "misc_funcs", "", "", "built-in"),
      builder)

  /** Every registered function: (identifier, info, builder). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    entry("graft_cosine",
      fixedArity("graft_cosine", 2)(c => CosineSimilarity(c(0), c(1))),
      "graft_cosine(a, b) - cosine similarity of two float/double arrays (native codegen'd expression)"),
    entry("graft_dot",
      fixedArity("graft_dot", 2)(c => VecDot(c(0), c(1))),
      "graft_dot(a, b) - dot product of two float/double arrays (native codegen'd expression)"),
    entry("graft_token_count",
      viaColumns("graft_token_count", 1)(c => TextFunctions.tokenCountWs(c(0))),
      "graft_token_count(text) - whitespace token count"),
    entry("graft_punct_count",
      viaColumns("graft_punct_count", 1)(c => TextFunctions.punctCount(c(0))),
      "graft_punct_count(text) - punctuation character count"),
    entry("graft_stopword_ratio",
      viaColumns("graft_stopword_ratio", 1)(c => TextFunctions.stopwordRatio(c(0))),
      "graft_stopword_ratio(text) - fraction of tokens that are stopwords"),
    entry("graft_mean_word_length",
      viaColumns("graft_mean_word_length", 1)(c => TextFunctions.meanWordLength(c(0))),
      "graft_mean_word_length(text) - mean token length"),
    entry("graft_quality_score",
      viaColumns("graft_quality_score", 2)(c => TextFunctions.qualityScore(c(0), c(1))),
      "graft_quality_score(text, n_chars) - composite [0,1] quality heuristic"),
    entry("graft_lang_id",
      viaColumns("graft_lang_id", 1)(c => TextFunctions.langId(c(0))),
      "graft_lang_id(text) - marker-stopword language-ID heuristic"),
    entry("graft_fingerprint",
      viaColumns("graft_fingerprint", 1)(c => TextFunctions.fingerprint(c(0))),
      "graft_fingerprint(text) - rolling polynomial document fingerprint"),
    entry("graft_script_fractions",
      viaColumns("graft_script_fractions", 1)(c => TextFunctions.scriptFractions(c(0))),
      "graft_script_fractions(text) - struct of per-script character fractions (latin/cyrillic/arabic/han/kana/hangul) plus the control-char garbage fraction, over non-whitespace characters"),
    entry("graft_lang_id_script",
      viaColumns("graft_lang_id_script", 1)(c => TextFunctions.langIdScript(c(0))),
      "graft_lang_id_script(text) - script-aware language-ID: hangul/kana/han/cyrillic/arabic fractions decide first, Latin text falls through to the marker heuristic"),
    entry("graft_urls",
      viaColumns("graft_urls", 1)(c => TextFunctions.extractUrls(c(0))),
      "graft_urls(text) - array of http(s) URLs in order of appearance"),
    entry("graft_domains",
      viaColumns("graft_domains", 1)(c => TextFunctions.textDomains(c(0))),
      "graft_domains(text) - distinct lowercased URL hosts referenced by the text"),
    entry("graft_normalize",
      viaColumns("graft_normalize", 1)(c => TextFunctions.normalizeForDedup(c(0))),
      "graft_normalize(text) - dedup normalization: lowercase, strip non-alphanumerics, collapse whitespace"),
    entry("graft_url_canon",
      viaColumns("graft_url_canon", 1)(c => TextFunctions.canonicalizeUrl(c(0))),
      "graft_url_canon(url) - canonical URL (fragment/tracking-param strip, lowercase scheme+authority, default ports, trailing slash) - the URL-dedup key"),
    entry("graft_gopher_flags",
      viaColumns("graft_gopher_flags", 1)(c => TextFunctions.gopherQualityFlags(c(0))),
      "graft_gopher_flags(text) - struct of Gopher (Rae 2021) quality signals, per-rule booleans, and the composite pass"),
    entry("graft_c4_filter",
      viaColumns("graft_c4_filter", 1)(c => TextFunctions.c4FilteredText(c(0))),
      "graft_c4_filter(text) - text after C4's (Raffel 2020) line retention: terminal punctuation, >= 5 words, no javascript"),
    entry("graft_c4_flags",
      viaColumns("graft_c4_flags", 1)(c => TextFunctions.c4DocFlags(c(0))),
      "graft_c4_flags(text) - struct of C4 page-level drop signals (sentences, curly brace, lorem ipsum) and the composite pass"),
    entry("graft_redact_pii",
      viaColumns("graft_redact_pii", 1)(c => TextFunctions.redactPii(c(0))),
      "graft_redact_pii(text) - text with emails/IPs/SSNs/phone numbers replaced by category tokens"),
    entry("graft_pii_stats",
      viaColumns("graft_pii_stats", 1)(c => TextFunctions.piiStats(c(0))),
      "graft_pii_stats(text) - struct(n_email, n_ip, n_ssn, n_phone) of PII matches, counted as redacted"),
    entry("graft_shingles",
      fixedArity("graft_shingles", 2) { c =>
        ColumnNodeToExpressionConverter(
          Dedup.shingleArray(ExpressionUtils.column(c(0)),
            intLiteral("graft_shingles", "n", c(1))).node)
      },
      "graft_shingles(text, n) - word n-gram shingle array (n a foldable integer); the dedup family's first stage — explode it for a pure-SQL inverted-index near-dup pipeline"),
    entry("graft_char_shingles",
      fixedArity("graft_char_shingles", 2) { c =>
        ColumnNodeToExpressionConverter(
          TextFunctions.charNgramArray(ExpressionUtils.column(c(0)),
            intLiteral("graft_char_shingles", "n", c(1))).node)
      },
      "graft_char_shingles(text, n) - character n-gram shingle array (n a foldable integer) — the near-dup unit for CJK and other unsegmented scripts"),
    entry("graft_chunk_tokens",
      fixedArity("graft_chunk_tokens", 3) { c =>
        ColumnNodeToExpressionConverter(
          TextFunctions.chunkArray(ExpressionUtils.column(c(0)),
            intLiteral("graft_chunk_tokens", "size", c(1)),
            intLiteral("graft_chunk_tokens", "overlap", c(2))).node)
      },
      "graft_chunk_tokens(text, size, overlap) - sliding token-window chunk array (training-context chunking; size/overlap foldable integers) — posexplode it for per-chunk rows"),
    // ---- repetition quality filters (the Gopher rules): segment
    // separators and gram widths shape the expression tree, so they
    // are literal-pinned like graft_shingles
    entry("graft_dup_segment_frac",
      fixedArity("graft_dup_segment_frac", 2) { c =>
        ColumnNodeToExpressionConverter(TextFunctions.duplicateSegmentFraction(
          ExpressionUtils.column(c(0)),
          stringLiteral("graft_dup_segment_frac", "sep", c(1))).node)
      },
      "graft_dup_segment_frac(text, sep) - fraction of sep-delimited segments repeating an earlier one; sep a string literal"),
    entry("graft_dup_segment_char_frac",
      fixedArity("graft_dup_segment_char_frac", 2) { c =>
        ColumnNodeToExpressionConverter(
          TextFunctions.duplicateSegmentCharFraction(
            ExpressionUtils.column(c(0)),
            stringLiteral("graft_dup_segment_char_frac", "sep", c(1))).node)
      },
      "graft_dup_segment_char_frac(text, sep) - fraction of characters inside repeated segment occurrences; sep a string literal"),
    entry("graft_top_ngram",
      fixedArity("graft_top_ngram", 2) { c =>
        ColumnNodeToExpressionConverter(TextFunctions.topNgramStats(
          ExpressionUtils.column(c(0)),
          intLiteral("graft_top_ngram", "n", c(1))).node)
      },
      "graft_top_ngram(text, n) - struct(gram, cnt, char_frac) of the most frequent word n-gram (deterministic lexicographic tie-break); n a foldable integer"),
    // ---- deterministic sampling family: the two ops a SQL-only data
    // engineer most wants (reproducible sampling and holdout splits).
    // The structural parameters (seed, fraction, split weights) shape
    // the expression tree — driver-computed thresholds, literal-pinned
    // like graft_shingles — so they must be literals in SQL.
    entry("graft_ring_position",
      fixedArity("graft_ring_position", 2) { c =>
        ColumnNodeToExpressionConverter(Sampling.ringPosition(
          ExpressionUtils.column(c(0)),
          longLiteral("graft_ring_position", "seed", c(1))).node)
      },
      "graft_ring_position(id, seed) - position of id on the engine-portable deterministic sampling ring [0, 2^31-1); seed a foldable integer"),
    entry("graft_sample",
      fixedArity("graft_sample", 3) { c =>
        val fraction = doubleLiteral("graft_sample", "fraction", c(1))
        val seed = longLiteral("graft_sample", "seed", c(2))
        ColumnNodeToExpressionConverter(
          (Sampling.ringPosition(ExpressionUtils.column(c(0)), seed)
            < lit(Sampling.threshold(fraction))).node)
      },
      "graft_sample(id, fraction, seed) - deterministic keep verdict: true iff id's ring position falls under floor(fraction * 2^31-1). Partition/retry/engine independent; fractions nest"),
    entry("graft_weighted_sample",
      fixedArity("graft_weighted_sample", 3) { c =>
        val seed = longLiteral("graft_weighted_sample", "seed", c(2))
        ColumnNodeToExpressionConverter(Sampling.weightedKeep(
          ExpressionUtils.column(c(0)), ExpressionUtils.column(c(1)),
          seed).node)
      },
      "graft_weighted_sample(id, weight, seed) - deterministic quality-proportional keep verdict: true iff id's ring position falls under floor(clamp(weight)·(2^31-1)). weight is a per-row column (null drops the row); seed a foldable integer; verdicts nest across weightings"),
    entry("graft_stratified_sample",
      (children: Seq[Expression]) => {
        if (children.length < 5 || children.length % 2 != 1)
          throw new IllegalArgumentException(
            "graft_stratified_sample expects (id, stratum, seed, " +
              s"label1, fraction1, ...), got ${children.length} argument(s)")
        val seed = longLiteral("graft_stratified_sample", "seed", children(2))
        val fractions = children.drop(3).grouped(2).map { pair =>
          stringLiteral("graft_stratified_sample", "label", pair(0)) ->
            doubleLiteral("graft_stratified_sample", "fraction", pair(1))
        }.toSeq
        ColumnNodeToExpressionConverter(Sampling.stratifiedKeep(
          ExpressionUtils.column(children(0)),
          ExpressionUtils.column(children(1)),
          // small-Map insertion order is preserved, so the when-chain
          // matches a Column-API call with the same literal pairs
          scala.collection.immutable.ListMap(fractions: _*), seed).node)
      },
      "graft_stratified_sample(id, stratum, seed, label1, fraction1, ...) - per-stratum deterministic keep verdict; strata not listed are dropped (fraction 0); labels/fractions foldable literals"),
    entry("graft_split_label",
      (children: Seq[Expression]) => {
        if (children.length < 4 || children.length % 2 != 0)
          throw new IllegalArgumentException(
            "graft_split_label expects (id, seed, label1, weight1, ...), " +
              s"got ${children.length} argument(s)")
        val seed = longLiteral("graft_split_label", "seed", children(1))
        val splits = children.drop(2).grouped(2).map { pair =>
          stringLiteral("graft_split_label", "label", pair(0)) ->
            doubleLiteral("graft_split_label", "weight", pair(1))
        }.toSeq
        ColumnNodeToExpressionConverter(Sampling.splitLabel(
          ExpressionUtils.column(children(0)), splits, seed).node)
      },
      "graft_split_label(id, seed, label1, weight1, ...) - deterministic train/val/test split assignment: disjoint, exhaustive, stable as data grows; labels/weights foldable literals"))

  /** Extract a foldable integer argument (e.g. a shingle width) — the
    * structural parameters of the dedup family shape the expression
    * tree itself, so they must be literals in SQL.
    */
  private def intLiteral(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Foldable integral argument as Long (SQL `7` parses as INT). */
  private def longLiteral(fn: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Foldable numeric argument as Double. SQL `0.35` parses as a
    * DECIMAL literal by default; Decimal.toDouble yields the same
    * IEEE double a Scala `0.35` source literal does, so thresholds
    * computed from it match the Column API bit-for-bit.
    */
  private def doubleLiteral(fn: String, arg: String, e: Expression): Double = e match {
    case Literal(v: Decimal, _: DecimalType) => v.toDouble
    case Literal(v: Double, DoubleType) => v
    case Literal(v: Float, FloatType) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case Literal(v: Long, LongType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got $other")
  }

  private def stringLiteral(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v: UTF8String, _: StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  /** Register every graft function on a live session (idempotent —
    * re-registration replaces the same entries).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point: registers [[GraftFunctions]]
  * at session construction, for clusters where the config is the
  * deployment contract (no code-side hook).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
