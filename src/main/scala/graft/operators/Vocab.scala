package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Frequency-ranked vocabulary construction and token-id encoding —
  * the tokenizer-prep stage of a training-data pipeline (build the
  * word table once over the corpus, then map every document to id
  * sequences). No reference counterpart; designed Spark-first.
  */
object Vocab {

  /** Top-`maxSize` corpus vocabulary by token frequency: one row per
    * kept token with `(token, token_id, freq)`, ids dense from 1 in
    * (freq DESC, token ASC) order — a total, engine-independent
    * ranking (the token tie-break makes equal-frequency ids
    * deterministic). Id 0 is RESERVED for out-of-vocabulary tokens
    * (see [[encodeTokens]]). `minCount` drops the long hapax tail
    * before ranking.
    *
    * Distributed shape: tokenize → map-side partial count → one
    * shuffle on the token key → distributed top-`maxSize`
    * (TakeOrderedAndProject — each partition keeps its own top
    * `maxSize`, the driver merges heaps; nothing sorts the full
    * vocabulary). The final dense-rank window runs over the
    * ALREADY-LIMITED vocab-sized frame (≤ maxSize rows — one small
    * task, not a corpus-wide single-partition window).
    */
  def buildVocab(df: DataFrame, text: Column, maxSize: Int,
      minCount: Long = 1L, sep: String = " "): DataFrame = {
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = df
      .select(explode(split(text, java.util.regex.Pattern.quote(sep))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(F.count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
    val top = counts.orderBy(col("freq").desc, col("token")).limit(maxSize)
    top.withColumn("token_id",
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .cast("long"))
      .select(col("token"), col("token_id"), col("freq"))
  }

  /** Encode each document's token sequence as vocabulary ids, in
    * order, with out-of-vocabulary tokens mapped to 0: one row per
    * document, `(doc_id, ids)`.
    *
    * Distributed shape: positional tokenize (posexplode) → BROADCAST
    * hash join against the vocab (≤ maxSize rows by construction —
    * always broadcastable, so the corpus-side explosion is probed
    * map-side and never shuffles for the lookup) → one groupBy(doc)
    * reassembly sorted by position. The single corpus shuffle is that
    * reassembly, keyed on the document id — the same key the corpus
    * is usually already laid out on.
    */
  def encodeTokens(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame, sep: String = " "): DataFrame = {
    val toks = df.select(id.as("doc_id"),
        posexplode(split(text, java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "token")))
    toks
      .join(F.broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .withColumn("__tid", coalesce(col("token_id"), lit(0L)))
      .groupBy("doc_id")
      .agg(F.transform(array_sort(F.collect_list(
          struct(col("__pos"), col("__tid")))), s => s.getField("__tid"))
        .as("ids"))
  }

  /** [[encodeTokens]] composed with a corpus-level report: token count
    * and OOV rate per document, `(doc_id, n_tokens, n_oov, oov_rate)`
    * — the coverage check run after every vocab rebuild. Same plan
    * shape as [[encodeTokens]] minus the reassembly sort.
    */
  def oovStats(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame, sep: String = " "): DataFrame =
    df.select(id.as("doc_id"),
        explode(split(text, java.util.regex.Pattern.quote(sep))).as("token"))
      .join(F.broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        F.count(lit(1)).as("n_tokens"),
        F.count(when(col("token_id").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
}
