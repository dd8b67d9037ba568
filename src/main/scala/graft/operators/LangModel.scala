package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.DoubleType

/** Corpus-level unigram language-model scoring — the CCNet-family
  * quality signal (Wenzek et al. 2020: docs are ranked by their
  * perplexity under an LM trained on a trusted corpus; here the
  * unigram restriction of that recipe, which needs no external model
  * artifacts) plus distribution-drift measurement between corpus
  * snapshots. No reference counterpart; designed Spark-first.
  *
  * Determinism note (the library-wide float policy): per-token
  * `ln(count)` terms are computed in IEEE double — identical in any
  * engine whose `ln` is correctly rounded — and SUMMED through
  * decimal casts, so accumulation order (partitioning) can never
  * change a score. Gate queries round log-derived outputs like the
  * var/std family; the frequency-mean outputs are decimal-exact
  * unrounded.
  */
object LangModel {

  /** Unigram counts of a reference corpus: `(token, cnt)` over
    * whitespace tokens, plus the caller retrieves the grand total from
    * [[totalTokens]]. One shuffle on the token key (map-side partial
    * counts); the table is vocabulary-sized.
    */
  def unigramCounts(ref: DataFrame, text: Column,
      sep: String = " "): DataFrame =
    ref.select(explode(split(text, java.util.regex.Pattern.quote(sep)))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(F.count(lit(1)).as("cnt"))

  /** Total token count of a counts table (one tiny aggregation —
    * an action; pass the result into [[scoreByUnigram]] so the scorer
    * itself stays fully lazy).
    */
  def totalTokens(counts: DataFrame): Long =
    counts.agg(F.sum(col("cnt"))).head().getLong(0)

  /** Score every document of `df` under the unigram LM of a reference
    * corpus: per document,
    *
    *  - `n_tokens` — scored token count,
    *  - `mean_logp` — mean per-token log-probability
    *    `Σ ln(cnt_w / total) / n` (natural log; OOV tokens score as
    *    count `smoothing`, the +k floor). Higher = more reference-like;
    *    `exp(-mean_logp)` is the unigram perplexity.
    *  - `mean_freq` — mean per-token relative frequency (the log-free
    *    twin: decimal-exact, engine-order-insensitive, no rounding
    *    caveat).
    *
    * Distributed shape: tokenize (posexplode-free — order is
    * irrelevant to a bag-of-words score) → BROADCAST lookup against
    * the vocabulary-sized counts table → one groupBy(doc). The corpus
    * scan never shuffles for the lookup; the per-doc aggregation is
    * the single data shuffle, keyed on the document id. ln terms are
    * decimal-cast before summation so partitioning cannot reorder a
    * float accumulation.
    */
  def scoreByUnigram(df: DataFrame, id: Column, text: Column,
      counts: DataFrame, total: Long, smoothing: Long = 1L,
      sep: String = " "): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    require(smoothing >= 1, s"smoothing must be >= 1, got $smoothing")
    val toks = df.select(id.as("doc_id"),
        explode(split(text, java.util.regex.Pattern.quote(sep))).as("token"))
      .filter(col("token") =!= "")
    val c = coalesce(col("cnt"), lit(smoothing)).cast(DoubleType)
    toks
      .join(F.broadcast(counts.select(col("token"), col("cnt"))),
        Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        F.count(lit(1)).as("n_tokens"),
        // decimal-summed ln terms: each term is one IEEE double,
        // the sum is order-exact
        F.sum(F.log(c).cast(graft.functions.Num.DotDec))
          .cast(DoubleType).as("__graft_sumln"),
        F.sum((c / lit(total.toDouble)).cast(graft.functions.Num.DotDec))
          .cast(DoubleType).as("__graft_sumfreq"))
      .select(col("doc_id"), col("n_tokens"),
        (col("__graft_sumln") / col("n_tokens").cast(DoubleType) -
          F.log(lit(total.toDouble))).as("mean_logp"),
        (col("__graft_sumfreq") / col("n_tokens").cast(DoubleType))
          .as("mean_freq"))
  }

  /** Kullback–Leibler divergence KL(P ‖ Q) between two corpora's
    * unigram distributions — the standard corpus-drift probe run when
    * a new crawl snapshot lands ("did the token distribution move?").
    * P is `left`'s distribution; tokens of P absent from Q score with
    * count `smoothing` so the divergence stays finite (add-k on the Q
    * side only; P's support defines the sum). Because the smoothed Q
    * is NOT renormalized, the statistic can dip slightly below zero
    * when P's support misses much of Q's mass — it is a drift SCORE
    * with KL semantics on shared support, not a strict divergence;
    * compare snapshots against the same reference, don't test ≥ 0.
    * Returns ONE row: `(n_tokens_p, n_types_p, kl_nats)`.
    *
    * Shape: two vocabulary-sized count tables, one hash join on the
    * token key, one scalar aggregation — nothing is corpus-sized
    * after the counting passes. The ln terms decimal-sum like
    * [[scoreByUnigram]].
    */
  def unigramKl(left: DataFrame, leftText: Column,
      right: DataFrame, rightText: Column,
      smoothing: Long = 1L, sep: String = " "): DataFrame = {
    require(smoothing >= 1, s"smoothing must be >= 1, got $smoothing")
    val p = unigramCounts(left, leftText, sep)
    val q = unigramCounts(right, rightText, sep)
      .withColumnRenamed("cnt", "qcnt")
    // P's total comes out of the scalar aggregation itself
    // (n_tokens_p); only Q's total needs a bounded pre-action
    val totalQ = totalTokens(q.withColumnRenamed("qcnt", "cnt")
      .select("token", "cnt"))
    val pc = col("cnt").cast(DoubleType)
    val qc = coalesce(col("qcnt"), lit(smoothing)).cast(DoubleType)
    // KL = Σ_w (p_w/P)·ln((p_w/P)/(q_w/Q))
    //    = [Σ p_w·(ln p_w − ln q_w)] / P − ln P + ln Q
    // (the per-type terms decimal-sum; the constant rearrangement
    // keeps every ln argument an integer count — the same doubles in
    // any engine)
    p.join(q, Seq("token"), "left")
      .agg(
        F.sum(col("cnt")).as("n_tokens_p"),
        F.count(lit(1)).as("n_types_p"),
        F.sum(((F.log(pc) - F.log(qc)) * pc)
          .cast(graft.functions.Num.DotDec))
          .cast(DoubleType).as("__graft_s"))
      .select(col("n_tokens_p"), col("n_types_p"),
        (col("__graft_s") / col("n_tokens_p").cast(DoubleType) -
          F.log(col("n_tokens_p").cast(DoubleType)) +
          F.log(lit(totalQ.toDouble))).as("kl_nats"))
  }
}
