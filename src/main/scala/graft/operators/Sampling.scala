package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixture rebalancing for training-data
  * pipelines (extension surface — no reference counterpart).
  *
  * Pretraining mixtures are weighted blends of domains ("webtext 60%,
  * code 25%, papers 15%"); realizing a target mixture from skewed raw
  * counts is a SAMPLING problem, and at 100 TB it must be
  * deterministic: `df.sample()` draws from partition-seeded RNG
  * streams, so its output changes with partitioning, retries, and
  * cluster size. Here a row's fate is a pure function of its id —
  * keep iff `h(id) < ⌊fraction·P⌋` over the engine-portable
  * [[PortableHash.intHash]] ring — so samples are reproducible across
  * runs, cluster sizes, AND engines (the DuckDB oracle replays them
  * row-for-row). Nested property: the sample at fraction f′ < f is a
  * subset of the sample at f (thresholds nest), which makes ablation
  * subsets consistent by construction.
  */
object Sampling {

  /** Hash position of an id on the sampling ring [0, P): a second
    * affine round over [[PortableHash.intHash]] folding in the seed —
    * different seeds give decorrelated rings, same seed gives the
    * identical ring anywhere.
    */
  def ringPosition(id: Column, seed: Long): Column = {
    require(seed >= 0 && seed < PortableHash.P,
      s"seed must be in [0, ${PortableHash.P}), got $seed")
    ((PortableHash.intHash(id) + lit(seed)) * lit(PortableHash.IntHashA)
      + lit(PortableHash.IntHashB)) % lit(PortableHash.P)
  }

  /** DuckDB rendering of [[ringPosition]] — keep in lockstep. */
  def ringPositionSql(e: String, seed: Long): String =
    s"(((${PortableHash.intHashSql(e)} + $seed) * ${PortableHash.IntHashA} " +
      s"+ ${PortableHash.IntHashB}) % ${PortableHash.P})"

  /** The keep-threshold for a fraction: ⌊fraction·P⌋, computed ONCE on
    * the driver so both the expression and any oracle embed the same
    * long (engine float→int casts round differently; a shared literal
    * cannot).
    */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    (fraction * PortableHash.P).toLong
  }

  /** Keep each row iff its id's ring position falls below
    * ⌊fraction·P⌋. Pure map-side filter — no shuffle, no RNG state,
    * no partition sensitivity.
    */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double,
      seed: Long = 0L): DataFrame =
    df.filter(ringPosition(id, seed) < lit(threshold(fraction)))

  /** Per-stratum deterministic sampling: rows whose stratum is absent
    * from `fractions` are DROPPED (fraction 0) — rebalancing selects
    * the domains it names.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      fractions: Map[String, Double], seed: Long = 0L): DataFrame = {
    val thr = fractions.foldLeft(lit(0L): Column) {
      case (acc, (k, f)) => when(stratum === lit(k), lit(threshold(f)))
        .otherwise(acc)
    }
    df.filter(ringPosition(id, seed) < thr)
  }

  /** Largest-total mixture plan: given per-stratum available counts
    * and target weights, the maximum total T with target_s·T ≤ count_s
    * for every targeted stratum is T = min(count_s / weight_s); the
    * per-stratum sampling fraction is then (weight_s · T) / count_s
    * (= 1 for the binding stratum). Weights are normalized to sum 1
    * first. Pure driver-side arithmetic, exposed for testability and
    * for oracle generation — keep the float evaluation ORDER in sync
    * with any SQL replay: c / w, MIN, then (w · T) / c.
    */
  def mixtureFractions(counts: Map[String, Long],
      targets: Map[String, Double]): Map[String, Double] = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0),
      s"target weights must be positive, got $targets")
    val sum = targets.values.sum
    val w = targets.map { case (k, v) => k -> v / sum }
    val missing = w.keySet -- counts.keySet
    require(missing.isEmpty,
      s"targeted strata absent from the data: ${missing.toSeq.sorted}")
    val t = w.map { case (k, wk) => counts(k) / wk }.min
    // the binding stratum computes (wk·(c/wk))/c, which floats to
    // 1.0 ± ulp — cap (mirror with LEAST(1.0, …) in any SQL replay)
    w.map { case (k, wk) => k -> math.min(1.0, (wk * t) / counts(k)) }
  }

  /** Deterministic train/val/test assignment: the ring [0, P) is cut
    * at the normalized cumulative weights and each row's id lands in
    * exactly one segment — splits are DISJOINT and EXHAUSTIVE by
    * construction (the last cut is pinned to P so floating floors
    * cannot orphan the tail), reproducible anywhere, and stable as
    * data grows: a row's split never changes when other rows arrive,
    * the property that keeps eval holdouts uncontaminated across
    * pipeline re-runs. Weights are normalized to sum 1. Rows with a
    * null id get a null label. Stateless projection — works identically
    * on batch frames and unbounded streams.
    */
  def assignSplits(df: DataFrame, id: Column,
      splits: Seq[(String, Double)], seed: Long = 0L,
      name: String = "split"): DataFrame =
    df.withColumn(name, splitLabel(id, splits, seed))

  /** The label expression behind [[assignSplits]]; cuts exposed via
    * [[splitCuts]] so an oracle can embed the identical thresholds.
    */
  def splitLabel(id: Column, splits: Seq[(String, Double)],
      seed: Long = 0L): Column = {
    val cuts = splitCuts(splits)
    val ring = ringPosition(id, seed)
    cuts.init.foldRight(when(ring < lit(cuts.last._2), lit(cuts.last._1))) {
      case ((label, cut), acc) => when(ring < lit(cut), lit(label)).otherwise(acc)
    }
  }

  /** Upper ring cut per split label, in declaration order; the last
    * cut is exactly P.
    */
  def splitCuts(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split labels in $splits")
    require(splits.forall(_._2 > 0),
      s"split weights must be positive, got $splits")
    val sum = splits.map(_._2).sum
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / sum }.tail
    splits.map(_._1).zip(cums).zipWithIndex.map { case ((l, c), i) =>
      l -> (if (i == splits.size - 1) PortableHash.P else (c * PortableHash.P).toLong)
    }
  }

  /** Select a deterministic ~`budget`-token subset: one explicit
    * counting job sums the token column exactly (integer sum — the
    * derived fraction is replayable in any engine), then the hash
    * ring keeps fraction = budget / total of the rows. The kept
    * token count is approximate (hash sampling is binomial around
    * the target; relative deviation shrinks as 1/√rows — at corpus
    * scale it is sharp). A budget at or above the total keeps
    * everything. The "give me ~1B tokens of this corpus" primitive,
    * with the same reproducibility-anywhere property as
    * [[deterministicSample]], and nested across budgets: a smaller
    * budget's subset is contained in a larger one's.
    */
  def takeTokenBudget(df: DataFrame, id: Column, tokens: Column,
      budget: Long, seed: Long = 0L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val total = df.agg(sum(tokens.cast("long"))).head.getLong(0)
    if (budget >= total) df
    else deterministicSample(df, id, budget.toDouble / total, seed)
  }

  /** Rebalance a skewed corpus to a target domain mixture, keeping as
    * much data as the targets allow: counts strata (ONE explicit
    * counting job — the only action here, bounded by the number of
    * strata), derives the largest feasible total via
    * [[mixtureFractions]], and deterministically samples each stratum.
    * Strata not named in `targets` are dropped.
    */
  def rebalanceMixture(df: DataFrame, id: Column, stratum: Column,
      targets: Map[String, Double], seed: Long = 0L): DataFrame = {
    val counts = df.groupBy(stratum.as("__s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stratifiedSample(df, id, stratum,
      mixtureFractions(counts.filter { case (k, _) => targets.contains(k) },
        targets), seed)
  }
}
