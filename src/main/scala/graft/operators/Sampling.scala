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
      fractions: Map[String, Double], seed: Long = 0L): DataFrame =
    df.filter(stratifiedKeep(id, stratum, fractions, seed))

  /** [[stratifiedSample]]'s keep verdict as a standalone Column — the
    * unit the SQL registration (`graft_stratified_sample`) exposes.
    */
  def stratifiedKeep(id: Column, stratum: Column,
      fractions: Map[String, Double], seed: Long = 0L): Column = {
    val thr = fractions.foldLeft(lit(0L): Column) {
      case (acc, (k, f)) => when(stratum === lit(k), lit(threshold(f)))
        .otherwise(acc)
    }
    ringPosition(id, seed) < thr
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

  /** Temperature-scaled source-mixture targets (Arivazhagan et al.
    * 2019, "Massively Multilingual Neural Machine Translation in the
    * Wild", §4.2 — the sampling recipe mT5/XLM-R popularized for
    * multi-source pretraining): target weight ∝ p_s^(1/tau) where
    * p_s = count_s / Σ count. `tau = 1` reproduces natural
    * proportions, larger tau flattens toward uniform (up-sampling
    * tail sources), tau < 1 sharpens toward head sources. Pure
    * driver-side arithmetic over the bounded per-stratum count map —
    * feed the result to [[mixtureFractions]] / [[rebalanceMixture]] /
    * [[takeTokenMixture]] as `targets`.
    *
    * Determinism: the normalization sum folds in SORTED key order, so
    * the same map yields the same doubles on any JVM; any SQL replay
    * should round outputs (pow is only faithfully rounded
    * per-engine).
    */
  def temperatureTargets(counts: Map[String, Long],
      tau: Double): Map[String, Double] = {
    require(tau > 0.0, s"tau must be positive, got $tau")
    require(counts.nonEmpty, "counts must be non-empty")
    val bad = counts.filter(_._2 <= 0)
    require(bad.isEmpty,
      s"strata must have positive counts, got ${bad.keySet.toSeq.sorted}")
    val total = counts.values.sum.toDouble
    val q = counts.map { case (k, c) =>
      k -> math.pow(c.toDouble / total, 1.0 / tau)
    }
    val qSum = q.toSeq.sortBy(_._1).map(_._2).sum
    q.map { case (k, v) => k -> v / qSum }
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
    * everything — including the degenerate total of 0 (empty frame or
    * all-null token column), where there is nothing to trim and the
    * frame passes through unchanged. The "give me ~1B tokens of this
    * corpus" primitive, with the same reproducibility-anywhere
    * property as [[deterministicSample]], and nested across budgets:
    * a smaller budget's subset is contained in a larger one's.
    *
    * Pass `total` when the corpus token sum is already known (e.g.
    * from catalog stats or a prior aggregation) to skip the counting
    * job entirely — then the operator is a pure lazy projection,
    * composable on unbounded streams.
    */
  def takeTokenBudget(df: DataFrame, id: Column, tokens: Column,
      budget: Long, seed: Long = 0L,
      total: Option[Long] = None): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // sum(all-null / zero rows) is a null cell — read boxed, not getLong
    val tot = total.getOrElse {
      Option(df.agg(sum(tokens.cast("long"))).head.getAs[java.lang.Long](0))
        .map(_.longValue).getOrElse(0L)
    }
    require(tot >= 0, s"total token count must be >= 0, got $tot")
    if (budget >= tot) df
    else deterministicSample(df, id, budget.toDouble / tot, seed)
  }

  /** Per-stratum aggregate probe shared by the mixture ops: one
    * bounded job (result size = number of strata). The stratum is
    * cast to string so integer/date domain columns work, and null
    * strata are dropped — they can carry no target weight, so they
    * behave exactly like any other stratum the targets do not name.
    */
  private def stratumTotals(df: DataFrame, stratum: Column,
      value: Column): Map[String, Long] =
    df.groupBy(stratum.cast("string").as("__s"))
      .agg(sum(value.cast("long")).as("__v"))
      .collect()
      .flatMap(r => if (r.isNullAt(0) || r.isNullAt(1)) None
                    else Some(r.getString(0) -> r.getLong(1)))
      .toMap

  /** Rebalance a skewed corpus to a target domain mixture, keeping as
    * much data as the targets allow: counts strata (ONE explicit
    * counting job bounded by the number of strata — skipped entirely
    * when `counts` is supplied, making the op lazy and
    * stream-composable), derives the largest feasible total via
    * [[mixtureFractions]], and deterministically samples each stratum.
    * Strata not named in `targets` are dropped; the stratum column is
    * compared as a string (matching the `Map[String, …]` targets), so
    * non-string domain columns work.
    */
  def rebalanceMixture(df: DataFrame, id: Column, stratum: Column,
      targets: Map[String, Double], seed: Long = 0L,
      counts: Option[Map[String, Long]] = None): DataFrame = {
    val c = counts.getOrElse(stratumTotals(df, stratum, lit(1L)))
    stratifiedSample(df, id, stratum.cast("string"),
      mixtureFractions(c.filter { case (k, _) => targets.contains(k) },
        targets), seed)
  }

  /** Budget-capped mixture plan over per-stratum TOKEN totals: the
    * largest total T with weight_s·T ≤ tokens_s for every stratum,
    * further capped at `budget`; the per-stratum sampling fraction is
    * (weight_s · T) / tokens_s. With the cap binding, no stratum is
    * kept whole — every stratum is trimmed to its share of the budget.
    * Weights normalize to sum 1. Float evaluation ORDER (for oracle
    * replay): tokens_s / w_s per stratum, MIN, LEAST with the budget,
    * then (w_s · T) / tokens_s, LEAST 1.0.
    */
  def tokenMixtureFractions(tokenTotals: Map[String, Long],
      targets: Map[String, Double], budget: Long): Map[String, Double] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0),
      s"target weights must be positive, got $targets")
    val sum = targets.values.sum
    val w = targets.map { case (k, v) => k -> v / sum }
    val missing = w.keySet -- tokenTotals.keySet
    require(missing.isEmpty,
      s"targeted strata absent from the data: ${missing.toSeq.sorted}")
    // a zero-token targeted stratum would make tMax 0 and the
    // fraction 0/0 = NaN, surfacing later as an opaque
    // "fraction must be in [0, 1], got NaN" — name the stratum here
    val empty = w.keySet.filter(k => tokenTotals(k) <= 0)
    require(empty.isEmpty,
      s"targeted strata have no tokens: ${empty.toSeq.sorted}")
    val tMax = w.map { case (k, wk) => tokenTotals(k) / wk }.min
    val t = math.min(tMax, budget.toDouble)
    w.map { case (k, wk) => k -> math.min(1.0, (wk * t) / tokenTotals(k)) }
  }

  /** "N tokens at THIS domain mixture" in one call — the pretraining
    * composition of [[takeTokenBudget]] and [[rebalanceMixture]]: one
    * bounded per-stratum token-sum job (skipped when `tokenTotals` is
    * supplied), the [[tokenMixtureFractions]] plan, then the
    * deterministic per-stratum hash-ring filter. Kept token counts
    * per stratum are binomial around weight_s·T (sharp at corpus
    * scale); strata not named in `targets` are dropped. Fully
    * deterministic: same inputs → the same kept rows on any cluster,
    * partitioning, or engine.
    */
  def takeTokenMixture(df: DataFrame, id: Column, stratum: Column,
      tokens: Column, targets: Map[String, Double], budget: Long,
      seed: Long = 0L,
      tokenTotals: Option[Map[String, Long]] = None): DataFrame = {
    val totals = tokenTotals.getOrElse(stratumTotals(df, stratum, tokens))
    stratifiedSample(df, id, stratum.cast("string"),
      tokenMixtureFractions(
        totals.filter { case (k, _) => targets.contains(k) },
        targets, budget), seed)
  }

  /** Deterministic fixed-count per-stratum sample ("exactly N docs per
    * language"): rows rank by RING POSITION within their stratum and
    * the first `nPer` win. Reproducible (the ring is a pure function
    * of id + seed — same winners on any partitioning/engine), stable
    * under growth ONLY in the downward direction (new rows can enter
    * the top-N and push others out — unlike fraction sampling, a
    * fixed-count contract cannot be growth-stable), and NESTED across
    * sizes: the N-sample always contains the (N−1)-sample for the
    * same seed. Skew-safe: `row_number <= n` plans a partial
    * WindowGroupLimit below the stratum shuffle, so a dominant
    * stratum keeps nPer rows per map task instead of sorting whole.
    * Requires per-stratum-unique ids (the ring tie-breaks by id).
    */
  def takePerStratum(df: DataFrame, id: Column, stratum: Column,
      nPer: Int, seed: Long = 0L): DataFrame = {
    require(nPer >= 1, s"nPer must be >= 1, got $nPer")
    // collision-free temp name: the input may legitimately carry
    // __graft_rn (e.g. a frame round-tripped through another graft op)
    val rn = Iterator.from(0)
      .map(i => if (i == 0) "__graft_rn" else s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(ringPosition(id, seed), id)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= nPer).drop(rn)
  }

  /** Deterministic weighted (quality-proportional) sampling: keep each
    * row with probability `weight` (a per-row column in [0, 1] — e.g.
    * a quality score), decided by the same hash ring as
    * [[deterministicSample]]: keep iff ring(id) < ⌊weight·P⌋. Pure
    * map-side filter — zero shuffle, stream-identical, reproducible
    * across partitionings/retries/engines — and CONSISTENT across
    * weightings: a row kept at weight w stays kept at any w′ ≥ w
    * (thresholds nest per row), so tightening a quality bar only ever
    * removes rows. Weights outside [0, 1] clamp; a NULL weight is
    * explicitly coalesced to 0.0 (the row is dropped — same on both
    * engines, rather than leaking a null predicate). The threshold is
    * `floor(weight·P)` computed IN the expression on both engines —
    * identical IEEE double math, unlike a float→long cast, which
    * truncates in Spark but rounds in DuckDB.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      seed: Long = 0L): DataFrame =
    df.filter(weightedKeep(id, weight, seed))

  /** [[weightedSample]]'s keep verdict as a standalone Column — the
    * unit the SQL registration (`graft_weighted_sample`) exposes, so
    * SQL callers build the IDENTICAL expression tree.
    */
  def weightedKeep(id: Column, weight: Column, seed: Long = 0L): Column = {
    val w = least(greatest(coalesce(weight.cast("double"), lit(0.0)),
      lit(0.0)), lit(1.0))
    ringPosition(id, seed) < floor(w * lit(PortableHash.P.toDouble)).cast("long")
  }

  /** DuckDB rendering of [[weightedSample]]'s predicate — keep in
    * lockstep.
    */
  def weightedSampleSql(idE: String, weightE: String, seed: Long): String =
    s"(${ringPositionSql(idE, seed)} < " +
      s"CAST(floor(least(greatest(coalesce(CAST($weightE AS DOUBLE), 0.0), " +
      s"0.0), 1.0) * ${PortableHash.P}.0) AS BIGINT))"

  /** Deterministic k-fold assignment (cross-validation folds): fold
    * label in [0, k) as an equal-width cut of the id's ring position.
    * Same guarantees as [[assignSplits]]: disjoint, exhaustive,
    * partition/retry/engine independent, stable as data grows, and a
    * pure map-side projection. A row's validation fold in any CV
    * round is a pure function of its id and the seed.
    */
  def assignFolds(df: DataFrame, id: Column, k: Int, seed: Long = 0L,
      out: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn(out, foldLabel(id, k, seed))
  }

  /** [[assignFolds]]'s label as a standalone Column. */
  def foldLabel(id: Column, k: Int, seed: Long = 0L): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    // equal-width ring cut ⌊ring·k/P⌋ via the exact-division trick
    // (Spark's `/` on longs is DOUBLE division; subtracting the
    // remainder first makes the quotient integral and the cast
    // lossless — the Joins.rangeJoin fdiv pattern)
    val rk = ringPosition(id, seed) * k
    ((rk - pmod(rk, lit(PortableHash.P))) / lit(PortableHash.P)).cast("int")
  }

  /** DuckDB rendering of [[foldLabel]] — keep in lockstep. */
  def foldLabelSql(idE: String, k: Int, seed: Long): String =
    s"CAST((${ringPositionSql(idE, seed)} * $k) // ${PortableHash.P} AS INT)"

  /** Deterministic repetition-factor realization — "epochs per
    * source" as row duplication: each row appears
    * `⌊factor⌋ + (ring < frac(factor)·P ? 1 : 0)` times, with a
    * `copy` index column (0-based) distinguishing the duplicates, so
    * a mixture spec like "2.5 epochs of wiki, 0.3 of CC" realizes
    * EXACTLY in expectation and deterministically per row — the same
    * row always gets the same copy count on any partitioning, engine,
    * or retry, and raising a factor only ever ADDS copies (nesting,
    * like every ring op). Null/negative factors yield zero copies
    * (the row drops — a 0-epoch source).
    *
    * Distributed shape: a row-local `explode(sequence(...))` — zero
    * shuffle, output volume = Σ factors. The standard next stage is
    * [[Sampling.shuffleShards]]-style reordering so duplicates
    * scatter across the training stream.
    */
  def repeatByFactor(df: DataFrame, id: Column, factor: Column,
      seed: Long = 0L, out: String = "copy",
      maxFactor: Double = 1000.0): DataFrame = {
    require(!df.columns.contains(out),
      s"output column '$out' already exists — pick another name")
    require(maxFactor >= 1.0, s"maxFactor must be >= 1, got $maxFactor")
    // a corrupt factor column must not OOM an executor through a
    // billion-element sequence: factors beyond the cap fail loudly
    val f0 = greatest(coalesce(factor.cast("double"), lit(0.0)), lit(0.0))
    val f = when(f0 > maxFactor, raise_error(concat(
        lit(s"graft: repeatByFactor factor exceeds maxFactor=$maxFactor: "),
        f0.cast("string")))).otherwise(f0)
    val whole = floor(f).cast("long")
    val extra = (ringPosition(id, seed) <
      floor((f - floor(f)) * lit(PortableHash.P.toDouble)).cast("long"))
      .cast("long")
    val n = whole + extra
    df.withColumn(out,
        explode(when(n > 0, sequence(lit(0L), n - 1)).otherwise(array())))
  }

  /** DuckDB rendering of [[repeatByFactor]]'s copy count — keep in
    * lockstep (the oracle unnests `generate_series(0, n-1)`).
    */
  def repeatCountSql(idE: String, factorE: String, seed: Long): String = {
    val f = s"greatest(coalesce(CAST($factorE AS DOUBLE), 0.0), 0.0)"
    s"(CAST(floor($f) AS BIGINT) + CASE WHEN ${ringPositionSql(idE, seed)} < " +
      s"CAST(floor(($f - floor($f)) * ${PortableHash.P}.0) AS BIGINT) " +
      s"THEN 1 ELSE 0 END)"
  }

  /** Deterministic sequence packing: assign each document to a
    * training pack of at most `maxTokens` tokens (greedy first-fit in
    * a fixed order — the standard pretraining batch-construction
    * step). Greedy fill is an inherently sequential recurrence (the
    * remaining capacity resets at every pack boundary — no prefix-sum
    * closed form), so the corpus is first SHARDED on the id's hash
    * ring (`shards` independent streams, each a deterministic
    * pseudo-random interleave of the corpus) and the recurrence runs
    * per shard: one hash shuffle, then a narrow per-partition pass —
    * parallelism is `shards`, each shard's walk is O(its docs), and
    * the result is a pure function of (ids, ord, seed) — partition /
    * retry / cluster-size independent like every sampling op here.
    * Documents longer than `maxTokens` get a pack of their own (the
    * recurrence isolates them naturally); size the shard count so a
    * shard's docs fit one task comfortably (default 256).
    * Returns `(doc_id, shard, pack_id, n_tokens)` — a pack is the
    * (shard, pack_id) group, ids dense per shard in fill order.
    */
  /** Deterministic global training-order shuffle: every row gets a
    * `shard` in [0, numShards) and a dense 0-based `pos` within its
    * shard, both pure functions of (id, seed) — the corpus-wide random
    * interleave a training run reads, reproducible across partitioning,
    * retries, cluster sizes, and engines (no `orderBy(rand())`, whose
    * order changes with partition seeding). Shard assignment is one
    * hash ring, within-shard order a SECOND decorrelated ring (offset
    * seed) with id as the total-order tie-break. Epochs = different
    * seeds.
    *
    * Distributed shape: one hash shuffle on `shard` + a per-shard sort
    * for `row_number` — the sort is the contract (a global random
    * permutation IS an order), and it distributes across shards; size
    * `numShards` so one shard's rows fit a task's sort budget
    * (100 TB / 4096 shards ≈ 25 GB — spill-backed but single-pass).
    * Writing `.repartition(col("shard")).sortWithinPartitions("pos")`
    * then lands training files in read order.
    */
  def shuffleShards(df: DataFrame, id: Column, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val orderSeed = (seed + ShuffleOrderSeedOffset) % PortableHash.P
    val withShard = df.withColumn("shard",
      (ringPosition(id, seed) % numShards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(ringPosition(id, orderSeed), id)
    withShard.withColumn("pos", row_number().over(w).cast("long") - 1L)
  }

  /** Seed offset decorrelating [[shuffleShards]]'s order ring from its
    * shard ring (shared with any oracle rendering).
    */
  val ShuffleOrderSeedOffset: Long = 1000003L

  def packSequences(df: DataFrame, id: Column, tokens: Column,
      maxTokens: Long, ord: Column, shards: Int = 256,
      seed: Long = 0L): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // a null id or null/negative token count has no packing
    // semantics — fail loudly at the offending row instead of an
    // opaque executor NPE (null shard read) or silently corrupted
    // fill arithmetic (negative)
    val checkedId = when(id.isNull,
      raise_error(lit("packSequences: null doc id"))).otherwise(id)
    val nTokens = when(tokens.isNull || tokens < 0,
      raise_error(concat(
        lit("packSequences: null or negative token count for doc_id="),
        id.cast("string")))).otherwise(tokens).cast(LongType)
    val base = df.select(checkedId.as("doc_id"),
      (ringPosition(id, seed) % shards).cast("int").as("shard"),
      nTokens.as("n_tokens"), ord.as("__graft_ord"))
    // same-shard rows land in one partition; a partition may hold
    // several whole shards, so the walk resets state on shard change
    val arranged = base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__graft_ord"), col("doc_id"))
    val outSchema = StructType(arranged.schema.fields :+
      StructField("pack_id", LongType, nullable = false))
    val shardIdx = arranged.schema.fieldIndex("shard")
    val tokIdx = arranged.schema.fieldIndex("n_tokens")
    arranged.mapPartitions { it =>
      var curShard = Int.MinValue
      var first = true
      var fill = 0L
      var pid = 0L
      it.map { r =>
        val sh = r.getInt(shardIdx)
        val t = r.getLong(tokIdx)
        if (first || sh != curShard) { curShard = sh; first = false
          fill = t; pid = 0L }
        else if (fill + t > maxTokens) { pid += 1; fill = t }
        else fill += t
        Row.fromSeq(r.toSeq :+ pid)
      }
    }(Encoders.row(outSchema))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tokens"))
  }
}
