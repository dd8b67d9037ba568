package graft.operators

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Which key levels receive "All" subtotal rows.
  *
  * Mirrors the reference's `margins=` argument
  * (`/root/reference/pandas_plus/groupby/core.py:1994-2051`
  * `add_row_margin`): for every non-empty subset S of the requested
  * levels, a subtotal row set aggregated over S is appended with the
  * S-positions labelled `"All"` — exactly a SQL GROUPING SETS
  * expansion, which is how it is executed here.
  */
sealed trait Margins
object Margins {
  case object None extends Margins
  /** Subtotals for every level plus the grand total (margins=True). */
  case object All extends Margins
  /** Subtotals only for the given key positions (margins=[levels]). */
  final case class Levels(levels: Seq[Int]) extends Margins
}

/** One aggregation to compute: `op` over `value`, output column `name`.
  *
  * `exact` selects order-insensitive decimal accumulation for
  * floating sums/means ([[graft.functions.Num]]) — the scale-safe
  * deterministic path. `ord` is required by order-dependent ops
  * (first/last). `ddof` parameterizes var/std. `param` tunes the
  * approximate ops (rsd for approx_nunique, accuracy for
  * approx_median).
  */
final case class AggSpec(
    op: String,
    value: Column,
    name: String,
    exact: Boolean = false,
    ddof: Int = 1,
    ord: Option[Column] = scala.None,
    param: Option[Double] = scala.None)

/** Spark-native analogue of the reference's `GroupBy`
  * (`/root/reference/pandas_plus/groupby/core.py:146`): a reusable
  * grouping of `df` by `keys` over which many aggregations can run.
  *
  * Design notes (Spark-first, not a port):
  *   - The reference factorizes keys once and reuses the codes; the
  *     Spark equivalent of "reuse the factorization" is reusing a
  *     key-partitioned, persisted DataFrame — [[persisted]] — so
  *     repeated aggregations skip the shuffle. Catalyst owns
  *     everything else the reference hand-built (partial/final
  *     aggregation, chunking, thread budgets; see SURVEY §4).
  *   - `mask` is an inline filter evaluated *inside* the aggregate
  *     (`F.sum(when(mask, v))`), never a materialized copy — same
  *     semantics, zero extra pass (reference `core.py:493-519`).
  *   - Null keys are dropped by default, matching pandas
  *     `dropna=True` (reference kernels skip code −1,
  *     `numba.py:441-443`).
  *   - `transform=true` runs the same aggregate as a window function
  *     over the key partition, returning input-shaped rows
  *     (reference `core.py:694-702`).
  */
final class GroupBy(
    val df: DataFrame,
    val keys: Seq[Column],
    val sort: Boolean = true,
    val dropNullKeys: Boolean = true)
    extends Serializable {

  private[operators] val keyNames: Seq[String] = df.select(keys: _*).columns.toSeq
  require(keyNames.distinct.size == keyNames.size,
    s"duplicate key names: $keyNames — alias expression keys with .as(...)")

  private[operators] def keyCols: Seq[Column] = keyNames.map(col)

  /** Input with every key materialized as a named column. A key that
    * is just a column reference keeps the existing column. An
    * EXPRESSION key whose name collides with an existing column is
    * rejected: silently grouping by the raw column is wrong, and
    * replacing the column would leak key values into value
    * expressions — pandas can hold both (grouper arrays live outside
    * the frame), a materialized column cannot, so the caller must
    * pick a fresh alias.
    */
  private[operators] lazy val dfWithKeys: DataFrame =
    keys.zip(keyNames).foldLeft(df) { case (d, (k, n)) =>
      val isPlainRef = k.toString == n || k.toString == s"`$n`"
      if (d.columns.contains(n)) {
        require(isPlainRef,
          s"expression key is aliased to existing column '$n' — " +
            "alias it to a fresh name so raw-column references stay unambiguous")
        d
      } else d.withColumn(n, k)
    }

  /** Rows that participate in grouping (null keys dropped by default). */
  private[operators] lazy val base: DataFrame =
    if (dropNullKeys)
      dfWithKeys.filter(keyNames.map(col(_).isNotNull).reduce(_ && _))
    else dfWithKeys

  /** The "reuse the factorization" lever at cluster scale: hash-
    * partition by the keys once and persist, so every subsequent
    * aggregation on this GroupBy is shuffle-free map-side work.
    */
  def persisted: GroupBy = {
    val g = new GroupBy(base.repartition(keyCols: _*).persist(), keyCols,
      sort, dropNullKeys)
    g.ownsCache = true
    g
  }

  /** Set only by [[persisted]]: marks that this GroupBy created (and
    * so owns) its cached frame — [[unpersist]] must never evict a
    * caller-supplied cache.
    */
  private var ownsCache: Boolean = false

  /** Release the cached partitioning created by [[persisted]] (no-op
    * on a GroupBy that was never persisted, even if the caller's own
    * input frame is cached).
    */
  def unpersist(): GroupBy = { if (ownsCache) df.unpersist(); this }

  /** Number of groups (reference `ngroups`, `api.py:189`). An action. */
  def ngroups: Long = base.select(keyCols: _*).distinct().count()

  // ---------------------------------------------------------------- core

  private def masked(mask: Option[Column], c: Column): Column =
    mask.map(m => when(m, c)).getOrElse(c)

  /** Build the expression for one spec. `over` switches every
    * aggregate call into a window function over the key partition
    * (transform mode) — composed results (exact mean, general-ddof
    * var) lift each constituent aggregate individually so the
    * surrounding arithmetic stays row-level.
    */
  private[operators] def aggExpr(
      spec: AggSpec,
      mask: Option[Column],
      over: Option[WindowSpec] = None): Column = {
    def lift(c: Column): Column = over.map(c.over).getOrElse(c)
    val v = masked(mask, spec.value)
    val e = spec.op match {
      case "sum" if spec.exact => lift(F.sum(v.cast(Num.SumDec))).cast(DoubleType)
      case "sum"               => lift(F.sum(v))
      case "mean" if spec.exact =>
        Num.safeDiv(lift(F.sum(v.cast(Num.SumDec))).cast(DoubleType),
          lift(F.count(v)).cast(DoubleType))
      case "mean"   => lift(F.avg(v))
      case "min"    => lift(F.min(v))
      case "max"    => lift(F.max(v))
      case "count"  => lift(F.count(v))
      case "size"   => lift(F.count(masked(mask, lit(1))))
      case "median" => lift(F.median(v))
      case "quantile" =>
        // exact linear-interpolation quantile (pandas interpolation=
        // 'linear', SQL PERCENTILE_CONT): per-group sort, the exact
        // sibling of approx_median's sketch
        lift(F.percentile(v, lit(spec.param.getOrElse(0.5))))
      case "skew" =>
        // pandas-semantics adjusted Fisher-Pearson G1 from Spark's
        // population g1 = √n·M3/M2^1.5: G1 = g1·√(n(n−1))/(n−2);
        // null for n < 3 (pandas returns NaN) or zero variance
        val n = lift(F.count(v)).cast(DoubleType)
        when(n < 3, lit(null).cast(DoubleType))
          .otherwise(lift(F.skewness(v)) * sqrt(n * (n - 1)) / (n - 2))
      case "kurt" =>
        // pandas-semantics adjusted excess kurtosis G2 from Spark's
        // population g2 = M4·n/M2²−3:
        // G2 = (n−1)/((n−2)(n−3)) · ((n+1)·g2 + 6); null for n < 4
        val n = lift(F.count(v)).cast(DoubleType)
        when(n < 4, lit(null).cast(DoubleType))
          .otherwise(((n + 1) * lift(F.kurtosis(v)) + lit(6.0)) *
            (n - 1) / ((n - 2) * (n - 3)))
      case "nunique" => over match {
        // DISTINCT aggregates are not legal window functions; the
        // window form dedups via collect_set (null-skipping, like
        // count_distinct), sized per row within the group partition
        case Some(w) => F.size(F.collect_set(v).over(w)).cast("long")
        case scala.None => F.count_distinct(v)
      }
      // the 100 TB paths: HLL++ sketch (constant memory per group, no
      // distinct expand) and t-digest-style quantile (single pass)
      case "approx_nunique" =>
        lift(F.approx_count_distinct(v, spec.param.getOrElse(0.05)))
      case "approx_median" =>
        lift(F.percentile_approx(v, lit(0.5),
          lit(spec.param.map(_.toInt).getOrElse(10000))))
      case "first" =>
        val ord = spec.ord.getOrElse(sys.error("first requires ord column"))
        lift(F.min_by(v, when(v.isNotNull, ord)))
      case "last" =>
        val ord = spec.ord.getOrElse(sys.error("last requires ord column"))
        lift(F.max_by(v, when(v.isNotNull, ord)))
      case "prod" =>
        // pandas GroupBy.prod (skipna): exp(Σ ln|x|)·(−1)^#neg, 0 when
        // any factor is zero, 1.0 for an empty/all-null group (the
        // multiplicative identity, pandas' choice). The ln terms
        // decimal-sum (order-exact); ln/exp are correctly rounded
        // per-engine, not bit-pinned across engines — gates round,
        // like every log-derived output
        val av = v.cast(DoubleType)
        val cnt = lift(F.count(av))
        val zeros = lift(F.count(when(av === 0.0, lit(1))))
        val negs = lift(F.count(when(av < 0.0, lit(1))))
        val sumln = lift(F.sum(when(av =!= 0.0, F.log(F.abs(av)))
          .cast(Num.DotDec))).cast(DoubleType)
        val sign = when(pmod(negs, lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0))
        when(cnt === 0, lit(1.0))
          .when(zeros > 0, lit(0.0))
          .otherwise(F.exp(sumln) * sign)
      case "sem" =>
        // pandas GroupBy.sem: std(ddof)/√n over non-null values
        val n = lift(F.count(v)).cast(DoubleType)
        val stdC = spec.ddof match {
          case 1 => lift(F.stddev_samp(v))
          case 0 => lift(F.stddev_pop(v))
          case d => sqrt(Num.varianceExpr(v, d, lift))
        }
        stdC / sqrt(n)
      case "any" =>
        // pandas GroupBy.any (skipna): true iff any non-null value is
        // truthy; an empty/all-null group is FALSE (pandas' identity)
        coalesce(lift(F.max(when(v.isNotNull, v.cast("boolean")))), lit(false))
      case "all" =>
        // pandas GroupBy.all: false iff any non-null value is falsy;
        // empty/all-null group is TRUE
        coalesce(lift(F.min(when(v.isNotNull, v.cast("boolean")))), lit(true))
      case "idxmin" =>
        // pandas idxmin: the ord of the FIRST (smallest-ord) occurrence
        // of the minimum — lexicographic struct-min over (value, ord);
        // numeric values only (idxmax negates)
        val ordC = spec.ord.getOrElse(sys.error("idxmin requires ord column"))
        lift(F.min(when(v.isNotNull,
          struct(v.cast(DoubleType).as("v"), ordC.as("o"))))).getField("o")
      case "idxmax" =>
        val ordC = spec.ord.getOrElse(sys.error("idxmax requires ord column"))
        lift(F.min(when(v.isNotNull,
          struct((-v.cast(DoubleType)).as("v"), ordC.as("o"))))).getField("o")
      case "var" =>
        spec.ddof match {
          case 1 => lift(F.var_samp(v))
          case 0 => lift(F.var_pop(v))
          case d => Num.varianceExpr(v, d, lift)
        }
      case "std" =>
        spec.ddof match {
          case 1 => lift(F.stddev_samp(v))
          case 0 => lift(F.stddev_pop(v))
          case d => sqrt(Num.varianceExpr(v, d, lift))
        }
      case other => sys.error(s"unknown aggregation op: $other")
    }
    e.as(spec.name)
  }

  /** Generic aggregation entry point every public op funnels through —
    * the analogue of the reference's `_apply_gb_func`
    * (`core.py:618-747`), except all of steps 1–5 of its pipeline
    * (factorize → dispatch → kernels → combine) collapse into one
    * Catalyst `groupBy().agg()` (partial → shuffle → final).
    */
  def aggregate(
      specs: Seq[AggSpec],
      mask: Option[Column] = None,
      transform: Boolean = false,
      margins: Margins = Margins.None,
      observedOnly: Boolean = true): DataFrame = {
    require(specs.nonEmpty, "no aggregations requested")
    require(specs.map(_.name).distinct.size == specs.size,
      s"duplicate output column names: ${specs.map(_.name)} — alias value columns distinctly")
    if (transform) {
      require(margins == Margins.None, "margins with transform is undefined")
      transformAgg(specs, mask)
    } else {
      margins match {
        case Margins.None => plainAgg(specs, mask, observedOnly)
        case m            => marginAgg(specs, mask, observedOnly, m)
      }
    }
  }

  private def plainAgg(
      specs: Seq[AggSpec],
      mask: Option[Column],
      observedOnly: Boolean): DataFrame = {
    // observed_only drops groups with zero mask-passing rows; without a
    // mask every factorized group is observed (reference core.py:704-717).
    val needSize = observedOnly && mask.isDefined
    val exprs = specs.map(aggExpr(_, mask)) ++
      (if (needSize) Seq(F.count(masked(mask, lit(1))).as(GroupBy.SizeCol)) else Nil)
    var out = base.groupBy(keyCols: _*).agg(exprs.head, exprs.tail: _*)
    if (needSize) out = out.filter(col(GroupBy.SizeCol) > 0).drop(GroupBy.SizeCol)
    if (sort) out.orderBy(keyCols: _*) else out
  }

  private def transformAgg(specs: Seq[AggSpec], mask: Option[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
    val keysOk =
      if (dropNullKeys) keyNames.map(col(_).isNotNull).reduce(_ && _) else lit(true)
    specs.foldLeft(dfWithKeys) { (d, spec) =>
      d.withColumn(spec.name, when(keysOk, aggExpr(spec, mask, Some(w))))
    }
  }

  /** GROUPING SETS expansion of the reference's margin rows (see
    * [[Margins]]); super-aggregate positions are relabelled "All"
    * (keys become strings, as in the reference's mixed-label index).
    */
  private def marginAgg(
      specs: Seq[AggSpec],
      mask: Option[Column],
      observedOnly: Boolean,
      margins: Margins): DataFrame = {
    val levels = margins match {
      case Margins.All        => keyNames.indices
      case Margins.Levels(ls) => ls
      case Margins.None       => Nil
    }
    val subsets = (1 to levels.size).flatMap(levels.combinations(_).toSeq)
    val sets: Seq[Seq[Column]] =
      keyCols +: subsets.map(s =>
        keyNames.indices.filterNot(s.contains).map(i => col(keyNames(i))))
    val needSize = observedOnly && mask.isDefined
    val gCols = keyNames.zipWithIndex.map { case (n, i) => F.grouping(col(n)).as(s"__g_$i") }
    val exprs = specs.map(aggExpr(_, mask)) ++ gCols ++
      (if (needSize) Seq(F.count(masked(mask, lit(1))).as(GroupBy.SizeCol)) else Nil)
    var out = base
      .groupingSets(sets, keyCols: _*)
      .agg(exprs.head, exprs.tail: _*)
    if (needSize) out = out.filter(col(GroupBy.SizeCol) > 0).drop(GroupBy.SizeCol)
    val relabelled = keyNames.zipWithIndex.foldLeft(out) { case (d, (n, i)) =>
      d.withColumn(n,
          when(col(s"__g_$i") === 1, lit("All")).otherwise(col(n).cast(StringType)))
        .drop(s"__g_$i")
    }
    if (sort) relabelled.orderBy(keyCols: _*) else relabelled
  }

  // ------------------------------------------------------- public surface

  private def named(values: Seq[Column]): Seq[(Column, String)] =
    values.zip(df.select(values: _*).columns)

  private def one(
      op: String,
      values: Seq[Column],
      mask: Option[Column],
      transform: Boolean,
      margins: Margins,
      observedOnly: Boolean,
      exact: Boolean = false,
      ddof: Int = 1,
      ord: Option[Column] = None,
      param: Option[Double] = None): DataFrame =
    aggregate(
      named(values).map { case (v, n) => AggSpec(op, v, n, exact, ddof, ord, param) },
      mask, transform, margins, observedOnly)

  /** Rows per group, null values included (reference `core.py:749`). */
  def size(
      mask: Option[Column] = None,
      transform: Boolean = false,
      margins: Margins = Margins.None,
      name: String = "size"): DataFrame =
    aggregate(Seq(AggSpec("size", lit(1), name)), mask, transform, margins)

  /** Non-null values per group (reference `core.py:778`). */
  def count(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true): DataFrame =
    one("count", values, mask, transform, margins, observedOnly)

  def sum(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true, exact: Boolean = false): DataFrame =
    one("sum", values, mask, transform, margins, observedOnly, exact = exact)

  def mean(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true, exact: Boolean = false): DataFrame =
    one("mean", values, mask, transform, margins, observedOnly, exact = exact)

  def min(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true): DataFrame =
    one("min", values, mask, transform, margins, observedOnly)

  def max(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true): DataFrame =
    one("max", values, mask, transform, margins, observedOnly)

  def median(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("median", values, mask, transform, Margins.None, observedOnly)

  /** Exact arbitrary-q quantile (pandas `quantile(q)`, linear
    * interpolation — PERCENTILE_CONT semantics). Per-group sort; use
    * [[medianApprox]]'s sketch family when cardinality × group size
    * makes exact sorting unreasonable.
    */
  def quantile(values: Seq[Column], q: Double, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile q must be in [0, 1], got $q")
    one("quantile", values, mask, transform, Margins.None, observedOnly,
      param = Some(q))
  }

  /** Winsorize a value within each group: clip to the group's exact
    * [`lo`, `hi`] linear-interpolation quantiles (the standard
    * outlier-capping pass run on quality scores before
    * weighted sampling or mixture balancing). Returns the input rows
    * (null keys dropped, as everywhere) plus the clipped DOUBLE
    * column `out`; null values stay null (a pandas `clip` would,
    * and least/greatest silently skip nulls — the explicit guard
    * keeps the null row a null, not the lower fence).
    *
    * Distributed shape: one bounded per-group quantile aggregation
    * (group-count rows), then the fences rejoin the input on the
    * keys. The fence table BROADCASTS by default — group counts are
    * tiny next to the corpus, so the input is clipped map-side with
    * ZERO shuffle of the data rows; pass `broadcastQuantiles = false`
    * at extreme group cardinalities and the join falls back to a
    * hash shuffle on the keys (both sides co-partition).
    */
  def winsorize(value: Column, lo: Double = 0.01, hi: Double = 0.99,
      out: String = "winsorized",
      broadcastQuantiles: Boolean = true): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"fences must satisfy 0 <= lo <= hi <= 1, got lo=$lo hi=$hi")
    require(!base.columns.contains(out),
      s"output column '$out' already exists on the input — pick another name")
    val fences = base.groupBy(keyCols: _*).agg(
      F.percentile(value, lit(lo)).as("__graft_qlo"),
      F.percentile(value, lit(hi)).as("__graft_qhi"))
    val probe = if (broadcastQuantiles) F.broadcast(fences) else fences
    val v = value.cast(DoubleType)
    base.join(probe, keyNames)
      .withColumn(out, when(v.isNull, lit(null).cast(DoubleType))
        .otherwise(F.least(F.greatest(v, col("__graft_qlo")), col("__graft_qhi"))))
      .drop("__graft_qlo", "__graft_qhi")
  }

  /** Adjusted Fisher-Pearson skewness (pandas `skew()` semantics —
    * bias-corrected G1; null for groups smaller than 3).
    */
  def skew(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("skew", values, mask, transform, Margins.None, observedOnly)

  /** Adjusted excess kurtosis (pandas `kurt()` semantics — bias-
    * corrected G2; null for groups smaller than 4).
    */
  def kurt(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("kurt", values, mask, transform, Margins.None, observedOnly)

  def variance(values: Seq[Column], ddof: Int = 1, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("var", values, mask, transform, Margins.None, observedOnly, ddof = ddof)

  def std(values: Seq[Column], ddof: Int = 1, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("std", values, mask, transform, Margins.None, observedOnly, ddof = ddof)

  /** Per-group pairwise covariance of `x` and `y` (pandas
    * `GroupBy.cov` for one column pair): only rows where BOTH are
    * non-null participate (pairwise-complete observations, exactly
    * pandas' rule), `ddof` generalizes the divisor (1 = sample, 0 =
    * population), null for pair-count ≤ ddof. One hash aggregation —
    * partial/final like every algebraic agg, no second pass.
    *
    * `exact = true` accumulates the pair moments in decimal so the
    * statistic is bit-identical under any partitioning (the
    * determinism contract the oracle gates need); the default is the
    * plain-double codegen path — measured 4.6× faster on the bench's
    * corr row, order-sensitive only in the final ulps.
    */
  def cov(x: Column, y: Column, ddof: Int = 1, mask: Option[Column] = None,
      out: String = "cov", observedOnly: Boolean = true,
      exact: Boolean = false): DataFrame =
    pairMoment(x, y, mask, observedOnly, exact) { (n, sx, sy, sxy, _, _) =>
      when(n > ddof, (sxy - sx * sy / n) / (n - lit(ddof.toDouble)))
        .otherwise(lit(null).cast(DoubleType)).as(out)
    }

  /** Per-group Pearson correlation of `x` and `y` (pandas
    * `GroupBy.corr` for one column pair): pairwise-complete
    * observations, null when either marginal variance is zero or the
    * pair count is < 2 (pandas yields NaN there; null is this
    * library's engine-portable NaN throughout). ddof cancels in the
    * ratio, so there is no ddof knob — same as pandas.
    *
    * `exact` as in [[cov]]: default is the plain-double codegen path
    * (4.6× faster, last-ulp order sensitivity); `exact = true` buys
    * partitioning-independent bit equality via decimal accumulation.
    */
  def corr(x: Column, y: Column, mask: Option[Column] = None,
      out: String = "corr", observedOnly: Boolean = true,
      exact: Boolean = false): DataFrame =
    pairMoment(x, y, mask, observedOnly, exact) { (n, sx, sy, sxy, sxx, syy) =>
      val cxy = sxy - sx * sy / n
      val cxx = sxx - sx * sx / n
      val cyy = syy - sy * sy / n
      when(n >= 2 && cxx > 0 && cyy > 0, cxy / sqrt(cxx * cyy))
        .otherwise(lit(null).cast(DoubleType)).as(out)
    }

  /** Per-group rank of `value` (pandas `GroupBy.rank`): a TRANSFORM —
    * input rows come back with a `rank` column appended.
    *
    *   - `method`: `"min"` (competition rank, pandas min), `"dense"`,
    *     `"first"` (order of appearance — requires `ord`, the
    *     physical-order stand-in), `"average"` (mean rank of ties,
    *     the pandas default).
    *   - `ascending` flips the direction; `pct` divides by the
    *     group's non-null count (pandas pct=True) — except
    *     method="dense", where pandas divides by the number of
    *     DISTINCT non-null values (GH#15630).
    *   - Null values rank as null and don't shift other ranks
    *     (pandas NaN semantics): nulls sort to the END of the rank
    *     window, so every non-null rank is unaffected, and the
    *     output nulls out.
    *
    * Distributed shape: one window sort per key — the same skew
    * exposure as unsplit positional selection; rank has no limit to
    * push down, so a degenerate hot key serializes its sort (use the
    * value-bucketed two-pass form if that regime ever matters; at
    * normal cardinality the per-key sort is the right plan).
    */
  def rank(value: Column, method: String = "average",
      ascending: Boolean = true, pct: Boolean = false,
      ord: Option[Column] = scala.None, out: String = "rank"): DataFrame = {
    require(Seq("min", "dense", "first", "average").contains(method),
      s"unknown rank method '$method'")
    require(!base.columns.contains(out),
      s"output column '$out' already exists — pick another name")
    val dir = if (ascending) value.asc_nulls_last else value.desc_nulls_last
    val w = method match {
      case "first" =>
        val o = ord.getOrElse(sys.error("method='first' requires ord"))
        Window.partitionBy(keyCols: _*).orderBy(dir, o)
      case _ => Window.partitionBy(keyCols: _*).orderBy(dir)
    }
    val raw: Column = method match {
      case "min"   => F.rank().over(w).cast(DoubleType)
      case "dense" => F.dense_rank().over(w).cast(DoubleType)
      case "first" => F.row_number().over(w).cast(DoubleType)
      case "average" =>
        // mean rank of a tie run = min rank + (ties − 1)/2
        val ties = Window.partitionBy(keyCols :+ value: _*)
        F.rank().over(w).cast(DoubleType) +
          (F.count(value).over(ties).cast(DoubleType) - 1) / 2.0
    }
    if (pct && method == "dense") {
      // pandas divides DENSE ranks by the number of DISTINCT non-null
      // values in the group, not the non-null row count (pandas
      // GH#15630) — otherwise dense+pct could never reach 1.0 when
      // ties exist. Distinct count = max dense rank over the group's
      // non-null rows (nulls sort last, so excluding them drops only
      // the trailing null band); computed as a second window over the
      // SAME key partitioning — no collect_set buffer, the sort is
      // reused, hot keys cost nothing extra.
      val rawName = "__graft_rank_raw"
      val denom = F.max(when(value.isNotNull, col(rawName)))
        .over(Window.partitionBy(keyCols: _*))
      base.withColumn(rawName, raw)
        .withColumn(out, when(value.isNotNull, col(rawName) / denom))
        .drop(rawName)
    } else {
      val nonNull = F.count(value)
        .over(Window.partitionBy(keyCols: _*)).cast(DoubleType)
      val r0 = if (pct) raw / nonNull else raw
      base.withColumn(out, when(value.isNotNull, r0))
    }
  }

  /** Shared single-pass pair-moment aggregation behind [[cov]] /
    * [[corr]]: the five sums over pairwise-complete rows, exact
    * decimal accumulation throughout ([[graft.functions.Num]]) so the
    * statistic is partitioning-independent — then `f(n, Σx, Σy, Σxy,
    * Σx², Σy²)` finishes row-locally in double.
    */
  private def pairMoment(x: Column, y: Column, mask: Option[Column],
      observedOnly: Boolean, exact: Boolean = true)(
      f: (Column, Column, Column, Column, Column, Column) => Column): DataFrame = {
    val both = masked(mask, when(x.isNotNull && y.isNotNull, lit(1)))
    // exact=false (the cov/corr DEFAULT since round 11): plain double
    // partial sums — stays inside whole-stage codegen (the decimal
    // casts are the one expensive expression in this aggregation,
    // measured 4.6x on the bench's corr row), at the cost of
    // accumulation-order sensitivity in the last ulps. exact=true is
    // the determinism-contract path (partitioning-independent bit
    // equality) — the oracle gate passes it explicitly.
    def s(c: Column, dec: org.apache.spark.sql.types.DecimalType) =
      if (exact)
        F.sum(when(both.isNotNull, c.cast(DoubleType)).cast(dec)).cast(DoubleType)
      else F.sum(when(both.isNotNull, c.cast(DoubleType)))
    val xd = x.cast(DoubleType); val yd = y.cast(DoubleType)
    val n = F.count(both).cast(DoubleType)
    val stat = f(n, s(xd, Num.SumDec), s(yd, Num.SumDec),
      s(xd * yd, Num.MomentDec), s(xd * xd, Num.MomentDec),
      s(yd * yd, Num.MomentDec))
    val needSize = observedOnly && mask.isDefined
    val exprs = Seq(stat) ++
      (if (needSize) Seq(F.count(masked(mask, lit(1))).as(GroupBy.SizeCol)) else Nil)
    var outDf = base.groupBy(keyCols: _*).agg(exprs.head, exprs.tail: _*)
    if (needSize) outDf = outDf.filter(col(GroupBy.SizeCol) > 0).drop(GroupBy.SizeCol)
    if (sort) outDf.orderBy(keyCols: _*) else outDf
  }

  /** Most frequent non-null value per group (pandas `mode()`, first
    * of the modes): `(keys…, out, out_count)`. Ties break on the
    * SMALLEST value — a total, engine-independent rule (pandas
    * returns all modes sorted; this is its head). Nulls are excluded
    * like every pandas aggregation.
    *
    * Distributed shape: two hash aggregations — (keys, value) counts,
    * then a per-key struct-min over (−count, value) — both
    * partial-aggregatable map-side, no windows, no sorting of the
    * data. A hot key costs one combiner per distinct value, not a
    * single-task sort.
    */
  def mode(value: Column, out: String = "mode"): DataFrame = {
    val counts = base.filter(value.isNotNull)
      .groupBy(keyCols :+ value.as("__graft_v"): _*)
      .agg(F.count(lit(1)).as("__graft_n"))
    val picked = counts.groupBy(keyCols: _*)
      .agg(F.min(struct((-col("__graft_n")).as("nn"),
        col("__graft_v").as("v"))).as("__graft_m"))
      .select(keyCols ++ Seq(col("__graft_m.v").as(out),
        (-col("__graft_m.nn")).as(s"${out}_count")): _*)
    if (sort) picked.orderBy(keyCols: _*) else picked
  }

  /** Top-`k` most frequent non-null values per group with counts and
    * dense 1-based ranks: `(keys…, value, value_count, rank)` — the
    * pandas `value_counts().head(k)` per group. Rank order is
    * (count DESC, value ASC), total and engine-independent.
    *
    * Distributed shape: the (keys, value) count aggregation, then
    * `row_number ≤ k` — which Spark plans as a PARTIAL
    * WindowGroupLimit below the key exchange (each map task keeps at
    * most k candidate values per key), so a key with millions of
    * distinct values never sorts whole in one task.
    */
  def topKValues(value: Column, k: Int, out: String = "value"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = base.filter(value.isNotNull)
      .groupBy(keyCols :+ value.as(out): _*)
      .agg(F.count(lit(1)).as(s"${out}_count"))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(s"${out}_count").desc, col(out))
    val ranked = counts
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    if (sort) ranked.orderBy(keyCols :+ col("rank"): _*) else ranked
  }

  /** Distinct non-null values per group (pandas `nunique`; exact —
    * use [[nuniqueApprox]] at extreme cardinalities).
    */
  def nunique(values: Seq[Column], mask: Option[Column] = None,
      observedOnly: Boolean = true): DataFrame =
    one("nunique", values, mask, transform = false, Margins.None, observedOnly)

  /** Approximate distinct count (HyperLogLog++, relative error
    * `rsd`) — constant sketch memory per group where exact
    * count_distinct would expand every distinct value through the
    * shuffle. The right nunique at 100 TB cardinalities.
    */
  def nuniqueApprox(values: Seq[Column], rsd: Double = 0.05,
      mask: Option[Column] = None, observedOnly: Boolean = true): DataFrame =
    aggregate(named(values).map { case (v, n) =>
      AggSpec("approx_nunique", v, n, param = Some(rsd)) },
      mask, transform = false, Margins.None, observedOnly)

  /** Approximate median (`percentile_approx`, positive `accuracy`;
    * error ≤ 1/accuracy) — single-pass bounded-memory sketch vs exact
    * median's per-group sort. The scale path for [[median]].
    */
  def medianApprox(values: Seq[Column], accuracy: Int = 10000,
      mask: Option[Column] = None, observedOnly: Boolean = true): DataFrame =
    aggregate(named(values).map { case (v, n) =>
      AggSpec("approx_median", v, n, param = Some(accuracy.toDouble)) },
      mask, transform = false, Margins.None, observedOnly)

  /** Skew-safe two-phase aggregation for algebraic ops
    * (sum/count/size/min/max/mean): rows first aggregate under
    * (keys, random salt) — splitting any hot key across
    * `saltBuckets` reducers — then the per-salt partials combine on
    * the keys alone. Same results as [[aggregate]] for these ops
    * (they re-aggregate losslessly; exact sums stay decimal between
    * phases), at the cost of one extra (tiny) shuffle. AQE's skew
    * handling covers joins; this is the aggregation-side lever for
    * 100 TB keys with degenerate frequency.
    */
  def aggregateSalted(
      specs: Seq[AggSpec],
      saltBuckets: Int = 16,
      mask: Option[Column] = None,
      observedOnly: Boolean = true): DataFrame = {
    require(specs.nonEmpty, "no aggregations requested")
    require(specs.map(_.name).distinct.size == specs.size,
      s"duplicate output column names: ${specs.map(_.name)}")
    val bad = specs.map(_.op).filterNot(
      Set("sum", "count", "size", "min", "max", "mean"))
    require(bad.isEmpty, s"non-algebraic ops cannot be salted: $bad")

    def m(c: Column) = masked(mask, c)
    // phase 1: (keys, salt) — partial states, decimals kept decimal
    val phase1 = specs.zipWithIndex.flatMap { case (s, i) =>
      s.op match {
        case "sum" if s.exact => Seq(F.sum(m(s.value).cast(Num.SumDec)).as(s"__p$i"))
        case "sum"            => Seq(F.sum(m(s.value)).as(s"__p$i"))
        case "count"          => Seq(F.count(m(s.value)).as(s"__p$i"))
        case "size"           => Seq(F.count(m(lit(1))).as(s"__p$i"))
        case "min"            => Seq(F.min(m(s.value)).as(s"__p$i"))
        case "max"            => Seq(F.max(m(s.value)).as(s"__p$i"))
        case "mean" =>
          val sumC = if (s.exact) F.sum(m(s.value).cast(Num.SumDec))
                     else F.sum(m(s.value))
          Seq(sumC.as(s"__p$i"), F.count(m(s.value)).as(s"__c$i"))
      }
    }
    val needSize = observedOnly && mask.isDefined
    val phase1All = phase1 ++
      (if (needSize) Seq(F.count(m(lit(1))).as(GroupBy.SizeCol)) else Nil)
    val salted = base
      .withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(phase1All.head, phase1All.tail: _*)
    // phase 2: combine partials on the keys alone
    val phase2 = specs.zipWithIndex.map { case (s, i) =>
      val e = s.op match {
        case "sum" if s.exact => F.sum(col(s"__p$i")).cast(DoubleType)
        case "sum"            => F.sum(col(s"__p$i"))
        case "count" | "size" => F.sum(col(s"__p$i"))
        case "min"            => F.min(col(s"__p$i"))
        case "max"            => F.max(col(s"__p$i"))
        case "mean" =>
          val total = F.sum(col(s"__p$i"))
          val n = F.sum(col(s"__c$i"))
          if (s.exact) Num.safeDiv(total.cast(DoubleType), n.cast(DoubleType))
          else Num.safeDiv(total, n.cast(DoubleType))
      }
      e.as(s.name)
    }
    val phase2All = phase2 ++
      (if (needSize) Seq(F.sum(col(GroupBy.SizeCol)).as(GroupBy.SizeCol)) else Nil)
    var out = salted.groupBy(keyCols: _*).agg(phase2All.head, phase2All.tail: _*)
    if (needSize) out = out.filter(col(GroupBy.SizeCol) > 0).drop(GroupBy.SizeCol)
    if (sort) out.orderBy(keyCols: _*) else out
  }

  /** First non-null value per group in `ord` order (reference
    * `core.py:1096`; Spark needs the explicit order the reference
    * gets from physical row order — SURVEY §7.4).
    */
  def first(values: Seq[Column], ord: Column, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("first", values, mask, transform, Margins.None, observedOnly, ord = Some(ord))

  def last(values: Seq[Column], ord: Column, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("last", values, mask, transform, Margins.None, observedOnly, ord = Some(ord))

  /** pandas `GroupBy.describe` for one numeric column: count, mean,
    * std, min, 25%/50%/75% exact quantiles, max — ONE aggregation
    * pass (the quantiles share the per-group sort), decimal-exact
    * mean.
    */
  def describe(value: Column, mask: Option[Column] = None,
      observedOnly: Boolean = true): DataFrame =
    aggregate(Seq(
      AggSpec("count", value, "count"),
      AggSpec("mean", value, "mean", exact = true),
      AggSpec("std", value, "std"),
      AggSpec("min", value, "min"),
      AggSpec("quantile", value, "q25", param = Some(0.25)),
      AggSpec("median", value, "q50"),
      AggSpec("quantile", value, "q75", param = Some(0.75)),
      AggSpec("max", value, "max")),
      mask, transform = false, Margins.None, observedOnly)

  /** pandas `GroupBy.prod` (skipna; empty/all-null group → 1.0). */
  def prod(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("prod", values, mask, transform, Margins.None, observedOnly)

  /** pandas `GroupBy.sem`: std(ddof)/√n. */
  def sem(values: Seq[Column], ddof: Int = 1, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("sem", values, mask, transform, Margins.None, observedOnly, ddof = ddof)

  /** Per-group z-score standardization transform: `(x − mean)/std`
    * (ddof configurable), null where std is zero/undefined or x is
    * null — the feature-normalization pass run on quality scores
    * before mixing or thresholding across heterogeneous groups.
    *
    * Distributed shape: one bounded per-group moment aggregation
    * (decimal-exact sums, so the stats — and therefore every score —
    * are partitioning-independent), then the group-sized stats table
    * rejoins the input BROADCAST by default (the winsorize pattern):
    * the data rows are standardized map-side with zero shuffle. A
    * whole-partition window would serialize each hot key on one task;
    * this shape never does.
    */
  def zscore(value: Column, ddof: Int = 1, out: String = "zscore",
      broadcastStats: Boolean = true): DataFrame = {
    require(!base.columns.contains(out),
      s"output column '$out' already exists — pick another name")
    val vd = value.cast(DoubleType)
    val stats = base.groupBy(keyCols: _*).agg(
      F.count(vd).cast(DoubleType).as("__graft_zn"),
      F.sum(vd.cast(Num.SumDec)).cast(DoubleType).as("__graft_zs"),
      F.sum((vd * vd).cast(Num.MomentDec)).cast(DoubleType).as("__graft_zss"))
    val probe = if (broadcastStats) F.broadcast(stats) else stats
    val n = col("__graft_zn"); val s = col("__graft_zs"); val ss = col("__graft_zss")
    val mean = s / n
    val variance = greatest((ss - s * s / n) / (n - lit(ddof.toDouble)), lit(0.0))
    val std = sqrt(variance)
    base.join(probe, keyNames)
      .withColumn(out, when(vd.isNotNull && n > ddof && std > 0,
        (vd - mean) / std))
      .drop("__graft_zn", "__graft_zs", "__graft_zss")
  }

  /** Per-group min-max scaling transform: `(x − min)/(max − min)` in
    * [0, 1], null where the group range is zero or x is null. Same
    * broadcast-stats shape as [[zscore]].
    */
  def minmaxScale(value: Column, out: String = "scaled",
      broadcastStats: Boolean = true): DataFrame = {
    require(!base.columns.contains(out),
      s"output column '$out' already exists — pick another name")
    val vd = value.cast(DoubleType)
    val stats = base.groupBy(keyCols: _*).agg(
      F.min(vd).as("__graft_mn"), F.max(vd).as("__graft_mx"))
    val probe = if (broadcastStats) F.broadcast(stats) else stats
    base.join(probe, keyNames)
      .withColumn(out, when(vd.isNotNull && col("__graft_mx") > col("__graft_mn"),
        (vd - col("__graft_mn")) / (col("__graft_mx") - col("__graft_mn"))))
      .drop("__graft_mn", "__graft_mx")
  }

  /** pandas `GroupBy.any` / `all` over boolean(ish) columns: skipna —
    * null values don't count; an empty/all-null group is false (any)
    * / true (all), the pandas identities. Plain partial-aggregatable
    * min/max under the hood.
    */
  def any(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("any", values, mask, transform, Margins.None, observedOnly)

  def all(values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("all", values, mask, transform, Margins.None, observedOnly)

  /** pandas `idxmin`/`idxmax` for a numeric value: the `ord` (row
    * identifier) of the first — smallest-ord — occurrence of the
    * group minimum/maximum. One lexicographic struct-min aggregation,
    * partial-aggregatable like min itself.
    */
  def idxmin(values: Seq[Column], ord: Column, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("idxmin", values, mask, transform, Margins.None, observedOnly, ord = Some(ord))

  def idxmax(values: Seq[Column], ord: Column, mask: Option[Column] = None,
      transform: Boolean = false, observedOnly: Boolean = true): DataFrame =
    one("idxmax", values, mask, transform, Margins.None, observedOnly, ord = Some(ord))

  /** pandas `GroupBy.ohlc` for one value column: open/high/low/close
    * = first/max/min/last in `ord` order, one aggregation pass.
    */
  def ohlc(value: Column, ord: Column, mask: Option[Column] = None,
      observedOnly: Boolean = true): DataFrame = {
    val ordV = struct(ord.as("o"), value.as("v"))
    aggregate(Seq(
      AggSpec("first", value, "open", ord = Some(ordV)),
      AggSpec("max", value, "high"),
      AggSpec("min", value, "low"),
      AggSpec("last", value, "close", ord = Some(ordV))),
      mask, transform = false, Margins.None, observedOnly)
  }

  /** Func-list agg with the reference's zip semantics: `funcs(i)` is
    * applied to `values(i)` — a 1:1 zip, NOT a cross-product
    * (`core.py:1216-1242`, mismatch error `core.py:1222-1226`).
    */
  def agg(funcs: Seq[String], values: Seq[Column], mask: Option[Column] = None,
      transform: Boolean = false, margins: Margins = Margins.None,
      observedOnly: Boolean = true, exact: Boolean = false): DataFrame = {
    require(funcs.size == values.size,
      s"Number of functions (${funcs.size}) must match number of value columns (${values.size})")
    val specs = funcs.zip(named(values)).map { case (f, (v, n)) =>
      AggSpec(f, v, n, exact)
    }
    aggregate(specs, mask, transform, margins, observedOnly)
  }

  /** `agg(values1) / agg(values2)` per group (reference `core.py:1248`). */
  def ratio(num: Column, den: Column, op: String = "sum",
      mask: Option[Column] = None, name: String = "ratio",
      exact: Boolean = false): DataFrame = {
    val specs = Seq(AggSpec(op, num, "__num", exact), AggSpec(op, den, "__den", exact))
    aggregate(specs, mask)
      .withColumn(name,
        Num.safeDiv(col("__num").cast(DoubleType), col("__den").cast(DoubleType)))
      .drop("__num", "__den")
  }

  /** `agg(mask=subset && global) / agg(mask=global)` (reference
    * `core.py:1296`): the share of each group's (globally masked)
    * total that falls in the subset.
    */
  def subsetRatio(value: Column, subset: Column, op: String = "sum",
      globalMask: Option[Column] = None, name: String = "subset_ratio",
      exact: Boolean = false): DataFrame = {
    val g = globalMask.getOrElse(lit(true))
    val specs = Seq(
      AggSpec(op, when(subset && g, value), "__num", exact),
      AggSpec(op, when(g, value), "__den", exact))
    aggregate(specs, None)
      .withColumn(name,
        Num.safeDiv(col("__num").cast(DoubleType), col("__den").cast(DoubleType)))
      .drop("__num", "__den")
  }

  /** Group total as % of the reference total (reference `core.py:1332`):
    * a single-level key divides by the grand total; a two-level key
    * divides by the level-0 subtotal so each level-0 slice sums to 100
    * (`core.py:1367-1372`); >2 levels raise, as in the reference
    * (`core.py:1378`). The grand total is a broadcast one-row
    * aggregate and the subtotal a window keyed by level 0 — never a
    * single-partition global window, so the result stays distributed
    * at any group cardinality.
    */
  def density(value: Column, op: String = "sum", mask: Option[Column] = None,
      name: String = "density", exact: Boolean = false): DataFrame = {
    require(keyNames.size <= 2,
      "density is defined for 1- or 2-level keys (reference core.py:1378)")
    // With exact=true the per-group sums stay decimal through the
    // total, so numerator and denominator are both exact and the
    // final double division is order-insensitive.
    val aggC =
      if (exact && op == "sum") F.sum(masked(mask, value).cast(Num.SumDec)).as("__agg")
      else aggExpr(AggSpec(op, value, "__agg"), mask)
    // For ADDITIVE ops the denominator (sum of the group aggregates)
    // equals the aggregate over all rows, so the total branch can
    // aggregate the raw input directly via a () grouping set: its
    // partial aggregation collapses to one row per map partition and
    // the only exchange moves those single rows — no per-key shuffle
    // on the denominator side (the two-stage form re-shuffles every
    // group just to sum the aggregates). Both branches still scan the
    // input; callers who must not pay two scans aggregate a
    // [[persisted]] GroupBy, which is this engine's cross-op reuse
    // lever. Non-additive ops (mean/…) keep the two-stage form: their
    // denominator is genuinely "sum of group aggregates", which only
    // exists after the per-group pass.
    val additive = Set("sum", "count", "size").contains(op)
    val withDen =
      if (keyNames.size == 2) {
        val aggd = base.groupBy(keyCols: _*).agg(aggC)
        aggd.withColumn("__den",
          F.sum(col("__agg")).over(Window.partitionBy(col(keyNames.head))))
      } else if (additive) {
        val (groups, total) = groupsWithTotal(aggC, "__agg", "__den")
        groups.crossJoin(total)
      } else {
        val aggd = base.groupBy(keyCols: _*).agg(aggC)
        aggd.crossJoin(
          F.broadcast(aggd.agg(F.sum(col("__agg")).as("__den"))))
      }
    val out = withDen
      .withColumn(name,
        Num.safeDiv(col("__agg").cast(DoubleType), col("__den").cast(DoubleType)) * 100)
      .drop("__agg", "__den")
    if (sort) out.orderBy(keyCols: _*) else out
  }

  /** Per-group rows AND the broadcast grand total from ONE
    * grouping-sets aggregation — the shared mechanism behind additive
    * [[density]] and normalized `valueCounts`: the () set's partials
    * collapse to one row per map partition, so the total branch never
    * re-shuffles the (possibly huge-cardinality) per-key aggregates.
    * `aggC` must be aliased to `aggName`; the total comes back as a
    * one-row broadcast frame with column `totalName`.
    */
  private[operators] def groupsWithTotal(aggC: Column, aggName: String,
      totalName: String): (DataFrame, DataFrame) = {
    val g = base.groupingSets(Seq(keyCols, Seq.empty), keyCols: _*)
      .agg(aggC, F.grouping(col(keyNames.head)).as("__g"))
    val total = F.broadcast(g.filter(col("__g") === 1)
      .select(col(aggName).as(totalName)))
    (g.filter(col("__g") === 0).drop("__g"), total)
  }

  /** Per-group row count over the full (unmasked) input — the
    * reference's `key_count` (`core.py:766`).
    */
  def keyCount(name: String = "key_count"): DataFrame =
    size(name = name)

  /** Reindex an aggregation result of this GroupBy onto a full key
    * domain — the reference's `observed_only=False` for categorical
    * keys (`core.py:704-717`, cartesian domain `util.py:1280-1287`):
    * unobserved key combinations appear with `fill` (or null).
    * `domain` must carry the key columns; build it as a cross-join of
    * per-level distinct values (cheap: domain cardinality is the
    * output cardinality, guard it at scale like any pivot domain).
    */
  def reindex(result: DataFrame, domain: DataFrame,
      fill: Option[Long] = scala.None): DataFrame = {
    // fill ONLY the rows the left join missed (unobserved key combos),
    // flagged by a marker column — `na.fill` over the joined frame
    // would also overwrite genuine null aggregates of observed groups
    // (e.g. mean over all-null values)
    val marker = "__gb_observed"
    val joined = domain.join(result.withColumn(marker, lit(1)), keyNames, "left")
    // numeric result columns only, mirroring na.fill(Long) semantics
    val valueCols = result.schema.fields.collect {
      case f if !keyNames.contains(f.name) &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq
    val out = fill.map { v =>
      valueCols.foldLeft(joined) { (d, c) =>
        d.withColumn(c, when(col(marker).isNull, lit(v)).otherwise(col(c)))
      }
    }.getOrElse(joined).drop(marker)
    if (sort) out.orderBy(keyCols: _*) else out
  }

  /** Cartesian key domain: the cross-join of each level's distinct
    * observed values — what the reference builds internally for
    * `observed_only=False` (`util.py:1280-1287`). Feed it to
    * [[reindex]]. Output cardinality is the product of the level
    * cardinalities — a silent scale-killer with a high-cardinality
    * level (user ids), so the product is counted FIRST (one cheap
    * count-distinct pass) and the build fails loudly past `maxDomain`
    * rather than materializing an unbounded cross join. Each per-level
    * distinct is a partial aggregation and the cross-join of the
    * (bounded) results is broadcast.
    */
  def keyDomain: DataFrame = keyDomain(GroupBy.DefaultMaxDomain)

  def keyDomain(maxDomain: Long): DataFrame = {
    require(maxDomain > 0, s"maxDomain must be positive, got $maxDomain")
    val counts = dfWithKeys
      .select(keyNames.map(n => F.count_distinct(col(n)).as(n)): _*)
      .head()
    val card = keyNames.indices.map(i => BigInt(counts.getLong(i))).product
    require(card <= maxDomain,
      s"keyDomain cardinality $card (= ${keyNames.zipWithIndex
        .map { case (n, i) => s"$n:${counts.getLong(i)}" }
        .mkString(" x ")}) exceeds maxDomain=$maxDomain; " +
        "observed_only=False over this key set would materialize an " +
        "unbounded cartesian domain — raise maxDomain explicitly if " +
        "the product is genuinely intended")
    // per-level distincts over rows where THAT level is non-null (not
    // `base`, which pre-drops rows with a null in ANY level — a value
    // observed only alongside another level's null must still appear,
    // matching the reference's independent per-level factorization)
    keyNames.map(n => dfWithKeys.filter(col(n).isNotNull).select(col(n)).distinct())
      .reduce((a, b) => a.crossJoin(F.broadcast(b)))
  }

  /** group-label → sorted row ids (reference `groups`, `core.py:323`);
    * distributed as collect_list, for moderate group sizes only: one
    * group's ids become ONE array cell, so a hot key at 100× scale
    * would materialize a giant single value. `maxGroupSize` makes
    * that failure loud instead of an executor OOM (the getDummies
    * guard pattern, round-9 verdict item 5) — the check is a
    * codegen'd `raise_error` branch inside the same aggregation, no
    * extra job; raise it explicitly when a huge cell is genuinely
    * intended.
    */
  def groupsOf(rowId: Column, name: String = "row_ids",
      maxGroupSize: Int = 10000000): DataFrame = {
    require(maxGroupSize >= 1, s"maxGroupSize must be >= 1, got $maxGroupSize")
    val ids = F.sort_array(F.collect_list(rowId))
    base.groupBy(keyCols: _*)
      .agg(when(F.size(ids) > maxGroupSize, F.raise_error(concat(
          lit(s"groupsOf: a group holds more than maxGroupSize=" +
            s"$maxGroupSize row ids ("), F.size(ids).cast(StringType),
          lit(") — its id array would be one giant cell; raise " +
            "maxGroupSize explicitly if intended"))))
        .otherwise(ids).as(name))
  }

  /** One group's rows as a DataFrame (reference `get_group`, the
    * usable half of `api.py:189-209`'s per-group iteration — full
    * iteration is a driver-side anti-pattern at scale; [[groupsOf]]
    * is the distributed analogue). `label` supplies one value per
    * grouping key, in key order; the result is a plain pushdown-
    * friendly filter over the input.
    */
  def getGroup(label0: Any*): DataFrame = {
    // A literal `getGroup(null)` wraps into Seq(null) (Scala boxes a
    // null argument to an Any* vararg), so label0 itself is null only
    // for the explicit spread form `getGroup(null: _*)` — read that
    // as the single null label the caller most plausibly meant
    // (round-10 advice: the earlier comment claimed the literal form
    // hit this branch; it does not).
    val label: Seq[Any] = if (label0 == null) Seq(null) else label0
    require(label.size == keyNames.size,
      s"getGroup needs one label per key (${keyNames.mkString(", ")}), " +
        s"got ${label.size}")
    // null labels: under dropNullKeys (the default, pandas dropna
    // parity) no group can have a null label — raise like pandas'
    // KeyError instead of silently returning empty (`=== lit(null)`
    // never matches). With dropNullKeys=false null IS a group label
    // and compiles to isNull.
    require(!dropNullKeys || label.forall(_ != null),
      s"getGroup(${label.mkString(", ")}): null is not a group label — " +
        "null keys are dropped (dropNullKeys=true, pandas dropna " +
        "parity); construct the GroupBy with dropNullKeys=false to " +
        "address the null-key group")
    base.filter(keyNames.zip(label)
      .map { case (n, v) => if (v == null) col(n).isNull else col(n) === lit(v) }
      .reduce(_ && _))
  }
}

object GroupBy {
  private[operators] val SizeCol = "__observed_size"

  /** Default cap on [[GroupBy.keyDomain]]'s cartesian cardinality
    * (SURVEY §7.4 item 4): large enough for any real categorical
    * domain, far below the user-id-cartesian failure mode.
    */
  val DefaultMaxDomain: Long = 10000000L

  def apply(df: DataFrame, keys: Seq[Column], sort: Boolean = true,
      dropNullKeys: Boolean = true): GroupBy =
    new GroupBy(df, keys, sort, dropNullKeys)

  /** Compile the reference's slice-mask form (`core.py:493-519`
    * accepts `mask=slice(start, stop, step)` over physical row
    * positions) into a boolean mask column. Spark has no physical row
    * order, so — like every positional op here — position is an
    * explicit `rowId` column (0-based, the reference's implicit
    * RangeIndex made explicit); the slice becomes a codegen'd range
    * predicate that pushes down to the scan. Half-open `[start,
    * stop)` with stride `step`, matching Python slice semantics;
    * negative/None endpoints need the frame length and are the
    * caller's arithmetic.
    */
  def maskSlice(rowId: Column, start: Long, stop: Long,
      step: Long = 1L): Column = {
    require(start >= 0, s"start must be >= 0, got $start")
    require(stop >= start, s"stop must be >= start, got [$start, $stop)")
    require(step >= 1, s"step must be >= 1, got $step")
    val inRange = rowId >= start && rowId < stop
    if (step == 1L) inRange
    else inRange && F.pmod(rowId - start, lit(step)) === 0
  }

  /** Compile the reference's fancy-indexer mask form (an integer
    * position array, `core.py:493-519`) into a boolean mask column
    * over the explicit `rowId`. Literal id sets are the in-memory-
    * array parity case; a DISTRIBUTED id set should be a semi-join,
    * not a mask.
    */
  def maskIndices(rowId: Column, ids: Seq[Long]): Column =
    if (ids.isEmpty) lit(false) else rowId.isin(ids: _*)

  /** Top-level value_counts (reference `core.py:2054`). */
  def valueCounts(df: DataFrame, value: Column, normalize: Boolean = false,
      mask: Option[Column] = None): DataFrame = {
    val gb = new GroupBy(df, Seq(value))
    if (!normalize) gb.size(mask = mask, name = "count")
    else {
      // grand total as a broadcast one-row aggregate, not a global
      // window — value_counts output is one row per distinct value,
      // which can be huge (user ids), so it must stay distributed.
      // Counts are additive, so the total comes from the same
      // grouping-sets mechanism as additive density (groupsWithTotal)
      val keyName = gb.keyNames.head
      val cnt = F.count(mask.map(m => when(m, lit(1))).getOrElse(lit(1))).as("count")
      val (groups0, total) = gb.groupsWithTotal(cnt, "count", "__total")
      // observed_only parity with gb.size(mask): all-masked groups drop
      val groups = if (mask.isDefined) groups0.filter(col("count") > 0) else groups0
      groups.crossJoin(total)
        .withColumn("proportion",
          col("count").cast(DoubleType) / col("__total"))
        .drop("count", "__total")
        .orderBy(col(keyName))
    }
  }
}
