package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Exponentially weighted mean — pandas `GroupBy.ewm(alpha).mean()`
  * with full `adjust` × `ignore_na` parity (the reference stops at
  * plain rolling windows, `pandas_plus/groupby/numba.py:1520-1910`;
  * ewm is the one classic pandas window family it lacks, added here
  * for surface completeness).
  *
  * Semantics (pandas `_libs/window/aggregations.pyx::ewma`): state is
  * `(y, w)` — the running mean and the accumulated relative weight of
  * everything already blended. Per row, ord-ascending:
  *   - while no value has been seen, a non-null row seeds `y = x`,
  *     `w = 1`; null rows emit null;
  *   - otherwise the old weight decays one step per row when
  *     `ignore_na = false` (absolute positions — nulls still age the
  *     history) but only on non-null rows when `ignore_na = true`
  *     (relative positions);
  *   - a non-null row blends `y' = (w·y + nw·x) / (w + nw)` with
  *     `nw = 1` (adjust) or `nw = α` (recursive), then `w' = w + nw`
  *     (adjust) or `w' = 1`; pandas skips the blend when `x == y`
  *     (the value cannot move), and so do we;
  *   - every row emits the current `y` (nulls carry the last mean).
  *
  * The one deliberate divergence: pandas decays in a single
  * `pow(1-α, deltas)` per observation, we multiply `(1-α)` stepwise —
  * mathematically identical, and stepwise is what an engine-portable
  * replay can pin (`pow` is only faithfully rounded per engine; a
  * chain of `×` is IEEE correctly rounded everywhere, the
  * sample_temperature lesson). Results can differ from pandas by an
  * ulp after long null runs, never in which rows are filled.
  *
  * Scale shape: an ewm is a linear recurrence — irreducibly
  * sequential per key — so this is the funnel pattern: ONE
  * `groupBy(keys)` shuffle, a row-local sorted fold over each key's
  * history, posexplode, and a co-partitioned join back on
  * (keys, ord). Per-key state is its (ord, value) history; keys with
  * histories too large for one task should be pre-thinned or
  * time-sessionized first (same contract as Funnel.funnel). No
  * window-rescaling trick survives unbounded spans: the prefix-sum
  * form needs `(1-α)^(-rank)`, which overflows double past
  * `~690/-ln(1-α)` rows, so the honest general path is the fold.
  */
object Ewm {

  /** See object doc. `ord` must be non-null and unique within each
    * group (it is also the join-back key); value casts to double.
    */
  def mean(gb: GroupBy, value: Column, ord: Column, alpha: Double,
      adjust: Boolean = true, ignoreNa: Boolean = false,
      name: String = "ewm_mean"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val f = 1.0 - alpha
    val nw = if (adjust) 1.0 else alpha
    val keyC = gb.keyNames.map(col)
    val checkedOrd = when(ord.isNull, raise_error(lit(
      "graft: ewm requires a non-null ord on every grouped row")))
      .otherwise(ord)
    val sub = gb.base
      .select(keyC :+ checkedOrd.as("__ord") :+
        value.cast(DoubleType).as("__v"): _*)
    val init = struct(lit(null).cast(DoubleType).as("y"),
      lit(0.0).as("w"),
      lit(Array.empty[Double]).cast(ArrayType(DoubleType)).as("outs"))
    // the fold as a function of the sorted rows array, so the per-key
    // select can reference the SAME collected array for both the ords
    // and the outputs
    def outsOf(rows: Column): Column = F.aggregate(rows, init, (acc, e) => {
      val y = acc.getField("y"); val w = acc.getField("w")
      val cur = e.getField("__v")
      val isObs = cur.isNotNull
      // no mean yet: seed on the first non-null value
      val fresh = struct(cur.as("y"),
        when(isObs, lit(1.0)).otherwise(lit(0.0)).as("w"))
      // one decay step per row (absolute positions) or per value
      // (relative positions, ignore_na)
      val w1 = when(isObs || lit(!ignoreNa), w * lit(f)).otherwise(w)
      val yNew = when(isObs,
          when(cur === y, y) // pandas skips the no-op blend
            .otherwise((w1 * y + lit(nw) * cur) / (w1 + lit(nw))))
        .otherwise(y)
      val wNew = when(isObs,
          if (adjust) w1 + lit(nw) else lit(1.0))
        .otherwise(w1)
      val next = when(y.isNull, fresh)
        .otherwise(struct(yNew.as("y"), wNew.as("w")))
      struct(next.getField("y").as("y"), next.getField("w").as("w"),
        concat(acc.getField("outs"), array(next.getField("y"))).as("outs"))
    }).getField("outs")
    val perKey = sub.groupBy(keyC: _*)
      .agg(sort_array(F.collect_list(struct(col("__ord"), col("__v"))))
        .as("__rows"))
      .select(keyC :+ explode(zip_with(col("__rows"), outsOf(col("__rows")),
        (r, o) => struct(r.getField("__ord").as("__ord"), o.as(name)))).as("__e"): _*)
      .select(keyC :+ col("__e.__ord").as("__ord") :+ col(s"__e.$name"): _*)
    gb.dfWithKeys
      .withColumn("__ord", ord)
      .join(perKey, gb.keyNames :+ "__ord", "left")
      .drop("__ord")
  }

  /** DuckDB replay of [[mean]] as a linear RECURSIVE CTE stepping
    * `rn → rn+1` per key (the pack_sequences pattern): the identical
    * seed / stepwise-decay / blend arithmetic, so results are
    * bit-exact (α and 1−α must be exactly representable doubles —
    * pick dyadic gate alphas). `srcSql` must yield
    * `(k, rid, o, v)`: key, output row id, order, double value.
    */
  def meanSql(srcSql: String, alpha: Double, adjust: Boolean,
      ignoreNa: Boolean, out: String = "ewm_mean"): String = {
    val f = s"CAST(${1.0 - alpha} AS DOUBLE)"
    val nw = s"CAST(${if (adjust) 1.0 else alpha} AS DOUBLE)"
    // the decayed old weight, inlined (SQL cannot bind a local)
    def w1(v: String, w: String) =
      if (ignoreNa) s"CASE WHEN $v IS NOT NULL THEN $w * $f ELSE $w END"
      else s"$w * $f"
    // the anchor row's types become the recursion's types — cast both
    // state columns to DOUBLE or a decimal-typed source truncates
    // every subsequent round
    s"""WITH RECURSIVE ev AS (
       |  SELECT k, rid, CAST(v AS DOUBLE) AS v,
       |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn
       |  FROM ($srcSql)),
       | st AS (
       |  SELECT k, rid, rn, v AS y,
       |    CAST(CASE WHEN v IS NOT NULL THEN 1.0 ELSE 0.0 END AS DOUBLE) AS w
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.k, e.rid, e.rn,
       |    CASE WHEN s.y IS NULL THEN e.v
       |         WHEN e.v IS NULL THEN s.y
       |         WHEN e.v = s.y THEN s.y
       |         ELSE (${w1("e.v", "s.w")} * s.y + $nw * e.v)
       |              / (${w1("e.v", "s.w")} + $nw) END,
       |    CASE WHEN s.y IS NULL THEN
       |           CASE WHEN e.v IS NOT NULL THEN 1.0 ELSE 0.0 END
       |         WHEN e.v IS NOT NULL THEN
       |           ${if (adjust) s"${w1("e.v", "s.w")} + $nw" else "1.0"}
       |         ELSE ${w1("e.v", "s.w")} END
       |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
       |SELECT rid, y AS $out FROM st""".stripMargin
  }
}
