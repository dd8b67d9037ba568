package graft.api

import graft.functions.Num
import graft.operators.{GroupBy, Margins, RollingOps, SelectionOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** The user-facing veneer — the analogue of the reference's
  * pandas-compatible API layer and convenience extensions
  * (`/root/reference/pandas_plus/groupby/api.py`,
  * `monkey_patch.py:97-126` `install_groupby_fast`,
  * `extensions.py:11-91`). `import graft.api.Implicits._` plays the
  * role of the monkey-patch install.
  */
object Implicits {

  implicit class GraftDataFrameOps(val df: DataFrame) extends AnyVal {

    /** `df.groupby_fast(...)` (reference `monkey_patch.py:55-94`). */
    def groupByFast(keys: Column*): GroupBy = new GroupBy(df, keys)
    def groupByFast(key: String, rest: String*): GroupBy =
      new GroupBy(df, (key +: rest).map(col))

    // ---- extensions.py aliases -------------------------------------

    /** value_counts (`vc`). */
    def vc(c: Column, normalize: Boolean = false): DataFrame =
      GroupBy.valueCounts(df, c, normalize)

    /** sort_values ascending (`sv`) / descending (`svd`). */
    def sv(cols: Column*): DataFrame = df.orderBy(cols: _*)
    def svd(cols: Column*): DataFrame = df.orderBy(cols.map(_.desc): _*)

    /** drop_duplicates (`dd`). */
    def dd(cols: String*): DataFrame =
      if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)

    /** groupby(observed=True) (`gb`). */
    def gb(keys: Column*): GroupBy = new GroupBy(df, keys)

    /** Column projection by name regex / substring (`filter_cols`). */
    def filterCols(regex: String = null, like: String = null): DataFrame = {
      require(regex != null || like != null,
        "filterCols requires a regex or a like substring")
      val keep = df.columns.filter { c =>
        (regex != null && c.matches(regex)) || (like != null && c.contains(like))
      }
      df.select(keep.map(col).toSeq: _*)
    }

    def dropCols(cols: String*): DataFrame = df.drop(cols: _*)

    /** ×100 rounded (`pc`, reference default precision 1). */
    def pc(c: Column, prec: Int = 1): Column = round(c * 100, prec)

    /** x / Σx × to (`normalize`) — adds `name` to the frame. The
      * total is a broadcast one-row aggregate joined back in, not a
      * global window, so the division runs partition-parallel on any
      * input size (two scans beat one single-partition shuffle).
      */
    def normalize(c: Column, to: Double = 1.0,
        name: String = "normalized"): DataFrame =
      df.crossJoin(F.broadcast(
          df.agg(F.sum(c).cast(DoubleType).as("__norm_total"))))
        .withColumn(name,
          Num.safeDiv(c.cast(DoubleType), col("__norm_total")) * to)
        .drop("__norm_total")

    /** Numeric columns only (`select_numeric`). */
    def selectNumeric(): DataFrame =
      df.select(df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[NumericType] => col(f.name)
      }.toSeq: _*)
  }

  /** Column-selection + rolling façade on GroupBy, mirroring
    * `SeriesGroupBy`/`DataFrameGroupBy.__getitem__` sharing the
    * grouper (`api.py:813-833`) and `.rolling(window, min_periods)`
    * (`api.py:527-662`).
    */
  implicit class GraftGroupByOps(val gbv: GroupBy) {
    /** `gb("col1", "col2")`-style selection bound to the grouper. */
    def cols(values: Column*): SelectedGroupBy = new SelectedGroupBy(gbv, values)
    def rolling(window: Int, minPeriods: Option[Int] = None): RollingFacade =
      new RollingFacade(gbv, window, minPeriods)
    def selection: SelectionOps = new SelectionOps(gbv)
    def windows: RollingOps = new RollingOps(gbv)
  }

  final class SelectedGroupBy(gb: GroupBy, values: Seq[Column]) {
    def sum(mask: Option[Column] = None, exact: Boolean = false): DataFrame =
      gb.sum(values, mask = mask, exact = exact)
    def mean(mask: Option[Column] = None, exact: Boolean = false): DataFrame =
      gb.mean(values, mask = mask, exact = exact)
    def min(mask: Option[Column] = None): DataFrame = gb.min(values, mask = mask)
    def max(mask: Option[Column] = None): DataFrame = gb.max(values, mask = mask)
    def count(mask: Option[Column] = None): DataFrame = gb.count(values, mask = mask)
    def median(mask: Option[Column] = None): DataFrame = gb.median(values, mask = mask)
    def variance(ddof: Int = 1): DataFrame = gb.variance(values, ddof)
    def std(ddof: Int = 1): DataFrame = gb.std(values, ddof)
    def size(mask: Option[Column] = None): DataFrame = gb.size(mask = mask)
    def nunique(mask: Option[Column] = None): DataFrame =
      gb.nunique(values, mask = mask)
    def first(ord: Column, mask: Option[Column] = None): DataFrame =
      gb.first(values, ord, mask = mask)
    def last(ord: Column, mask: Option[Column] = None): DataFrame =
      gb.last(values, ord, mask = mask)
    def skew(mask: Option[Column] = None): DataFrame = gb.skew(values, mask)
    def kurt(mask: Option[Column] = None): DataFrame = gb.kurt(values, mask)
    def quantile(q: Double, mask: Option[Column] = None): DataFrame =
      gb.quantile(values, q, mask)
    def prod(mask: Option[Column] = None): DataFrame = gb.prod(values, mask)
    def sem(ddof: Int = 1, mask: Option[Column] = None): DataFrame =
      gb.sem(values, ddof, mask)
    def any(mask: Option[Column] = None): DataFrame = gb.any(values, mask)
    def all(mask: Option[Column] = None): DataFrame = gb.all(values, mask)
    def idxmin(ord: Column, mask: Option[Column] = None): DataFrame =
      gb.idxmin(values, ord, mask)
    def idxmax(ord: Column, mask: Option[Column] = None): DataFrame =
      gb.idxmax(values, ord, mask)
  }

  final class RollingFacade(gb: GroupBy, window: Int, minPeriods: Option[Int]) {
    private def ops = new RollingOps(gb)
    /** String-dispatch form, mirroring the reference façade's
      * `agg(method_name, mask)` (`api.py:556-574`).
      */
    def agg(op: String, value: Column, ord: Column, mask: Option[Column] = None,
        exact: Boolean = false): DataFrame =
      ops.rollingAgg(op, value, ord, window, minPeriods, mask,
        name = s"rolling_$op", exact = exact)
    def count(value: Column, ord: Column, mask: Option[Column] = None): DataFrame =
      agg("count", value, ord, mask)
    def sum(value: Column, ord: Column, mask: Option[Column] = None,
        exact: Boolean = false): DataFrame =
      ops.rollingSum(value, ord, window, minPeriods, mask, exact = exact)
    def mean(value: Column, ord: Column, mask: Option[Column] = None,
        exact: Boolean = false): DataFrame =
      ops.rollingMean(value, ord, window, minPeriods, mask, exact = exact)
    def min(value: Column, ord: Column, mask: Option[Column] = None): DataFrame =
      ops.rollingMin(value, ord, window, minPeriods, mask)
    def max(value: Column, ord: Column, mask: Option[Column] = None): DataFrame =
      ops.rollingMax(value, ord, window, minPeriods, mask)
    def variance(value: Column, ord: Column, mask: Option[Column] = None,
        exact: Boolean = false): DataFrame =
      ops.rollingVar(value, ord, window, minPeriods, mask, exact = exact)
    def std(value: Column, ord: Column, mask: Option[Column] = None,
        exact: Boolean = false): DataFrame =
      ops.rollingStd(value, ord, window, minPeriods, mask, exact = exact)
    def cov(x: Column, y: Column, ord: Column, ddof: Int = 1): DataFrame =
      ops.rollingCov(x, y, ord, window, minPeriods, ddof)
    def corr(x: Column, y: Column, ord: Column): DataFrame =
      ops.rollingCorr(x, y, ord, window, minPeriods)
  }
}
