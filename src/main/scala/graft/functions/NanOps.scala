package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.DoubleType

/** Whole-array (non-grouped) skipna reductions — the reference's
  * `nanops.py`. Its chunk-parallel partial/final reduction
  * (`nanops.py:68-143`) is exactly Spark's partial aggregation, so
  * each op is a single `df.agg(...)`; this module just mirrors the
  * naming and adds the exact-decimal option.
  */
object NanOps {

  /** One reduction spec: op ∈ sum|count|mean|min|max|var|std. */
  final case class Red(op: String, value: Column, name: String,
      exact: Boolean = false, ddof: Int = 1)

  private def expr(r: Red): Column = {
    val e = r.op match {
      case "sum" if r.exact  => Num.exactSum(r.value)
      case "sum"             => F.sum(r.value)
      case "mean" if r.exact => Num.exactMean(r.value)
      case "mean"            => F.avg(r.value)
      case "min"             => F.min(r.value)
      case "max"             => F.max(r.value)
      case "count"           => F.count(r.value)
      case "var" => r.ddof match {
        case 1 => F.var_samp(r.value)
        case 0 => F.var_pop(r.value)
        case d => Num.varianceExpr(r.value, d)
      }
      case "std" => r.ddof match {
        case 1 => F.stddev_samp(r.value)
        case 0 => F.stddev_pop(r.value)
        case d => sqrt(Num.varianceExpr(r.value, d))
      }
      case other => sys.error(s"unknown reduction: $other")
    }
    e.as(r.name)
  }

  /** Run several reductions in one pass → single-row DataFrame
    * (reference `reduce_2d`/`reduce`, `nanops.py:146-223`).
    */
  def reduce(df: DataFrame, reds: Seq[Red]): DataFrame = {
    require(reds.nonEmpty, "no reductions requested")
    val exprs = reds.map(expr)
    df.agg(exprs.head, exprs.tail: _*)
  }

  def nansum(df: DataFrame, c: Column, exact: Boolean = false): DataFrame =
    reduce(df, Seq(Red("sum", c, "nansum", exact)))
  def nanmean(df: DataFrame, c: Column, exact: Boolean = false): DataFrame =
    reduce(df, Seq(Red("mean", c, "nanmean", exact)))
  def nanmin(df: DataFrame, c: Column): DataFrame =
    reduce(df, Seq(Red("min", c, "nanmin")))
  def nanmax(df: DataFrame, c: Column): DataFrame =
    reduce(df, Seq(Red("max", c, "nanmax")))
  def count(df: DataFrame, c: Column): DataFrame =
    reduce(df, Seq(Red("count", c, "count")))
  def nanvar(df: DataFrame, c: Column, ddof: Int = 1): DataFrame =
    reduce(df, Seq(Red("var", c, "nanvar", ddof = ddof)))
  def nanstd(df: DataFrame, c: Column, ddof: Int = 1): DataFrame =
    reduce(df, Seq(Red("std", c, "nanstd", ddof = ddof)))

  /** Row-level dot product of columns with a constant weight vector —
    * the reference's `nb_dot` (`util.py:766-793`): one codegen'd
    * expression, no matrix materialization.
    */
  def nbDot(cols: Seq[Column], weights: Seq[Double]): Column = {
    require(cols.size == weights.size, "cols and weights must align")
    cols.zip(weights).map { case (c, w) => c.cast(DoubleType) * w }.reduce(_ + _)
  }
}
