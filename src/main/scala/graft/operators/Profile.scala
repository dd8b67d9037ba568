package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, MapType, StructType}

/** One-pass column profiling — the "what is in this table" report a
  * pipeline starts with: per column, non-null/null counts, null
  * fraction, distinct count, and min/max (rendered as strings so one
  * result schema covers every column type).
  *
  * Scale shape: ONE aggregation over the input computes every
  * column's statistics together (no per-column scans), then the
  * one-row result is melted to per-column rows with `stack` — driver
  * cost is the number of columns, never the data. Distinct counts
  * default to HyperLogLog (`approx_count_distinct`, one pass,
  * mergeable); `exactDistinct = true` switches to exact
  * count-distinct for oracle replay or small tables. Non-orderable
  * columns (arrays, structs, maps) report null min/max.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame = {
    val names = if (columns.isEmpty) df.columns.toSeq else columns
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): $missing")
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _                                         => true
    }
    val orderable = names.map(n => n -> atomic(df.schema(n).dataType)).toMap

    def nd(c: Column): Column =
      if (exactDistinct) F.count_distinct(c) else F.approx_count_distinct(c)
    val aggs = F.count(lit(1)).as("__n") +: names.zipWithIndex.flatMap {
      case (n, i) =>
        val mm =
          if (orderable(n))
            Seq(F.min(col(n)).cast("string").as(s"__min$i"),
              F.max(col(n)).cast("string").as(s"__max$i"))
          else
            Seq(F.first(lit(null).cast("string")).as(s"__min$i"),
              F.first(lit(null).cast("string")).as(s"__max$i"))
        Seq(F.count(col(n)).as(s"__nn$i"), nd(col(n)).as(s"__nd$i")) ++ mm
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.zipWithIndex.map { case (n, i) =>
      s"$i, '${n.replace("'", "''")}', __nn$i, __nd$i, __min$i, __max$i"
    }.mkString(", ")
    one.select(expr(s"stack(${names.size}, $stackArgs) AS " +
        "(col_id, col_name, n_nonnull, n_distinct, min, max)"),
        col("__n"))
      .select(col("col_id"), col("col_name"), col("n_nonnull"),
        (col("__n") - col("n_nonnull")).as("n_null"),
        ((col("__n") - col("n_nonnull")).cast(DoubleType) /
          col("__n").cast(DoubleType)).as("null_frac"),
        col("n_distinct"), col("min"), col("max"))
  }
}
