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

  /** Key-skew diagnosis — the report run before choosing a partition
    * or join strategy ("does one user own half the table?"): the
    * `topN` heaviest values of `key` with row counts, share of all
    * rows, and cumulative share, rank order (count DESC, key ASC) —
    * total and engine-independent. Null keys count as a value here
    * (they shuffle like any other, which is exactly what the report
    * must reveal); the key renders as a string so one schema covers
    * every type.
    *
    * Scale shape: one hash count on the key (map-side partials), a
    * distributed top-N (TakeOrderedAndProject — per-task heaps,
    * never a full sort), and a one-row broadcast total; the ranking
    * window runs over the already-limited ≤ topN rows.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(key.cast("string").as("key"))
      .agg(F.count(lit(1)).as("n_rows"))
    val top = counts.orderBy(col("n_rows").desc, col("key").asc_nulls_last)
      .limit(topN)
    val total = df.agg(F.count(lit(1)).as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("key").asc_nulls_last)
    top.crossJoin(F.broadcast(total))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .withColumn("share",
        col("n_rows").cast(DoubleType) / col("__total").cast(DoubleType))
      .withColumn("cum_share",
        F.sum(col("n_rows")).over(w.rowsBetween(Long.MinValue, 0))
          .cast(DoubleType) / col("__total").cast(DoubleType))
      .select(col("rank"), col("key"), col("n_rows"), col("share"),
        col("cum_share"))
  }
}
