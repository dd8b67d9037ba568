package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, MapType, NumericType, StructType}

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

  /** Per-numeric-column distribution shape: `quantiles` probabilities
    * are reported per numeric column as an `ARRAY<DOUBLE>` column
    * (null for non-numeric columns) inside the SAME single
    * aggregation pass — no extra scan, the no-Union plan invariant
    * holds. Default approximate (`percentile_approx`, one mergeable
    * sketch per column, the 100 TB shape); `exactQuantiles = true`
    * switches to exact interpolated percentiles for oracle replay or
    * small tables. Pass `quantiles = Nil` to drop the column
    * entirely.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exactDistinct: Boolean = false,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
      exactQuantiles: Boolean = false): DataFrame = {
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0, 1], got $quantiles")
    val names = if (columns.isEmpty) df.columns.toSeq else columns
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): $missing")
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _                                         => true
    }
    def numeric(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _              => false
    }
    val orderable = names.map(n => n -> atomic(df.schema(n).dataType)).toMap
    val isNum = names.map(n => n -> numeric(df.schema(n).dataType)).toMap
    val withQ = quantiles.nonEmpty

    def nd(c: Column): Column =
      if (exactDistinct) F.count_distinct(c) else F.approx_count_distinct(c)
    def qs(c: Column): Column = {
      val probs = array(quantiles.map(lit): _*)
      if (exactQuantiles) F.percentile(c, probs)
      else F.percentile_approx(c, probs, lit(10000))
    }
    val aggs = F.count(lit(1)).as("__n") +: names.zipWithIndex.flatMap {
      case (n, i) =>
        val mm =
          if (orderable(n))
            Seq(F.min(col(n)).cast("string").as(s"__min$i"),
              F.max(col(n)).cast("string").as(s"__max$i"))
          else
            Seq(F.first(lit(null).cast("string")).as(s"__min$i"),
              F.first(lit(null).cast("string")).as(s"__max$i"))
        val qq =
          if (!withQ) Nil
          else if (isNum(n))
            // cast normalizes containsNull so the stack melt sees one
            // array type across numeric and non-numeric columns
            Seq(qs(col(n).cast(DoubleType)).cast("array<double>")
              .as(s"__q$i"))
          else Seq(F.first(lit(null).cast("array<double>")).as(s"__q$i"))
        Seq(F.count(col(n)).as(s"__nn$i"), nd(col(n)).as(s"__nd$i")) ++
          mm ++ qq
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val qOut = if (withQ) ", quantiles" else ""
    val stackArgs = names.zipWithIndex.map { case (n, i) =>
      s"$i, '${n.replace("'", "''")}', __nn$i, __nd$i, __min$i, __max$i" +
        (if (withQ) s", __q$i" else "")
    }.mkString(", ")
    val outCols = Seq(col("col_id"), col("col_name"), col("n_nonnull"),
      (col("__n") - col("n_nonnull")).as("n_null"),
      ((col("__n") - col("n_nonnull")).cast(DoubleType) /
        col("__n").cast(DoubleType)).as("null_frac"),
      col("n_distinct"), col("min"), col("max")) ++
      (if (withQ) Seq(col("quantiles")) else Nil)
    one.select(expr(s"stack(${names.size}, $stackArgs) AS " +
        s"(col_id, col_name, n_nonnull, n_distinct, min, max$qOut)"),
        col("__n"))
      .select(outCols: _*)
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
