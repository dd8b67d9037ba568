package graft.operators

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.DoubleType

/** Compute side of the reference's `GroupScatter` plot
  * (`/root/reference/pandas_plus/plotting/group_scatter.py:11-116`):
  * equal-frequency binning of x with per-bin mean of x and y, plus a
  * weighted polynomial least-squares fit of y on x. Plotting itself
  * is out of scope — callers receive the binned means and the
  * coefficients (`regression_coefs` analogue).
  *
  * Scale design: the fit is one aggregation pass over moment sums
  * Σ w·xᵏ, Σ w·xᵏ·y (k ≤ 2·deg) — a (deg+1)² normal-equation system
  * solved on the driver; no per-row collection, any data size.
  * Binning: the DEFAULT (`exactBins = false`) is the 100 TB path —
  * `approxQuantile` edges (one distributed aggregation, driver gets
  * nBins−1 doubles) + a comparison chain, fully partition-parallel.
  * `exactBins = true` is an explicit opt-in that uses `ntile` over a
  * global sort for exact oracle-reproducible quantiles — a
  * single-partition window, so small/medium data only (oracle parity
  * and verification, never the production default).
  */
object GroupScatter {

  /** Equal-frequency bins of x with per-bin means. `tieBreak` makes
    * the ntile assignment total and thus deterministic (exact path;
    * the approx path is deterministic by value already).
    */
  def binnedMeans(df: DataFrame, x: Column, y: Column, nBins: Int,
      tieBreak: Seq[Column] = Nil, mask: Option[Column] = None,
      exact: Boolean = false, exactBins: Boolean = false,
      relativeError: Double = 1e-3): DataFrame = {
    val filtered = df
      .filter(mask.getOrElse(lit(true)))
      .filter(x.isNotNull && y.isNotNull &&
        !isnan(x.cast(DoubleType)) && !isnan(y.cast(DoubleType)))
    val binned =
      if (exactBins) {
        val ord = x +: tieBreak
        filtered.withColumn("bin", ntile(nBins).over(Window.orderBy(ord: _*)))
      } else {
        // distributed equal-frequency binning: Greenwald-Khanna edges,
        // then bin = 1 + #edges strictly below x (ties collapse left,
        // matching a <=-closed Bucketizer; bins may be slightly uneven
        // within relativeError, never empty of its quantile mass)
        val withX = filtered.withColumn("__x", x.cast(DoubleType))
        val probs = (1 until nBins).map(_.toDouble / nBins).toArray
        val edges = withX.stat.approxQuantile("__x", probs, relativeError)
          .distinct.sorted
        val bin = edges.foldLeft(lit(1)) { (acc, e) =>
          acc + when(col("__x") > e, 1).otherwise(0)
        }
        withX.withColumn("bin", bin).drop("__x")
      }
    val gb = new GroupBy(binned, Seq(col("bin")))
    gb.aggregate(Seq(
      AggSpec("mean", x, "x_mean", exact),
      AggSpec("mean", y, "y_mean", exact),
      AggSpec("size", lit(1), "n")))
  }

  /** Weighted least-squares polynomial fit of y on x, degree `deg`,
    * via the normal equations over moment sums. Returns coefficients
    * `[c1, ..., cdeg, intercept]` (the reference's
    * `regression_coefs` ordering) and r².
    */
  def fit(df: DataFrame, x: Column, y: Column, deg: Int = 1,
      weight: Option[Column] = None, fitIntercept: Boolean = true,
      mask: Option[Column] = None, exact: Boolean = false): (Seq[Double], Double) = {
    require(deg >= 1, "deg must be >= 1")
    val w = weight.getOrElse(lit(1.0)).cast(DoubleType)
    val xd = x.cast(DoubleType)
    val yd = y.cast(DoubleType)
    val filtered = df
      .filter(mask.getOrElse(lit(true)))
      .filter(xd.isNotNull && yd.isNotNull && !isnan(xd) && !isnan(yd))

    // x^k by left-associated multiplication (pow() is not guaranteed
    // bit-equal to repeated multiply across engines)
    def xpow(k: Int): Column =
      Seq.fill(k)(xd).reduceOption(_ * _).getOrElse(lit(1.0))
    // exact mode: moment sums through wide decimals (38,6) so the fit
    // is independent of partitioning and engine
    def msum(c: Column): Column =
      if (exact) F.sum(c.cast(Num.MomentDec)).cast(DoubleType) else F.sum(c)

    // moments: m(k) = Σ w x^k for k ≤ 2deg; b(k) = Σ w x^k y; syy = Σ w y²
    val mExprs = (0 to 2 * deg).map(k => msum(w * xpow(k)).as(s"m$k"))
    val bExprs = (0 to deg).map(k => msum(w * xpow(k) * yd).as(s"b$k"))
    val row = filtered.agg(mExprs.head,
      (mExprs.tail ++ bExprs :+ msum(w * yd * yd).as("syy")): _*).head()
    val m = (0 to 2 * deg).map(k => row.getAs[Double](s"m$k"))
    val b = (0 to deg).map(k => row.getAs[Double](s"b$k"))
    val syy = row.getAs[Double]("syy")

    // normal equations A c = v over basis [1?, x, ..., x^deg];
    // deg=1 closed form keeps the arithmetic sequence reproducible in
    // plain SQL (the driver's oracle mirrors it term for term)
    val basis = if (fitIntercept) 0 to deg else 1 to deg
    val sol =
      if (deg == 1 && fitIntercept) {
        val det = m(0) * m(2) - m(1) * m(1)
        val c1 = (m(0) * b(1) - m(1) * b(0)) / det
        val c0 = (b(0) - m(1) * c1) / m(0)
        Seq(c0, c1)
      } else {
        val a = basis.map(j => basis.map(k => m(j + k)).toArray).toArray
        val v = basis.map(j => b(j)).toArray
        solve(a, v)
      }
    val coefs = basis.zip(sol).toMap
    val intercept = coefs.getOrElse(0, 0.0)
    val slopes = (1 to deg).map(coefs(_))

    // r² = 1 − SSE/SST from the same moments
    val n = m(0)
    val sse = syy -
      2 * basis.zip(sol).map { case (k, c) => c * b(k) }.sum +
      basis.zip(sol).flatMap { case (j, cj) =>
        basis.zip(sol).map { case (k, ck) => cj * ck * m(j + k) }
      }.sum
    val sst = syy - b(0) * b(0) / n
    val r2 = if (sst == 0) 0.0 else 1.0 - sse / sst
    (slopes :+ intercept, r2)
  }

  /** Gaussian elimination with partial pivoting — (deg+1) ≤ ~10, so a
    * driver-side solve is exact enough and free.
    */
  private def solve(a0: Array[Array[Double]], v0: Array[Double]): Seq[Double] = {
    val n = v0.length
    val a = a0.map(_.clone())
    val v = v0.clone()
    for (i <- 0 until n) {
      val p = (i until n).maxBy(r => math.abs(a(r)(i)))
      val (ri, rp) = (a(i), a(p)); a(i) = rp; a(p) = ri
      val (vi, vp) = (v(i), v(p)); v(i) = vp; v(p) = vi
      require(math.abs(a(i)(i)) > 1e-300, "singular normal equations")
      for (r <- i + 1 until n) {
        val f = a(r)(i) / a(i)(i)
        for (c <- i until n) a(r)(c) -= f * a(i)(c)
        v(r) -= f * v(i)
      }
    }
    val out = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = v(i)
      for (c <- i + 1 until n) s -= a(i)(c) * out(c)
      out(i) = s / a(i)(i)
    }
    out.toSeq
  }
}
