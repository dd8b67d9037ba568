package graft

import graft.operators.Pca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed PCA semantics: one-pass moments, deterministic power
  * iteration + deflation, sign normalization, row-local projection,
  * and the explained-variance accounting. Fixtures are chosen so the
  * expected eigenstructure is known in closed form.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def embs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Mean-zero axis-aligned fixture: x-variance 8/3, y-variance 2/3,
    * zero covariance — the eigenvectors are exactly the basis vectors
    * and power iteration converges in one step from e₀.
    */
  def axisAligned: DataFrame = Seq(
    (1L, Seq(2.0, 0.0)), (2L, Seq(-2.0, 0.0)),
    (3L, Seq(0.0, 1.0)), (4L, Seq(0.0, -1.0))
  ).toDF("id", "v")

  test("axis-aligned: components are the basis vectors, eigenvalues the per-axis variances") {
    val m = Pca.fit(axisAligned, col("v"), k = 2, iters = 4)
    assert(m.dim === 2 && m.k === 2)
    assert(m.mean === Seq(0.0, 0.0))
    assert(math.abs(m.eigenvalues(0) - 8.0 / 3) < 1e-7)
    assert(math.abs(m.eigenvalues(1) - 2.0 / 3) < 1e-7)
    // scale-8 term rounding bounds the fixed point ~1e-8 off the
    // exact eigenvector — the documented determinism-over-last-ulps
    // contract (Pca.TermDec)
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-7 &&
      math.abs(m.components(0)(1)) < 1e-7)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-7 &&
      math.abs(m.components(1)(0)) < 1e-7)
  }

  test("perfectly correlated data: first component is the diagonal, second eigenvalue ~0") {
    val d = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(2.0, 2.0)),
      (3L, Seq(3.0, 3.0)), (4L, Seq(-1.0, -1.0))).toDF("id", "v")
    val m = Pca.fit(d, col("v"), k = 2, iters = 20)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(m.components(0)(0) - s) < 1e-6 &&
      math.abs(m.components(0)(1) - s) < 1e-6)
    assert(math.abs(m.eigenvalues(1)) < 1e-6)
    // sign normalization: largest-|loading| element is positive
    assert(m.components(0).maxBy(math.abs) > 0)
    assert(m.components(1).maxBy(math.abs) > 0)
  }

  test("real embeddings: orthonormal components, descending eigenvalues, probe matches explicit dim") {
    // the raw random embeddings are near-isotropic (λ₂/λ₁ ≈ 1), where
    // power iteration cannot separate components in bounded rounds —
    // scale coordinate i by 2^(i/4) so adjacent eigenvalues sit at
    // ratio ≈ 2^(-1/2) and 40 rounds converge to ~0.71⁴⁰ ≈ 1e-6,
    // which is the separated-spectrum regime PCA is used in
    val scaled = embs.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * pow(lit(2.0), i.cast("double") / 4.0)).as("v"))
    val m = Pca.fit(scaled, col("v"), k = 3, iters = 40)
    assert(m.dim === 64)
    for (c <- m.components)
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-4)
    for (Seq(a, b) <- m.components.combinations(2))
      assert(math.abs(a.zip(b).map { case (x, y) => x * y }.sum) < 1e-3)
    assert(m.eigenvalues === m.eigenvalues.sorted.reverse)
    assert(m.eigenvalues.forall(_ > 0))
    val m2 = Pca.fit(scaled, col("v"), k = 3, iters = 40, dim = Some(64))
    assert(m2 === m)
  }

  test("projection: per-component mean ~0, variance ~eigenvalue, invalid rows null, fast path agrees") {
    val m = Pca.fit(embs, col("embedding"), k = 2, iters = 12)
    val p = Pca.project(embs, col("embedding"), m)
    val stats = p.agg(avg(col("pc0")), variance(col("pc0")),
      avg(col("pc1")), variance(col("pc1"))).head()
    assert(math.abs(stats.getDouble(0)) < 1e-6)
    assert(math.abs(stats.getDouble(1) - m.eigenvalues(0)) < 1e-3 * m.eigenvalues(0))
    assert(math.abs(stats.getDouble(2)) < 1e-6)
    assert(math.abs(stats.getDouble(3) - m.eigenvalues(1)) < 1e-3 * m.eigenvalues(1))
    // invalid rows project to null, valid count preserved
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, null)).toDF("id", "v")
      .union(Seq((3L, Seq(0.5, 0.5, 0.5))).toDF("id", "v"))
    val mAxis = Pca.fit(axisAligned, col("v"), k = 1, iters = 4)
    val pb = Pca.project(bad, col("v"), mAxis).orderBy(col("id")).collect()
    assert(!pb(0).isNullAt(2) && pb(1).isNullAt(2) && pb(2).isNullAt(2))
    // exact=false double-fold path agrees to fp tolerance
    val fast = Pca.project(embs, col("embedding"), m, exact = false)
    val joined = p.select(col("vec_id"), col("pc0").as("a"))
      .join(fast.select(col("vec_id"), col("pc0").as("b")), "vec_id")
      .select(max(abs(col("a") - col("b")))).head().getDouble(0)
    assert(joined < 1e-6)
  }

  test("whitening: unit variance per component; zero-eigenvalue components whiten to null") {
    val m = Pca.fit(embs, col("embedding"), k = 2, iters = 12)
    val w = Pca.project(embs, col("embedding"), m, whiten = true)
    val stats = w.agg(variance(col("pc0")), variance(col("pc1"))).head()
    assert(math.abs(stats.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-3)
    // whitened = plain / sqrt(eigenvalue), row for row
    val p = Pca.project(embs, col("embedding"), m)
    val diff = p.select(col("vec_id"), col("pc0").as("a"))
      .join(w.select(col("vec_id"), col("pc0").as("b")), "vec_id")
      .select(max(abs(col("a") / math.sqrt(m.eigenvalues(0)) - col("b"))))
      .head().getDouble(0)
    assert(diff < 1e-12)
    // a degenerate (zero-variance) second axis whitens to null
    val flat = Seq((1L, Seq(1.0, 5.0)), (2L, Seq(2.0, 5.0)),
      (3L, Seq(3.0, 5.0))).toDF("id", "v")
    val mf = Pca.fit(flat, col("v"), k = 2, iters = 6)
    val wf = Pca.project(flat, col("v"), mf, whiten = true).collect()
    assert(wf.forall(r => !r.isNullAt(2))) // pc0 spread is real
    assert(wf.forall(r => r.isNullAt(3)),
      s"zero-eigenvalue axis must whiten to null, eigs=${mf.eigenvalues}")
  }

  test("explainedVariance: full-rank fit accounts for ~all the trace") {
    val d = Seq((1L, Seq(2.0, 0.1, -1.0)), (2L, Seq(-2.0, 0.3, 1.5)),
      (3L, Seq(0.5, 1.0, 0.0)), (4L, Seq(-0.5, -1.4, -0.5)),
      (5L, Seq(1.0, 0.0, 0.9))).toDF("id", "v")
    val m = Pca.fit(d, col("v"), k = 3, iters = 30)
    val mom = Pca.moments(d, col("v"), 3)
    val ratios = Pca.explainedVariance(m, mom)
    assert(ratios.forall(r => r > -1e-9 && r <= 1.0 + 1e-9))
    assert(math.abs(ratios.sum - 1.0) < 1e-6)
    assert(ratios === ratios.sorted.reverse)
    // ddof must match the fit: a ddof=0 model with a ddof=0 trace
    // also sums to 1; mixing normalizations scales by (n-1)/n
    val m0 = Pca.fit(d, col("v"), k = 3, iters = 30, ddof = 0)
    val r0 = Pca.explainedVariance(m0, mom, ddof = 0)
    assert(math.abs(r0.sum - 1.0) < 1e-6)
    val mixed = Pca.explainedVariance(m0, mom, ddof = 1)
    assert(math.abs(mixed.sum - 4.0 / 5.0) < 1e-6) // n=5: (n-1)/n
  }

  test("moments: count cell is the valid-row count; null and wrong-length vectors excluded") {
    val d = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)), (3L, null),
      (4L, Seq(5.0))).toDF("id", "v")
    val cells = Pca.moments(d, col("v"), 2).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(cells((-1, -1)) === 2.0)
    assert(cells((0, -1)) === 4.0) // 1 + 3
    assert(cells((0, 1)) === 14.0) // 1*2 + 3*4
    assert(cells((1, 1)) === 20.0) // 4 + 16
    // guards
    intercept[IllegalArgumentException] {
      Pca.fit(d, col("v"), k = 3, dim = Some(2))
    }
    intercept[IllegalArgumentException] {
      Pca.fit(d.filter(col("id") < 0), col("v"), k = 1)
    }
  }
}
