package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.functions.Num

/** Distributed PCA over an embedding column — the dimensionality
  * reducer of the curation stack (SemDeDup-style clustering, ANN
  * indexes, and drift probes all get cheaper and better-conditioned
  * on decorrelated, variance-ranked coordinates; the classic recipe
  * is Halko et al. 2011-family power iteration over the covariance).
  *
  * Scale shape: ONE corpus pass computes every covariance ingredient
  * — per-row the upper-triangle outer products, first moments, and a
  * count term are emitted as (i, j, term) cells and hash-aggregated
  * (map-side partial combine, so the shuffle carries only
  * `partitions × dim²/2` cells, never rows). The dim×dim matrix —
  * driver-bounded like the IVF centroid table (`MaxDim` guard) — is
  * then eigen-decomposed ON THE DRIVER by deterministic power
  * iteration with deflation: every sum is an exact scale-8 decimal
  * accumulation (order-free, so the components replay bit-identically
  * in any engine that sums the same rounded terms — the
  * Similarity.decFold contract), every division/sqrt an IEEE
  * correctly-rounded double op. Projection back onto the data is a
  * row-local literal dot product: zero shuffle, streaming-safe.
  *
  * Reference scope note: the pandas-plus reference has no
  * linear-algebra surface (nanops stop at `nb_dot`,
  * `pandas_plus/nanops.py`); PCA is extension surface for the
  * training-data pipeline, gated by the unrolled-CTE replay below.
  */
object Pca {

  /** Driver-side matrices are dim² doubles — keep them bounded the
    * same way IVF bounds its centroid collect.
    */
  val MaxDim = 1024

  /** Scale-8 term rounding shared by engine and driver: a double
    * product becomes the NEAREST scale-8 decimal (the boundary-tie
    * rounding mode is irrelevant in practice — a double product's
    * exact expansion has ~50 significant digits, so an exact .5 tie
    * at scale 8 is measure-zero; Num.DotDec documents the same
    * argument for the cross-engine cast).
    */
  private val TermDec = DecimalType(28, 8)

  private def roundTerm(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP)

  /** Exact decimal sum of scale-8-rounded products, as a double —
    * the driver-side twin of `SUM(CAST(x AS DECIMAL(28,8)))`.
    */
  private def decSum(terms: Iterator[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    while (terms.hasNext) acc = acc.add(roundTerm(terms.next()))
    acc.doubleValue
  }

  /** The fitted model: per-coordinate mean, `k` orthonormal
    * components (each `dim` loadings, sign-normalized so the
    * largest-|loading| element is positive), and the matching
    * eigenvalues of the ddof-covariance, descending.
    */
  final case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      eigenvalues: Seq[Double]) {
    def k: Int = components.size
    def dim: Int = mean.size
  }

  /** One-pass covariance ingredients: for each valid row (non-null
    * vector of length `dim`) emit first-moment cells `(i, -1, xᵢ)`,
    * upper-triangle product cells `(i, j≥i, xᵢ·xⱼ)`, and one count
    * cell `(-1, -1, 1)`, every term rounded to scale-8 decimal BEFORE
    * the order-free exact sum. Returns `(i, j, s)` with `s` the
    * decimal sum as double.
    */
  def moments(df: DataFrame, vec: Column, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= MaxDim, s"dim must be in [1, $MaxDim], got $dim")
    val v = vec
    val firsts = transform(v, (x, i) => struct(i.cast(IntegerType).as("i"),
      lit(-1).as("j"), x.cast(DoubleType).cast(TermDec).as("t")))
    // slice is 1-based: elements j >= i of the 0-based index i start
    // at 1-based position i+1; the inner 0-based offset dj maps back
    // as j = i + dj
    val pairs = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + 1, size(v) - i), (xj, dj) =>
        struct(i.cast(IntegerType).as("i"), (i + dj).cast(IntegerType).as("j"),
          (xi.cast(DoubleType) * xj.cast(DoubleType)).cast(TermDec).as("t")))))
    val cnt = array(struct(lit(-1).as("i"), lit(-1).as("j"),
      lit(java.math.BigDecimal.ONE).cast(TermDec).as("t")))
    df.filter(v.isNotNull && size(v) === dim)
      .select(explode(concat(cnt, firsts, pairs)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.t")).cast(DoubleType).as("s"))
  }

  /** Fit `k` principal components by `iters` rounds of power
    * iteration + deflation over the exact-decimal covariance
    * (sample covariance with `ddof`). Deterministic end to end:
    * start vector is the basis vector of the largest diagonal entry
    * (smallest index on ties), all accumulations are order-free
    * decimal sums, and each component's sign is normalized on its
    * largest-|loading| element. `dim` is probed from the first valid
    * row when not given (the documented bounded probe — pass it to
    * stay fully lazy).
    */
  def fit(df: DataFrame, vec: Column, k: Int, iters: Int = 10,
      dim: Option[Int] = None, ddof: Int = 1): PcaModel = {
    val d = dim.getOrElse {
      val probe = df.select(size(vec).as("d")).filter(col("d") > 0).limit(1).collect()
      require(probe.nonEmpty, "cannot probe dim: no non-empty vectors")
      probe(0).getInt(0)
    }
    require(k >= 1 && k <= d, s"k must be in [1, dim], got $k for dim $d")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val cells = moments(df, vec, d).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val n = cells.getOrElse((-1, -1),
      throw new IllegalArgumentException("PCA on an empty corpus")).toDouble
    require(n > ddof, s"need more than ddof=$ddof valid rows, got ${n.toLong}")
    val s1 = Array.tabulate(d)(i => cells((i, -1)))
    val mean = s1.map(_ / n)
    // a(i)(j) full symmetric ddof-covariance; expression order pinned
    // to the oracle: (sij - si*sj/n) / (n - ddof)
    val a = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      (cells((lo, hi)) - s1(i) * s1(j) / n) / (n - ddof)
    }
    val comps = Array.newBuilder[Seq[Double]]
    val eigs = Array.newBuilder[Double]
    for (_ <- 0 until k) {
      // start at the largest-diagonal basis vector (ties: smallest i)
      var best = 0
      for (i <- 1 until d) if (a(i)(i) > a(best)(best)) best = i
      var v = Array.tabulate(d)(i => if (i == best) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val w = Array.tabulate(d)(i => decSum((0 until d).iterator.map(j => a(i)(j) * v(j))))
        val nrm = math.sqrt(decSum(w.iterator.map(x => x * x)))
        // a fully-deflated (≈zero) residual matrix maps v to the zero
        // vector; keep the previous iterate instead of dividing 0/0 —
        // the Rayleigh quotient then lands on the true eigenvalue 0
        if (nrm != 0.0) v = w.map(_ / nrm)
      }
      val u = Array.tabulate(d)(i => decSum((0 until d).iterator.map(j => a(i)(j) * v(j))))
      val lam = decSum((0 until d).iterator.map(i => v(i) * u(i)))
      // sign normalization: the largest-|loading| element positive
      var big = 0
      for (i <- 1 until d) if (math.abs(v(i)) > math.abs(v(big))) big = i
      val flipped = if (v(big) < 0) v.map(x => -x) else v
      comps += flipped.toSeq
      eigs += lam
      // deflate (sign-invariant: (±v_i)(±v_j) is exact)
      for (i <- 0 until d; j <- 0 until d) a(i)(j) = a(i)(j) - lam * flipped(i) * flipped(j)
    }
    PcaModel(mean.toSeq, comps.result().toSeq, eigs.result().toSeq)
  }

  /** Row-local projection onto the fitted components: appends
    * `{prefix}0..{prefix}{k-1}`, each the exact-decimal dot of the
    * centered vector with a literal component — zero shuffle,
    * streaming-safe; invalid rows (null / wrong length) project to
    * null. `exact=false` swaps the decimal fold for a plain double
    * fold (codegen-friendlier, order-sensitive in the last ulps).
    * `whiten=true` divides each coordinate by √eigenvalue (PCA
    * whitening — unit variance per component, the usual conditioning
    * step before cosine/k-means over the reduced space); a component
    * with eigenvalue ≤ 0 whitens to null rather than ±∞.
    */
  def project(df: DataFrame, vec: Column, model: PcaModel,
      prefix: String = "pc", exact: Boolean = true,
      whiten: Boolean = false): DataFrame = {
    val centered = zip_with(vec, lit(model.mean.toArray),
      (x, m) => x.cast(DoubleType) - m)
    val cols = model.components.zipWithIndex.map { case (w, c) =>
      val dot =
        if (exact) aggregate(
          zip_with(centered, lit(w.toArray), (x, wi) => (x * wi).cast(TermDec)),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(37, 8)),
          (acc, t) => (acc + t).cast(DecimalType(37, 8))).cast(DoubleType)
        else org.apache.spark.sql.graft.VectorExpressions.vecDot(
          centered, lit(w.toArray))
      val out =
        if (!whiten) dot
        else if (model.eigenvalues(c) > 0.0)
          dot / math.sqrt(model.eigenvalues(c))
        else lit(null).cast(DoubleType)
      when(vec.isNotNull && size(vec) === model.dim, out).as(s"$prefix$c")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ cols: _*)
  }

  /** Per-component explained variance ratio: eigenvalue over the
    * covariance trace (the trace is Σ per-coordinate ddof-variance —
    * recoverable from the moments pass; callers with a model and the
    * moments frame avoid a second corpus scan).
    */
  def explainedVariance(model: PcaModel, momentsDf: DataFrame,
      ddof: Int = 1): Seq[Double] = {
    val diag = momentsDf.filter(col("i") === col("j")).select(col("i"), col("s"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val nRow = momentsDf.filter(col("i") === -1 && col("j") === -1)
      .select(col("s")).collect()
    require(nRow.nonEmpty, "moments frame lacks the count cell")
    val n = nRow(0).getDouble(0)
    val s1 = momentsDf.filter(col("j") === -1 && col("i") >= 0)
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toMap
    // same ddof as the fit, or the eigenvalues and the trace use
    // different normalizations and the ratios stop summing to ~1
    val trace = (0 until model.dim).map { i =>
      (diag(i) - s1(i) * s1(i) / n) / (n - ddof)
    }.sum
    model.eigenvalues.map(_ / trace)
  }

  // ------------------------------------------------------- oracle SQL

  /** Shared CTE prefix of the fit/project oracles: `src(rid, v)` from
    * `corpusSql`, element cells `el`, decimal first/second moments,
    * and the full symmetric covariance `m0(i, j, a)` — each term cast
    * to DECIMAL(28,8) exactly like the engine's moments pass.
    */
  private def covCtes(corpusSql: String, dim: Int, ddof: Int): String =
    s"""src AS MATERIALIZED ($corpusSql),
       | nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM src WHERE v IS NOT NULL AND len(v) = $dim),
       | el AS MATERIALIZED (SELECT rid, t.i AS i, CAST(v[t.i + 1] AS DOUBLE) AS x
       |   FROM src, range($dim) t(i) WHERE v IS NOT NULL AND len(v) = $dim),
       | s1 AS MATERIALIZED (SELECT i, CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS s
       |   FROM el GROUP BY i),
       | pr AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
       |   CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,8))) AS DOUBLE) AS sij
       |   FROM el a JOIN el b ON a.rid = b.rid AND b.i >= a.i GROUP BY 1, 2),
       | mu AS MATERIALIZED (SELECT pr.i, pr.j,
       |   (sij - sa.s * sb.s / (SELECT c FROM nn)) / ((SELECT c FROM nn) - $ddof) AS a
       |   FROM pr JOIN s1 sa ON pr.i = sa.i JOIN s1 sb ON pr.j = sb.i),
       | m0 AS MATERIALIZED (SELECT i, j, a FROM mu
       |   UNION ALL SELECT j, i, a FROM mu WHERE i <> j)""".stripMargin

  /** Power-iteration rounds for component `c` over matrix `m$c`,
    * producing the flipped component `f$c`, eigenvalue `lam$c`, and
    * the deflated matrix `m${c+1}` — every sum an exact decimal of
    * scale-8 terms, mirroring the driver arithmetic op for op.
    */
  private def componentCtes(c: Int, dim: Int, iters: Int): String = {
    val start =
      s""" d$c AS MATERIALIZED (SELECT i FROM m$c WHERE i = j ORDER BY a DESC, i LIMIT 1),
         | v${c}_0 AS MATERIALIZED (SELECT t.i AS i,
         |   CASE WHEN t.i = (SELECT i FROM d$c) THEN 1.0 ELSE 0.0 END AS v
         |   FROM range($dim) t(i))""".stripMargin
    val rounds = (1 to iters).map { t =>
      s""" w${c}_$t AS MATERIALIZED (SELECT m.i,
         |   CAST(SUM(CAST(m.a * v.v AS DECIMAL(28,8))) AS DOUBLE) AS w
         |   FROM m$c m JOIN v${c}_${t - 1} v ON m.j = v.i GROUP BY 1),
         | nr${c}_$t AS MATERIALIZED (SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,8))) AS DOUBLE)) AS nrm
         |   FROM w${c}_$t),
         | v${c}_$t AS MATERIALIZED (SELECT w.i,
         |   CASE WHEN (SELECT nrm FROM nr${c}_$t) = 0 THEN p.v
         |        ELSE w.w / (SELECT nrm FROM nr${c}_$t) END AS v
         |   FROM w${c}_$t w JOIN v${c}_${t - 1} p ON w.i = p.i)""".stripMargin
    }.mkString(",\n")
    val finish =
      s""" u$c AS MATERIALIZED (SELECT m.i,
         |   CAST(SUM(CAST(m.a * v.v AS DECIMAL(28,8))) AS DOUBLE) AS w
         |   FROM m$c m JOIN v${c}_$iters v ON m.j = v.i GROUP BY 1),
         | lam$c AS MATERIALIZED (SELECT CAST(SUM(CAST(v.v * u.w AS DECIMAL(28,8))) AS DOUBLE) AS l
         |   FROM v${c}_$iters v JOIN u$c u ON v.i = u.i),
         | sg$c AS MATERIALIZED (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
         |   FROM v${c}_$iters ORDER BY abs(v) DESC, i LIMIT 1),
         | f$c AS MATERIALIZED (SELECT i, v * (SELECT s FROM sg$c) AS v FROM v${c}_$iters),
         | m${c + 1} AS MATERIALIZED (SELECT m.i, m.j,
         |   m.a - (SELECT l FROM lam$c) * vi.v * vj.v AS a
         |   FROM m$c m JOIN f$c vi ON m.i = vi.i JOIN f$c vj ON m.j = vj.i)""".stripMargin
    Seq(start, rounds, finish).mkString(",\n")
  }

  /** DuckDB replay of [[fit]] as unrolled CTEs (the pageRank/BPE
    * pattern): covariance from decimal moments, then per component
    * the start-vector pick, `iters` matvec+normalize rounds, the
    * Rayleigh eigenvalue, sign flip, and deflation. Emits
    * `(component, i, loading, eigenvalue)` — bit-exact, unrounded.
    * `corpusSql` must yield `(rid, v)` with `v` a float/double list.
    */
  def fitSql(corpusSql: String, dim: Int, k: Int, iters: Int,
      ddof: Int = 1): String = {
    val comps = (0 until k).map(componentCtes(_, dim, iters)).mkString(",\n")
    val unions = (0 until k).map { c =>
      s"SELECT CAST($c AS INT) AS component, CAST(i AS INT) AS i, v AS loading, " +
        s"(SELECT l FROM lam$c) AS eigenvalue FROM f$c"
    }.mkString("\nUNION ALL\n")
    s"WITH ${covCtes(corpusSql, dim, ddof)},\n$comps\n$unions\nORDER BY component, i"
  }

  /** DuckDB replay of [[fit]] + [[project]]: the same fit CTEs, then
    * each surviving row's centered decimal dot with every component —
    * `(rid, pc0..pc{k-1})`, bit-exact.
    */
  def projectSql(corpusSql: String, dim: Int, k: Int, iters: Int,
      ddof: Int = 1): String = {
    val comps = (0 until k).map(componentCtes(_, dim, iters)).mkString(",\n")
    val pcs = (0 until k).map { c =>
      s""" p$c AS MATERIALIZED (SELECT el.rid,
         |   CAST(SUM(CAST((el.x - mn.m) * f.v AS DECIMAL(28,8))) AS DOUBLE) AS pc
         |   FROM el JOIN mn ON el.i = mn.i JOIN f$c f ON el.i = f.i
         |   GROUP BY el.rid)""".stripMargin
    }.mkString(",\n")
    val sel = (0 until k).map(c => s"p$c.pc AS pc$c").mkString(", ")
    val joins = (1 until k).map(c => s"JOIN p$c ON p0.rid = p$c.rid").mkString(" ")
    s"""WITH ${covCtes(corpusSql, dim, ddof)},
       | mn AS MATERIALIZED (SELECT i, s / (SELECT c FROM nn) AS m FROM s1),
       |$comps,
       |$pcs
       |SELECT p0.rid, $sel FROM p0 $joins ORDER BY p0.rid""".stripMargin
  }
}
