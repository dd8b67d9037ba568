package graft

import graft.api.Implicits._
import graft.functions.NanOps
import graft.operators.{GroupBy, GroupScatter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def df = Seq((1, 2.0, "a"), (1, 4.0, "b"), (2, 6.0, "a"), (2, 8.0, "b"))
    .toDF("k", "v", "s")

  test("groupByFast + cols selection shares the grouper") {
    val out = df.groupByFast("k").cols(col("v")).sum()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out === Map(1 -> 6.0, 2 -> 14.0))
    val sel = df.groupByFast("k").cols(col("v"))
    assert(sel.size().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      === Map(1 -> 2L, 2 -> 2L))
    assert(sel.nunique().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      === Map(1 -> 2L, 2 -> 2L))
    assert(sel.first(col("s")).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      === Map(1 -> 2.0, 2 -> 6.0))
    assert(sel.last(col("s")).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      === Map(1 -> 4.0, 2 -> 8.0))
  }

  test("rolling facade") {
    val out = df.groupByFast("k").rolling(2, Some(1))
      .sum(col("v"), col("s"))
      .orderBy("k", "s").select("rolling_sum")
      .collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(2.0, 6.0, 6.0, 14.0))
  }

  test("rolling facade string-dispatch agg and count") {
    val facade = df.groupByFast("k").rolling(2, Some(1))
    val viaAgg = facade.agg("sum", col("v"), col("s"))
      .orderBy("k", "s").select("rolling_sum")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaAgg === Seq(2.0, 6.0, 6.0, 14.0))
    val counts = facade.count(col("v"), col("s"))
      .orderBy("k", "s").select("rolling_count")
      .collect().map(_.getLong(0)).toSeq
    assert(counts === Seq(1L, 2L, 1L, 2L))
  }

  test("extensions sugar: vc, sv, svd, dd, filterCols, dropCols, selectNumeric") {
    assert(df.vc(col("s")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 2L, "b" -> 2L))
    assert(df.sv(col("v")).head.getDouble(1) === 2.0)
    assert(df.svd(col("v")).head.getDouble(1) === 8.0)
    assert(df.select("k").dd().count() === 2)
    assert(df.filterCols(like = "s").columns.toSeq === Seq("s"))
    assert(df.filterCols(regex = "^[kv]$").columns.toSeq === Seq("k", "v"))
    assert(df.dropCols("s").columns.toSeq === Seq("k", "v"))
    assert(df.selectNumeric().columns.toSeq === Seq("k", "v"))
  }

  test("pc and normalize column helpers") {
    val p = df.select(df.pc(col("v") / 100).as("p")).collect()
    assert(p.map(_.getDouble(0)).toSeq === Seq(2.0, 4.0, 6.0, 8.0))
    val n = df.normalize(col("v"), name = "n").select("n").collect()
    assert(math.abs(n.map(_.getDouble(0)).sum - 1.0) < 1e-12)
  }

  test("NanOps global reductions match direct computation") {
    val row = NanOps.reduce(df, Seq(
      NanOps.Red("sum", col("v"), "s"),
      NanOps.Red("mean", col("v"), "m"),
      NanOps.Red("count", col("v"), "c"),
      NanOps.Red("var", col("v"), "var2", ddof = 2))).head
    assert(row.getDouble(0) === 20.0)
    assert(row.getDouble(1) === 5.0)
    assert(row.getLong(2) === 4L)
    // Σ(x-5)² = 20 over (n-2)=2 → 10
    assert(math.abs(row.getDouble(3) - 10.0) < 1e-12)
  }

  test("nbDot computes a weighted row sum") {
    val out = df.select(NanOps.nbDot(Seq(col("k"), col("v")), Seq(10.0, 1.0)).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(12.0, 14.0, 26.0, 28.0))
  }

  test("GroupScatter.fit recovers a known linear relationship") {
    val d = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val (coefs, r2) = GroupScatter.fit(d, col("x"), col("y"))
    assert(math.abs(coefs.head - 3.0) < 1e-9) // slope
    assert(math.abs(coefs.last - 7.0) < 1e-9) // intercept
    assert(math.abs(r2 - 1.0) < 1e-12)
  }

  test("GroupScatter.fit degree 2 recovers a quadratic") {
    val d = (-50 to 50).map(i => (i.toDouble, 2.0 * i * i - 3.0 * i + 1.0)).toDF("x", "y")
    val (coefs, r2) = GroupScatter.fit(d, col("x"), col("y"), deg = 2)
    assert(math.abs(coefs(0) - -3.0) < 1e-6)
    assert(math.abs(coefs(1) - 2.0) < 1e-6)
    assert(math.abs(coefs(2) - 1.0) < 1e-6)
    assert(math.abs(r2 - 1.0) < 1e-9)
  }

  test("GroupScatter.fit with weights favors weighted points") {
    val d = Seq((0.0, 0.0, 1.0), (1.0, 1.0, 1.0), (2.0, 10.0, 0.0))
      .toDF("x", "y", "w")
    val (coefs, _) = GroupScatter.fit(d, col("x"), col("y"),
      weight = Some(col("w")))
    assert(math.abs(coefs.head - 1.0) < 1e-9) // zero-weight outlier ignored
  }

  test("binnedMeans produces equal-frequency bins with means") {
    val d = (1 to 100).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    // exactBins = true: this test pins the ntile path (the sibling test
    // below pins the approx default); orderBy so rows.head is bin 1 by
    // construction, not by collect() luck
    val out = GroupScatter.binnedMeans(d, col("x"), col("y"), 4,
      tieBreak = Seq(col("x")), exactBins = true)
    val rows = out.orderBy("bin").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(25L, 25L, 25L, 25L))
    assert(math.abs(rows.head.getAs[Double]("x_mean") - 13.0) < 1e-12)
  }

  test("veneer round-10 additions: selected prod/sem/any/idxmax, rolling var/corr facade, zscore/minmax") {
    import graft.api.Implicits._
    val d = Seq((0, "a", 2.0), (1, "a", 4.0), (2, "a", 6.0), (3, "b", 5.0))
      .toDF("ord", "k", "v")
    val g = d.groupByFast(col("k"))
    assert(g.cols(col("v")).sem().collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
      .apply("a").asInstanceOf[Double] - 2.0 / math.sqrt(3) < 1e-9)
    assert(g.cols(col("v")).idxmax(col("ord")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap === Map("a" -> 2, "b" -> 3))
    val rv = g.rolling(2, Some(2)).variance(col("v"), col("ord"))
      .filter(col("ord") === 1).head.getAs[Double]("rolling_var")
    assert(math.abs(rv - 2.0) < 1e-9)
    // zscore: group a mean 4, std 2 → [-1, 0, 1]; minmax → [0, 0.5, 1]
    val z = new GroupBy(d, Seq(col("k"))).zscore(col("v"))
      .filter(col("k") === "a").orderBy("ord")
      .select("zscore").collect().map(_.getDouble(0)).toSeq
    assert(z.zip(Seq(-1.0, 0.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    val mm = new GroupBy(d, Seq(col("k"))).minmaxScale(col("v"))
      .filter(col("k") === "a").orderBy("ord")
      .select("scaled").collect().map(_.getDouble(0)).toSeq
    assert(mm === Seq(0.0, 0.5, 1.0))
    // single-member group: zero std/range → null, not NaN
    val zb = new GroupBy(d, Seq(col("k"))).zscore(col("v"))
      .filter(col("k") === "b").select("zscore").head
    assert(zb.isNullAt(0))
  }

  test("binnedMeans approx path (exactBins=false) matches exact bins on clean quantiles") {
    val d = (1 to 100).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    // distinct uniform values, tight relativeError → identical bins
    val out = GroupScatter.binnedMeans(d, col("x"), col("y"), 4,
      exactBins = false, relativeError = 1e-4)
    val rows = out.orderBy("bin").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(25L, 25L, 25L, 25L))
    assert(math.abs(rows.head.getAs[Double]("x_mean") - 13.0) < 1e-12)
  }
}
