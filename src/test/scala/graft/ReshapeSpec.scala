package graft

import graft.operators.{GroupBy, Margins, Reshape, SelectionOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReshapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def sel(d: DataFrame) = new SelectionOps(new GroupBy(d, Seq(col("key"))))

  def fixture: DataFrame = Seq(
    (0, 1, 10.0), (1, 1, 11.0), (2, 1, 12.0), (3, 2, 20.0), (4, 2, 21.0)
  ).toDF("ord", "key", "value")

  test("head/tail/nth select by position per group") {
    assert(sel(fixture).head(2, Seq(col("ord"))).select("ord")
      .collect().map(_.getInt(0)).sorted === Array(0, 1, 3, 4))
    assert(sel(fixture).tail(1, Seq(col("ord"))).select("ord")
      .collect().map(_.getInt(0)).sorted === Array(2, 4))
    assert(sel(fixture).nth(1, Seq(col("ord"))).select("ord")
      .collect().map(_.getInt(0)).sorted === Array(1, 4))
    // negative n counts from the end
    assert(sel(fixture).nth(-1, Seq(col("ord"))).select("ord")
      .collect().map(_.getInt(0)).sorted === Array(2, 4))
    // out-of-range n yields no rows for short groups
    assert(sel(fixture).nth(2, Seq(col("ord"))).select("ord")
      .collect().map(_.getInt(0)).sorted === Array(2))
  }

  test("findFirstN/findLastN return row ids with within-group positions") {
    val first = sel(fixture).findFirstN(2, col("ord"), Seq(col("ord")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    assert(first === Array((1, 0, 1L), (1, 1, 2L), (2, 3, 1L), (2, 4, 2L)))
    // pos 1 = last row when searching from the end
    val last = sel(fixture).findLastN(1, col("ord"), Seq(col("ord")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    assert(last === Array((1, 2, 1L), (2, 4, 1L)))
  }

  test("sliceWidth positional selection matches the unsplit path") {
    // 3 keys with very different sizes (one hot), integral unique ord
    // with gaps so slice occupancy is irregular; width 7 puts slice
    // boundaries mid-group and leaves some slices empty
    val rows = for {
      k <- Seq("hot", "mid", "one")
      i <- 0 until (if (k == "hot") 200 else if (k == "mid") 23 else 1)
    } yield (k, i.toLong * 3 + (if (k == "mid") 1 else 0), s"$k-$i")
    val d = rows.toDF("key", "ord", "payload")
    val s = sel2(d)
    def sortedRows(df: DataFrame): Seq[String] =
      df.select("payload").collect().map(_.getString(0)).sorted.toSeq
    for (w <- Seq(7L, 50L, 10000L); n <- Seq(1, 2, 5, 300)) {
      assert(sortedRows(s.head(n, Seq(col("ord")))) ===
        sortedRows(s.head(n, Seq(col("ord")), sliceWidth = Some(w))),
        s"head($n) w=$w")
      assert(sortedRows(s.tail(n, Seq(col("ord")))) ===
        sortedRows(s.tail(n, Seq(col("ord")), sliceWidth = Some(w))),
        s"tail($n) w=$w")
    }
    for (w <- Seq(7L, 50L); n <- Seq(0, 3, -1, -4, 250, -250)) {
      assert(sortedRows(s.nth(n, Seq(col("ord")))) ===
        sortedRows(s.nth(n, Seq(col("ord")), sliceWidth = Some(w))),
        s"nth($n) w=$w")
    }
    def sortedIds(df: DataFrame): Seq[(String, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    for (w <- Seq(7L, 50L); n <- Seq(1, 4)) {
      assert(sortedIds(s.findFirstN(n, col("ord"), Seq(col("ord")))) ===
        sortedIds(s.findFirstN(n, col("ord"), Seq(col("ord")),
          sliceWidth = Some(w))), s"findFirstN($n) w=$w")
      assert(sortedIds(s.findLastN(n, col("ord"), Seq(col("ord")))) ===
        sortedIds(s.findLastN(n, col("ord"), Seq(col("ord")),
          sliceWidth = Some(w))), s"findLastN($n) w=$w")
    }
    // negative ords: floor division must slice them correctly
    val neg = Seq(("a", -13L, "a0"), ("a", -7L, "a1"), ("a", -1L, "a2"),
      ("a", 4L, "a3"), ("b", -2L, "b0")).toDF("key", "ord", "payload")
    val sn = sel2(neg)
    assert(sortedRows(sn.head(2, Seq(col("ord")))) ===
      sortedRows(sn.head(2, Seq(col("ord")), sliceWidth = Some(5L))))
    assert(sortedRows(sn.tail(2, Seq(col("ord")))) ===
      sortedRows(sn.tail(2, Seq(col("ord")), sliceWidth = Some(5L))))
    // a null ord fails loudly instead of silently diverging
    val withNull = Seq(("a", Some(1L), "x"), ("a", None, "y"))
      .toDF("key", "ord", "payload")
    val err = intercept[Exception] {
      sel2(withNull).head(1, Seq(col("ord")), sliceWidth = Some(5L)).collect()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("non-null ord")))
  }

  private def sel2(d: DataFrame) =
    new SelectionOps(new GroupBy(d, Seq(col("key"))))

  test("crosstab pivots counts with margins and zero fill") {
    val d = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("k", "c")
    val out = Reshape.crosstab(d, Seq(col("k")), col("c"),
      margins = Margins.All, fillZero = true)
    val rows = out.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.columns.toSeq === Seq("k", "All", "x", "y") ||
      out.columns.toSeq === Seq("k", "x", "y", "All"))
    val xi = out.columns.indexOf("x") - 1
    val yi = out.columns.indexOf("y") - 1
    val ai = out.columns.indexOf("All") - 1
    def tup(t: (Long, Long, Long)): Array[Long] = Array(t._1, t._2, t._3)
    assert(tup(rows("a"))(xi) === 2L); assert(tup(rows("a"))(yi) === 1L)
    assert(tup(rows("a"))(ai) === 3L)
    assert(tup(rows("b"))(yi) === 0L) // zero-filled missing cell
    assert(tup(rows("All"))(ai) === 4L) // grand total
  }

  test("crosstab with sum aggfunc leaves missing cells null") {
    val d = Seq(("a", "x", 1.0), ("b", "y", 2.0)).toDF("k", "c", "v")
    val out = Reshape.crosstab(d, Seq(col("k")), col("c"),
      value = Some(("sum", col("v"))))
    val row = out.filter(col("k") === "a").head
    assert(row.getAs[Any](out.columns.indexOf("y")) == null)
  }

  test("prettyCut labels and binning match the reference format") {
    assert(Reshape.prettyCutLabels(Seq(5d, 10d, 15d), integer = true) ===
      Seq(" <= 5", "6 - 10", "11 - 15", " > 15"))
    assert(Reshape.prettyCutLabels(Seq(0.5, 1.25), integer = false) ===
      Seq(" <= 0.50", "0.50 - 1.25", " > 1.25"))
    val d = Seq(Some(1.0), Some(5.0), Some(10.0), Some(15.0), Some(20.0),
      Some(Double.NaN), None).toDF("x")
    val out = d.select(Reshape.prettyCut(col("x"), Seq(5d, 10d, 15d),
      integer = true).as("bin")).collect().map(r => Option(r.getString(0)))
    assert(out === Seq(Some(" <= 5"), Some(" <= 5"), Some("6 - 10"),
      Some("11 - 15"), Some(" > 15"), None, None))
  }

  test("boolsToCategorical joins true flag names; all-false is naRep") {
    val d = Seq((true, false, false), (false, true, false), (true, false, true),
      (false, true, true), (false, false, false)).toDF("A", "B", "C")
    val out = d.select(Reshape.boolsToCategorical(Seq(
      "A" -> col("A"), "B" -> col("B"), "C" -> col("C"))).as("l"))
      .collect().map(_.getString(0))
    assert(out === Seq("A", "B", "A & C", "B & C", "None"))
  }

  test("boolsToCategorical rejects clashing naRep and duplicate trues when disallowed") {
    intercept[IllegalArgumentException] {
      Reshape.boolsToCategorical(Seq("None" -> lit(true)))
    }
    val d = Seq((true, true)).toDF("A", "B")
    val ex = intercept[Exception] {
      d.select(Reshape.boolsToCategorical(Seq("A" -> col("A"), "B" -> col("B")),
        allowDuplicates = false).as("l")).collect()
    }
    assert(ex.getMessage.contains("more than one True"))
  }

  test("crosstab single-pass margins path equals the grouping-sets path") {
    // a richer fixture: null index keys (dropped), null column keys
    // (dropped), null values (count skips, size keeps), missing combos
    val d = Seq(
      (Some("a"), Some("x"), Some(1.0)), (Some("a"), Some("x"), None),
      (Some("a"), Some("y"), Some(2.0)), (Some("b"), Some("x"), Some(3.0)),
      (Some("b"), None, Some(4.0)), (None, Some("y"), Some(5.0)),
      (Some("c"), Some("z"), None)
    ).toDF("k", "c", "v")
    for (agg <- Seq("size", "count")) {
      val fast = Reshape.crosstab(d, Seq(col("k")), col("c"),
        value = Some((agg, col("v"))), margins = Margins.All, fillZero = true)
      // mask = lit(true) is semantically a no-op but routes the
      // general GROUPING SETS implementation
      val general = Reshape.crosstab(d, Seq(col("k")), col("c"),
        value = Some((agg, col("v"))), margins = Margins.All,
        mask = Some(lit(true)), fillZero = true)
      assert(fast.columns.toSeq === general.columns.toSeq, s"columns for $agg")
      assert(fast.collect().map(_.toSeq).toSeq ===
        general.collect().map(_.toSeq).toSeq, s"rows for $agg")
    }
  }

  test("single-pass margins with a PARTIAL domain still counts all rows in All") {
    // domain restricted to x — the "All" column/grand total must still
    // cover y rows, like the general path (advisory regression: the
    // row-wise cell sum undercounted)
    val d = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("b", "y"))
      .toDF("k", "c")
    val fast = Reshape.crosstab(d, Seq(col("k")), col("c"),
      margins = Margins.All, domain = Some(Seq("x")), fillZero = true)
    val general = Reshape.crosstab(d, Seq(col("k")), col("c"),
      margins = Margins.All, domain = Some(Seq("x")),
      mask = Some(lit(true)), fillZero = true)
    assert(fast.columns.toSeq === general.columns.toSeq)
    assert(fast.collect().map(_.toSeq).toSeq ===
      general.collect().map(_.toSeq).toSeq)
    // and the absolute numbers: a → 3 total, b → 1, grand total 4
    val all = fast.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all === Map("a" -> 3L, "b" -> 1L, "All" -> 4L))
  }

  test("crosstabMulti with margins adds the All row and column") {
    val d = Seq(("a", "x", "p"), ("a", "y", "q"), ("b", "x", "p"), ("a", "x", "p"))
      .toDF("k", "c1", "c2")
    val out = Reshape.crosstabMulti(d, Seq(col("k")),
      Seq(col("c1"), col("c2")), margins = Margins.All, fillZero = true)
    val rows = out.collect().map(r => r.getString(0) ->
      out.columns.tail.zipWithIndex.map { case (c, i) => c -> r.getLong(i + 1) }.toMap).toMap
    assert(rows("a")("x|p") === 2L)
    assert(rows("a")("All") === 3L)
    assert(rows("All")("All") === 4L) // grand total
    assert(rows("All")("x|p") === 3L) // column margin
  }

  test("margins compose with non-additive ops (median, first)") {
    val d = Seq((0, "a", 1.0), (1, "a", 3.0), (2, "b", 5.0)).toDF("ord", "k", "v")
    val g = new GroupBy(d, Seq(col("k")))
    val med = g.aggregate(Seq(graft.operators.AggSpec("median", col("v"), "m")),
        margins = Margins.All)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med === Map("a" -> 2.0, "b" -> 5.0, "All" -> 3.0))
    val first = g.aggregate(Seq(graft.operators.AggSpec("first", col("v"), "f",
        ord = Some(col("ord")))), margins = Margins.All)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(first === Map("a" -> 1.0, "b" -> 5.0, "All" -> 1.0))
  }

  test("crosstab matches cells for timestamp column keys (cast-vs-toString)") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-06-01 12:30:00")
    val d = Seq(("a", t1), ("a", t1), ("a", t2), ("b", t2)).toDF("k", "ts")
    // fast (count-like margins) path
    val fast = Reshape.crosstab(d, Seq(col("k")), col("ts"),
      margins = Margins.All, fillZero = true)
    val fa = fast.filter(col("k") === "a").head
    assert(fa.getAs[Long](fast.columns.indexOf("All")) === 3L)
    assert(fast.columns.count(c =>
      fa.getAs[Any](fast.columns.indexOf(c)) == (2L: Any)) >= 1) // t1 cell hit
    // general GROUPING SETS path (mask forces it)
    val gen = Reshape.crosstab(d, Seq(col("k")), col("ts"),
      margins = Margins.All, mask = Some(lit(true)), fillZero = true)
    val ga = gen.filter(col("k") === "a").head
    assert(ga.getAs[Long](gen.columns.indexOf("All")) === 3L)
    // non-All cells must carry the counts (they'd all be 0 on a
    // cast-vs-toString mismatch)
    val nonAll = gen.columns.filter(c => c != "k" && c != "All")
    assert(nonAll.map(c => ga.getAs[Long](gen.columns.indexOf(c))).sum === 3L)
  }

  test("crosstabMulti concatenates column levels into one pivot key") {
    val d = Seq(("a", "x", "p", 1.0), ("a", "y", "q", 2.0), ("b", "x", "q", 3.0))
      .toDF("k", "c1", "c2", "v")
    val out = Reshape.crosstabMulti(d, Seq(col("k")),
      Seq(col("c1"), col("c2")), value = Some(("sum", col("v"))))
    assert(out.columns.toSet === Set("k", "x|p", "x|q", "y|q"))
    val a = out.filter(col("k") === "a").head
    assert(a.getAs[Double]("x|p") === 1.0)
    assert(a.getAs[Double]("y|q") === 2.0)
    assert(a.isNullAt(out.columns.indexOf("x|q")))
  }

  test("normalizeCells: index is a row share, columns a column share, all a grand share; zero rows null") {
    import spark.implicits._
    val ct = Seq(("a", 2.0, 2.0), ("b", 0.0, 0.0), ("c", 1.0, 3.0))
      .toDF("k", "x", "y")
    def m(mode: String): Map[String, (Any, Any)] =
      Reshape.normalizeCells(ct, Seq("k"), mode).collect()
        .map(r => r.getString(0) -> ((if (r.isNullAt(1)) null else r.get(1),
          if (r.isNullAt(2)) null else r.get(2)))).toMap
    assert(m("index") === Map("a" -> ((0.5, 0.5)), "b" -> ((null, null)),
      "c" -> ((0.25, 0.75))))
    assert(m("columns") === Map("a" -> ((2.0 / 3, 0.4)), "b" -> ((0.0, 0.0)),
      "c" -> ((1.0 / 3, 0.6))))
    assert(m("all") === Map("a" -> ((0.25, 0.25)), "b" -> ((0.0, 0.0)),
      "c" -> ((0.125, 0.375))))
    intercept[IllegalArgumentException] {
      Reshape.normalizeCells(ct, Seq("k"), "rows")
    }
  }

  test("qcut: pandas quartile codes, ties to the lower bin, nulls null") {
    import spark.implicits._
    // pandas qcut([1..8], 4) -> codes [0,0,1,1,2,2,3,3]
    val d = (1 to 8).map(i => (i, Some(i.toDouble))).toDF("id", "v")
      .union(Seq((9, Option.empty[Double])).toDF("id", "v"))
    val out = Reshape.qcut(d, col("v"), 4).orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.get(2)).toSeq
    assert(out === Seq(0, 0, 1, 1, 2, 2, 3, 3, null))
    intercept[IllegalArgumentException] { Reshape.qcut(d, col("v"), 1) }
    intercept[IllegalArgumentException] {
      Reshape.qcut(d.filter(col("id") > 90), col("v"), 4)
    }
  }

  test("get_dummies: sorted 0/1 columns, null rows all-zero, dropFirst, cardinality guard") {
    import spark.implicits._
    val d = Seq((1, Some("b")), (2, Some("a")), (3, None), (4, Some("b")))
      .toDF("id", "c")
    val out = Reshape.getDummies(d, col("c"), prefix = "x").orderBy("id")
    assert(out.columns.toSeq === Seq("id", "c", "x_a", "x_b"))
    val rows = out.select("x_a", "x_b").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows === Seq((0, 1), (1, 0), (0, 0), (0, 1)))
    assert(Reshape.getDummies(d, col("c"), dropFirst = true).columns
      .count(_.startsWith("d_")) === 1)
    intercept[IllegalArgumentException] {
      Reshape.getDummies(d, col("c"), maxCategories = 1)
    }
    intercept[IllegalArgumentException] {
      Reshape.getDummies(d.filter(col("id") > 90), col("c"))
    }
  }

  test("factorize: first-appearance codes by ord, nulls -1, uniques table") {
    import spark.implicits._
    val d = Seq((10, Some("z")), (20, Some("a")), (30, Some("z")),
      (40, None), (50, Some("m"))).toDF("ord", "c")
    val out = Reshape.factorize(d, col("c"), col("ord")).orderBy("ord")
      .select("code").as[Int].collect().toSeq
    // z appears first (ord 10) -> 0, a -> 1, m -> 2, null -> -1
    assert(out === Seq(0, 1, 0, -1, 2))
    val tbl = Reshape.factorizeTable(d, col("c"), col("ord"))
      .orderBy("code").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(tbl === Seq(("z", 0), ("a", 1), ("m", 2)))
  }

  test("factorize at high cardinality: no single-partition exchange, join fallback agrees") {
    import spark.implicits._
    // 50k distinct ids — the shape that used to funnel the whole
    // domain through a one-task rank window (round-8 verdict item 4)
    val d = spark.range(50000).select(col("id").as("ord"),
      concat(lit("v"), col("id")).as("c"))
    val tbl = Reshape.factorizeTable(d, col("c"), col("ord"), "code")
    val plan = tbl.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"uniques indexing must not single-partition:\n$plan")
    // codes follow (min-ord, value) order at any cardinality
    val sample = tbl.filter(col("value").isin("v0", "v1", "v49999"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sample === Map("v0" -> 0, "v1" -> 1, "v49999" -> 49999))
    // forcing the non-broadcast fallback returns identical codes
    val broad = Reshape.factorize(d, col("c"), col("ord"))
      .select("ord", "code").as[(Long, Int)].collect().toMap
    val joined = Reshape.factorize(d, col("c"), col("ord"),
        maxBroadcastCategories = 1L)
      .select("ord", "code").as[(Long, Int)].collect().toMap
    assert(broad === joined && broad(0L) === 0 && broad(49999L) === 49999)
  }

  test("melt: wide to long, nulls kept, mixed types rejected") {
    import spark.implicits._
    val d = Seq((1, Some(10.0), 100.0), (2, None, 200.0)).toDF("id", "a", "b")
    val out = Reshape.melt(d, Seq("id"), Seq("a", "b"))
      .collect().map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out === Set((1, "a", 10.0), (1, "b", 100.0),
      (2, "a", null), (2, "b", 200.0)))
    val mixed = Seq((1, 1.0, "s")).toDF("id", "a", "b")
    intercept[IllegalArgumentException] {
      Reshape.melt(mixed, Seq("id"), Seq("a", "b"))
    }
  }

  test("nlargest/nsmallest: keep='first' tie rule, nulls dropped") {
    import spark.implicits._
    val d = Seq[(String, Int, Option[Double])](
      ("g", 0, Some(5.0)), ("g", 1, Some(5.0)), ("g", 2, Some(1.0)),
      ("g", 3, None), ("g", 4, Some(3.0))
    ).toDF("k", "id", "v")
    val sel = new SelectionOps(new GroupBy(d, Seq(col("k"))))
    assert(sel.nlargest(2, col("v"), col("id")).select("id")
      .collect().map(_.getInt(0)).toSet === Set(0, 1)) // tie → smaller id first
    assert(sel.nsmallest(2, col("v"), col("id")).select("id")
      .collect().map(_.getInt(0)).toSet === Set(2, 4)) // null id=3 dropped
  }
}
