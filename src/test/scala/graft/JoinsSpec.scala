package graft

import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the temporal joins (pandas.merge_asof parity on
  * direction/allow_exact_matches/tolerance, plus the binned range
  * join's equivalence to a naive cross-join filter).
  */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // quotes: (key, ts, px); trades: (key, ts, qty)
  def quotes: DataFrame = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 10.0)
  ).toDF("key", "ts", "px")

  def trades: DataFrame = Seq(
    ("a", 5L, 100), ("a", 20L, 200), ("a", 25L, 300), ("a", 35L, 400),
    ("b", 14L, 500), ("c", 50L, 600)
  ).toDF("key", "ts", "qty")

  def matchMap(out: DataFrame): Map[(String, Long), Any] =
    out.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (if (r.isNullAt(r.fieldIndex("px"))) null
       else r.getDouble(r.fieldIndex("px")))).toMap

  test("asof backward picks the greatest right ts <= left ts; no match -> null") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"))
    assert(matchMap(out) === Map(
      ("a", 5L) -> null, ("a", 20L) -> 2.0, ("a", 25L) -> 2.0,
      ("a", 35L) -> 3.0, ("b", 14L) -> null, ("c", 50L) -> null))
  }

  test("asof allowExactMatches=false uses strict inequality") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), allowExactMatches = false)
    assert(matchMap(out)(("a", 20L)) === 1.0)
  }

  test("asof forward picks the smallest right ts >= left ts") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Forward)
    assert(matchMap(out) === Map(
      ("a", 5L) -> 1.0, ("a", 20L) -> 2.0, ("a", 25L) -> 3.0,
      ("a", 35L) -> null, ("b", 14L) -> 10.0, ("c", 50L) -> null))
  }

  test("asof nearest picks the closer side; exact-distance tie -> backward") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Nearest)
    assert(matchMap(out) === Map(
      ("a", 5L) -> 1.0,   // only forward exists (10)
      ("a", 20L) -> 2.0,  // exact match
      ("a", 25L) -> 2.0,  // 20 and 30 equidistant -> backward
      ("a", 35L) -> 3.0,  // only backward exists
      ("b", 14L) -> 10.0, // forward (15) closer than nothing behind
      ("c", 50L) -> null))
  }

  test("asof nearest: per-side tolerance, strict matches, and the split twin") {
    // tolerance cuts the far side independently
    val tol = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Nearest,
      tolerance = Some(4L))
    assert(matchMap(tol) === Map(
      ("a", 5L) -> null,   // forward 10 is 5 away > 4
      ("a", 20L) -> 2.0,   // exact, distance 0
      ("a", 25L) -> null,  // both sides 5 away > 4
      ("a", 35L) -> null,  // backward 30 is 5 away > 4
      ("b", 14L) -> 10.0,  // forward 15 is 1 away
      ("c", 50L) -> null))
    // allowExactMatches=false skips the equal-ts quote on BOTH sides
    val strict = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Nearest,
      allowExactMatches = false)
    assert(matchMap(strict)(("a", 20L)) === 1.0) // 10 and 30 equidistant -> backward
    // sliceWidth twin: identical output (both directions' carries)
    val split = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Nearest,
      sliceWidth = Some(7L))
    val unsplit = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), direction = Joins.Nearest)
    assert(matchMap(split) === matchMap(unsplit))
  }

  test("asof tolerance nulls matches beyond it without falling back") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), tolerance = Some(5L))
    // (a,25): nearest preceding quote is ts=20 (within 5) -> 2.0;
    // (a,35): nearest is ts=30 (within 5) -> 3.0; (c,50): none
    assert(matchMap(out) === Map(
      ("a", 5L) -> null, ("a", 20L) -> 2.0, ("a", 25L) -> 2.0,
      ("a", 35L) -> 3.0, ("b", 14L) -> null, ("c", 50L) -> null))
    val tight = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), tolerance = Some(1L))
    assert(matchMap(tight)(("a", 25L)) === null) // ts=20 is 5 away -> dropped
  }

  test("asof emits the matched right ts when asked") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), matchedTs = Some("quote_ts"))
    val m = out.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (if (r.isNullAt(r.fieldIndex("quote_ts"))) null
       else r.getLong(r.fieldIndex("quote_ts")))).toMap
    assert(m(("a", 25L)) === 20L && m(("a", 5L)) === null)
  }

  test("asof duplicate right (key, ts) resolves to the greatest payload tuple") {
    val dupQuotes = Seq(("a", 10L, 1.0), ("a", 10L, 9.0)).toDF("key", "ts", "px")
    val out = Joins.asof(Seq(("a", 12L, 1)).toDF("key", "ts", "qty"),
      dupQuotes, Seq("key"), "ts", "ts", rightVals = Seq("px" -> "px"))
    assert(matchMap(out)(("a", 12L)) === 9.0)
  }

  test("asof ignores null right ts rows") {
    val q = Seq(("a", Option.empty[Long], 99.0), ("a", Some(10L), 1.0))
      .toDF("key", "ts", "px")
    val out = Joins.asof(trades.filter($"key" === "a"), q, Seq("key"),
      "ts", "ts", rightVals = Seq("px" -> "px"))
    assert(matchMap(out)(("a", 5L)) === null)
  }

  test("asof output has no duplicate column names (regression: ts emitted twice)") {
    val out = Joins.asof(trades, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"), matchedTs = Some("quote_ts"))
    val names = out.columns.toSeq
    assert(names === names.distinct, s"duplicate columns in $names")
    // the write path is where the duplicate used to explode — exercise it
    val dir = java.nio.file.Files.createTempDirectory("graft_asof").toString
    out.write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() === trades.count())
  }

  test("asof keeps non-key left columns exactly once, values intact") {
    val l = Seq(("a", 12L, 7, "x")).toDF("key", "ts", "qty", "tag")
    val out = Joins.asof(l, quotes, Seq("key"), "ts", "ts",
      rightVals = Seq("px" -> "px"))
    assert(out.columns.count(_ == "ts") === 1)
    val r = out.collect().head
    assert(r.getAs[Long]("ts") === 12L && r.getAs[Int]("qty") === 7 &&
      r.getAs[String]("tag") === "x" && r.getAs[Double]("px") === 1.0)
  }

  test("asof differential vs naive argmax on pseudo-random data") {
    val left = (1 to 300).map(i => (i % 7, (i * 131 % 997).toLong, i))
      .toDF("key", "ts", "lid")
    val right = (1 to 200).map(i => (i % 7, (i * 173 % 991).toLong, i * 2))
      .toDF("key", "ts", "rv")
    val out = Joins.asof(left, right, Seq("key"), "ts", "ts",
      rightVals = Seq("rv" -> "rv"))
      .select("lid", "rv").as[(Int, Option[Int])].collect().toMap
    val naive = left.as("l").join(right.as("r"),
        $"l.key" === $"r.key" && $"l.ts" >= $"r.ts", "left")
      .groupBy($"l.lid".as("lid"))
      .agg(max(struct($"r.ts", $"r.rv")).as("m"))
      .select($"lid", $"m.rv".as("rv"))
      .as[(Int, Option[Int])].collect().toMap
    assert(out === naive)
  }

  test("asof nearest differential vs naive |distance| argmin on pseudo-random data") {
    val left = (1 to 300).map(i => (i % 7, (i * 131 % 997).toLong, i))
      .toDF("key", "ts", "lid")
    val right = (1 to 200).map(i => (i % 7, (i * 173 % 991).toLong, i * 2))
      .toDF("key", "ts", "rv")
    def run(width: Option[Long]): Map[Int, Option[Int]] =
      Joins.asof(left, right, Seq("key"), "ts", "ts",
        rightVals = Seq("rv" -> "rv"), direction = Joins.Nearest,
        sliceWidth = width)
        .select("lid", "rv").as[(Int, Option[Int])].collect().toMap
    // naive: minimize (|distance|, forward-flag), then max rv on ties —
    // the engine's backward-preference + greatest-payload rules
    val naive = left.as("l").join(right.as("r"),
        $"l.key" === $"r.key", "left")
      .groupBy($"l.lid".as("lid"))
      .agg(max(struct(
        -abs($"l.ts" - $"r.ts").as("negd"),
        when($"r.ts" <= $"l.ts", 1).otherwise(0).as("backPref"),
        $"r.rv".as("rv"))).as("m"))
      .select($"lid", $"m.rv".as("rv"))
      .as[(Int, Option[Int])].collect().toMap
    assert(run(None) === naive)
    assert(run(Some(100L)) === naive) // dual-carry sliced path
  }

  test("asof sliceWidth time-split equals the unsplit output (skew lever)") {
    // hot key 0 holds ~half of all rows — the skew shape sliceWidth
    // exists for; ts collisions across sides exercise the exact-match
    // ordering and the payload tie-break across the boundary patch
    val left = (1 to 600).map { i =>
      (if (i % 2 == 0) 0 else i % 5, (i * 131 % 997).toLong, i)
    }.toDF("key", "ts", "lid")
    val right = (1 to 400).map { i =>
      (if (i % 2 == 0) 0 else i % 5, (i * 173 % 991).toLong, i * 2)
    }.toDF("key", "ts", "rv")
    def run(dir: Joins.Direction, exact: Boolean, tol: Option[Long],
        width: Option[Long]): Set[(Int, Any, Any)] =
      Joins.asof(left, right, Seq("key"), "ts", "ts",
          rightVals = Seq("rv" -> "rv"), direction = dir,
          allowExactMatches = exact, tolerance = tol,
          matchedTs = Some("mts"), sliceWidth = width)
        .select("lid", "rv", "mts").collect()
        .map(r => (r.getInt(0), r.get(1), r.get(2))).toSet
    for {
      dir <- Seq(Joins.Backward, Joins.Forward)
      exact <- Seq(true, false)
      tol <- Seq(None, Some(50L))
    } {
      val base = run(dir, exact, tol, None)
      // widths spanning: every row its own slice; mid-size slices; one
      // slice holding everything (degenerates to the unsplit shape)
      for (width <- Seq(1L, 97L, 5000L)) {
        val split = run(dir, exact, tol, Some(width))
        assert(split === base, s"dir=$dir exact=$exact tol=$tol width=$width")
      }
    }
  }

  def points: DataFrame = (1 to 400)
    .map(i => (i % 5, (i * 37 % 1000).toLong, i)).toDF("key", "p", "pid")
  def intervals: DataFrame = (1 to 60)
    .map { i =>
      val lo = (i * 101 % 900).toLong
      (i % 5, lo, lo + (i * 13 % 150).toLong, i)
    }.toDF("key", "lo", "hi", "iid")

  def pairs(out: DataFrame): Set[(Int, Int)] =
    out.select("pid", "iid").as[(Int, Int)].collect().toSet

  test("rangeJoin matches the cross-join filter, for any bucket width") {
    val expected = points.as("l").join(intervals.as("r"),
        $"l.key" === $"r.key" && $"l.p" >= $"r.lo" && $"l.p" <= $"r.hi")
      .select($"pid", $"iid").as[(Int, Int)].collect().toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 150L, 1000L, 5000L)) {
      val got = pairs(Joins.rangeJoin(points, intervals, Seq("key"),
        "p", "lo", "hi", bucketWidth = w))
      assert(got === expected, s"bucketWidth=$w")
    }
  }

  test("rangeJoin emits each matching pair exactly once") {
    val out = Joins.rangeJoin(points, intervals, Seq("key"),
      "p", "lo", "hi", bucketWidth = 10L)
    val all = out.select("pid", "iid").as[(Int, Int)].collect()
    assert(all.length === all.toSet.size)
  }

  test("rangeJoin handles negative coordinates (floor, not truncate)") {
    val l = Seq((1, -95L, 1), (1, -105L, 2), (1, 5L, 3)).toDF("key", "p", "pid")
    val r = Seq((1, -100L, -90L, 10), (1, 0L, 10L, 20)).toDF("key", "lo", "hi", "iid")
    val got = pairs(Joins.rangeJoin(l, r, Seq("key"), "p", "lo", "hi", 30L))
    assert(got === Set((1, 10), (3, 20)))
  }

  test("rangeJoin is exact within bucketWidth of Long.MinValue (decimal floor)") {
    val lo = Long.MinValue
    val l = Seq((1, lo + 5L, 1), (1, lo + 25L, 2)).toDF("key", "p", "pid")
    val r = Seq((1, lo, lo + 10L, 10)).toDF("key", "lo", "hi", "iid")
    val got = pairs(Joins.rangeJoin(l, r, Seq("key"), "p", "lo", "hi", 30L))
    assert(got === Set((1, 10)))
  }

  test("asof: a null left ts never matches (both directions, split and unsplit)") {
    // without the guard, the unsplit Forward window (ts desc, nulls
    // last) hands a null-ts left row the earliest right payload while
    // the sliced path gives it none — both must emit no match
    val l = Seq((Option("a"), Option(10L), 1), (Option("a"), Option.empty[Long], 2))
      .toDF("key", "ts", "lid")
    val r = Seq(("a", 5L, 100.0)).toDF("key", "ts", "px")
    for {
      dir <- Seq(Joins.Backward, Joins.Forward)
      width <- Seq(None, Some(7L))
    } {
      val out = Joins.asof(l, r, Seq("key"), "ts", "ts",
        rightVals = Seq("px" -> "px"), direction = dir, sliceWidth = width)
      val m = out.collect().map(row => row.getInt(row.fieldIndex("lid")) ->
        (if (row.isNullAt(row.fieldIndex("px"))) null
         else row.getDouble(row.fieldIndex("px")))).toMap
      val expected1: Any = if (dir == Joins.Backward) 100.0 else null
      assert(m === Map(1 -> expected1, 2 -> null), s"dir=$dir width=$width")
    }
  }

  test("rangeJoin plans an equi-join, not a nested-loop join") {
    val plan = Joins.rangeJoin(points, intervals, Seq("key"),
      "p", "lo", "hi", bucketWidth = 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("intervalJoin: overlap matrix vs a brute-force oracle, each pair exactly once, all widths") {
    // dense fixture: every lo/hi combination within a small range, two
    // keys, including touching endpoints, containment, disjoint, and
    // inverted (hi < lo, must never match) intervals
    val ls = for (k <- 1 to 2; lo <- 0L to 40L by 7; len <- Seq(0L, 5L, 13L))
      yield (k, lo, lo + len, s"l$k-$lo-$len")
    val rs = for (k <- 1 to 2; lo <- 3L to 45L by 5; len <- Seq(0L, 4L, 20L))
      yield (k, lo, lo + len, s"r$k-$lo-$len")
    val inverted = Seq((1, 10L, 5L, "linv"))
    val l = (ls ++ inverted).toDF("key", "llo", "lhi", "lid")
    val r = (rs ++ Seq((1, 20L, 2L, "rinv"))).toDF("key", "rlo", "rhi", "rid")
    val expect = (for {
      (k1, llo, lhi, lid) <- ls
      (k2, rlo, rhi, rid) <- rs
      if k1 == k2 && llo <= rhi && rlo <= lhi
    } yield (lid, rid)).toSet
    for (width <- Seq(1L, 3L, 10L, 1000L)) {
      val got = Joins.intervalJoin(l, r, Seq("key"), "llo", "lhi",
          "rlo", "rhi", bucketWidth = width)
        .select("lid", "rid").as[(String, String)].collect()
      assert(got.length === got.toSet.size, s"width=$width: duplicates")
      assert(got.toSet === expect, s"width=$width")
    }
  }

  test("intervalJoin plans an equi-join, not a nested-loop join") {
    val l = Seq((1, 0L, 5L, 1)).toDF("key", "llo", "lhi", "lid")
    val r = Seq((1, 3L, 9L, 2)).toDF("key", "rlo", "rhi", "rid")
    val plan = Joins.intervalJoin(l, r, Seq("key"), "llo", "lhi",
      "rlo", "rhi", bucketWidth = 4L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
