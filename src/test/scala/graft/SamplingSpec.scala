package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling semantics: partition-independence, threshold
  * nesting, stratified fractions, and the mixture-plan arithmetic.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministic sample: partition-independent, re-runnable, fraction-accurate") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.deterministicSample(df, col("doc_id"), 0.35, seed = 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val once = ids(docs)
    assert(ids(docs) === once)                 // re-run
    assert(ids(docs.repartition(13)) === once) // partitioning
    val n = docs.count().toDouble
    assert(math.abs(once.size - 0.35 * n) / n < 0.08,
      s"kept ${once.size} of $n at fraction 0.35")
  }

  test("samples nest: fraction f' < f selects a subset") {
    def at(f: Double): Set[Long] =
      Sampling.deterministicSample(docs, col("doc_id"), f, seed = 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = at(0.2); val big = at(0.5)
    assert(small.nonEmpty && small.subsetOf(big))
  }

  test("stratified sample applies per-stratum fractions and drops unnamed strata") {
    val out = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
        Map("en" -> 1.0, "de" -> 0.5), seed = 7)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") === full("en"))               // fraction 1.0 keeps all
    assert(out.keySet === Set("en", "de"))         // fr/es/... dropped
    assert(out("de") > 0 && out("de") < full("de"))
  }

  test("mixtureFractions: largest feasible total, binding stratum kept whole") {
    val f = Sampling.mixtureFractions(
      Map("web" -> 100L, "code" -> 50L),
      Map("web" -> 0.5, "code" -> 0.5))
    // T = min(100/.5, 50/.5) = 100 → web 50/100 = .5, code 50/50 = 1.0
    assert(f("web") === 0.5 && f("code") === 1.0)
    // weights normalize: same result for 2:2 as .5:.5
    assert(Sampling.mixtureFractions(Map("web" -> 100L, "code" -> 50L),
      Map("web" -> 2.0, "code" -> 2.0)) === f)
    intercept[IllegalArgumentException] {
      Sampling.mixtureFractions(Map("web" -> 1L), Map("missing" -> 1.0))
    }
  }

  test("assignSplits: disjoint, exhaustive, proportional, and stable under data growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplits(docs, col("doc_id"), splits, seed = 7)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === docs.count())               // exhaustive, one label each
    assert(out.values.toSet === Set("train", "val", "test"))
    val n = out.size.toDouble
    for ((l, w) <- splits)
      assert(math.abs(out.values.count(_ == l) / n - w) < 0.07,
        s"$l: ${out.values.count(_ == l) / n} vs $w")
    // stability: a row's split never changes when OTHER rows disappear
    val subset = Sampling.assignSplits(docs.filter(col("doc_id") % 3 === 0),
        col("doc_id"), splits, seed = 7)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (id, l) => out(id) == l })
    // guards
    intercept[IllegalArgumentException] {
      Sampling.splitCuts(Seq("a" -> 1.0, "a" -> 1.0))
    }
  }

  test("deterministic sampling is a stateless projection: identical on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smp-ckpt").toFile
    val ms = MemoryStream[Long]
    val q = Sampling.deterministicSample(ms.toDS().toDF("id"), col("id"),
        fraction = 0.4, seed = 7)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_stream_sample")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    ms.addData(0L until 500L: _*)
    q.processAllAvailable()
    val streamed = spark.table("graft_stream_sample")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    val batch = Sampling.deterministicSample(
        spark.range(500).toDF("id"), col("id"), fraction = 0.4, seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("takeTokenBudget keeps ~budget tokens, nests, and degrades to identity") {
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokenCountWs(col("text"))
    val total = docs.agg(sum(toks.cast("long"))).head.getLong(0)
    val budget = total * 2 / 5
    val kept = Sampling.takeTokenBudget(docs, col("doc_id"), toks,
      budget, seed = 7)
    val keptTokens = kept.agg(sum(toks.cast("long"))).head.getLong(0)
    assert(math.abs(keptTokens - budget).toDouble / budget < 0.12,
      s"kept $keptTokens of target $budget")
    // nested: a smaller budget's rows are a subset of a larger one's
    def ids(b: Long): Set[Long] =
      Sampling.takeTokenBudget(docs, col("doc_id"), toks, b, seed = 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(total / 5).subsetOf(ids(budget)))
    // budget >= total keeps everything
    assert(Sampling.takeTokenBudget(docs, col("doc_id"), toks,
      total, seed = 7).count() === docs.count())
  }

  test("takeTokenBudget: degenerate totals pass through, precomputed total is identical") {
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokenCountWs(col("text"))
    // empty frame: sum(...) is a null cell — must pass through, not NPE
    val empty = docs.filter(lit(false))
    assert(Sampling.takeTokenBudget(empty, col("doc_id"), toks,
      1000L, seed = 7).count() === 0)
    // all-null token column: nothing to budget, frame unchanged
    val nulls = docs.select(col("doc_id"), lit(null).cast("long").as("t"))
    assert(Sampling.takeTokenBudget(nulls, col("doc_id"), col("t"),
      1000L, seed = 7).count() === docs.count())
    // supplying the total skips the probe and selects the same rows
    val total = docs.agg(sum(toks.cast("long"))).head.getLong(0)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Sampling.takeTokenBudget(docs, col("doc_id"), toks,
        total / 3, seed = 7, total = Some(total)))
      === ids(Sampling.takeTokenBudget(docs, col("doc_id"), toks,
        total / 3, seed = 7)))
  }

  test("rebalanceMixture: non-string strata, null strata dropped, precomputed counts") {
    // integer stratum column — compared through its string form
    val byMod = docs.select(col("doc_id"), (col("doc_id") % 3).as("m"))
    val out = Sampling.rebalanceMixture(byMod, col("doc_id"), col("m"),
        Map("0" -> 0.5, "1" -> 0.5), seed = 7)
      .groupBy("m").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(0L, 1L))
    // null strata are dropped like any unnamed stratum, not NPE'd
    val withNull = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("lang")).as("l"))
    val outN = Sampling.rebalanceMixture(withNull, col("doc_id"), col("l"),
      Map("en" -> 1.0), seed = 7)
    assert(outN.filter(col("l").isNull).count() === 0 && outN.count() > 0)
    // precomputed counts: lazy (no counting job) and row-identical
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 0.5, "de" -> 0.5)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Sampling.rebalanceMixture(docs, col("doc_id"), col("lang"),
        targets, seed = 7, counts = Some(counts)))
      === ids(Sampling.rebalanceMixture(docs, col("doc_id"), col("lang"),
        targets, seed = 7)))
  }

  test("takeTokenMixture keeps ~budget tokens at the target mixture; lazy totals identical") {
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokenCountWs(col("text"))
    val targets = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val totals = docs.groupBy("lang").agg(sum(toks.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val feasible = targets.map { case (k, w) => totals(k) / w }.min
    val budget = (feasible * 0.5).toLong // the cap binds
    val kept = Sampling.takeTokenMixture(docs, col("doc_id"), col("lang"),
      toks, targets, budget, seed = 7)
    val keptTok = kept.groupBy("lang").agg(sum(toks.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptTok.keySet === targets.keySet)
    // per-stratum kept tokens approach weight·budget (binomial at
    // this SF — generous tolerance)
    for ((k, w) <- targets)
      assert(math.abs(keptTok(k) - w * budget) / (w * budget) < 0.30,
        s"$k: ${keptTok(k)} vs target ${w * budget}")
    // supplying the totals skips the probe and selects the same rows
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Sampling.takeTokenMixture(docs, col("doc_id"), col("lang"),
        toks, targets, budget, seed = 7, tokenTotals = Some(totals)))
      === ids(kept))
    // budget at/above the feasible max degrades to the pure mixture
    // rebalance (binding stratum kept whole)
    val full = Sampling.takeTokenMixture(docs, col("doc_id"), col("lang"),
      toks, targets, budget = Long.MaxValue, seed = 7)
    val fullTok = full.groupBy("lang").agg(sum(toks.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = targets.keys.minBy(k => totals(k) / targets(k))
    assert(fullTok(binding) === totals(binding))
  }

  test("rebalanceMixture realizes the target mixture on the corpus") {
    val targets = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val out = Sampling.rebalanceMixture(docs, col("doc_id"), col("lang"),
        targets, seed = 7)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === targets.keySet)
    val total = out.values.sum.toDouble
    // realized proportions approach the targets (hash sampling is
    // binomial around fraction·count — generous tolerance at this SF)
    for ((k, w) <- targets)
      assert(math.abs(out(k) / total - w) < 0.12,
        s"$k: ${out(k) / total} vs target $w (counts $out)")
    // the binding stratum is kept whole
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = targets.keys.minBy(k => full(k) / targets(k))
    assert(out(binding) === full(binding))
  }

  test("weightedSample: partition-independent, nests across weightings, clamps") {
    val w = col("doc_id").cast("double") / 500.0
    def run(d: org.apache.spark.sql.DataFrame, wc: org.apache.spark.sql.Column) =
      Sampling.weightedSample(d, col("doc_id"), wc, seed = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = run(docs, w)
    assert(kept.nonEmpty && kept.size < docs.count())
    // a pure function of (id, weight, seed): partitioning is irrelevant
    assert(run(docs.repartition(13), w) === kept)
    // per-row thresholds nest: lowering every weight only removes rows
    assert(run(docs, w * 0.5).subsetOf(kept))
    // weights clamp to [0, 1]
    assert(run(docs, lit(2.0)).size === docs.count())
    assert(run(docs, lit(-1.0)).isEmpty)
  }

  test("packSequences: greedy fill per shard matches a sequential oracle, partition-independent") {
    val rnd = new scala.util.Random(41)
    val rows = (0L until 300L).map(i => (i, 1L + rnd.nextInt(120).toLong))
    val df = spark.createDataFrame(rows).toDF("id", "t")
    val maxT = 100L
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(d, col("id"), col("t"), maxT, ord = col("id"),
        shards = 4, seed = 3L)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val got = run(df)
    // sequential oracle: group by the same ring shard, walk in id order
    def shardOf(id: Long): Int = {
      val p = 2147483647L; val a = 1103515245L; val b = 12345L
      val h1 = (((id % p + p) % p) * a + b) % p
      (((h1 + 3L) * a + b) % p % 4L).toInt
    }
    val expected = rows.groupBy { case (id, _) => shardOf(id) }.flatMap {
      case (sh, docs) =>
        var fill = 0L; var pid = 0L; var first = true
        docs.sortBy(_._1).map { case (id, t) =>
          if (first) { first = false; fill = t }
          else if (fill + t > maxT) { pid += 1; fill = t }
          else fill += t
          id -> ((sh, pid))
        }
    }
    assert(got === expected)
    // pure function of (ids, ord, seed): partitioning must not matter
    assert(run(df.repartition(13)) === got)
    // oversize docs isolate in their own pack
    val big = Seq((1L, 50L), (2L, 999L), (3L, 60L)).toDF("id", "t")
    val packs = Sampling.packSequences(big, col("id"), col("t"), 100L,
        ord = col("id"), shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((packs(2L) !== packs(1L)) && (packs(2L) !== packs(3L)))
    // a null token count fails loudly, naming the row
    val withNull = Seq((1L, Some(10L)), (2L, None)).toDF("id", "t")
    val err = intercept[Exception] {
      Sampling.packSequences(withNull, col("id"), col("t"), 100L,
        ord = col("id"), shards = 1).collect()
    }
    assert(err.getMessage.contains("negative token count") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("negative token count"))
    // a null doc id fails loudly too (it has no shard), not an NPE
    val nullId = Seq((Some(1L), 10L), (None, 20L)).toDF("id", "t")
    val errId = intercept[Exception] {
      Sampling.packSequences(nullId, col("id"), col("t"), 100L,
        ord = col("t"), shards = 1).collect()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(errId).exists(m => m != null && m.contains("null doc id")))
  }

  test("takePerStratum: exact count per stratum, nested across sizes, partition independent") {
    val d = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "lang")
    val s5 = Sampling.takePerStratum(d, col("id"), col("lang"), 5, seed = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s5.count(_._2 == "a") === 5 && s5.count(_._2 == "b") === 5)
    // nested: the 5-sample is inside the 9-sample for the same seed
    val s9 = Sampling.takePerStratum(d, col("id"), col("lang"), 9, seed = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s5.toSet.subsetOf(s9.toSet))
    // small strata are taken whole
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "lang")
    val all = Sampling.takePerStratum(tiny, col("id"), col("lang"), 10)
      .count()
    assert(all === 3)
    // partitioning does not change the winners
    val s5r = Sampling.takePerStratum(d.repartition(13), col("id"),
        col("lang"), 5, seed = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s5r.toSet === s5.toSet)
    // different seed, different winners (with overwhelming probability)
    val s5b = Sampling.takePerStratum(d, col("id"), col("lang"), 5, seed = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s5b.toSet !== s5.toSet)
    // a caller's own __graft_rn column survives untouched
    val carry = Sampling.takePerStratum(
        d.withColumn("__graft_rn", col("id") * 2),
        col("id"), col("lang"), 5, seed = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(carry.forall { case (id, c) => c === id * 2 })
    assert(carry.map(_._1).toSet === s5.map(_._1).toSet)
  }

  test("guards: zero-token stratum named; null weight drops the row on both engines") {
    // tokenMixtureFractions with a zero-total targeted stratum must
    // name the stratum instead of surfacing NaN downstream
    val err = intercept[IllegalArgumentException] {
      Sampling.tokenMixtureFractions(Map("a" -> 100L, "b" -> 0L),
        Map("a" -> 0.5, "b" -> 0.5), budget = 50L)
    }
    assert(err.getMessage.contains("b"))
    // null weight == weight 0.0: dropped, and identical to explicit 0.0
    val d = Seq((1L, Some(0.9)), (2L, None), (3L, Some(0.0)))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(d, col("id"), col("w"), seed = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L) && !kept.contains(3L))
    val asZero = Sampling.weightedSample(
        d.withColumn("w", coalesce(col("w"), lit(0.0))),
        col("id"), col("w"), seed = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === asZero)
  }

  test("shuffleShards: dense per-shard positions, partition/seed semantics") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.shuffleShards(df, col("doc_id"), numShards = 8, seed = seed)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val once = run(docs, 5L)
    // a permutation: shards in range, positions dense 0..count-1 per shard
    assert(once.forall { case (_, s, _) => s >= 0 && s < 8 })
    once.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // deterministic and partition-independent
    assert(run(docs, 5L).toSet === once.toSet)
    assert(run(docs.repartition(13), 5L).toSet === once.toSet)
    // a different seed reshuffles (different assignment for some doc)
    assert(run(docs, 6L).toSet !== once.toSet)
    // not the trivial identity order: within some shard, ascending pos
    // does not follow ascending doc_id
    val scrambled = once.groupBy(_._2).values.exists { rows =>
      val byPos = rows.sortBy(_._3).map(_._1).toSeq
      byPos !== byPos.sorted
    }
    assert(scrambled)
  }

  test("assignFolds: disjoint, exhaustive, roughly equal, growth-stable, partition-independent") {
    import spark.implicits._
    val d = (0L until 2000L).toDF("id")
    val folds = Sampling.assignFolds(d, col("id"), k = 5, seed = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    val sizes = folds.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.size === 5 && sizes.values.forall(s => s > 300 && s < 500))
    // stability: a row's fold doesn't change when the corpus grows
    val more = Sampling.assignFolds((0L until 4000L).toDF("id"),
        col("id"), k = 5, seed = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(folds.forall { case (id, f) => more(id) == f })
    // partition independence
    val rep = Sampling.assignFolds(d.repartition(7), col("id"), k = 5, seed = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rep === folds)
    intercept[IllegalArgumentException] {
      Sampling.assignFolds(d, col("id"), k = 1)
    }
  }

  test("repeatByFactor: exact whole copies, ring-decided fractional copy, nesting, null/zero drop") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, i % 5 match {
      case 0 => Some(2.0); case 1 => Some(0.0); case 2 => Some(2.5)
      case 3 => None; case _ => Some(0.5)
    })).toDF("id", "f")
    val out = Sampling.repeatByFactor(d, col("id"), col("f"), seed = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val counts = out.groupBy(_._1).view.mapValues(_.size).toMap
    // factor 2.0 → exactly 2 copies with indices 0,1
    assert((0L until 1000L by 5).forall(counts(_) == 2))
    assert(out.filter(_._1 == 0L).map(_._2).sorted.toSeq === Seq(0L, 1L))
    // factor 0 / null → absent
    assert((1L until 1000L by 5).forall(!counts.contains(_)))
    assert((3L until 1000L by 5).forall(!counts.contains(_)))
    // factor 2.5 → 2 or 3; the fractional share lands near half
    val c25 = (2L until 1000L by 5).map(counts(_))
    assert(c25.forall(c => c == 2 || c == 3))
    assert(c25.count(_ == 3) > 60 && c25.count(_ == 3) < 140)
    // nesting: every copy at factor f exists at factor f + 0.3
    val bigger = Sampling.repeatByFactor(d, col("id"),
        col("f") + 0.3, seed = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out.toSet.subsetOf(bigger))
  }

  test("temperatureTargets: tau=1 is natural proportions, large tau flattens, guards") {
    import graft.operators.Sampling
    val counts = Map("a" -> 800L, "b" -> 150L, "c" -> 50L)
    // tau = 1: weights are exactly the natural proportions
    val nat = Sampling.temperatureTargets(counts, tau = 1.0)
    assert(math.abs(nat("a") - 0.8) < 1e-12)
    assert(math.abs(nat("b") - 0.15) < 1e-12)
    assert(math.abs(nat("c") - 0.05) < 1e-12)
    // large tau approaches uniform
    val flat = Sampling.temperatureTargets(counts, tau = 1000.0)
    assert(flat.values.forall(v => math.abs(v - 1.0 / 3) < 1e-3))
    // tau = 2 sits between: tail source up-weighted, head down-weighted
    val mid = Sampling.temperatureTargets(counts, tau = 2.0)
    assert(mid("c") > nat("c") && mid("c") < flat("c") + 1e-3)
    assert(mid("a") < nat("a") && mid("a") > flat("a") - 1e-3)
    // weights always normalize to 1
    assert(math.abs(mid.values.sum - 1.0) < 1e-12)
    // guards
    intercept[IllegalArgumentException] {
      Sampling.temperatureTargets(counts, tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureTargets(Map("a" -> 0L), tau = 1.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureTargets(Map.empty[String, Long], tau = 1.0)
    }
  }
}
