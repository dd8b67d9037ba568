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
}
