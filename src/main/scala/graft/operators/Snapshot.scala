package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Corpus snapshot versioning — the incremental-pipeline surface a
  * periodically-rebuilt 100 TB training corpus needs: what changed
  * between two snapshots, and dedup of a NEW batch against an
  * already-published corpus (no reference counterpart; designed
  * Spark-first).
  *
  * Both operators key on a caller-supplied content fingerprint (any
  * deterministic expression — `md5(text)`, a normalized-text hash,
  * a minhash band slice), so "same document" is the caller's policy,
  * not this module's.
  */
object Snapshot {

  /** Row-level diff of two corpus snapshots keyed on `id`: one output
    * row per document present in either side, with
    * `status ∈ {added, removed, changed, unchanged}` and both sides'
    * fingerprints (null where absent).
    *
    * Distributed shape: each side collapses to (id, fingerprint) —
    * column-pruned straight off the scan, the text itself is never
    * shuffled — then ONE full-outer hash equijoin on id (both sides
    * co-partition; AQE handles skew splits). No driver state, no
    * broadcast assumption: both snapshots may be 100 TB.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, id: Column,
      fingerprint: Column): DataFrame = {
    val o = oldDf.select(id.as("doc_id"), fingerprint.as("old_fp"))
    val n = newDf.select(id.as("doc_id"), fingerprint.as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** [[corpusDiff]] rolled up to one row per status (the report a
    * snapshot-promotion job logs): document counts per status.
    */
  def corpusDiffSummary(oldDf: DataFrame, newDf: DataFrame, id: Column,
      fingerprint: Column): DataFrame =
    corpusDiff(oldDf, newDf, id, fingerprint)
      .groupBy(col("status"))
      .agg(F.count(lit(1)).as("n_docs"))

  /** Incremental exact dedup: the rows of `batch` whose `key` does not
    * appear in the prior corpus — "only ingest what the published
    * corpus doesn't already have". The prior side collapses to its
    * DISTINCT keys (partial-aggregated map-side before the exchange),
    * then a LEFT ANTI hash join on the key: both sides shuffle once on
    * the key, nothing is quadratic, and `batch`'s payload columns ride
    * the join untouched. Set `broadcastPrior = true` when the prior
    * key set is small enough to broadcast (the batch then never
    * shuffles at all); for a 100 TB prior corpus leave it false, or
    * use [[dedupAgainstBloom]] for a constant-size probe.
    */
  def dedupAgainst(batch: DataFrame, batchKey: Column,
      prior: DataFrame, priorKey: Column,
      broadcastPrior: Boolean = false): DataFrame = {
    val keys = prior.select(priorKey.as("__graft_prior_key")).distinct()
    val probe = if (broadcastPrior) F.broadcast(keys) else keys
    batch.join(probe, batchKey === col("__graft_prior_key"), "left_anti")
  }

  /** Bloom filter over the prior corpus's distinct keys — the probe
    * side of [[dedupAgainstBloom]] when the prior key set is too large
    * to broadcast or must ship to a stream: KB–MB at any fpp
    * regardless of corpus size. Built distributed
    * (`stat.bloomFilter` tree-aggregates per-partition sketches); pass
    * `expectedItems` to stay action-free (otherwise one documented
    * distinct-count probe sizes the sketch).
    */
  def priorKeyBloom(prior: DataFrame, priorKey: Column,
      fpp: Double = 1e-6,
      expectedItems: Option[Long] = scala.None): org.apache.spark.util.sketch.BloomFilter = {
    val keys = prior.select(priorKey.cast("string").as("__graft_prior_key"))
    val items = expectedItems.getOrElse(keys.distinct().count())
    keys.stat.bloomFilter("__graft_prior_key", math.max(items, 1L), fpp)
  }

  /** Incremental dedup against a CONSTANT-size sketch of the prior
    * corpus: keep batch rows whose key is (probably) not already
    * published. A pure projection + filter over the batch scan — no
    * join, no shuffle, no state — so it runs identically on an
    * unbounded ingest stream. Error is one-sided the SAFE way for
    * dedup: a true duplicate is NEVER kept (the sketch has no false
    * negatives); a false positive drops a genuinely-new row at the
    * sketch's fpp rate — size `fpp` to the acceptable ingest loss.
    * Reuses the codegen'd
    * [[org.apache.spark.sql.graft.BloomAnyContain]] probe over a
    * one-element array, so the membership test stays inside
    * WholeStageCodegen.
    */
  def dedupAgainstBloom(batch: DataFrame, batchKey: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    batch.filter(!org.apache.spark.sql.graft.BloomExpressions.bloomAnyContain(
      array(batchKey.cast("string")), bloom))
}
