package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest deduplication — the unbounded twin of
  * [[graft.operators.Snapshot.dedupAgainst]]'s batch screen: keep the
  * FIRST arrival of each content fingerprint, drop re-arrivals within
  * the watermark horizon. State is the fingerprint set of the horizon
  * only (`dropDuplicatesWithinWatermark` reaps keys older than the
  * watermark), so memory is bounded by ingest rate × delay, not
  * corpus size — the property that makes exact dedup viable on an
  * unbounded crawl feed. Re-arrivals OUTSIDE the horizon pass (they
  * are a batch concern: run the snapshot screen against the
  * accumulated corpus downstream — the standard two-tier layout).
  *
  * Composes with the projection-form signatures the batch family
  * exposes ([[graft.operators.Dedup.withMinHashSignature]],
  * [[graft.functions.TextFunctions.normalizeForDedup]] /
  * `fingerprint`): every key below is a row-local expression, so the
  * stream plan stays a projection + the dedup operator, no joins.
  */
object StreamDedup {

  /** Drop rows whose `key` already arrived within the watermark
    * horizon. `ts` must be the event-time column name; `delay` is the
    * watermark (e.g. "10 minutes"). Works on batch frames too (the
    * watermark is a no-op there and the dedup is global).
    */
  def dedupWithinWatermark(df: DataFrame, key: Column, ts: String,
      delay: String): DataFrame =
    df.withColumn("__graft_dedup_key", key)
      .withWatermark(ts, delay)
      .dropDuplicatesWithinWatermark("__graft_dedup_key")
      .drop("__graft_dedup_key")

  /** The standard text-ingest screen: md5 of the canonical
    * normalization (case/punctuation/whitespace variants collapse —
    * the [[graft.functions.TextFunctions.normalizeForDedup]] recipe)
    * as the fingerprint.
    */
  def dedupTextWithinWatermark(df: DataFrame, text: Column, ts: String,
      delay: String): DataFrame =
    dedupWithinWatermark(df,
      md5(graft.functions.TextFunctions.normalizeForDedup(text)), ts, delay)
}
