package graft.streaming

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType

/** Structured-Streaming-shaped aggregations over the `events` table.
  * Each transform works identically on a batch DataFrame (driver
  * correctness queries) and a streaming DataFrame (`readStream` →
  * same call → `writeStream`), which is the point: the streaming
  * extension of the reference's session logic (`group_nearby_members`)
  * is `session_window`, and tumbling/sliding aggregation is
  * `window()` — SURVEY §2.9.
  *
  * On a stream, add `.withWatermark("ts2", horizon)` before the
  * grouping to bound state (late data beyond the horizon is dropped);
  * watermarking is a no-op in batch, so [[withEventTime]] leaves it to
  * the caller.
  */
object EventStreams {

  /** Normalize the ts column to a proper timestamp: the testdata
    * stores TIMESTAMP(NANOS), which arrives as long nanos under the
    * `nanosAsLong` flag, or as a (µs) timestamp otherwise.
    */
  def withEventTime(df: DataFrame, ts: String = "ts",
      out: String = "ts2"): DataFrame =
    df.schema(ts).dataType match {
      // integer division: nanos exceed 2^53, a double `/` would lose µs
      case LongType => df.withColumn(out, timestamp_micros(expr(s"$ts div 1000")))
      case _        => df.withColumn(out, col(ts))
    }

  /** Tumbling-window aggregation: counts + exact sum per (window,
    * event_type).
    */
  def tumbling(df: DataFrame, duration: String,
      exact: Boolean = true): DataFrame = {
    val in = withEventTime(df)
    val sum = if (exact) Num.exactSum(col("value")) else F.sum(col("value"))
    in.groupBy(window(col("ts2"), duration).as("w"), col("event_type"))
      .agg(F.count(lit(1)).as("n"), sum.as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Sliding-window variant (overlapping windows). */
  def sliding(df: DataFrame, duration: String, slide: String): DataFrame = {
    val in = withEventTime(df)
    in.groupBy(window(col("ts2"), duration, slide).as("w"), col("event_type"))
      .agg(F.count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))
  }

  /** Session-window aggregation per user — the streaming twin of
    * `RollingOps.groupNearbyMembers`. Boundary semantics: Spark's
    * `session_window` starts a new session when the gap is >= `gap`,
    * while `groupNearbyMembers` splits only when strictly greater
    * (the reference semantic) — the two differ exactly at gap ==
    * threshold, measure-zero for continuous timestamps.
    */
  def sessions(df: DataFrame, gap: String): DataFrame = {
    val in = withEventTime(df)
    in.groupBy(session_window(col("ts2"), gap).as("w"), col("user_id"))
      .agg(F.count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))
  }
}
