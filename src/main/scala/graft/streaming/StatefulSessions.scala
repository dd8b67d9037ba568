package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Event payload for stateful sessionization: `ts2` is the event-time
  * timestamp (watermark column on streams), `ts_us` the same instant
  * in integer microseconds (the arithmetic column — no ms truncation).
  */
case class SessionEvent(user_id: Long, ts2: java.sql.Timestamp,
    ts_us: Long, value: Double)

/** One closed (or, in batch mode, final) session. */
case class UserSession(user_id: Long, session_start_us: Long,
    session_end_us: Long, n: Long, sum_value: Double)

private[streaming] case class OpenSession(startUs: Long, lastUs: Long,
    n: Long, sum: Double)

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * explicit-state twin of [[EventStreams.sessions]] and the streaming
  * form of the reference's `group_nearby_members`
  * (`/root/reference/pandas_plus/groupby/core.py:1891`,
  * `numba.py:1021`). Unlike `session_window`, the split rule is the
  * reference's exactly: a new session starts when the gap is
  * *strictly greater* than `gapUs` (`numba.py:1045`), and arbitrary
  * extra state rules (session caps, custom folds) can be added.
  *
  * Scale: state is one `OpenSession` (4 scalars) per active user key,
  * partitioned by user across executors; closed sessions stream out
  * incrementally (Append mode) and state for idle users is reaped by
  * the event-time timeout, so state size tracks *concurrently active*
  * users, not history.
  */
object StatefulSessions {

  /** Normalize the raw `events` frame (nanos-as-long or timestamp ts)
    * into the typed event stream.
    */
  def fromEvents(df: DataFrame): Dataset[SessionEvent] = {
    import df.sparkSession.implicits._
    val in = EventStreams.withEventTime(df)
    val tsUs = df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts"))
    }
    in.select(col("user_id").cast("long").as("user_id"), col("ts2"),
        tsUs.cast("long").as("ts_us"), col("value").cast("double").as("value"))
      .as[SessionEvent]
  }

  /** Sessionize. Batch mode (`streaming = false`) emits every session
    * including each user's final one (all data is present, so it is
    * complete). Streaming mode emits a session only once it is closed —
    * by a later event or by the event-time timeout firing after the
    * watermark passes `lastEvent + gapUs`; callers must set
    * `.withWatermark("ts2", ...)` upstream.
    */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      streaming: Boolean): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def close(uid: Long, s: OpenSession): UserSession =
      UserSession(uid, s.startUs, s.lastUs, s.n, s.sum)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append(), timeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _))
            state.remove()
            out.iterator
          } else {
            // sort this batch's rows by event time; cross-batch
            // stragglers older than the watermark were already dropped
            val evs = it.toArray.sortBy(_.ts_us)
            val closed = scala.collection.mutable.ArrayBuffer[UserSession]()
            var open = state.getOption
            for (e <- evs) {
              open = open match {
                case Some(s) if e.ts_us - s.lastUs > gapUs =>
                  closed += close(uid, s)
                  Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
                case Some(s) =>
                  Some(OpenSession(math.min(s.startUs, e.ts_us),
                    math.max(s.lastUs, e.ts_us), s.n + 1, s.sum + e.value))
                case scala.None =>
                  Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            if (streaming) {
              open.foreach { s =>
                state.update(s)
                // µs → ms, rounding up so the timeout never fires early
                state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000 + 1)
              }
              closed.iterator
            } else {
              state.remove()
              (closed ++ open.map(close(uid, _))).iterator
            }
          }
      }
  }
}
