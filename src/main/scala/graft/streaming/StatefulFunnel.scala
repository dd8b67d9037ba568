package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** One step-type event for funnel tracking: `ts2` is the event-time
  * timestamp (watermark column), `ts_us` the same instant in integer
  * microseconds, `step` the 0-based funnel step index.
  */
case class FunnelEvent(user_id: Long, ts2: java.sql.Timestamp,
    ts_us: Long, step: Int)

/** A funnel progress report: completion times (micros, null-free
  * prefix of length `steps_completed`) padded with -1 sentinels so the
  * row is a flat fixed-width record.
  */
case class FunnelProgress(user_id: Long, steps_completed: Int,
    step_ts: Seq[Long], complete: Boolean)

private[streaming] case class FunnelProg(done: Int, times: List[Long],
    lastUs: Long)

/** Real-time conversion-funnel tracking via `flatMapGroupsWithState` —
  * the streaming twin of [[graft.operators.Funnel.funnel]] (same
  * greedy-earliest semantics, same optional max step gap). Emits a
  * user's progress row the moment the funnel COMPLETES, and a partial
  * progress row when a user goes idle past `idleUs` (event-time
  * timeout) — so dashboards see conversions immediately and
  * abandonment after the idle horizon, with state reaped in both
  * cases.
  *
  * Scale: state is one fixed-width record (k longs + 2 ints) per
  * in-flight user, partitioned across executors; completed and
  * idle-timed-out users leave state, so state size tracks users
  * mid-funnel, not history. Within a batch events process in
  * event-time order; across batches the watermark drops stragglers —
  * the [[StatefulSessions]] contract.
  */
object StatefulFunnel {

  /** Normalize the raw `events` frame into the typed step stream:
    * rows whose `event_type` is not a funnel step are dropped
    * MAP-SIDE (they never reach state).
    */
  def fromEvents(df: DataFrame, steps: Seq[String]): Dataset[FunnelEvent] = {
    import df.sparkSession.implicits._
    require(steps.nonEmpty, "no funnel steps given")
    require(steps.distinct.size == steps.size,
      s"duplicate step types: $steps")
    val in = EventStreams.withEventTime(df)
    val tsUs = df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts"))
    }
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col("event_type") === s, lit(i)).otherwise(acc)
    }
    in.select(col("user_id").cast("long").as("user_id"), col("ts2"),
        tsUs.cast("long").as("ts_us"), stepIdx.as("step"))
      .filter(col("step") >= 0)
      .as[FunnelEvent]
  }

  /** Track k-step funnels. Batch mode (`streaming = false`) emits
    * every user's final progress (complete or not — all data is
    * present); streaming mode emits completions immediately and
    * partial progress via the idle timeout. Callers must set
    * `.withWatermark("ts2", ...)` upstream in streaming mode.
    */
  def track(events: Dataset[FunnelEvent], k: Int,
      maxGap: Option[Long] = None, idleUs: Long = 3600000000L,
      streaming: Boolean = true): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    require(idleUs > 0, s"idleUs must be positive, got $idleUs")
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def report(uid: Long, s: FunnelProg): FunnelProgress =
      FunnelProgress(uid, s.done,
        s.times.reverse.padTo(k, -1L), complete = s.done == k)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProg, FunnelProgress](
        OutputMode.Append(), timeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelProg]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(report(uid, _))
            state.remove()
            out.iterator
          } else {
            val evs = it.toArray.sortBy(e => (e.ts_us, e.step))
            var prog = state.getOption.getOrElse(FunnelProg(0, Nil, Long.MinValue))
            var completed: Option[FunnelProgress] = None
            for (e <- evs if completed.isEmpty) {
              val gapOk = maxGap.forall(g =>
                prog.done == 0 || e.ts_us <= prog.times.head + g)
              if (e.step == prog.done && prog.done < k && gapOk) {
                prog = FunnelProg(prog.done + 1, e.ts_us :: prog.times,
                  math.max(prog.lastUs, e.ts_us))
                if (prog.done == k) completed = Some(report(uid, prog))
              } else {
                prog = prog.copy(lastUs = math.max(prog.lastUs, e.ts_us))
              }
            }
            if (streaming) {
              completed match {
                case Some(c) => state.remove(); Iterator(c)
                case scala.None =>
                  state.update(prog)
                  state.setTimeoutTimestamp(prog.lastUs / 1000 + idleUs / 1000 + 1)
                  Iterator.empty
              }
            } else {
              state.remove()
              Iterator(completed.getOrElse(report(uid, prog)))
            }
          }
      }
  }
}
