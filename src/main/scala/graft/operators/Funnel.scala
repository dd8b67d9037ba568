package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Conversion-funnel analytics over an event log — the standard
  * product-analytics question ("of the users who viewed, how many
  * then clicked, then purchased?") as ONE aggregation. No reference
  * counterpart; designed Spark-first.
  */
object Funnel {

  /** Earliest completion time of each funnel step per entity, where
    * step i+1 must occur at-or-after step i's completion (ties at the
    * same timestamp resolve in step order), optionally within
    * `maxGap` time units of it (`ts` units; a TimestampType ts is
    * converted to integer MICROSECONDS, so maxGap is micros there). Returns one row per entity that has
    * at least one step-type event:
    * `(entity, step_1_ts … step_k_ts, steps_completed)` — incomplete
    * steps are null, `steps_completed` counts the filled prefix.
    *
    * Greedy-earliest semantics: each step completes at the first
    * qualifying event after the previous step; equivalently
    * `t_{i+1} = min{ts : type = step_{i+1}, ts ≥ t_i (, ts ≤ t_i +
    * maxGap)}` — the relational formulation the oracle uses.
    *
    * Distributed shape: filter to step-type events (map-side — other
    * event types never shuffle), ONE groupBy(entity) collecting the
    * per-entity step events, then a row-local sorted fold computes
    * all k completion times — one shuffle total, versus the k
    * join+agg rounds of the naive chained formulation. Per-entity
    * state is its step-type event list; if one entity can hold
    * millions of step events, pre-thin with
    * [[RollingOps.groupNearbyMembers]]-style sessionization or a
    * per-(entity, type) min — the funnel itself only ever needs the
    * first qualifying event per step.
    */
  def funnel(df: DataFrame, entity: Column, ts: Column, eventType: Column,
      steps: Seq[String], maxGap: Option[Long] = None,
      outPrefix: String = "step"): DataFrame = {
    require(steps.nonEmpty, "no funnel steps given")
    require(steps.distinct.size == steps.size,
      s"duplicate step types: $steps — a type may appear once")
    val k = steps.size
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(eventType === s, lit(i)).otherwise(acc)
    }
    // a timestamp cast to long is SECONDS in Spark — a silent
    // precision loss; convert via unix_micros instead, so timestamp
    // callers get microsecond ordering like every numeric caller
    val tsL = df.select(ts.as("__t")).schema.head.dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(ts)
      case _ => ts.cast("long")
    }
    val ev = df.select(entity.as("entity"), tsL.as("__ts"),
        stepIdx.as("__si"))
      .filter(col("__si") >= 0 && col("__ts").isNotNull)
    val sorted = sort_array(F.collect_list(struct(col("__ts"), col("__si"))))
    val init = struct(lit(0).as("done"),
      array_repeat(lit(null).cast("long"), k).as("times"))
    val folded = F.aggregate(sorted, init, (acc, e) => {
      val done = acc.getField("done")
      val times = acc.getField("times")
      val t = e.getField("__ts")
      val si = e.getField("__si")
      val gapOk = maxGap match {
        case Some(g) =>
          done === 0 || t <= element_at(times, done) + lit(g)
        case None => lit(true)
      }
      // events arrive ts-ascending, so t >= every recorded time; the
      // next step advances iff this event IS that step (and in gap)
      when(si === done && done < k && gapOk,
        struct((done + 1).as("done"),
          F.transform(sequence(lit(1), lit(k)),
            i => when(i === done + 1, t).otherwise(element_at(times, i)))
            .as("times")))
        .otherwise(acc)
    })
    val agg = ev.groupBy(col("entity")).agg(folded.as("__f"))
    val stepCols = (1 to k).map(i =>
      element_at(col("__f").getField("times"), i).as(s"${outPrefix}_${i}_ts"))
    agg.select(col("entity") +: stepCols :+
      col("__f").getField("done").as("steps_completed"): _*)
  }
}
