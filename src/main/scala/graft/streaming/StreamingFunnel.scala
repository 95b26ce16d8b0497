package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming twin of the batch `EventQueries.funnel`: emit a row
  * the moment a user REACHES each funnel step, from an unbounded event
  * stream.
  *
  * Equivalence argument (the spec's contract): the batch funnel is the
  * conditional-min chain t₀ = min(ts: step₀), tᵢ = min(ts: stepᵢ ∧
  * ts > tᵢ₋₁ [∧ ts ≤ tᵢ₋₁+horizon]). Processing a user's events in
  * event-time order and GREEDILY taking the first event that qualifies
  * for the lowest incomplete step computes exactly that chain: the first
  * qualifying event in time order IS the min, and a strict `>` means an
  * event can never satisfy the step that its own timestamp anchors.
  * Events are sorted by (ts_us, event_id) within each micro-batch, so
  * intra-batch disorder is absorbed; CROSS-batch order is the source's
  * contract (same as [[StreamingSessions.sessionize]] — late events past
  * the micro-batch that advanced their user's chain would need the batch
  * operator to re-derive, which is the general streaming-vs-late-data
  * trade, not a defect of this fold).
  *
  * Scale shape: state is ONE fixed-size record per ever-seen user (k
  * longs — the per-step anchor timestamps), hash-partitioned by user
  * across executors; no timeout is registered because a funnel has no
  * natural horizon once complete (a production deployment with finite
  * `horizonUs` can evict state once the watermark passes the last
  * reachable anchor + horizon — noted, not implemented, to keep the
  * equivalence contract exact).
  *
  * Aggregating the emitted rows (count distinct user per step) equals
  * the batch funnel's counts — StreamingFunnelSpec's assertion. */
object StreamingFunnel {

  /** A user reaching funnel step `step_idx` (1-based) at `ts_us`. */
  case class StepReached(user_id: Long, step_idx: Int, step: String,
                         ts_us: Long)

  /** Per-user progress: anchor timestamp per step, -1 = unreached.
    * (Wrapped in a case class for a stable product encoder.) */
  case class Progress(reached: Array[Long])

  def funnelSteps(events: DataFrame,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  horizonUs: Long = 0L): Dataset[StepReached] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"),
        col("event_id").cast("long").as("event_id"))
      .as[(Long, Long, String, Long)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Progress, StepReached](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, String, Long)],
         state: GroupState[Progress]) =>
          val evs = it.toArray.sortBy(t => (t._2, t._4))
          val st = state.getOption.map(_.reached.clone())
            .getOrElse(Array.fill(steps.length)(-1L))
          val out = Seq.newBuilder[StepReached]
          evs.foreach { case (_, ts, tpe, _) =>
            // lowest incomplete step this event qualifies for; at most
            // one state change per event (strict > excludes the rest)
            var j = 0
            var applied = false
            while (j < steps.length && !applied) {
              val qualifies = st(j) < 0 && steps(j) == tpe &&
                (j == 0 || (st(j - 1) >= 0 && ts > st(j - 1) &&
                  (horizonUs <= 0L || ts <= st(j - 1) + horizonUs)))
              if (qualifies) {
                st(j) = ts
                out += StepReached(user, j + 1, s"${j + 1}_${steps(j)}", ts)
                applied = true
              }
              j += 1
            }
          }
          state.update(Progress(st))
          out.result().iterator
      }
  }
}
