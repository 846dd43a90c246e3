package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming beyond the reference surface (the reference is
  * processing-time only, SURVEY.md §2.10): watermarked tumbling-window
  * aggregation and custom keyed state via flatMapGroupsWithState — the two
  * Structured Streaming primitives a production ingest pipeline needs for
  * late-data handling and bespoke per-key state. Input shape mirrors the
  * `events` table (ts, event_type) replayed as a stream.
  */
object EventTime {

  /** Tumbling-window counts per event type with a watermark: late rows beyond
    * `lateness` are dropped and their windows finalized (enabling append-mode
    * sinks and bounded state at scale). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Streaming daily-active-users: EXACT distinct users per event-time
    * window, as a two-stage streaming pipeline — dedup on
    * (user, day-WINDOW), then a windowed count of the survivors.
    *
    * The dedup key deliberately includes the day *window column* (not a
    * plain derived day scalar): a window key's state is evicted only when
    * the watermark passes the window END, so a user's (user, day) row
    * survives the entire day and every same-day re-arrival deduplicates —
    * exactly once per user-day reaches the count. The previous shape
    * (`dropDuplicatesWithinWatermark("user_id", "day")` under a raw-ts
    * watermark) evicted a user's state `lateness` after their FIRST event
    * and double-counted an evening return (caught by ScratchDauSpec:
    * morning + evening activity of one user read as DAU 2, not 1).
    * State stays bounded: |active users per in-flight day|, closed days
    * evicted by the watermark; exact (not approx_count_distinct) — the
    * streaming twin of the batch distinct user-day table (q_stickiness's
    * first stage). */
  def dauStream(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .select(window(col("ts"), "1 day").as("w"), col("user_id"))
      .dropDuplicates("user_id", "w")
      // second stateful stage: window-on-window chaining — the agg groups
      // by the same day window, finalizing each day for append sinks once
      // the watermark passes its end
      .groupBy(col("w"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").as("day"), col("dau"))

  /** Hopping (sliding) window counts: `window(ts, width, slide)` replicates
    * each event into width/slide overlapping windows — the streaming twin of
    * the batch [[graft.operators.Relational.eventsHopping]]. Watermark
    * finalizes a window once event time passes its end + lateness, so state
    * is bounded by (width/slide) · in-flight windows at any throughput. */
  def hoppingCounts(events: DataFrame, width: String = "20 minutes",
                    slide: String = "10 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Session windows per user: gap-based sessionization as a STREAMING
    * operator (`session_window`), the event-time twin of the batch
    * [[graft.operators.Relational.sessionize]]. Watermark bounds session
    * state; a session closes `gap` after its last event. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("user_id"), col("n_events"))

  /** Streaming dedup with bounded state: drop duplicate event ids where the
    * duplicate arrives within the watermark delay of the original —
    * `dropDuplicatesWithinWatermark` keeps state only for the watermark
    * horizon instead of forever (the only dedup that survives an unbounded
    * stream). */
  def dedupWithinWatermark(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join — the attribution shape (pair
    * each click with the same user's conversions landing within `maxDelay`
    * after it). Both sides carry watermarks and the join predicate bounds
    * the event-time distance, so each side's buffered state is limited to
    * the watermark + interval horizon — the only stream-stream join that
    * runs unbounded at scale. Inner join: unmatched rows age out of state
    * and emit nothing. */
  def intervalJoin(clicks: DataFrame, convs: DataFrame,
                   maxDelay: String = "30 minutes",
                   lateness: String = "10 minutes"): DataFrame =
    clicks.withWatermark("ts", lateness).alias("c")
      .join(
        convs.withWatermark("ts", lateness).alias("v"),
        expr(s"""c.user_id = v.user_id AND
                 v.ts >= c.ts AND v.ts <= c.ts + interval $maxDelay"""))
      .select(col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("v.ts").as("conv_ts"))

  /** Left-outer watermarked stream-stream join — the attribution shape
    * when the UNCONVERTED clicks are the point (funnel drop-off, ad-spend
    * reconciliation): same bounded-state interval join as [[intervalJoin]],
    * but a click whose interval closes under the advancing watermark with
    * no conversion EMITS with a null conversion time instead of aging out
    * silently. The null-padded row can only be produced once the watermark
    * proves no match can still arrive — which is why the outer side's
    * emission lags by the watermark delay, the documented latency/
    * completeness trade of outer stream joins. State bounds are identical
    * to the inner form. */
  def intervalJoinLeftOuter(clicks: DataFrame, convs: DataFrame,
                            maxDelay: String = "30 minutes",
                            lateness: String = "10 minutes"): DataFrame =
    clicks.withWatermark("ts", lateness).alias("c")
      .join(
        convs.withWatermark("ts", lateness).alias("v"),
        expr(s"""c.user_id = v.user_id AND
                 v.ts >= c.ts AND v.ts <= c.ts + interval $maxDelay"""),
        "leftOuter")
      .select(col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("v.ts").as("conv_ts"))

  /** Stream-static broadcast enrichment — the "join the stream with
    * reference data" shape: every micro-batch hash-joins against the
    * static dimension, explicitly broadcast (dims are small next to the
    * stream by premise). No state store is involved — unlike stream-stream
    * joins there is no watermark horizon to size — and the static side is
    * re-resolved per batch, so a dim backed by a re-readable source
    * refreshes between batches. Left join: events with no dim row pass
    * through with nulls rather than silently dropping. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  final case class ItemEvent(item: Long, ts: java.sql.Timestamp)
  final case class ItemRunning(item: Long, total: Long, batches: Long)

  /** Custom keyed state: running per-item totals via flatMapGroupsWithState —
    * the mergeable-state shape the reference's driver-side dicts
    * (`big_data_computing_3.py:65-68`) take when state must shard across
    * executors instead of living on one driver thread. Emits the updated
    * running row for every key touched in a batch; state is per-key constant
    * size, so it scales with distinct keys, not stream length. */
  final case class UserEvent(user_id: Long, event_id: Long,
                             event_type: String, value: Double, ts: Long)
  final case class UserProfile(user_id: Long, last_event_id: Long,
                               last_type: String, last_value: Double,
                               ts: Long, n_merges: Long)

  /** Streaming SCD-1 upsert: the mapGroupsWithState twin of
    * [[graft.operators.Relational.userProfileUpsert]] — per-user latest-event
    * profiles maintained continuously instead of batch-merged. Each batch
    * folds its events into the stored profile by (ts, event_id) max, so
    * arrival order (within and across batches) cannot change the converged
    * state: after any replay of the same event set, the state equals the
    * batch latest-per-key window exactly (asserted in EventTimeSpec).
    * State is one profile row per user — scales with distinct keys, never
    * stream length; `n_merges` counts the batches that touched the key (the
    * emit ordinal a memory-sink reader needs to pick the final row). */
  def profileUpsertStream(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserProfile]) =>
          val prev = state.getOption
          val cands = prev.iterator ++ batch.map(e =>
            UserProfile(uid, e.event_id, e.event_type, e.value, e.ts, 0L))
          val best = cands.maxBy(p => (p.ts, p.last_event_id))
          val next = best.copy(
            n_merges = prev.map(_.n_merges).getOrElse(0L) + 1L)
          state.update(next)
          next
      }
  }

  final case class FunnelProgress(user_id: Long, t_view: Long, t_click: Long,
                                  t_purchase: Long, depth: Long, n_updates: Long)

  /** Streaming conversion funnel: the per-user stage state machine of
    * [[graft.operators.Relational.funnelOf]] maintained continuously —
    * first view, first click strictly after it, first purchase strictly
    * after that. State is 3 longs per user who has viewed, never the event
    * history, so it scales with distinct users at any stream length.
    *
    * Ordering contract: stages only ADVANCE (a funnel is monotone), so the
    * stream must deliver each user's events in event-time order ACROSS
    * batches — the watermark discipline every funnel deployment runs.
    * WITHIN a batch, arrival order is irrelevant: the fold sorts the
    * group's events by (ts, event_id) before advancing, so micro-batch
    * carving cannot change the converged state (EventTimeSpec replays the
    * same stream under different carvings against the batch funnel). */
  def funnelStream(events: Dataset[UserEvent]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[FunnelProgress]) =>
          val prev = state.getOption
            .getOrElse(FunnelProgress(uid, -1L, -1L, -1L, 0L, 0L))
          var tv = prev.t_view
          var tc = prev.t_click
          var tp = prev.t_purchase
          batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val t = e.ts / 1000L // µs, the batch twin's resolution
            e.event_type match {
              case "view" if tv == -1L => tv = t
              case "click" if tv != -1L && tc == -1L && t > tv => tc = t
              case "purchase" if tc != -1L && tp == -1L && t > tc => tp = t
              case _ => // stage already reached, out of sequence, or other type
            }
          }
          if (tv == -1L) Iterator.empty // no view yet: not in the funnel
          else {
            val depth = 1L + (if (tc != -1L) 1L else 0L) +
              (if (tp != -1L) 1L else 0L)
            val next = FunnelProgress(uid, tv, tc, tp, depth,
              prev.n_updates + 1L)
            state.update(next)
            Iterator.single(next)
          }
      }
  }

  def runningCounts(items: Dataset[ItemEvent]): Dataset[ItemRunning] = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .groupByKey(_.item)
      .flatMapGroupsWithState[ItemRunning, ItemRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (item: Long, batch: Iterator[ItemEvent], state: GroupState[ItemRunning]) =>
          val prev = state.getOption.getOrElse(ItemRunning(item, 0L, 0L))
          val add = batch.size
          val next = ItemRunning(item, prev.total + add, prev.batches + 1L)
          state.update(next)
          Iterator.single(next)
      }
  }
}
