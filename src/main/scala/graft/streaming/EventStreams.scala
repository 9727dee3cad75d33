package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Windowed event-time analytics over the `events` stream table —
  * tumbling, sliding, and session windows, each usable in BOTH batch
  * (the declared oracle queries) and Structured Streaming (the
  * `*Stream` variants add a watermark; the aggregation expressions are
  * shared, so batch results are the streaming results at watermark ∞).
  *
  * The reference is pure batch (SURVEY §1.4) — this is the §7.5
  * extension surface.
  *
  * Timestamps: `events.ts` arrives as int64 epoch-NANOseconds
  * (Tables.scala nanosAsLong). Conversion to TimestampType must use
  * integral division — `ts/1000` in double loses precision above 2⁵³ ns
  * (≈ 1970+104 days), silently shifting events between windows. */
object EventStreams {

  /** Exact epoch-nanos `ts` → TimestampType (microsecond precision).
    * `div` is INTEGRAL division — `ts / 1000` would promote to double
    * and round above 2⁵³ ns. */
  private val EventTimeExpr = "timestamp_micros(ts div 1000)"

  /** Tumbling-window counts + exact value sums per event_type.
    * Epoch-aligned `width` windows; output keys on the window start
    * (epoch seconds — engine-portable). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour")
      : DataFrame =
    events
      .withColumn("event_time", expr(EventTimeExpr))
      .groupBy(window(col("event_time"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.functions.Exact.sumCents(col("value")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("event_type"), col("n_events"),
              (col("sum_cents").cast("double") / 100.0).as("sum_value"))

  /** Sliding-window mean value per event_type (window `width`, stride
    * `slide`): each event lands in width/slide windows — Spark expands
    * via its internal window generator, no self-join needed. */
  def slidingAvg(events: DataFrame, width: String = "1 hour",
                 slide: String = "15 minutes"): DataFrame =
    events
      .withColumn("event_time", expr(EventTimeExpr))
      .groupBy(window(col("event_time"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.functions.Exact.sumCents(col("value")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("event_type"), col("n_events"),
              graft.functions.Exact.avgFromCents(col("sum_cents"),
                col("n_events")).as("avg_value"))

  /** Session windows per user: events closer than `gap` merge. Session
    * start reported in epoch seconds. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes")
      : DataFrame =
    events
      .withColumn("event_time", expr(EventTimeExpr))
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_timestamp(col("session_window.start"))
                .as("session_start_s"),
              col("n_events"))

  // --- streaming variants -------------------------------------------------

  /** Streaming tumbling counts: the SAME aggregation expressions as the
    * batch [[tumblingCounts]] (exact integer-cents sums, same output
    * shape) plus a watermark so state for closed windows is dropped
    * (append-mode emittable). Input must already carry an `event_time`
    * TimestampType column. */
  def tumblingCountsStream(stream: DataFrame, width: String = "1 hour",
                           watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.functions.Exact.sumCents(col("value")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("event_type"), col("n_events"),
              (col("sum_cents").cast("double") / 100.0).as("sum_value"))

  /** Streaming EXACT dedup on ingest: drops rows whose `keyCols` were
    * already seen, keeping state only within the watermark horizon —
    * the streaming face of `graft.dedup.Dedup.dropExactDuplicates`
    * (state for a key is evicted once the watermark passes it, so the
    * store is bounded by the horizon's key cardinality, not the
    * stream's). Input needs an `event_time` TimestampType column. */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream temporal join: each left event joined to same-key
    * right events within `(right_time ∈ [left_time − horizon,
    * left_time]]` — the streaming face of [[graft.ops.AsOf]]'s bounded
    * lookback. BOTH sides carry watermarks and the join condition
    * bounds event-time distance, so Spark derives state-cleanup
    * thresholds for both buffers (unbounded state otherwise — a
    * stream-stream join without a time bound never evicts). Inputs
    * need `user_id` and an `event_time` TimestampType column. */
  def temporalJoinStream(left: DataFrame, right: DataFrame,
                         horizon: String = "5 minutes",
                         watermark: String = "1 hour"): DataFrame = {
    val l = left
      .select(col("user_id"), col("event_time").as("l_time"),
              col("value").as("l_value"))
      .withWatermark("l_time", watermark)
    val r = right
      .select(col("user_id").as("r_user_id"),
              col("event_time").as("r_time"),
              col("value").as("r_value"))
      .withWatermark("r_time", watermark)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_time") <= col("l_time") &&
        col("r_time") >= col("l_time") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("l_time"), col("l_value"),
              col("r_time"), col("r_value"))
  }

  // --- custom state (KeyValueGroupedDataset.mapGroupsWithState) -----------

  final case class UserEvent(user_id: Long,
                             event_time: java.sql.Timestamp,
                             value: Double)
  final case class UserRunning(n_events: Long, total_value: Double,
                               max_value: Double)
  final case class UserStats(user_id: Long, n_events: Long,
                             total_value: Double, max_value: Double)

  /** Per-user running aggregate with EXPLICIT state — the
    * `mapGroupsWithState` escape hatch for semantics the declarative
    * window aggregates can't express (custom accumulators, decay,
    * conditional resets). State is one small case class per user in the
    * state store; each micro-batch folds its events into it and emits
    * the updated stats row (OutputMode.Update). Works identically on a
    * batch Dataset (each group seen once, state used within the call).
    *
    * At scale the state store shards by the grouping key across
    * executors; nothing here is driver-side. */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserStats](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent],
         state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(0L, 0.0, Double.MinValue))
          var n = prev.n_events
          var total = prev.total_value
          var mx = prev.max_value
          batch.foreach { e =>
            n += 1; total += e.value; if (e.value > mx) mx = e.value
          }
          val next = UserRunning(n, total, mx)
          state.update(next)
          UserStats(uid, n, total, mx)
      }
  }

  /** The OutputMode the [[runningUserStats]] sink needs. */
  val RunningStatsOutputMode: OutputMode = OutputMode.Update()

  final case class OpenSession(start_ms: Long, end_ms: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long,
                                 end_ms: Long, n_events: Long)

  /** Sessionization as an EXPLICIT state machine with EVENT-TIME
    * TIMEOUT (`flatMapGroupsWithState`) — the escape hatch beyond
    * [[sessionCountsStream]]'s declarative `session_window`: emit each
    * user's session the moment it CLOSES (append-mode), either because
    * a later event arrived more than `gap` after it, or because the
    * WATERMARK passed its horizon with no successor (the timeout path —
    * that's what the declarative form can't surface as a first-class
    * "session closed" event stream).
    *
    * State per user = one open session (3 longs); the store shards by
    * user across executors, timeouts fire as the watermark advances.
    * Works in batch too (timeouts never fire; within-batch closures
    * still emit). Input needs a watermark on `event_time` when
    * streaming. */
  def closedUserSessions(events: Dataset[UserEvent],
                         gapMs: Long = 30L * 60L * 1000L)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.start_ms, s.end_ms, s.n))
          } else {
            val times = batch.map(_.event_time.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            times.foreach { t =>
              open match {
                case Some(s) if t - s.end_ms <= gapMs =>
                  open = Some(s.copy(end_ms = t, n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, s.start_ms, s.end_ms, s.n)
                  open = Some(OpenSession(t, t, 1L))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close via timeout once the watermark passes end + gap.
              // setTimeoutTimestamp must exceed the current watermark or
              // it throws and kills the query; Spark 4 already drops
              // rows behind the watermark before this function when
              // EventTimeTimeout is set (probed empirically — a fully
              // late batch never reaches here), so surviving events have
              // end >= watermark and the max() is defense-in-depth for
              // versions/configs where the late-row filter's watermark
              // lags the one this check consults. Batch queries report
              // watermark -1, leaving end+gap untouched.
              state.setTimeoutTimestamp(
                math.max(s.end_ms + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Streaming per-user session counts (flatMapGroupsWithState-free:
    * session_window + watermark is the declarative form; Spark manages
    * the merging state store). */
  def sessionCountsStream(stream: DataFrame, gap: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("n_events"))
}
