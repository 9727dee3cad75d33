package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics — cohort retention and ordered
  * event-sequence funnels, the two queries every product-events
  * warehouse runs daily and the reference's event table begs for.
  * Both are exact-integer operators (day buckets, user counts), so
  * their declared queries hash-gate against a DuckDB twin.
  *
  * ==Scale shape==
  * Both operators reduce events to per-user aggregates FIRST (shuffle
  * on `user`, map-side combined — the high-cardinality dimension),
  * then work on |users|-sized frames. Nothing driver-side; no windows
  * over unpartitioned data. [[sequenceFunnel]]'s per-step joins are
  * all on the same `user` key, so every post-step-1 exchange reuses
  * the step-1 partitioning (AQE sees aligned hash partitioning), and
  * each step's event side is filtered by its predicate BEFORE the
  * join — at 100 TB each step scans only its own event slice, with
  * partition pruning when the sink lays events out by type/date
  * ([[graft.sources.Layout]]).
  */
object Behavior {

  /** Cohort retention over an event log with epoch-NANOS `tsCol`
    * (the [[graft.Tables.events]] contract): bucket time by
    * `bucketMicros`, cohort each user at their FIRST bucket, and
    * count distinct active users per `(cohort, age)` cell —
    * the classic retention triangle, day-granular by default.
    * Returns `(cohort, age, n_users)`, `age` in buckets since the
    * user's cohort bucket. */
  def cohortRetention(events: DataFrame,
                      bucketMicros: Long = 86400000000L,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    require(bucketMicros > 0, s"bad bucket $bucketMicros")
    val b = expr(s"($tsCol div 1000) div ${bucketMicros}L").as("b")
    val active = events.select(col(userCol).as("u"), b).distinct()
    val cohorts = active.groupBy(col("u")).agg(min(col("b")).as("cohort"))
    active.join(cohorts, Seq("u"))
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("age"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Ordered event-sequence funnel: step `i` counts users with an
    * event matching `steps(i)` STRICTLY AFTER their earliest
    * completion of steps `0..i-1` (min-time semantics — the standard
    * "did A, then B, then C" product funnel; simultaneous timestamps
    * do not chain). `tsCol` is epoch nanos; comparison happens at
    * micro precision (the engine's cross-engine time grain). Returns
    * one row per step: `(step, n_users)`, 1-based. */
  def sequenceFunnel(events: DataFrame, steps: Seq[Column],
                     userCol: String = "user_id",
                     tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "no funnel steps")
    val stepEvents = steps.map(p =>
      events.filter(p).select(col(userCol).as("u"),
        expr(s"$tsCol div 1000").as("t_us")))
    // frontier: per-user earliest completion time of the prefix
    var frontier = stepEvents.head.groupBy(col("u"))
      .agg(min(col("t_us")).as("t"))
    val counts = Seq.newBuilder[DataFrame]
    counts += frontier.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), col("n_users"))
    for ((se, i) <- stepEvents.tail.zipWithIndex) {
      frontier = se.join(frontier, Seq("u"))
        .filter(col("t_us") > col("t"))
        .groupBy(col("u")).agg(min(col("t_us")).as("t"))
      counts += frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).as("step"), col("n_users"))
    }
    counts.result().reduce(_ unionByName _)
  }

  /** First-order transition counts — the Markov matrix of the event
    * stream: per user, order events by `(time, tieCol)` and count
    * each consecutive `(from, to)` label pair. Stream ends
    * contribute no pair (no synthetic terminal state). `tieCol` must
    * break time ties deterministically (an event id); the window
    * partitions by user, so no global sort — the usual per-entity
    * window shape, skew-bounded by the busiest single user. Returns
    * `(from_type, to_type, n)`. */
  def transitionCounts(events: DataFrame,
                       typeCol: String = "event_type",
                       userCol: String = "user_id",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(expr(s"$tsCol div 1000"), col(tieCol))
    events
      .select(col(typeCol).as("from_type"),
              lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
