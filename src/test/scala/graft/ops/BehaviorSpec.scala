package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral analytics ([[Behavior]]): retention cells and funnel
  * chaining on constructed event logs with known answers. Timestamps
  * are epoch NANOS (the [[graft.Tables.events]] contract). */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DayNs = 86400000000000L

  test("cohortRetention: the known retention triangle") {
    // u1 active days 0,1,3 ; u2 days 1,1 (dup events) ; u3 day 3
    val ev = Seq(
      (1L, 0L * DayNs), (1L, 1L * DayNs + 5L), (1L, 3L * DayNs),
      (2L, 1L * DayNs), (2L, 1L * DayNs + 999L),
      (3L, 3L * DayNs))
      .toDF("user_id", "ts")
    val r = Behavior.cohortRetention(ev)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 1L,                                 // u2 (deduped)
      (3L, 0L) -> 1L))                                // u3
  }

  test("cohortRetention buckets at micro precision, not nanos") {
    // two events 1ns apart straddle nothing; 1µs inside day 0 stays 0
    val ev = Seq((7L, DayNs - 1000L), (7L, DayNs)).toDF("user_id", "ts")
    val r = Behavior.cohortRetention(ev)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    // DayNs-1000 is the last micro of day 0 -> cohort 0; DayNs -> day 1
    assert(r == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }

  test("sequenceFunnel: strict ordering chains, ties don't") {
    val M = 1000L // 1µs in ns
    val ev = Seq(
      // u1 completes all three in order
      (1L, "view", 1L * M), (1L, "click", 2L * M), (1L, "purchase", 3L * M),
      // u2: click BEFORE view -> stops at step 1
      (2L, "click", 1L * M), (2L, "view", 2L * M),
      // u3: view and click SAME micro -> tie does not chain
      (3L, "view", 5L * M), (3L, "click", 5L * M),
      // u4: view, click, purchase before click -> stops at step 2
      (4L, "view", 1L * M), (4L, "purchase", 2L * M), (4L, "click", 3L * M),
      // u5: no view at all -> never enters
      (5L, "click", 1L * M), (5L, "purchase", 2L * M))
      .toDF("user_id", "event_type", "ts")
    val r = Behavior.sequenceFunnel(ev,
        Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"))
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("sequenceFunnel: later cheaper completion chains (min-time)") {
    val M = 1000L
    // u: view@1, click@2, click@10, purchase@5 — min click (2) lets
    // purchase@5 qualify even though a later click exists
    val ev = Seq(
      (1L, "view", 1L * M), (1L, "click", 2L * M),
      (1L, "click", 10L * M), (1L, "purchase", 5L * M))
      .toDF("user_id", "event_type", "ts")
    val r = Behavior.sequenceFunnel(ev,
        Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"))
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("transitionCounts: known Markov pairs with a time tie broken " +
       "by event id") {
    val M = 1000L
    // u1: a -> b -> b ; u2: b -> a. At t=2µs u1 has TWO events (ids
    // 10 < 11): the tie-break orders b(10) before b(11)... use
    // distinct types to pin the order: x(10), y(11).
    val ev = Seq(
      (1L, 5L, "a", 1L * M), (1L, 10L, "x", 2L * M), (1L, 11L, "y", 2L * M),
      (2L, 20L, "b", 1L * M), (2L, 21L, "a", 3L * M))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = Behavior.transitionCounts(ev)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(("a", "x") -> 1L, ("x", "y") -> 1L, ("b", "a") -> 1L))
  }

  test("funnel steps shuffle on the user key only (no cartesian)") {
    // range-based input: Catalyst can't constant-fold either step
    // slice to an empty relation and drop the join
    val ev = spark.range(100).select(
      pmod(col("id"), lit(10)).as("user_id"),
      when(col("id") % 2 === 0, lit("view")).otherwise(lit("click"))
        .as("event_type"),
      (col("id") * 1000000L).as("ts"))
    val d = Behavior.sequenceFunnel(ev,
      Seq(col("event_type") === "view", col("event_type") === "click"))
    val joins = d.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty &&
      joins.forall(_.condition.isDefined), "every join keyed")
  }
}
