package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val events = Tables.events(spark, TestSpark.sf0001).cache()

  test("batch tumbling windows: counts sum to input, epoch-aligned") {
    val out = EventStreams.tumblingCounts(events).cache()
    assert(out.agg(sum(col("n_events"))).head().getLong(0) == events.count())
    assert(out.filter(col("bucket_start_s") % 3600 =!= 0).count() == 0)
  }

  test("sliding windows: each event appears in width/slide windows") {
    val tumbling = EventStreams.tumblingCounts(events)
    val sliding = EventStreams.slidingAvg(events,
      width = "1 hour", slide = "15 minutes")
    val nTumbling = tumbling.agg(sum(col("n_events"))).head().getLong(0)
    val nSliding = sliding.agg(sum(col("n_events"))).head().getLong(0)
    assert(nSliding == 4 * nTumbling,
      s"1h/15m sliding must count each event 4x: $nSliding vs $nTumbling")
  }

  test("session windows: per-user event counts are preserved") {
    val out = EventStreams.sessionCounts(events).cache()
    val perUserSessions = out.groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n"))
    val perUserEvents = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(perUserSessions.join(perUserEvents, Seq("user_id"))
      .filter(perUserSessions("n") =!= perUserEvents("n")).count() == 0)
    // sessions of one user never overlap: starts are strictly increasing
    // and (being first-event times) unique per user
    val dup = out.groupBy(col("user_id"), col("session_start_s"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
    assert(dup.count() == 0)
  }

  test("streaming tumbling aggregation equals the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF()
      .toDF("event_time", "event_type", "value")
    val agg = EventStreams.tumblingCountsStream(stream,
      width = "1 hour", watermark = "1 hour")
    val q = agg.writeStream.format("memory")
      .queryName("tumbling_test").outputMode("complete").start()
    try {
      val rows = Seq(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0),
        (Timestamp.valueOf("2024-01-01 10:30:00"), "view", 8.0))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .select(col("bucket_start_s"), col("event_type"),
                col("n_events"), col("sum_value")).collect()
        .map(r => (r.getLong(0), r.getString(1),
                   r.getLong(2), r.getDouble(3))).toSet
      def ep(s: String): Long = Timestamp.valueOf(s).getTime / 1000
      val expected = Set(
        (ep("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ep("2024-01-01 11:00:00"), "click", 1L, 4.0),
        (ep("2024-01-01 10:00:00"), "view", 1L, 8.0))
      assert(streamed == expected)
    } finally q.stop()
  }

  test("stream-stream temporal join matches the batch bounded lookback") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mkRows = Seq(
      // user 1: clicks at 10:00, 10:10; purchases at 9:57, 10:04, 10:20
      (1L, "2024-01-01 10:00:00", 1.0, "c"),
      (1L, "2024-01-01 10:10:00", 2.0, "c"),
      (1L, "2024-01-01 09:57:00", 10.0, "p"),
      (1L, "2024-01-01 10:04:00", 20.0, "p"),
      (1L, "2024-01-01 10:20:00", 30.0, "p"),
      // user 2: a click with no purchase in window
      (2L, "2024-01-01 10:00:00", 3.0, "c"),
      (2L, "2024-01-01 09:00:00", 40.0, "p"))
    val cMem = MemoryStream[(Long, Timestamp, Double)]
    val pMem = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.temporalJoinStream(
      cMem.toDF().toDF("user_id", "event_time", "value"),
      pMem.toDF().toDF("user_id", "event_time", "value"))
    val q = joined.writeStream.format("memory")
      .queryName("temporal_join_test").outputMode("append").start()
    try {
      cMem.addData(mkRows.filter(_._4 == "c")
        .map(r => (r._1, Timestamp.valueOf(r._2), r._3)): _*)
      pMem.addData(mkRows.filter(_._4 == "p")
        .map(r => (r._1, Timestamp.valueOf(r._2), r._3)): _*)
      q.processAllAvailable()
      val got = spark.table("temporal_join_test")
        .select(col("user_id"), col("l_value"), col("r_value")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      // click 10:00 looks back to [9:55, 10:00] → purchase 9:57 only;
      // click 10:10 looks back to [10:05, 10:10] → none (10:04 too
      // early, 10:20 in the future); user 2's purchase is an hour out
      val want = Set((1L, 1.0, 10.0))
      assert(got == want, s"got $got want $want")
    } finally q.stop()
  }

  test("closed-session state machine: gap closure and watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_time", "value")
      .withWatermark("event_time", "10 minutes")
      .as[EventStreams.UserEvent]
    val q = EventStreams.closedUserSessions(events)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    def ms(s: String): Long = Timestamp.valueOf(s).getTime
    try {
      // batch 1: user 1 two close events (one session), user 2 one event
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 1.0),
        (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2: user 1 far-future event — closes their open session by
      // GAP within processing, and pushes the watermark to 11:50, which
      // TIMES OUT user 2's open session (horizon 10:30)
      mem.addData((1L, Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // one empty batch so timeout-triggered output lands in the sink
      mem.addData((3L, Timestamp.valueOf("2024-01-01 12:00:01"), 1.0))
      q.processAllAvailable()
      val got = spark.table("closed_sessions")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.contains((1L, ms("2024-01-01 10:00:00"),
        ms("2024-01-01 10:05:00"), 2L)), s"gap-closed session missing: $got")
      assert(got.contains((2L, ms("2024-01-01 10:00:00"),
        ms("2024-01-01 10:00:00"), 1L)), s"timed-out session missing: $got")
    } finally q.stop()
  }

  test("closed sessions survive a batch entirely behind the watermark") {
    // regression for ADVICE r3 / the round-4 clamp at
    // EventStreams.scala: a batch whose events all predate the
    // watermark must not kill the query. Probed empirically: Spark 4
    // drops such rows before the function when EventTimeTimeout is set
    // (so the late user gets NO session — that drop is the pinned
    // semantics here), and the clamp keeps setTimeoutTimestamp legal in
    // versions/configs where late rows do get through.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_time", "value")
      .withWatermark("event_time", "10 minutes")
      .as[EventStreams.UserEvent]
    val q = EventStreams.closedUserSessions(events)
      .writeStream.format("memory").queryName("late_closed_sessions")
      .outputMode("append").start()
    def ms(s: String): Long = Timestamp.valueOf(s).getTime
    try {
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // push the watermark far past 10:30 (10:00 session horizon)
      mem.addData((9L, Timestamp.valueOf("2024-01-01 13:00:00"), 1.0))
      q.processAllAvailable()
      // LATE batch: user 2's only event is behind the 12:50 watermark —
      // the historical crash trigger (setTimeoutTimestamp <= watermark)
      mem.addData((2L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // advance the watermark so pending timeouts fire and flush
      mem.addData((9L, Timestamp.valueOf("2024-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
      mem.addData((9L, Timestamp.valueOf("2024-01-01 15:00:00"), 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val got = spark.table("late_closed_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // user 1's pre-watermark session still closes via timeout
      assert(got.contains((1L, ms("2024-01-01 10:00:00"),
        ms("2024-01-01 10:00:00"), 1L)), s"timeout close missing: $got")
      // the fully-late event is dropped, not sessionized (Spark 4
      // late-row filter) — and crucially did not kill the query
      assert(!got.exists(_._1 == 2L),
        s"late row behind the watermark must be dropped: $got")
    } finally q.stop()
  }

  test("file-source streaming: parquet dir stream matches batch windows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(TestSpark.sf0001, "events.parquet"),
      tmp.resolve("events.parquet"))
    val batch = events
    // readStream needs the file's PHYSICAL schema (no implicit cast);
    // normalize ts afterwards exactly like the batch loader
    val rawSchema = spark.read.parquet(tmp.toString).schema
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(tmp.toString))
    assert(stream.isStreaming)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_tumbling").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                   r.getDouble(3))).toSet
      val direct = EventStreams.tumblingCounts(batch).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                   r.getDouble(3))).toSet
      assert(streamed == direct,
        "file-stream aggregation must equal the batch aggregation")
    } finally q.stop()
  }

  test("mapGroupsWithState: state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val stats = EventStreams.runningUserStats(mem.toDS())
    val q = stats.writeStream.format("memory")
      .queryName("running_stats")
      .outputMode(EventStreams.RunningStatsOutputMode).start()
    try {
      mem.addData(
        EventStreams.UserEvent(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 2.0),
        EventStreams.UserEvent(1L, Timestamp.valueOf("2024-01-01 10:01:00"), 3.0),
        EventStreams.UserEvent(2L, Timestamp.valueOf("2024-01-01 10:00:00"), 7.0))
      q.processAllAvailable()
      // second micro-batch must fold into the SAME state
      mem.addData(
        EventStreams.UserEvent(1L, Timestamp.valueOf("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      val latest = spark.table("running_stats")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("total_value")).as("t"),
             max(col("max_value")).as("m"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
                                    r.getDouble(3)))).toMap
      assert(latest(1L) == ((3L, 10.0, 5.0)))
      assert(latest(2L) == ((1L, 7.0, 7.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeats across micro-batches within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("event_time", "content_hash", "value")
    val q = EventStreams.streamingDedup(stream, Seq("content_hash"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "aaa", 1.0),
        (Timestamp.valueOf("2024-01-01 10:00:10"), "aaa", 2.0), // dup
        (Timestamp.valueOf("2024-01-01 10:00:20"), "bbb", 3.0))
      q.processAllAvailable()
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "aaa", 4.0), // dup, later batch
        (Timestamp.valueOf("2024-01-01 10:05:10"), "ccc", 5.0))
      q.processAllAvailable()
      val hashes = spark.table("dedup_stream")
        .select(col("content_hash")).collect().map(_.getString(0))
      assert(hashes.sorted.toSeq == Seq("aaa", "bbb", "ccc"),
        s"got ${hashes.toSeq}")
    } finally q.stop()
  }

  test("streaming session windows merge within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val stream = mem.toDF().toDF("event_time", "user_id", "value")
    val agg = EventStreams.sessionCountsStream(stream, gap = "30 minutes")
    val q = agg.writeStream.format("memory")
      .queryName("session_test").outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
        (Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 1.0), // merges
        (Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 1.0), // new session
        (Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select(col("user_id"), col("session_start"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L),
        (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L),
        (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L)))
    } finally q.stop()
  }
}
