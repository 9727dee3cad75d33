package graft.streaming

import graft.TestSpark
import graft.sources.Feed
import graft.text.Robots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming feed ingest ([[FeedIngest]]): RSS/Atom parse +
  * canonicalization + compiled-robots policy per micro-batch,
  * disposition-partitioned landing, restart safety, batch/stream
  * parity. The q_feed_ingest oracle gates the id-arithmetic mass. */
class FeedIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // feed f: 3 RSS items — one allowed, one under the blocked path,
  // one with tracking params that must canonicalize away; gzip odd f
  private def feedFile(f: Int): Array[Byte] = {
    val raw = Feed.writeRss(Seq(
      (s"http://f.example/ok$f?utm_source=x&k=$f", s"OK $f", null, null),
      (s"http://f.example/blocked/b$f", s"B $f", null, null),
      ("", s"broken $f", null, null)))
    if (f % 2 == 0) raw
    else {
      val gz = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(raw); g.close()
      gz.toByteArray
    }
  }

  private lazy val rules = Robots.compileRules(
    Seq(("f.example", "User-agent: *\nDisallow: /blocked/"))
      .toDF("host", "robots_txt"),
    "graftbot/1.0")

  test("entries land disposition-partitioned; kept slice is canonicalized") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-feed-ingest")
    val out = s"$tmp/landed"; val ckpt = s"$tmp/ckpt"
    val in = MemoryStream[(Long, Array[Byte])]
    val q = FeedIngest.land(
      FeedIngest.ingest(in.toDF().toDF("feed_id", "content"), rules),
      out, ckpt)
    try {
      in.addData((0L, feedFile(0)))
      q.processAllAvailable()
      in.addData((1L, feedFile(1))) // the gzip spelling
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(out)
    assert(back.count() == 6)
    val disp = back.groupBy(col("disposition")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(disp == Map("kept" -> 2L, "robots_blocked" -> 2L,
                       "invalid" -> 2L))
    // tracking params canonicalized away on the frontier candidates
    val candidates = back.filter(col("disposition") === "kept")
      .select("candidate_url").collect().map(_.getString(0)).toSet
    assert(candidates == Set("http://f.example/ok0?k=0",
                             "http://f.example/ok1?k=1"))

    // restart resumes from the sink log; a fresh feed lands once
    val q2 = FeedIngest.land(
      FeedIngest.ingest(in.toDF().toDF("feed_id", "content"), rules),
      out, ckpt)
    try {
      in.addData((2L, feedFile(2)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).count() == 9)
  }

  test("stream and batch spellings agree entry for entry") {
    val batch = FeedIngest.ingest(
      Seq((0L, feedFile(0)), (1L, feedFile(1))).toDF("feed_id", "content"),
      rules)
    val got = batch.select("link", "disposition").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = (0 until 2).flatMap { f =>
      Seq((s"http://f.example/ok$f?utm_source=x&k=$f", "kept"),
          (s"http://f.example/blocked/b$f", "robots_blocked"),
          (null, "invalid"))
    }.toSet
    assert(got == want)
  }
}
