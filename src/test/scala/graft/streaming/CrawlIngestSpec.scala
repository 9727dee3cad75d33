package graft.streaming

import graft.TestSpark
import graft.sources.Warc
import graft.text.Robots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming crawl ingest ([[CrawlIngest]]): WARC walk + extraction +
  * the full politeness policy per micro-batch, disposition-partitioned
  * landing, restart safety, and batch/stream parity. */
class CrawlIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(id: Long, noindex: Boolean): String = {
    val meta = if (noindex) "<meta name=\"robots\" content=\"noindex\">"
               else ""
    s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
    s"<html><head><title>T$id</title>$meta</head>" +
    s"<body><p>crawl doc $id</p></body></html>"
  }

  private def shard(f: Int): Array[Byte] = {
    // 6 records per shard: ids 6f..6f+5 — id%6==1 under a blocked
    // path, id%6==2 declares noindex, id%6==3 is a 404, id%6==4 is
    // plain text (non-HTML), id%6==5 a request record; rest kept
    val recs = (0 until 6).map { r =>
      val id = f * 6L + r
      id % 6 match {
        case 1 => ("response", s"http://c.example/blocked/p$id",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   page(id, noindex = false))
        case 2 => ("response", s"http://c.example/p$id",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   page(id, noindex = true))
        case 3 => ("response", s"http://c.example/p$id",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone")
        case 4 => ("response", s"http://c.example/p$id.txt",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nplain $id")
        case 5 => ("request", s"http://c.example/p$id",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   "GET / HTTP/1.1\r\n\r\n")
        case _ => ("response", s"http://c.example/p$id",
                   "2024-01-01T00:00:00Z", s"<urn:uuid:c$id>",
                   page(id, noindex = false))
      }
    }
    Warc.writeWarc(recs, gzipPerRecord = f % 2 == 1)
  }

  private lazy val rules = Robots.compileRules(
    Seq(("c.example", "User-agent: *\nDisallow: /blocked/"))
      .toDF("host", "robots_txt"),
    "graftbot/1.0")

  test("records land disposition-partitioned; kept slice is the corpus feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crawl-ingest")
    val out = s"$tmp/landed"; val ckpt = s"$tmp/ckpt"
    val in = MemoryStream[(Long, Array[Byte])]
    val stamped = CrawlIngest.ingest(
      in.toDF().toDF("shard_id", "content"), rules)
    val q = CrawlIngest.land(stamped, out, ckpt)
    try {
      in.addData((0L, shard(0)))
      q.processAllAvailable()
      in.addData((1L, shard(1)))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(out)
    assert(back.count() == 12)
    val disp = back.groupBy(col("disposition")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // per shard: 2 kept (r=0, r=... only id%6==0 -> 1 kept... see
    // shard(): kept = id%6==0; blocked = 1; noindex = 2; skipped =
    // 3,4,5 -> per shard 1/1/1/3
    assert(disp == Map("kept" -> 2L, "robots_blocked" -> 2L,
                       "noindex" -> 2L, "skipped" -> 6L))

    // the corpus feed reads ONLY its partition (pruning proof)
    val kept = back.filter(col("disposition") === "kept")
    val scan = kept.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("disposition"))
    // extraction really ran: title + text present on kept rows
    kept.collect().foreach { r =>
      assert(r.getAs[String]("title").startsWith("T"))
      assert(r.getAs[String]("text").contains("crawl doc"))
    }

    // restart resumes from the sink log; a fresh shard lands once
    val q2 = CrawlIngest.land(
      CrawlIngest.ingest(in.toDF().toDF("shard_id", "content"), rules),
      out, ckpt)
    try {
      in.addData((2L, shard(2)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).count() == 18,
      "exactly the new shard's records landed once")
  }

  test("stream and batch spellings agree record for record") {
    // the same shards through ingest() as a BATCH frame equals what
    // the stream landed — ingest is stateless by construction
    val batch = CrawlIngest.ingest(
      Seq((0L, shard(0)), (1L, shard(1))).toDF("shard_id", "content"),
      rules)
    val got = batch
      .select(col("target_uri"), col("disposition"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // closed form from shard()'s id arithmetic
    val want = (0 until 12).map { id =>
      val uri = id % 6 match {
        case 1 => s"http://c.example/blocked/p$id"
        case 4 => s"http://c.example/p$id.txt"
        case _ => s"http://c.example/p$id"
      }
      val d = id % 6 match {
        case 0 => "kept"
        case 1 => "robots_blocked"
        case 2 => "noindex"
        case _ => "skipped"
      }
      (uri, d)
    }.toSet
    assert(got == want)
  }

  test("join spelling and compiled spelling agree on the same corpus") {
    val robotsDf = Seq(
      ("c.example", "User-agent: *\nDisallow: /blocked/\nAllow: /blocked/ok$"),
      ("d.example", "User-agent: *\nDisallow: /")
    ).toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "http://c.example/a"), (2L, "http://c.example/blocked/x"),
      (3L, "http://c.example/blocked/ok"), (4L, "http://d.example/y"),
      (5L, "http://norules.example/z"), (6L, null)
    ).toDF("doc_id", "url")
    val joined = Robots.verdicts(docs, robotsDf, "graftbot")
      .select(col("doc_id"), col("robots_allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val compiled = Robots.compileRules(robotsDf, "graftbot")
    val host = lower(parse_url(col("url"), lit("HOST")))
    val path = coalesce(parse_url(col("url"), lit("PATH")), lit("/"))
    val direct = docs
      .select(col("doc_id"),
              Robots.allowedColumn(host, path, compiled).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(joined == direct)
    assert(joined == Map(1L -> true, 2L -> false, 3L -> true,
                         4L -> false, 5L -> true, 6L -> true))
  }

  test("mainContentOnly strips boilerplate in the stream, batch-parity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val article = "A long enough article paragraph with plenty of " +
      "prose characters for the block classifier to keep."
    def mcPage(id: Long): String =
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><head><title>M$id</title></head><body>" +
        "<nav><a href=/a>Home</a> <a href=/b>About</a></nav>" +
        s"<h1>Head $id</h1><p>$article</p>" +
        s"<footer>Copyright $id</footer></body></html>"
    val bytes = Warc.writeWarc((0 until 4).map { id =>
      ("response", s"http://c.example/m$id", "2024-01-01T00:00:00Z",
       s"<urn:uuid:m$id>", mcPage(id))
    })
    val shards = Seq((0L, bytes)).toDF("shard_id", "content")
    val batch = CrawlIngest.ingest(shards, rules, mainContentOnly = true)
      .filter(col("disposition") === "kept")
      .select(col("target_uri"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch.size == 4)
    (0 until 4).foreach { id =>
      // nav/footer gone; promoted heading + article survive
      assert(batch(s"http://c.example/m$id") == s"Head $id $article")
    }
    // the stream spelling lands the identical text
    val tmp = java.nio.file.Files.createTempDirectory("graft-mc-ingest")
    val in = MemoryStream[(Long, Array[Byte])]
    val q = CrawlIngest.land(
      CrawlIngest.ingest(in.toDF().toDF("shard_id", "content"), rules,
                         mainContentOnly = true),
      s"$tmp/out", s"$tmp/ckpt")
    try { in.addData((0L, bytes)); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/out")
      .filter(col("disposition") === "kept")
      .select(col("target_uri"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }

  test("compileRules refuses loudly on both the host and BYTE bounds") {
    val robotsDf = Seq(
      ("a.example", "User-agent: *\nDisallow: /x\n" + ("#pad\n" * 40)),
      ("b.example", "User-agent: *\nAllow: /")
    ).toDF("host", "robots_txt")
    val hostsErr = intercept[IllegalArgumentException] {
      Robots.compileRules(robotsDf, "graftbot", maxHosts = 1)
    }
    assert(hostsErr.getMessage.contains("hosts"))
    // row count (2) is under the host bound, but the padded bodies
    // exceed a tiny byte budget — the byte guard must trip on its own
    val bytesErr = intercept[IllegalArgumentException] {
      Robots.compileRules(robotsDf, "graftbot", maxBytes = 64L)
    }
    assert(bytesErr.getMessage.contains("bytes"))
    // within both bounds it still compiles
    assert(Robots.compileRules(robotsDf, "graftbot").size == 2)
  }
}
