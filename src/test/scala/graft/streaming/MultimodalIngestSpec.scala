package graft.streaming

import graft.TestSpark
import graft.multimodal.{AudioIo, H264Io, ImageIo, Mp3Io, VideoIo}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming multimodal ingest ([[MultimodalIngest]]): sniff-routed
  * landing into route-partitioned parquet with quarantine capture,
  * restart-safe via the file-sink log, each landed slice decodable by
  * its own kernel. */
class MultimodalIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("assets land route-partitioned; quarantine captures junk; slices decode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm-ingest")
    val out = s"$tmp/landed"; val ckpt = s"$tmp/ckpt"
    val in = MemoryStream[(Long, Array[Byte])]
    val routed = MultimodalIngest.ingest(
      in.toDF().toDF("asset_id", "content"))
    val q = MultimodalIngest.land(routed, out, ckpt)
    try {
      in.addData(
        (1L, ImageIo.encodePng(3, 3, seed = 1L)),
        (2L, AudioIo.encodeWav(60, 8000, 1, seed = 2L)),
        (3L, "bytes of nothing".getBytes("US-ASCII")))
      q.processAllAvailable()
      in.addData((4L, VideoIo.encodeY4m(2, 2, 25, 1, 2, seed = 4L)),
                 (5L, ImageIo.encodePng(2, 5, seed = 5L)))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    val routes = back.groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(routes == Map("image" -> 2L, "audio" -> 1L,
                         "video" -> 1L, "quarantine" -> 1L))

    // reading ONE route prunes the others (partition filter on route)
    val images = back.filter(col("route") === "image")
    val scan = images.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("route"))

    // each landed slice decodes clean with its own kernel
    val img = graft.multimodal.Multimodal.decodeImages(images)
    assert(img.count() == 2 && img.filter(!col("ok")).count() == 0)
    val vid = graft.multimodal.Multimodal.decodeVideos(
      back.filter(col("route") === "video"))
    assert(vid.count() == 1 && vid.filter(!col("ok")).count() == 0)

    // restart resumes from the sink log: the SAME source against the
    // same checkpoint re-lands NOTHING for the processed batches, and
    // a fresh batch lands exactly once (CurationStreamSpec pattern)
    val q2 = MultimodalIngest.land(
      MultimodalIngest.ingest(in.toDF().toDF("asset_id", "content")),
      out, ckpt)
    try {
      in.addData((6L, AudioIo.encodeWav(40, 16000, 2, seed = 6L)))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = spark.read.parquet(out)
    assert(after.count() == 6, "exactly the new asset landed once")
    assert(after.filter(col("route") === "audio").count() == 2)
  }

  test("compressed containers stream-land on their routes and parse structurally") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm-compressed")
    val out = s"$tmp/landed"; val ckpt = s"$tmp/ckpt"
    val in = MemoryStream[(Long, Array[Byte])]
    val q = MultimodalIngest.land(
      MultimodalIngest.ingest(in.toDF().toDF("asset_id", "content")),
      out, ckpt)
    try {
      in.addData(
        (1L, Mp3Io.encodeMp3(8, 3, 3, 0, _ => 9, 1, seed = 1L,
                             id3v2PadBytes = 12)),
        (2L, H264Io.encodeAnnexB(3, 2, 2, 1, seed = 2L)),
        // deep-truncated MP3: sniff routes it (valid leading frame),
        // the structural walker must flag it after landing
        (3L, {
          val whole = Mp3Io.encodeMp3(2, 3, 3, 0, _ => 5, 1, seed = 3L)
          whole.take(whole.length - 40)
        }),
        (4L, AudioIo.encodeWav(50, 8000, 1, seed = 4L)))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(out)
    val routes = back.groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(routes == Map("audio" -> 3L, "video" -> 1L))

    // the audio route mixes containers — dispatch on `detected`,
    // exactly as Corpus.ingestDecodeCompressed does in batch
    val mp3 = graft.multimodal.Multimodal.parseMp3Streams(
      back.filter(col("detected") === "audio/mp3"))
    assert(mp3.count() == 2)
    val okRow = mp3.filter(col("asset_id") === 1L).head()
    assert(okRow.getAs[Boolean]("ok") && okRow.getAs[Long]("frames") == 8L)
    assert(!mp3.filter(col("asset_id") === 3L).head().getAs[Boolean]("ok"))
    val h264 = graft.multimodal.Multimodal.parseH264Streams(
      back.filter(col("detected") === "video/h264"))
    assert(h264.head().getAs[Boolean]("ok") &&
           h264.head().getAs[Int]("n_idr") == 2)
  }
}
