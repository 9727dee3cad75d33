package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VideoIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def decodeOne(bytes: Array[Byte]): VideoIo.Decoded =
    new VideoIo.Decoder().processBatch(Seq(bytes)).head

  private def sampleOne(bytes: Array[Byte], everyNth: Int = 2,
                        maxFrames: Int = 4): Seq[VideoIo.Frame] =
    new VideoIo.FrameSampler(everyNth, maxFrames)
      .processBatch(Seq(bytes)).head

  test("roundtrip: encoded Y4M decodes to its exact shape facts") {
    val bytes = VideoIo.encodeY4m(6, 4, 30000, 1001, 5, seed = 42L)
    val d = decodeOne(bytes)
    assert(d.ok)
    assert(d.width.contains(6) && d.height.contains(4))
    assert(d.fpsNum.contains(30000) && d.fpsDen.contains(1001))
    assert(d.colorspace.contains("420jpeg"))
    assert(d.nFrames.contains(5))
    // floor(5 * 1000 * 1001 / 30000) = floor(166.83) = 166
    assert(d.durationMs.contains(166L))
  }

  test("mono and 420 frame payload sizes both demux cleanly") {
    val mono = VideoIo.encodeY4m(5, 3, 25, 1, 4, seed = 7L,
                                 colorspace = "mono")
    val dm = decodeOne(mono)
    assert(dm.ok && dm.nFrames.contains(4) && dm.colorspace.contains("mono"))
    // total length check: header + 4 * (6 + 5*3)
    val hlen = "YUV4MPEG2 W5 H3 F25:1 Ip A1:1 Cmono\n".length
    assert(mono.length == hlen + 4 * (6 + 15))
    val c420 = VideoIo.encodeY4m(4, 4, 25, 1, 2, seed = 7L)
    assert(c420.length ==
      "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n".length
        + 2 * (6 + 16 + 2 * 4))
  }

  test("sampler reads real luma bytes at real offsets") {
    val (w, h, nf, seed) = (4, 2, 7, 11L)
    val bytes = VideoIo.encodeY4m(w, h, 25, 1, nf, seed)
    val frames = sampleOne(bytes, everyNth = 3, maxFrames = 2)
    assert(frames.map(_.frameIdx) == Seq(0, 3))
    val hlen = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".length
    val fsize = w * h + 2 * ((w / 2) * (h / 2))
    assert(frames.map(_.byteOff) ==
      Seq(0, 3).map(i => (hlen + i * (6 + fsize) + 6).toLong))
    def lumaSum(f: Int): Long = (for {
      y <- 0 until h; x <- 0 until w
    } yield (7 * seed + 13 * f + 3 * x + 5 * y) % 256).sum
    assert(frames.map(_.lumaSum) == Seq(lumaSum(0), lumaSum(3)))
    // independent of the formula: the sum must equal summing the raw
    // bytes straight out of the buffer
    assert(frames.head.lumaSum ==
      (0 until w * h).map(i => bytes(hlen + 6 + i) & 0xff).sum.toLong)
  }

  test("frame-level tags and optional header tags are tolerated") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    // minimal header (no I/A tags), frame with a parameter tag
    val luma = Array.fill(4)(9.toByte)
    val bytes = "YUV4MPEG2 W2 H2 F25:1 Cmono\n".getBytes(ascii) ++
      "FRAME Xweird\n".getBytes(ascii) ++ luma ++
      "FRAME\n".getBytes(ascii) ++ luma
    val d = decodeOne(bytes)
    assert(d.ok && d.nFrames.contains(2) && d.width.contains(2))
    val s = sampleOne(bytes, everyNth = 1, maxFrames = 10)
    assert(s.map(_.frameIdx) == Seq(0, 1))
    assert(s.map(_.lumaSum) == Seq(36L, 36L))
  }

  test("corrupt streams are captured, not fatal") {
    val good = VideoIo.encodeY4m(4, 4, 25, 1, 3, seed = 1L)
    val cases = Seq(
      "empty" -> Array.empty[Byte],
      "not y4m" -> "MPEG4 garbage\n".getBytes("US-ASCII"),
      "no newline" -> Array.fill(600)('x'.toByte),
      "missing F tag" -> "YUV4MPEG2 W4 H4 Cmono\nFRAME\n0123456789abcdef"
        .getBytes("US-ASCII"),
      "unknown colorspace" ->
        "YUV4MPEG2 W4 H4 F25:1 C999\nFRAME\n".getBytes("US-ASCII"),
      "truncated final frame" -> good.dropRight(1),
      "bad frame marker" -> {
        val b = good.clone(); val i = good.indexOf('F'.toByte, 30)
        b(i) = 'G'.toByte; b
      })
    cases.foreach { case (label, bytes) =>
      val d = decodeOne(bytes)
      assert(!d.ok && d.nFrames.isEmpty, label)
      assert(sampleOne(bytes).isEmpty, label)
    }
    // and the good stream still decodes after its mutated twin
    assert(decodeOne(good).ok)
  }

  test("zero-frame stream is valid with nFrames=0, not corrupt") {
    val bytes = VideoIo.encodeY4m(4, 4, 25, 1, 0, seed = 1L)
    val d = decodeOne(bytes)
    assert(d.ok && d.nFrames.contains(0) && d.durationMs.contains(0L))
    assert(sampleOne(bytes).isEmpty)
  }

  test("DataFrame lifts: decodeVideos + sampleVideoFrames over the " +
       "synthetic asset table") {
    val assets = Multimodal.syntheticVideoAssets(spark, 12)
    val meta = Multimodal.decodeVideos(assets).cache()
    assert(meta.count() == 12)
    assert(meta.filter(!col("ok")).count() == 0)
    assert(meta.filter(col("colorspace") === "mono").count() == 6)
    val frames = Multimodal.sampleVideoFrames(assets)
    // every asset has >= 3 frames, so frame 0 and 2 always sampled
    assert(frames.filter(col("frame_idx") === 0).count() == 12)
    assert(frames.groupBy("asset_id").count()
      .filter(col("count") > 4).count() == 0)
  }
}
