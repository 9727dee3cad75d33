package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Magic-byte sniffing ([[Sniff]]): every container the real kernels
  * decode is detected from genuine encoder output (or a hand-built
  * minimal header where no encoder exists), and everything else lands
  * in quarantine. */
class SniffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def detectOne(bytes: Array[Byte]): String =
    Sniff.detect(Seq((1L, bytes)).toDF("id", "content"))
      .select(col("detected")).head().getString(0)

  test("real encoder output detects as its container") {
    assert(detectOne(ImageIo.encodePng(3, 2, seed = 7L)) == "image/png")
    assert(detectOne(ImageIo.transcode(
      ImageIo.encodePng(4, 4, seed = 9L), "bmp")) == "image/bmp")
    assert(detectOne(ImageIo.transcode(
      ImageIo.encodePng(4, 4, seed = 9L), "gif")) == "image/gif")
    assert(detectOne(ImageIo.transcode(
      ImageIo.encodePng(4, 4, seed = 9L), "jpg")) == "image/jpeg")
    assert(detectOne(AudioIo.encodeWav(100, 8000, 1, seed = 3L))
      == "audio/wav")
    assert(detectOne(VideoIo.encodeY4m(2, 2, 25, 1, 1, seed = 1L))
      == "video/y4m")
  }

  test("hand-built AIFF and AU headers detect (no encoder for these)") {
    val aiff = "FORM".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 4) ++
      "AIFF".getBytes("US-ASCII")
    assert(detectOne(aiff) == "audio/aiff")
    // full 24-byte AU fixed header: magic, data offset 24, size 0,
    // encoding 3 (16-bit PCM), 8000 Hz, mono
    val au = ".snd".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 24) ++ Array[Byte](0, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 3) ++
      Array[Byte](0, 0, 0x1f, 0x40) ++ Array[Byte](0, 0, 0, 1)
    assert(detectOne(au) == "audio/au")
  }

  test("structural checks: valid magic + corrupt body quarantines") {
    // PNG magic with the IHDR chunk cut off (magic + length field only)
    val pngStub = ImageIo.encodePng(3, 3, seed = 11L).take(12)
    assert(detectOne(pngStub) == "unknown")
    // full WAV truncated mid-file: RIFF declared size now past EOF
    val wav = AudioIo.encodeWav(100, 8000, 1, seed = 4L)
    assert(detectOne(wav) == "audio/wav")
    assert(detectOne(wav.take(20)) == "unknown")
    // AIFF FORM declared size past EOF
    val aiffCut = "FORM".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 3, 0x18.toByte) ++ "AIFF".getBytes("US-ASCII")
    assert(detectOne(aiffCut) == "unknown")
    // AU header cut before its own declared data offset
    val auStub = ".snd".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 24)
    assert(detectOne(auStub) == "unknown")
    // 'BM' junk: bytes 14-17 are ASCII, not a real DIB header size
    assert(detectOne("BM plain text that is not a bitmap at all"
      .getBytes("US-ASCII")) == "unknown")
    // real BMP still detects (DIB size 40 from javax.imageio's writer)
    assert(detectOne(ImageIo.transcode(
      ImageIo.encodePng(4, 4, seed = 9L), "bmp")) == "image/bmp")
    // Y4M magic without the leading W parameter
    assert(detectOne("YUV4MPEG2 bogus\n".getBytes("US-ASCII")) == "unknown")
    // JPEG SOI with a non-marker 4th byte
    assert(detectOne(Array(0xff, 0xd8, 0xff, 0x10).map(_.toByte))
      == "unknown")
  }

  test("non-media, truncated, empty, and null bytes quarantine") {
    assert(detectOne("plain text".getBytes("US-ASCII")) == "unknown")
    // a PNG magic cut short must NOT detect
    assert(detectOne(Array[Byte](0x89.toByte, 0x50)) == "unknown")
    assert(detectOne(Array.empty[Byte]) == "unknown")
    // RIFF that is not WAVE (e.g. AVI) stays unknown
    val avi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "AVI ".getBytes("US-ASCII")
    assert(detectOne(avi) == "unknown")
    val nullRow = Seq((1L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "content")
    assert(Sniff.route(nullRow).select(col("route")).head().getString(0)
      == "quarantine")
  }

  test("stateless sniffing lifts to Structured Streaming verbatim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Array[Byte])]
    val routed = Sniff.route(
      in.toDF().toDF("asset_id", "content"))
    val q = routed.writeStream.format("memory").queryName("sniff_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ImageIo.encodePng(2, 2, seed = 5L)),
        (2L, "junk".getBytes("US-ASCII")))
      q.processAllAvailable()
      in.addData((3L, AudioIo.encodeWav(60, 8000, 1, seed = 2L)))
      q.processAllAvailable()
      val got = spark.table("sniff_stream")
        .select(col("asset_id"), col("route")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "image", 2L -> "quarantine", 3L -> "audio"))
    } finally q.stop()
  }

  test("route composes with the real decoders: each slice decodes clean") {
    val assets = spark.range(30).as[Long].map { id =>
      val content: Array[Byte] = (id % 3) match {
        case 0 => ImageIo.encodePng(2 + (id % 4).toInt, 3, seed = id)
        case 1 => AudioIo.encodeWav(80, 16000, 2, seed = id)
        case _ => VideoIo.encodeY4m(2, 2, 30, 1, 2, seed = id)
      }
      (id, content)
    }.toDF("asset_id", "content")
    val routed = Sniff.route(assets).cache()
    val img = Multimodal.decodeImages(
      routed.filter(col("route") === "image"))
    assert(img.count() == 10 && img.filter(!col("ok")).count() == 0)
    val aud = Multimodal.decodeAudio(
      routed.filter(col("route") === "audio"))
    assert(aud.count() == 10 && aud.filter(!col("ok")).count() == 0)
    val vid = Multimodal.decodeVideos(
      routed.filter(col("route") === "video"))
    assert(vid.count() == 10 && vid.filter(!col("ok")).count() == 0)
    routed.unpersist()
  }
}
