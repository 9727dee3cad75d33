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

  test("compressed containers detect: MP3 (tagged + raw sync), H.264") {
    // raw-sync CBR MP3 from the real header author
    assert(detectOne(Mp3Io.encodeMp3(3, 3, 3, 0, _ => 9, 1, seed = 1L))
      == "audio/mp3")
    // ID3v2-tagged MP3: tag declared and fits
    assert(detectOne(Mp3Io.encodeMp3(3, 3, 3, 0, _ => 9, 1, seed = 1L,
      id3v2PadBytes = 25)) == "audio/mp3")
    // H.264 Annex-B with 4-byte leading start code (SPS first)
    assert(detectOne(H264Io.encodeAnnexB(2, 2, 1, 1, seed = 3L))
      == "video/h264")
    // 3-byte leading start code is also legal Annex-B
    assert(detectOne(Array[Byte](0, 0, 1, 0x67, 0x42))
      == "video/h264")
    // routes land on their coarse kinds
    val routed = Sniff.route(Seq(
        (1L, Mp3Io.encodeMp3(2, 3, 3, 0, _ => 5, 1, seed = 2L)),
        (2L, H264Io.encodeAnnexB(1, 1, 1, 0, seed = 2L)))
      .toDF("asset_id", "content"))
      .select(col("asset_id"), col("route")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(routed == Map(1L -> "audio", 2L -> "video"))
  }

  test("compressed-container structural checks quarantine header junk") {
    // ID3 tag declaring a size past EOF (cut mid-download)
    val id3Cut = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 7, 0x68) ++
      Array.fill(20)(0x41.toByte)
    assert(detectOne(id3Cut) == "unknown")
    // ID3 with a non-syncsafe size byte
    val id3BadSize = Array[Byte]('I', 'D', '3', 3, 0, 0,
      0x80.toByte, 0, 0, 4) ++ Array.fill(30)(0x41.toByte)
    assert(detectOne(id3BadSize) == "unknown")
    // sync with bad bitrate index 15 / free index 0 / reserved
    // version / reserved sample-rate index
    assert(detectOne(Array(0xff, 0xfb, 0xf0, 0).map(_.toByte)) == "unknown")
    assert(detectOne(Array(0xff, 0xfb, 0x00, 0).map(_.toByte)) == "unknown")
    assert(detectOne(Array(0xff, 0xeb, 0x90, 0).map(_.toByte)) == "unknown")
    assert(detectOne(Array(0xff, 0xfb, 0x9c, 0).map(_.toByte)) == "unknown")
    // FF Ex junk with reserved layer 00
    assert(detectOne(Array(0xff, 0xe1, 0x90, 0).map(_.toByte)) == "unknown")
    // H.264 start code + forbidden_zero_bit set
    assert(detectOne(Array[Byte](0, 0, 0, 1, 0x87.toByte, 0))
      == "unknown")
    // H.264 start code + a NAL type no stream leads with
    assert(detectOne(Array[Byte](0, 0, 0, 1, 0x6c, 0)) == "unknown")
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

  test("documents detect: PDF by magic, HTML by DOCTYPE/root prefix") {
    assert(detectOne("%PDF-1.7\nrest".getBytes("US-ASCII"))
      == "application/pdf")
    assert(detectOne("%PDF-x.y".getBytes("US-ASCII")) == "unknown")
    assert(detectOne("<!DOCTYPE html><html>".getBytes("UTF-8"))
      == "text/html")
    assert(detectOne("<html lang=\"en\">".getBytes("UTF-8"))
      == "text/html")
    // leading whitespace and BOM tolerated; case-insensitive
    assert(detectOne("﻿  \n<HTML>".getBytes("UTF-8")) == "text/html")
    assert(detectOne("  <!doctype HTML SYSTEM>".getBytes("UTF-8"))
      == "text/html")
    // an <htmlx> element or a stray tag is NOT an HTML document
    assert(detectOne("<htmlx>".getBytes("UTF-8")) == "unknown")
    assert(detectOne("<div>x</div>".getBytes("UTF-8")) == "unknown")
    // both document kinds take the document route
    val routed = Sniff.route(Seq(
        (0L, "%PDF-1.4\nx".getBytes("US-ASCII")),
        (1L, "<html>".getBytes("UTF-8"))).toDF("asset_id", "content"))
      .select(col("route")).collect().map(_.getString(0)).toSeq
    assert(routed == Seq("document", "document"))
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
