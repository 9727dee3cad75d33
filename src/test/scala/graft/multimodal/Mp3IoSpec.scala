package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MP3 structural walking ([[Mp3Io]]): authored streams round-trip
  * through the frame-header walker with exact facts; corruption in
  * every structural position is rejected, never mis-read. */
class Mp3IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cbr(nFrames: Int = 10, version: Int = 3, layer: Int = 3,
                  srIdx: Int = 0, brIdx: Int = 9, channels: Int = 2,
                  id3v2: Int = -1, id3v1: Boolean = false): Array[Byte] =
    Mp3Io.encodeMp3(nFrames, version, layer, srIdx, _ => brIdx,
                    channels, seed = 42L, id3v2PadBytes = id3v2,
                    id3v1 = id3v1)

  test("CBR MPEG-1 Layer III round-trips with exact facts") {
    val p = Mp3Io.parseMp3(cbr(nFrames = 25, srIdx = 0, brIdx = 9))
    assert(p.ok)
    assert(p.sampleRateHz.contains(44100))
    assert(p.channels.contains(2))
    assert(p.frames.contains(25L))
    assert(p.durationMs.contains(25L * 1152 * 1000 / 44100)) // 653
    assert(p.bitrateKbps.contains(128))
    assert(p.vbr.contains(false))
    assert(p.layer.contains(3))
    assert(p.versionId.contains("mpeg1"))
    assert(p.id3v2Bytes.contains(0))
  }

  test("every version x layer cell parses with its own samples-per-frame") {
    // (versionBits, layer, srIdx, brIdx, expected rate, expected spf)
    val cells = Seq(
      (3, 1, 0, 9, 44100, 384),  // MPEG-1 Layer I
      (3, 2, 1, 9, 48000, 1152), // MPEG-1 Layer II
      (3, 3, 2, 9, 32000, 1152), // MPEG-1 Layer III
      (2, 3, 0, 9, 22050, 576),  // MPEG-2 Layer III
      (2, 1, 1, 5, 24000, 384),  // MPEG-2 Layer I
      (0, 3, 2, 7, 8000, 576))   // MPEG-2.5 Layer III
    for ((v, l, sr, br, rate, spf) <- cells) {
      val p = Mp3Io.parseMp3(Mp3Io.encodeMp3(
        7, v, l, sr, _ => br, channels = 1, seed = v * 100L + l))
      assert(p.ok, s"v$v L$l")
      assert(p.sampleRateHz.contains(rate), s"v$v L$l rate")
      assert(p.layer.contains(l))
      assert(p.durationMs.contains(7L * spf * 1000 / rate), s"v$v L$l dur")
    }
  }

  test("VBR: alternating bitrates flag vbr and average exactly") {
    val b = Mp3Io.encodeMp3(9, 3, 3, 0, f => if (f % 2 == 0) 9 else 11,
                            channels = 1, seed = 7L)
    val p = Mp3Io.parseMp3(b)
    assert(p.ok && p.vbr.contains(true))
    // 5 frames at idx9=128, 4 at idx11=192 -> floor(1408/9)=156
    assert(p.bitrateKbps.contains((5 * 128 + 4 * 192) / 9))
  }

  test("ID3v2 prefix, ID3v1 tail, and padding bits are all walked") {
    val p = Mp3Io.parseMp3(Mp3Io.encodeMp3(
      12, 3, 3, 0, _ => 9, channels = 1, seed = 3L,
      paddingOf = f => f % 2, id3v2PadBytes = 33, id3v1 = true))
    assert(p.ok)
    assert(p.id3v2Bytes.contains(43)) // 10-byte header + 33 payload
    assert(p.frames.contains(12L))    // tags and padding change no fact
    assert(p.durationMs.contains(12L * 1152 * 1000 / 44100))
  }

  test("Xing/Info tag frame: detected, excluded from facts, cross-checked") {
    // CBR -> Info magic; facts identical to the untagged stream
    val cbrTagged = Mp3Io.encodeMp3(15, 3, 3, 0, _ => 9, 2, seed = 4L,
                                    xing = true)
    val p = Mp3Io.parseMp3(cbrTagged)
    assert(p.ok && p.xingFrames.contains(15L))
    assert(p.frames.contains(15L)) // tag frame not counted as audio
    assert(p.bitrateKbps.contains(128) && p.vbr.contains(false))
    assert(p.durationMs.contains(15L * 1152 * 1000 / 44100))
    assert(new String(cbrTagged, 4 + 32, 4) == "Info") // stereo V1
    // VBR -> Xing magic, mono side-info offset
    val vbrTagged = Mp3Io.encodeMp3(9, 3, 3, 0,
      f => if (f % 2 == 0) 9 else 11, 1, seed = 5L, xing = true)
    val q = Mp3Io.parseMp3(vbrTagged)
    assert(q.ok && q.xingFrames.contains(9L) && q.vbr.contains(true))
    assert(new String(vbrTagged, 4 + 17, 4) == "Xing")
    // untagged stream: no declaration
    assert(Mp3Io.parseMp3(cbr()).xingFrames.isEmpty)
    // a declaration disagreeing with the walked count is corruption:
    // patch the BE count field (last byte) to declare one frame more
    val lied = cbrTagged.clone
    val countOff = 4 + 32 + 8 + 3
    lied(countOff) = (lied(countOff) + 1).toByte
    assert(!Mp3Io.parseMp3(lied).ok)
    // MPEG-2 mono offset (side info 9) also detected
    val v2 = Mp3Io.parseMp3(Mp3Io.encodeMp3(6, 2, 3, 1, _ => 7, 1,
                                            seed = 6L, xing = true))
    assert(v2.ok && v2.xingFrames.contains(6L) && v2.frames.contains(6L))
  }

  test("corruption is rejected, never mis-read") {
    val good = cbr(nFrames = 4)
    // truncated final frame
    assert(!Mp3Io.parseMp3(good.take(good.length - 17)).ok)
    // mid-stream sample-rate change (two concatenated streams)
    assert(!Mp3Io.parseMp3(cbr(srIdx = 0) ++ cbr(srIdx = 1)).ok)
    // mid-stream layer change
    assert(!Mp3Io.parseMp3(cbr(layer = 3) ++ cbr(layer = 2)).ok)
    // free-format bitrate index 0 (unwalkable without resync guessing)
    val free = good.clone; free(2) = (free(2) & 0x0f).toByte
    assert(!Mp3Io.parseMp3(free).ok)
    // bad bitrate index 15
    val bad = good.clone; bad(2) = (bad(2) | 0xf0).toByte
    assert(!Mp3Io.parseMp3(bad).ok)
    // reserved version bits 01
    val rv = good.clone; rv(1) = ((rv(1) & ~0x18) | 0x08).toByte
    assert(!Mp3Io.parseMp3(rv).ok)
    // ID3v2 declaring a size past EOF
    val tagged = Mp3Io.encodeMp3(2, 3, 3, 0, _ => 5, 1, 1L,
                                 id3v2PadBytes = 40)
    assert(!Mp3Io.parseMp3(tagged.take(30)).ok)
    // junk, empty, null
    assert(!Mp3Io.parseMp3("NOT A MEDIA FILE".getBytes).ok)
    assert(!Mp3Io.parseMp3(Array.emptyByteArray).ok)
    assert(!Mp3Io.parseMp3(null).ok)
  }

  test("trailing junk after the last whole frame is rejected (strict)") {
    assert(!Mp3Io.parseMp3(cbr() ++ Array[Byte](1, 2, 3, 4, 5)).ok)
  }

  test("parseMp3Streams: every synthetic asset parses ok with id-exact facts") {
    val out = Multimodal.parseMp3Streams(
        Multimodal.syntheticMp3Assets(spark, 32))
      .orderBy(col("asset_id")).collect()
    assert(out.length == 32)
    for (r <- out) {
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Boolean]("ok"), s"id $id")
      assert(r.getAs[Int]("sample_rate_hz") ==
        Seq(44100, 48000, 32000)((id % 3).toInt))
      assert(r.getAs[Long]("frames") == 20 + id % 30)
      assert(r.getAs[Long]("vbr") == id % 2)
      assert(r.getAs[Int]("id3v2_bytes") ==
        (if (id % 4 == 0) 27 + id.toInt else 0))
      if (id % 6 == 0)
        assert(r.getAs[Long]("xing_frames") == 20 + id % 30, s"xing $id")
      else assert(r.isNullAt(r.fieldIndex("xing_frames")), s"no xing $id")
    }
  }
}
