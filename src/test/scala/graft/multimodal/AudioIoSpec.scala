package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audio twin of ImageIoSpec: WAV header decode does REAL work on
  * REAL bytes — genuine PCM WAVs through `javax.sound.sampled`,
  * exact shape facts asserted back out, corrupt bytes captured. */
class AudioIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("encodeWav → Decoder round-trips exact rate/channels/frames") {
    val dec = new AudioIo.Decoder
    val cases = Seq((100, 8000, 1), (441, 44100, 2), (250, 16000, 1))
    val out = dec.processBatch(
      cases.map { case (f, r, c) => AudioIo.encodeWav(f, r, c, 7L) })
    out.zip(cases).foreach { case (d, (f, r, c)) =>
      assert(d.ok, s"decode must succeed for $f@$r×$c")
      assert(d.sampleRateHz.contains(r) && d.channels.contains(c))
      assert(d.frames.contains(f.toLong), s"frames ${d.frames} != $f")
      assert(d.durationMs.contains(f * 1000L / r))
      assert(d.format.contains("wave"))
    }
  }

  test("encodeWav is deterministic; corrupt bytes are ok=false, not thrown") {
    val a = AudioIo.encodeWav(128, 16000, 2, 5L)
    assert(a.sameElements(AudioIo.encodeWav(128, 16000, 2, 5L)))
    assert(!a.sameElements(AudioIo.encodeWav(128, 16000, 2, 6L)))
    val dec = new AudioIo.Decoder
    val garbage = Seq(Array.empty[Byte], "not audio".getBytes("UTF-8"),
      "RIFF....WAVEfmt garbage".getBytes("UTF-8"))
    assert(dec.processBatch(garbage).forall(d =>
      !d.ok && d.sampleRateHz.isEmpty && d.frames.isEmpty))
  }

  test("decodeAudio: distributed header decode, exact facts, invariant to batching") {
    val assets = Multimodal.syntheticAudioAssets(spark, 24).cache()
    val d = Multimodal.decodeAudio(assets).cache()
    assert(d.count() == 24)
    assert(d.filter(!col("ok")).count() == 0)
    d.collect().foreach { r =>
      val id = r.getLong(0)
      val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
      assert(r.getInt(1) == rate, s"rate mismatch for $id")
      assert(r.getInt(2) == 1 + (id % 2).toInt, s"channels mismatch for $id")
      assert(r.getLong(3) == 100 + (id % 400), s"frames mismatch for $id")
      assert(r.getString(5) == "wave")
    }
    val again = Multimodal.decodeAudio(assets.repartition(5), batchSize = 3)
    assert(d.exceptAll(again).count() == 0)
  }
}
