package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Audio/video perceptual fingerprints ([[MediaPhash]]): clone
  * robustness (gain/requantization), cross-content separation, and
  * the banded-join dedup surfaces over planted clones. */
class MediaPhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def tone(bits: Int, amp: Double, notes: Seq[Double],
                   seed: Long) =
    AudioIo.encodeToneWav(8192, 8000, bits, amp, notes, seed)

  private val melodyA = Seq(220.0, 330.0, 494.0, 262.0, 392.0, 587.0)
  private val melodyB = Seq(587.0, 262.0, 330.0, 494.0, 220.0, 392.0)

  test("audio fingerprint: deterministic; survives gain change and " +
       "8-bit requantization; separates different melodies") {
    val a16 = MediaPhash.audioFingerprint64(tone(16, 0.9, melodyA, 7)).get
    val a16b = MediaPhash.audioFingerprint64(tone(16, 0.9, melodyA, 7)).get
    assert(a16 == a16b, "same bytes must hash identically")
    val aQuiet = MediaPhash.audioFingerprint64(tone(16, 0.4, melodyA, 7)).get
    val a8 = MediaPhash.audioFingerprint64(tone(8, 0.72, melodyA, 7)).get
    assert(hamming(a16, aQuiet) <= 6,
      s"gain change moved ${hamming(a16, aQuiet)} bits")
    assert(hamming(a16, a8) <= 6,
      s"requantization moved ${hamming(a16, a8)} bits")
    // same notes, different ORDER — a different melody, far away
    val other = MediaPhash.audioFingerprint64(tone(16, 0.9, melodyB, 7)).get
    assert(hamming(a16, other) > 6,
      s"different melody only ${hamming(a16, other)} bits away")
  }

  test("audio fingerprint: undecodable bytes quarantine (None)") {
    assert(MediaPhash.audioFingerprint64("junk".getBytes).isEmpty)
    assert(MediaPhash.audioFingerprint64(Array.empty[Byte]).isEmpty)
  }

  test("luma pHash: requantized texture within budget, different " +
       "texture far") {
    def firstFrameHash(seed: Long, q: Int) = {
      val y4m = VideoIo.encodeY4mTextured(64, 48, 25, 1, 4, seed, q)
      val p = VideoIo.parseY4m(y4m).get
      MediaPhash.lumaPhash64(y4m, p.frameOffsets(0).toInt, p.w, p.h)
    }
    val full = firstFrameHash(5, 8)
    assert(full == firstFrameHash(5, 8))
    val re = firstFrameHash(5, 6)
    assert(hamming(full, re) <= 3,
      s"6-bit requantization moved ${hamming(full, re)} bits")
    val other = firstFrameHash(6, 8)
    assert(hamming(full, other) > 10,
      s"different texture only ${hamming(full, other)} bits away")
  }

  test("audio near-dup surface recovers every planted transcode clone") {
    val got = graft.ops.Corpus
      .audioFingerprintDedup(spark, graft.TestSpark.sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 48L by 6L).map(id => (id, id + 1000L)).toSet
    assert(planted.subsetOf(got),
      s"missing clones: ${planted -- got}")
  }

  test("video near-dup surface recovers every planted requantized clone") {
    val got = graft.ops.Corpus
      .videoFrameDedup(spark, graft.TestSpark.sf0001)
      .select("id_a", "id_b", "n_matching_frames")
      .as[(Long, Long, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    val planted = (0L until 24L by 6L).map(id => (id, id + 1000L)).toSet
    assert(planted.subsetOf(pairs), s"missing clones: ${planted -- pairs}")
    // clone pairs match on (nearly) every sampled frame
    got.filter(r => planted((r._1, r._2))).foreach { r =>
      assert(r._3 >= 3L, s"clone pair $r matched too few frames")
    }
  }
}
