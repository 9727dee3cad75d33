package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MP4/ISO-BMFF structural walking ([[Mp4Io]]): authored-file
  * round-trips against closed-form facts, SPS-composed geometry,
  * strict corruption rejection, and sniff routing. */
class Mp4IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** LAST occurrence: "avc1" also appears as an ftyp brand. */
  private def idx(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    (0 to b.length - 4).findLast(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
        b(i + 3) == t(3)).getOrElse(fail(s"no $tag box in fixture"))
  }

  test("round-trip: authored facts come back exactly") {
    for (n <- Seq(1, 4, 8, 13, 20); ts <- Seq(1000L, 3000L)) {
      val b = Mp4Io.encodeMp4(widthMbs = 4, heightMbs = 3, nSamples = n,
        sampleDelta = 120L, timescale = ts, seed = n * 31L + ts)
      val p = Mp4Io.parseMp4(b)
      assert(p.ok, s"n=$n ts=$ts")
      assert(p.brand.contains("isom") && p.handler.contains("vide"))
      assert(p.timescale.contains(ts))
      assert(p.durationMs.contains(n * 120L * 1000L / ts))
      assert(p.width.contains(64) && p.height.contains(48))
      assert(p.profileIdc.contains(66) && p.levelIdc.contains(30))
      assert(p.nSamples.contains(n.toLong))
      assert(p.nChunks.contains(((n + 3) / 4).toLong))
      val mdat = (0 until n).map(i => 20 + i % 7).sum.toLong
      assert(p.mdatBytes.contains(mdat))
      assert(p.sampleSpan.contains(mdat)) // gapless packing
    }
  }

  test("cropped geometry is decoded from the SPS, crop arithmetic applied") {
    val b = Mp4Io.encodeMp4(widthMbs = 5, heightMbs = 2, nSamples = 6,
      sampleDelta = 150L, timescale = 2000L, seed = 7L,
      cropRight = 1, cropBottom = 1)
    val p = Mp4Io.parseMp4(b)
    assert(p.ok && p.width.contains(78) && p.height.contains(30))
  }

  test("corruption is rejected, never guessed") {
    val good = Mp4Io.encodeMp4(widthMbs = 4, heightMbs = 3, nSamples = 10,
      sampleDelta = 120L, timescale = 1000L, seed = 42L)
    assert(Mp4Io.parseMp4(good).ok)
    // mdat cut mid-payload: box size points past EOF
    assert(!Mp4Io.parseMp4(good.take(good.length - 40)).ok)
    // file cut before moov completes
    assert(!Mp4Io.parseMp4(good.take(idx(good, "stbl"))).ok)
    // not starting with ftyp
    assert(!Mp4Io.parseMp4(good.drop(8)).ok)
    // avc1 display width disagreeing with the SPS-decoded geometry
    val lying = good.clone()
    val avc1 = idx(lying, "avc1")
    lying(avc1 + 4 + 24 + 1) = (lying(avc1 + 4 + 24 + 1) + 16).toByte
    assert(!Mp4Io.parseMp4(lying).ok)
    // stco offset shifted: a sample range escapes mdat
    val shifted = good.clone()
    val stco = idx(shifted, "stco")
    shifted(stco + 12 + 2) = (shifted(stco + 12 + 2) + 0x40).toByte
    assert(!Mp4Io.parseMp4(shifted).ok)
    // stts delta tampered: summed durations no longer match mdhd
    val drifted = good.clone()
    val stts = idx(drifted, "stts") // payload+15 = sample_delta low byte
    drifted(stts + 19) = (drifted(stts + 19) + 1).toByte
    assert(!Mp4Io.parseMp4(drifted).ok)
    assert(Mp4Io.parseMp4(null).ok == false)
    assert(!Mp4Io.parseMp4(Array.fill(32)(0x00.toByte)).ok)
  }

  test("sniff routes MP4 by structure; a cut ftyp quarantines") {
    import spark.implicits._
    val good = Mp4Io.encodeMp4(widthMbs = 2, heightMbs = 2, nSamples = 4,
      sampleDelta = 120L, timescale = 1000L, seed = 1L)
    val rows = Seq(
      (0L, good),                 // real file
      (1L, good.take(good.length - 40)), // deep truncation: sniff passes
      (2L, good.take(12)))        // cut inside ftyp: sniff quarantines
      .toDF("asset_id", "content")
    val got = Sniff.route(rows).select("asset_id", "detected", "route")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got(0L) == ("video/mp4", "video"))
    assert(got(1L) == ("video/mp4", "video")) // walker's job, not sniff's
    assert(got(2L) == ("unknown", "quarantine"))
  }

  test("fragmented round-trip: trun-summed facts come back exactly") {
    for (f <- Seq(1, 3, 6); spf <- Seq(1, 4, 9)) {
      val b = Mp4Io.encodeFmp4(widthMbs = 4, heightMbs = 3,
        nFragments = f, samplesPerFrag = spf, sampleDelta = 120L,
        timescale = 3000L, seed = f * 100L + spf)
      val p = Mp4Io.parseMp4(b)
      assert(p.ok, s"f=$f spf=$spf")
      assert(p.brand.contains("iso6") && p.handler.contains("vide"))
      assert(p.durationMs.contains(f * spf * 120L * 1000L / 3000L))
      assert(p.width.contains(64) && p.height.contains(48))
      assert(p.nSamples.contains((f * spf).toLong))
      assert(p.nChunks.contains(f.toLong)) // fragments
      val perFrag = (0 until spf).map(i => 20 + i % 7).sum.toLong
      assert(p.mdatBytes.contains(f * perFrag))
      assert(p.sampleSpan.contains(f * perFrag))
    }
  }

  test("fragmented corruption is rejected: sequence, offsets, truncation") {
    val good = Mp4Io.encodeFmp4(widthMbs = 4, heightMbs = 3,
      nFragments = 3, samplesPerFrag = 5, sampleDelta = 120L,
      timescale = 1000L, seed = 9L)
    assert(Mp4Io.parseMp4(good).ok)
    // cut inside the last fragment's mdat
    assert(!Mp4Io.parseMp4(good.take(good.length - 10)).ok)
    // mfhd sequence number tampered: 1,2,3 -> 1,5,3
    val reseq = good.clone()
    val mfhd2 = {
      val t = "mfhd".getBytes("US-ASCII")
      (0 to reseq.length - 4).filter(i =>
        reseq(i) == t(0) && reseq(i + 1) == t(1) && reseq(i + 2) == t(2) &&
          reseq(i + 3) == t(3)).apply(1)
    }
    reseq(mfhd2 + 11) = 5.toByte
    assert(!Mp4Io.parseMp4(reseq).ok)
    // trun data offset shifted: fragment data escapes its mdat
    val shifted = good.clone()
    val trun1 = idx(shifted, "trun")
    shifted(trun1 + 14) = (shifted(trun1 + 14) + 0x40).toByte
    assert(!Mp4Io.parseMp4(shifted).ok)
    // sniff still routes by the leading ftyp, iso6 brand included
    import spark.implicits._
    val got = Sniff.route(Seq((0L, good)).toDF("asset_id", "content"))
      .select("detected").head().getString(0)
    assert(got == "video/mp4")
  }

  test("synthetic asset table parses all-ok through the kernel seam") {
    val parsed = Multimodal.parseMp4Streams(
      Multimodal.syntheticMp4Assets(spark, 16))
    val rows = parsed.collect()
    assert(rows.length == 16 && rows.forall(_.getAs[Boolean]("ok")))
    val r4 = rows.find(_.getAs[Long]("asset_id") == 4L).get
    // id 4: crop off, width 16*(2+4%6)=96, n = 8+4%13 = 12,
    // delta 120+30*(4%5)=240, ts 1000*(1+4%3)=2000 → 12*240*1000/2000
    assert(r4.getAs[Int]("width") == 96)
    assert(r4.getAs[Long]("n_samples") == 12L)
    assert(r4.getAs[Long]("duration_ms") == 1440L)
    val r5 = rows.find(_.getAs[Long]("asset_id") == 5L).get
    // id 5 IS cropped (5 % 5 == 0): width 16*(2+5)-2 = 110
    assert(r5.getAs[Int]("width") == 110)
  }
}
