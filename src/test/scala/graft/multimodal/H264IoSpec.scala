package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex-B structural walking ([[H264Io]]): authored streams
  * round-trip through the NAL walker + exp-Golomb SPS decode with
  * exact geometry; emulation prevention round-trips adversarial byte
  * runs; corruption in every structural position is rejected. */
class H264IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("uncropped stream round-trips with exact geometry and census") {
    val p = H264Io.parseAnnexB(H264Io.encodeAnnexB(
      widthMbs = 5, heightMbs = 3, nIdr = 2, nNonIdr = 4, seed = 1L))
    assert(p.ok)
    assert(p.width.contains(80) && p.height.contains(48))
    assert(p.profileIdc.contains(66) && p.levelIdc.contains(30))
    assert(p.nNal.contains(8)) // SPS + PPS + 2 IDR + 4 non-IDR
    assert(p.nIdr.contains(2) && p.nNonIdr.contains(4))
  }

  test("frame cropping yields non-multiple-of-16 dims (4:2:0 units)") {
    val p = H264Io.parseAnnexB(H264Io.encodeAnnexB(
      2, 2, nIdr = 1, nNonIdr = 0, seed = 2L,
      cropRight = 3, cropBottom = 1))
    assert(p.ok)
    assert(p.width.contains(32 - 6))  // crop unit x = 2
    assert(p.height.contains(32 - 2)) // crop unit y = 2 (frame_mbs_only)
  }

  test("emulation prevention round-trips adversarial zero runs") {
    val cases = Seq(
      Array[Byte](0, 0, 0), Array[Byte](0, 0, 1), Array[Byte](0, 0, 2),
      Array[Byte](0, 0, 3), Array[Byte](0, 0, 0, 0, 0, 1),
      Array[Byte](1, 0, 0, 3, 0, 0, 2, 0), Array[Byte](0, 0),
      Array.fill(9)(0.toByte))
    for (c <- cases) {
      val ebsp = H264Io.addEmulation(c)
      // no 00 00 {00,01,02} survives in EBSP (00 00 03 is the legal
      // emulation-prevention form itself)
      assert(!ebsp.sliding(3).exists(w =>
        w.length == 3 && w(0) == 0 && w(1) == 0 && (w(2) & 0xff) <= 2),
        s"unprotected triple in ${ebsp.mkString(",")}")
      assert(H264Io.stripEmulation(ebsp).sameElements(c))
    }
  }

  test("high-profile SPS (chroma_format_idc prefix fields) decodes") {
    // hand-written profile-100 SPS: the walker must consume the
    // chroma/bit-depth prefix before the geometry fields
    val w = new H264Io.BitWriter
    w.u(100, 8) // profile_idc: High
    w.u(0, 8); w.u(31, 8) // constraints, level 3.1
    w.ue(0)     // sps_id
    w.ue(1)     // chroma_format_idc 4:2:0
    w.ue(0); w.ue(0) // bit depths
    w.u(0, 1)   // qpprime
    w.u(0, 1)   // no scaling matrix
    w.ue(0)     // log2_max_frame_num_minus4
    w.ue(2)     // pic_order_cnt_type
    w.ue(1)     // max_num_ref_frames
    w.u(0, 1)   // gaps allowed
    w.ue(7); w.ue(4) // 8x5 mbs
    w.u(1, 1); w.u(1, 1) // frame_mbs_only, direct_8x8
    w.u(0, 1); w.u(0, 1) // no crop, no vui
    val sps = w.trailing()
    val stream = Array[Byte](0, 0, 0, 1, 0x67) ++
      H264Io.addEmulation(sps) ++
      Array[Byte](0, 0, 1, 0x65, 9, 9, 9) // one IDR slice
    val p = H264Io.parseAnnexB(stream)
    assert(p.ok)
    assert(p.width.contains(128) && p.height.contains(80))
    assert(p.profileIdc.contains(100) && p.levelIdc.contains(31))
    assert(p.nIdr.contains(1))
  }

  test("pic_order_cnt_type 0 and 1 field groups are consumed") {
    for (poc <- Seq(0, 1)) {
      val w = new H264Io.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(30, 8)
      w.ue(0); w.ue(0)
      w.ue(poc)
      if (poc == 0) w.ue(4)
      else { w.u(0, 1); w.se(0); w.se(0); w.ue(2); w.se(1); w.se(-1) }
      w.ue(1); w.u(0, 1)
      w.ue(3); w.ue(2)
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      val stream = Array[Byte](0, 0, 0, 1, 0x67) ++
        H264Io.addEmulation(w.trailing()) ++
        Array[Byte](0, 0, 1, 0x65, 1)
      val p = H264Io.parseAnnexB(stream)
      assert(p.ok && p.width.contains(64) && p.height.contains(48),
        s"poc $poc")
    }
  }

  test("corruption is rejected, never mis-read") {
    val good = H264Io.encodeAnnexB(2, 2, 1, 1, seed = 5L)
    // no leading start code (drop(1) would still leave a legal
    // 3-byte code — drop 2 to break it)
    assert(!H264Io.parseAnnexB(good.drop(2)).ok)
    // forbidden_zero_bit set on the first NAL
    val fb = good.clone; fb(4) = (fb(4) | 0x80).toByte
    assert(!H264Io.parseAnnexB(fb).ok)
    // SPS payload truncated mid-bitstream (cut inside the first NAL)
    assert(!H264Io.parseAnnexB(good.take(7)).ok)
    // slices but no SPS at all
    assert(!H264Io.parseAnnexB(
      Array[Byte](0, 0, 0, 1, 0x65, 1, 2, 3)).ok)
    // reserved NAL type 0
    assert(!H264Io.parseAnnexB(
      Array[Byte](0, 0, 0, 1, 0x60, 1, 2)).ok)
    // junk / empty / null
    assert(!H264Io.parseAnnexB("NOT A MEDIA FILE".getBytes).ok)
    assert(!H264Io.parseAnnexB(Array.emptyByteArray).ok)
    assert(!H264Io.parseAnnexB(null).ok)
  }

  test("sampleNals: offsets, sizes, and payload sums match an independent scan") {
    val b = H264Io.encodeAnnexB(3, 2, nIdr = 3, nNonIdr = 5, seed = 9L)
    // independent ground truth: locate every start code by brute scan
    val codes = (0 until b.length - 3).flatMap { i =>
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) Some((i, 3))
      else if (i + 4 <= b.length && b(i) == 0 && b(i + 1) == 0 &&
               b(i + 2) == 0 && b(i + 3) == 1) Some((i, 4))
      else None
    }.foldLeft(Vector.empty[(Int, Int)]) { (acc, c) =>
      // keep only non-overlapping codes (a 4-byte code also matches
      // the 3-byte pattern one position later)
      if (acc.nonEmpty && c._1 < acc.last._1 + acc.last._2) acc
      else acc :+ c
    }
    // NAL k runs from just after its start code to the next code's
    // first byte (or EOF): (headerOff, type, length)
    val nals = codes.zipWithIndex.map { case ((off, sc), k) =>
      val start = off + sc
      val end = if (k + 1 < codes.length) codes(k + 1)._1 else b.length
      (start, b(start) & 0x1f, end - start)
    }
    val slices = nals.filter { case (_, t, _) => t == 1 || t == 5 }
    val got = H264Io.sampleNals(b, everyNth = 3, maxFrames = 2)
    assert(got.size == 2)
    for ((s, k) <- got.zipWithIndex) {
      val (off, t, len) = slices(k * 3)
      assert(s.sliceIdx == k * 3 && s.byteOff == off && s.nalType == t &&
             s.nalBytes == len, s"sample $k")
      // payload sum recomputed directly over the sampled NAL's bytes
      val expSum = (off + 1 until off + len)
        .map(j => (b(j) & 0xff).toLong).sum
      assert(s.paySum == expSum, s"paySum $k")
    }
    // everyNth=1, large cap: all 8 slices, IDR first then non-IDR
    val all = H264Io.sampleNals(b, 1, 100)
    assert(all.size == 8)
    assert(all.take(3).forall(_.nalType == 5) &&
           all.drop(3).forall(_.nalType == 1))
    // corrupt stream: no samples
    assert(H264Io.sampleNals("junk".getBytes, 1, 10).isEmpty)
  }

  test("sampleH264Nals: one row per sampled slice, stable across batch size") {
    val assets = Multimodal.syntheticH264Assets(spark, 12)
    val a = Multimodal.sampleH264Nals(assets, everyNth = 2, maxFrames = 3,
        batchSize = 64)
      .orderBy(col("asset_id"), col("slice_idx")).collect()
    val c = Multimodal.sampleH264Nals(assets, everyNth = 2, maxFrames = 3,
        batchSize = 1)
      .orderBy(col("asset_id"), col("slice_idx")).collect()
    assert(a.toSeq == c.toSeq)
    assert(a.nonEmpty && a.forall(r => Set(1, 5)(r.getAs[Int]("nal_type"))))
  }

  test("parseH264Streams: every synthetic asset parses ok with id-exact facts") {
    val out = Multimodal.parseH264Streams(
        Multimodal.syntheticH264Assets(spark, 32))
      .orderBy(col("asset_id")).collect()
    assert(out.length == 32)
    for (r <- out) {
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Boolean]("ok"), s"id $id")
      val crop = if (id % 5 == 0) 2 else 0
      assert(r.getAs[Int]("width") == 16 * (1 + id % 6) - crop, s"id $id")
      assert(r.getAs[Int]("height") == 16 * (1 + id % 4) - crop)
      assert(r.getAs[Int]("n_idr") == 1 + id % 3)
      assert(r.getAs[Int]("n_nal") == 2 + (1 + id % 3) + id % 5)
    }
  }
}
