package graft.multimodal

import java.awt.image.BufferedImage
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MM2 gate (VERDICT r7 #1): image decode does REAL work on REAL
  * bytes — genuine PNGs through `javax.imageio`, exact known
  * dims/bands asserted back out, corrupt bytes captured not fatal. */
class ImageIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("encodePng → Decoder round-trips exact dims, bands, and format") {
    val dec = new ImageIo.Decoder
    val cases = Seq(
      (3, 5, BufferedImage.TYPE_INT_RGB, 3),
      (7, 2, BufferedImage.TYPE_INT_ARGB, 4),
      (4, 4, BufferedImage.TYPE_BYTE_GRAY, 1),
      (1, 1, BufferedImage.TYPE_INT_RGB, 3))
    val out = dec.processBatch(
      cases.map { case (w, h, t, _) => ImageIo.encodePng(w, h, 42L, t) })
    out.zip(cases).foreach { case (d, (w, h, _, bands)) =>
      assert(d.ok, s"decode must succeed for ${w}x$h")
      assert(d.width.contains(w) && d.height.contains(h),
        s"expected ${w}x$h, got ${d.width}x${d.height}")
      assert(d.channels.contains(bands), s"expected $bands bands, got ${d.channels}")
      assert(d.format.contains("png"))
    }
  }

  test("encodePng is deterministic; different seeds give different bytes") {
    val a = ImageIo.encodePng(5, 5, 1L)
    val b = ImageIo.encodePng(5, 5, 1L)
    val c = ImageIo.encodePng(5, 5, 2L)
    assert(a.sameElements(b), "same (dims, seed) must encode identical bytes")
    assert(!a.sameElements(c), "different seed must change pixel content")
  }

  test("corrupt bytes are captured as ok=false, never thrown") {
    val dec = new ImageIo.Decoder
    val garbage = Seq(
      Array.empty[Byte],
      "not an image at all".getBytes("UTF-8"),
      // a PNG signature followed by garbage — readers found, read fails
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
                  1, 2, 3, 4))
    val out = dec.processBatch(garbage)
    assert(out.forall(d => !d.ok && d.width.isEmpty && d.channels.isEmpty))
  }

  test("decodeImages: real decode distributed, exact facts, invariant to partitioning/batch") {
    val assets = Multimodal.syntheticImageAssets(spark, 30).cache()
    val d = Multimodal.decodeImages(assets).cache()
    assert(d.columns.toSeq ==
      Seq("asset_id", "width", "height", "channels", "format", "ok"))
    assert(d.count() == 30)
    assert(d.filter(!col("ok")).count() == 0, "all synthetic PNGs decode")
    // exact dims are a pure function of the id — assert them all
    d.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1 + (id % 9).toInt, s"width mismatch for $id")
      assert(r.getInt(2) == 1 + (id % 7).toInt, s"height mismatch for $id")
      val bands = (id % 3) match { case 0 => 3; case 1 => 4; case _ => 1 }
      assert(r.getInt(3) == bands, s"bands mismatch for $id")
      assert(r.getString(4) == "png")
    }
    val repart = Multimodal.decodeImages(assets.repartition(7), batchSize = 3)
    assert(d.exceptAll(repart).count() == 0,
      "decode output must not depend on partitioning or batch size")
  }

  test("decodeImages: mixed good/corrupt column quarantines cleanly") {
    val good = Multimodal.syntheticImageAssets(spark, 6)
    import spark.implicits._
    val bad = Seq((100L, "image", "plain text bytes".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "content")
    val d = Multimodal.decodeImages(good.union(bad))
    assert(d.filter(col("ok")).count() == 6)
    val q = d.filter(!col("ok")).collect()
    assert(q.length == 1 && q.head.getLong(0) == 100L)
    assert(q.head.isNullAt(1) && q.head.isNullAt(3),
      "undecodable rows carry null facts")
  }
}
