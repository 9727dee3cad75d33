package graft.multimodal

import graft.TestSpark
import graft.dedup.Dedup
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImagePhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  private def reencode(png: Array[Byte], format: String): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  /** Decode, nudge a few pixels by +2 per channel, re-encode — the
    * smallest perceptual perturbation that still changes the bytes. */
  private def noised(png: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    (0 until 5).foreach { i =>
      val x = (i * 13) % img.getWidth
      val y = (i * 7) % img.getHeight
      val rgb = img.getRGB(x, y)
      def bump(c: Int) = math.min(255, c + 2)
      img.setRGB(x, y,
        (bump((rgb >> 16) & 0xff) << 16) | (bump((rgb >> 8) & 0xff) << 8) |
          bump(rgb & 0xff))
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // random-texture images: full DCT spectrum, so the median threshold
  // is well-separated and the hash is stable under tiny perturbations
  lazy val base: Array[Byte] = ImageIo.encodePng(64, 64, seed = 1L)
  lazy val other: Array[Byte] = ImageIo.encodePng(64, 64, seed = 2L)

  test("re-encoding identical pixels (PNG -> BMP) gives the identical hash") {
    val hPng = ImagePhash.phash64(base).get
    val hBmp = ImagePhash.phash64(reencode(base, "bmp")).get
    assert(hPng == hBmp)
  }

  test("tiny pixel noise stays within the band-join radius; unrelated " +
       "images are far") {
    val h0 = ImagePhash.phash64(base).get
    val hN = ImagePhash.phash64(noised(base)).get
    assert(hamming(h0, hN) <= 3,
      s"noise moved the hash ${hamming(h0, hN)} bits")
    val h2 = ImagePhash.phash64(other).get
    assert(hamming(h0, h2) > 10,
      s"unrelated images only ${hamming(h0, h2)} bits apart")
  }

  test("hash is invariant under upscaling (area-average resample)") {
    // the same texture drawn at 2x size: every 2x2 block is the
    // original pixel, so the 32x32 area averages are identical
    val img = ImageIO.read(new ByteArrayInputStream(base))
    val big = new java.awt.image.BufferedImage(
      128, 128, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 128; x <- 0 until 128)
      big.setRGB(x, y, img.getRGB(x / 2, y / 2))
    val out = new ByteArrayOutputStream()
    ImageIO.write(big, "png", out)
    assert(ImagePhash.phash64(base).get ==
           ImagePhash.phash64(out.toByteArray).get)
  }

  test("undecodable bytes hash to None") {
    assert(ImagePhash.phash64("not an image".getBytes).isEmpty)
    assert(ImagePhash.phash64(Array.empty[Byte]).isEmpty)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  test("DCT features: re-encode identical, noise cosine ~ 1, " +
       "unrelated near 0, garbage empty") {
    val f0 = ImagePhash.dctFeatures(base).get
    assert(f0.length == 63)
    assert(math.abs(f0.map(x => x.toDouble * x).sum - 1.0) < 1e-6,
      "L2-normalized")
    assert(f0.sameElements(ImagePhash.dctFeatures(reencode(base, "bmp")).get))
    assert(cosine(f0, ImagePhash.dctFeatures(noised(base)).get) > 0.99)
    assert(math.abs(cosine(f0, ImagePhash.dctFeatures(other).get)) < 0.5,
      "unrelated textures must not align")
    assert(ImagePhash.dctFeatures("junk".getBytes).isEmpty)
    assert(new ImagePhash.FeatureExtractor()
      .processBatch(Seq("junk".getBytes)).head.isEmpty)
  }

  test("composition: real DCT features through batchedFeatureExtract " +
       "feed cosine near-dup exactly like a learned embedding would") {
    import spark.implicits._
    val assets = Seq(
      (1L, base), (2L, noised(base)), (3L, other),
      (4L, ImageIo.encodePng(64, 64, seed = 3L))
    ).toDF("asset_id", "content")
    val feats = Multimodal.batchedFeatureExtract(
        assets, kernel = ImagePhash.featureFactory)
      .filter(size(col("features")) > 0)
    val pairs = Dedup.embeddingNearDuplicates(
        feats, vecCol = "features", idCol = "asset_id",
        minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("phashNearDuplicates finds planted re-encodes and perturbations, " +
       "quarantines garbage, skips unrelated pairs") {
    import spark.implicits._
    val assets = Seq(
      (1L, base),
      (2L, reencode(base, "bmp")),       // re-encode -> hamming 0
      (3L, noised(base)),                // perceptual twin -> <= 3
      (4L, other),                       // unrelated
      (5L, "garbage".getBytes)           // undecodable -> dropped
    ).toDF("asset_id", "content")
    val pairs = Dedup.phashNearDuplicates(assets)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs")
  }
}
