package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.ImageInputStream

/** REAL image codec kernels over the [[MediaKernel]] seam: decode via
  * the JDK's built-in `javax.imageio` (PNG / JPEG / BMP / GIF — zero
  * external dependencies), in exactly the batched `mapPartitions`
  * shape a native codec runs in on a cluster. With this, MM2 (image
  * decode) does real work on real bytes; audio/video demux stay
  * stubbed ([[Multimodal]] header) because the JDK ships no codec for
  * them.
  *
  * Reference behavior being rebuilt: the capstone's pipelines treat
  * media as opaque columns and decode lazily per stage; here decode is
  * a per-partition kernel so blobs never ride a shuffle.
  *
  * ==Failure semantics==
  * A training-data pipeline must CAPTURE corrupt assets, not crash the
  * stage (same posture as the CSV/JSONL corrupt-record columns in
  * `sources/`): undecodable bytes yield `ok = false` with null facts,
  * and the caller filters or quarantines on that flag.
  *
  * ==Scale notes==
  * Decode is map-shaped (no shuffle); `ImageIO`'s default DISK cache
  * is turned off once per handle so executor-local decode never writes
  * scratch files — at 1000 executors a per-image temp file is an IOPS
  * storm. Memory: only dimensions/bands are materialized per image
  * here (the `BufferedImage` is released batch by batch); a
  * pixel-consuming kernel would stream rasters row-wise instead.
  */
object ImageIo {

  /** Decoded image facts. `ok = false` marks undecodable bytes; its
    * numeric fields are null once lifted to a DataFrame (Option). */
  final case class Decoded(width: Option[Int], height: Option[Int],
                           channels: Option[Int], format: Option[String],
                           ok: Boolean)

  /** Real decode handle: one `javax.imageio` configuration per
    * partition, one pass per batch. Thread-safe per Spark's task model
    * (one handle per task, never shared). */
  final class Decoder extends MediaKernel.Handle[Array[Byte], Decoded] {
    // per-handle (≈ per-task) config: no scratch-file cache on executors
    ImageIO.setUseCache(false)

    def processBatch(batch: Seq[Array[Byte]]): Seq[Decoded] =
      batch.map(decodeOne)

    private def decodeOne(bytes: Array[Byte]): Decoded = {
      var iis: ImageInputStream = null
      try {
        iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Decoded(None, None, None, None, ok = false)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val fmt = reader.getFormatName.toLowerCase
            val img = reader.read(0)
            Decoded(Some(img.getWidth), Some(img.getHeight),
                    Some(img.getRaster.getNumBands), Some(fmt), ok = true)
          } finally reader.dispose()
        }
      } catch {
        case _: Exception => Decoded(None, None, None, None, ok = false)
      } finally if (iis != null) iis.close()
    }
  }

  val decoderFactory: MediaKernel.Factory[Array[Byte], Decoded] =
    new MediaKernel.Factory[Array[Byte], Decoded] {
      def open() = new Decoder
    }

  /** REAL transcode: decode with `javax.imageio`, re-encode in
    * `format` ("png"/"bmp"/"jpg"...) — the re-encode half of a resize/
    * normalize stage, and the planted-twin generator for perceptual
    * dedup (same pixels, different container → same pHash). Throws on
    * undecodable input or a missing writer — fixture-side tool; the
    * quarantining decode paths are the kernels. */
  def transcode(bytes: Array[Byte], format: String): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "transcode: input does not decode")
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  /** Deterministic tiny PNG: `width`×`height`, each pixel's RGB a pure
    * function of (seed, x, y). Real bytes through the real encoder —
    * used by specs and [[Multimodal.syntheticImageAssets]] so the
    * decode kernel is exercised on genuine PNG content, not
    * text-cast-to-binary. Grayscale variant exercises 1-band rasters,
    * ARGB exercises 4. */
  def encodePng(width: Int, height: Int, seed: Long,
                imageType: Int = BufferedImage.TYPE_INT_RGB): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, imageType)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, (seed >> 8).toByte, x.toByte, y.toByte))
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
