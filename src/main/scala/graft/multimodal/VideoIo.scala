package graft.multimodal

/** REAL video demux kernels over the [[MediaKernel]] seam, the video
  * twin of [[ImageIo]]/[[AudioIo]]: YUV4MPEG2 (`.y4m`) — the
  * uncompressed interchange format of mjpegtools/ffmpeg/x264, chosen
  * because it is fully parseable with zero external dependencies
  * (plain-text stream header + `FRAME` markers + raw planar YUV).
  * With this, MM3 (video demux + frame sampling) does real work on
  * real bytes: the demuxer walks genuine frame boundaries and the
  * sampler reads genuine luma planes. Compressed video (H.264/VP9)
  * stays the documented stub — no codec ships in this container.
  *
  * Format (public spec: mjpegtools `yuv4mpeg(5)`):
  * {{{
  *   YUV4MPEG2 W<w> H<h> F<num>:<den> [I<x>] [A<n>:<d>] [C<cs>] [X..]\n
  *   FRAME[ <tags>]\n<w*h luma bytes><chroma planes per colorspace>
  *   FRAME ...
  * }}}
  * Frame payload by colorspace: 420* → w·h·3/2, 422 → 2·w·h,
  * 444 → 3·w·h, mono → w·h. `C` defaults to 420jpeg per the spec.
  *
  * ==Failure semantics==
  * Same as [[ImageIo]]: a malformed header, unknown colorspace, bad
  * frame marker, or TRUNCATED final frame yields `ok = false` with
  * null facts (sampler: empty frame list) — corrupt assets are
  * captured, not fatal, and a partial asset is never half-decoded.
  *
  * ==Scale notes==
  * Demux is map-shaped (no shuffle) and single-pass. The demuxer
  * materializes one Long per frame (a 2-hour 30 fps stream ≈ 216k
  * frames ≈ 1.7 MB — bounded by content, released per batch); the
  * sampler touches only the sampled frames' luma planes, skipping
  * chroma and unsampled payloads entirely. */
object VideoIo {

  /** Demuxed stream facts. `durationMs` is floor((frames·1000·den)/num)
    * in exact Long arithmetic — reproducible across engines. */
  final case class Decoded(width: Option[Int], height: Option[Int],
                           fpsNum: Option[Int], fpsDen: Option[Int],
                           colorspace: Option[String],
                           nFrames: Option[Int], durationMs: Option[Long],
                           ok: Boolean)

  /** One sampled frame: index, byte offset of its raw payload (first
    * luma byte), and the exact sum of its luma-plane bytes — integer
    * facts a spec or SQL oracle can recompute independently. */
  final case class Frame(frameIdx: Int, byteOff: Long, lumaSum: Long)

  private[multimodal] final case class Parsed(
      w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      cs: String, frameOffsets: Array[Long])

  /** Luma-plane bytes per frame (= sampler read span). */
  private def lumaSize(w: Int, h: Int): Int = w * h

  /** Full frame payload for a colorspace, or None if unsupported. */
  private def frameSize(cs: String, w: Int, h: Int): Option[Int] =
    if (cs.startsWith("420")) Some(w * h + 2 * ((w / 2) * (h / 2)))
    else if (cs.startsWith("422")) Some(w * h * 2)
    else if (cs.startsWith("444") && cs != "444alpha") Some(w * h * 3)
    else if (cs == "mono") Some(w * h)
    else None

  private def newlineAt(bytes: Array[Byte], from: Int, bound: Int): Int = {
    var i = from
    val lim = math.min(bytes.length, bound)
    while (i < lim && bytes(i) != '\n') i += 1
    if (i < lim) i else -1
  }

  /** Single-pass demux: header facts + the payload offset of every
    * frame. None ⇔ the stream is malformed anywhere (header, marker,
    * colorspace, or truncation). Package-visible so the frame-hash
    * sampler ([[MediaPhash]]) rides the same walk. */
  private[multimodal] def parseY4m(bytes: Array[Byte]): Option[Parsed] =
    parse(bytes)

  private def parse(bytes: Array[Byte]): Option[Parsed] = {
    val hEnd = newlineAt(bytes, 0, 512)
    if (hEnd < 0) return None
    val header = new String(bytes, 0, hEnd, java.nio.charset.StandardCharsets.US_ASCII)
    val toks = header.split(" ")
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
    var w, h, fn, fd = -1
    var cs = "420jpeg" // spec default
    toks.iterator.drop(1).foreach { t =>
      if (t.nonEmpty) try {
        t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'F' =>
            val p = t.substring(1).split(":")
            if (p.length == 2) { fn = p(0).toInt; fd = p(1).toInt }
          case 'C' => cs = t.substring(1)
          case _   => () // I (interlace), A (aspect), X (metadata)
        }
      } catch { case _: NumberFormatException => () }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val fsize = frameSize(cs, w, h).getOrElse(return None)
    val offsets = Array.newBuilder[Long]
    var pos = hEnd + 1
    val frameMarker = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    while (pos < bytes.length) {
      if (pos + frameMarker.length > bytes.length ||
          !frameMarker.indices.forall(i => bytes(pos + i) == frameMarker(i)))
        return None
      val nl = newlineAt(bytes, pos + frameMarker.length, pos + 512)
      if (nl < 0) return None
      val dataStart = nl + 1
      if (dataStart + fsize > bytes.length) return None // truncated frame
      offsets += dataStart.toLong
      pos = dataStart + fsize
    }
    Some(Parsed(w, h, fn, fd, cs, offsets.result()))
  }

  final class Decoder extends MediaKernel.Handle[Array[Byte], Decoded] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Decoded] =
      batch.map { bytes =>
        parse(bytes) match {
          case Some(p) =>
            val n = p.frameOffsets.length
            Decoded(Some(p.w), Some(p.h), Some(p.fpsNum), Some(p.fpsDen),
                    Some(p.cs), Some(n),
                    Some(n.toLong * 1000L * p.fpsDen / p.fpsNum), ok = true)
          case None =>
            Decoded(None, None, None, None, None, None, None, ok = false)
        }
      }
  }

  val decoderFactory: MediaKernel.Factory[Array[Byte], Decoded] =
    new MediaKernel.Factory[Array[Byte], Decoded] {
      def open() = new Decoder
    }

  /** Samples frames 0, everyNth, 2·everyNth, … (at most `maxFrames`)
    * and reads each sampled frame's REAL luma plane for its byte sum —
    * the demux + per-frame-work shape of a keyframe-thumbnail or
    * frame-dedup stage. Corrupt stream → empty list. */
  final class FrameSampler(everyNth: Int, maxFrames: Int)
      extends MediaKernel.Handle[Array[Byte], Seq[Frame]] {
    require(everyNth > 0 && maxFrames > 0,
      s"bad sampling: every $everyNth, max $maxFrames")
    def processBatch(batch: Seq[Array[Byte]]): Seq[Seq[Frame]] =
      batch.map { bytes =>
        parse(bytes) match {
          case None => Seq.empty
          case Some(p) =>
            val ls = lumaSize(p.w, p.h)
            val out = Seq.newBuilder[Frame]
            var idx = 0
            var taken = 0
            while (idx < p.frameOffsets.length && taken < maxFrames) {
              val off = p.frameOffsets(idx).toInt
              var sum = 0L
              var i = off
              while (i < off + ls) { sum += bytes(i) & 0xff; i += 1 }
              out += Frame(idx, p.frameOffsets(idx), sum)
              taken += 1
              idx += everyNth
            }
            out.result()
        }
      }
  }

  def samplerFactory(everyNth: Int, maxFrames: Int)
      : MediaKernel.Factory[Array[Byte], Seq[Frame]] =
    new MediaKernel.Factory[Array[Byte], Seq[Frame]] {
      def open() = new FrameSampler(everyNth, maxFrames)
    }

  /** Deterministic Y4M stream: `nFrames` frames of `width`×`height`,
    * luma(x, y, f) = (7·seed + 13·f + 3·x + 5·y) mod 256 (linear so a
    * SQL oracle can recompute the sums exactly), chroma neutral 128.
    * Real bytes in the real container layout, so the demux kernel is
    * exercised on genuine Y4M content. 420jpeg requires even dims. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                nFrames: Int, seed: Long,
                colorspace: String = "420jpeg"): Array[Byte] = {
    require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0 &&
            nFrames >= 0,
      s"bad Y4M shape: ${width}x$height F$fpsNum:$fpsDen x$nFrames")
    require(colorspace != "420jpeg" || (width % 2 == 0 && height % 2 == 0),
      s"420jpeg needs even dims, got ${width}x$height")
    val fsize = frameSize(colorspace, width, height)
      .getOrElse(throw new IllegalArgumentException(
        s"unsupported colorspace $colorspace"))
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes(ascii)
    val marker = "FRAME\n".getBytes(ascii)
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (marker.length + fsize))
    out.write(header)
    var f = 0
    while (f < nFrames) {
      out.write(marker)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out.write((((7 * seed + 13 * f + 3 * x + 5 * y) % 256 + 256)
            % 256).toInt)
          x += 1
        }
        y += 1
      }
      var c = lumaSize(width, height)
      while (c < fsize) { out.write(128); c += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic TEXTURED Y4M fixture: luma is a per-video random
    * 4×4-block texture (fnv1a64 over (seed, frame, block)) — unlike
    * [[encodeY4m]]'s linear ramp (which every video shares up to a
    * constant shift, useless for perceptual separation), textures
    * from different seeds are uncorrelated, so frame pHashes land
    * ~32 bits apart across videos and identical within one.
    * `quantBits` < 8 requantizes the luma (keep the high bits,
    * mid-step fill) — the "re-encode at lower depth" clone for the
    * video near-dup plants. Chroma neutral 128. */
  def encodeY4mTextured(width: Int, height: Int, fpsNum: Int,
                        fpsDen: Int, nFrames: Int, seed: Long,
                        quantBits: Int = 8,
                        colorspace: String = "420jpeg"): Array[Byte] = {
    require(quantBits >= 1 && quantBits <= 8, s"bad quantBits $quantBits")
    require(colorspace != "420jpeg" || (width % 2 == 0 && height % 2 == 0),
      s"420jpeg needs even dims, got ${width}x$height")
    val fsize = frameSize(colorspace, width, height)
      .getOrElse(throw new IllegalArgumentException(
        s"unsupported colorspace $colorspace"))
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes(ascii)
    val marker = "FRAME\n".getBytes(ascii)
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (marker.length + fsize))
    out.write(header)
    val drop = 8 - quantBits
    var f = 0
    while (f < nFrames) {
      out.write(marker)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val h = graft.functions.SimHash64.fnv1a64(Array(
            seed.toByte, (seed >> 8).toByte, (seed >> 16).toByte,
            f.toByte, (x / 4).toByte, (y / 4).toByte))
          // raw FNV bytes are NOT usable here: for 6-byte inputs the
          // low byte is a weak mod-256 lattice (whole frames repeated
          // across (seed+20, frame+4) deltas) and the high bytes are
          // near-constant (diffusion climbs only ~9 bits per multiply)
          // — run the murmur3 fmix64 finalizer for full avalanche
          var z = h
          z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
          z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
          z ^= z >>> 33
          var v = (z & 0xffL).toInt
          if (drop > 0) v = ((v >> drop) << drop) | (1 << (drop - 1))
          out.write(v)
          x += 1
        }
        y += 1
      }
      var c = lumaSize(width, height)
      while (c < fsize) { out.write(128); c += 1 }
      f += 1
    }
    out.toByteArray
  }
}
