package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL MPEG-audio (MP3) STRUCTURAL kernels — frame-header walking,
  * the industry-standard way an ingest pipeline gets duration /
  * bitrate / sample-rate facts from compressed audio WITHOUT a
  * decoder: every MPEG audio frame carries a self-describing 4-byte
  * header (sync + version + layer + bitrate/sample-rate indices +
  * padding), and the frame's byte length is pure arithmetic over
  * those fields, so a single forward walk yields the frame count,
  * total samples, duration, and CBR/VBR disposition of a stream
  * while reading only 4 bytes per frame. This is exactly what
  * `ffprobe`/Tika do for MP3 metadata before any codec is invoked —
  * the curation-relevant facts (duration, bitrate, rate, channels)
  * need NO sample decode.
  *
  * With this kernel, compressed AUDIO metadata moves off the
  * documented stub list ([[Multimodal]] header): header parsing is
  * real work on real bytes. Only the psychoacoustic SAMPLE decode
  * (Huffman + IMDCT) remains environmental — no codec ships in this
  * container, and no curation fact below needs it.
  *
  * ==What the walker handles==
  *  - ID3v2 prefix tags (syncsafe 28-bit size, skipped structurally);
  *  - ID3v1 trailing 128-byte `TAG` blocks;
  *  - MPEG-1 / MPEG-2 / MPEG-2.5 × Layer I/II/III — the full public
  *    bitrate and sample-rate index tables;
  *  - padding bits (frame length +1 slot, +4 for Layer I);
  *  - VBR streams (per-frame bitrate varies; reported as the exact
  *    floor of the per-frame mean, `vbr = true`);
  *  - corruption: bad sync, reserved version/layer/index values,
  *    mid-stream truncation, or trailing junk → `ok = false` with
  *    null facts (captured, not fatal — same posture as [[ImageIo]]).
  *  - "free format" (bitrate index 0) is treated as unparseable: its
  *    frame length is only discoverable by resync heuristics, and a
  *    curation pipeline quarantines it rather than guess.
  *
  * ==Scale notes==
  * The walk is map-shaped per partition over the [[MediaKernel]]
  * seam (no shuffle) and touches 4 bytes per ~400-byte frame —
  * header-only cost, like [[AudioIo]]'s unread PCM stream. */
object Mp3Io {

  /** Parsed structural facts of one MPEG audio stream. `xingFrames`
    * is the audio-frame count DECLARED by a Xing/Info tag when the
    * stream carries one (the first-frame VBR header every real
    * encoder writes); the walker counts frames itself either way and
    * rejects a disagreeing declaration as corruption. */
  final case class Parsed(sampleRateHz: Option[Int], channels: Option[Int],
                          frames: Option[Long], durationMs: Option[Long],
                          bitrateKbps: Option[Int], vbr: Option[Boolean],
                          layer: Option[Int], versionId: Option[String],
                          id3v2Bytes: Option[Int],
                          xingFrames: Option[Long], ok: Boolean)

  private val Bad = Parsed(None, None, None, None, None, None, None, None,
                           None, None, ok = false)

  // Public MPEG audio header tables (ISO/IEC 11172-3 / 13818-3).
  // Indexed [versionGroup][layer][bitrateIndex]; versionGroup 0 = MPEG-1,
  // 1 = MPEG-2/2.5 (they share bitrate tables). kbps; -1 = invalid.
  private val BitrateKbps: Array[Array[Array[Int]]] = Array(
    Array( // MPEG-1
      Array(-1, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, -1), // Layer I
      Array(-1, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, -1),    // Layer II
      Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)),    // Layer III
    Array( // MPEG-2 / 2.5
      Array(-1, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, -1),    // Layer I
      Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1),         // Layer II
      Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)))        // Layer III

  // Sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1) × index.
  private val SampleRateHz: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000, -1), // MPEG-1
    2 -> Array(22050, 24000, 16000, -1), // MPEG-2
    0 -> Array(11025, 12000, 8000, -1))  // MPEG-2.5

  /** Samples per frame: Layer I = 384; Layer II = 1152; Layer III =
    * 1152 (MPEG-1) / 576 (MPEG-2/2.5). */
  private def samplesPerFrame(versionBits: Int, layer: Int): Int =
    layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (versionBits == 3) 1152 else 576
    }

  /** Exact frame byte length from the header fields — the arithmetic
    * that makes header-walking possible. */
  private def frameLength(versionBits: Int, layer: Int, bitrateKbps: Int,
                          rateHz: Int, padding: Int): Int =
    if (layer == 1)
      (12 * bitrateKbps * 1000 / rateHz + padding) * 4
    else
      samplesPerFrame(versionBits, layer) / 8 * bitrateKbps * 1000 /
        rateHz + padding

  private final case class Header(versionBits: Int, layer: Int,
                                  bitrateKbps: Int, rateHz: Int,
                                  padding: Int, channels: Int, len: Int)

  /** Parse + validate the 4 header bytes at `off`; None on anything
    * reserved/invalid (bad sync, version 01, layer 00, bitrate index
    * 0 or 15, sample-rate index 3). */
  private def header(b: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > b.length) return None
    val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
    val b2 = b(off + 2) & 0xff; val b3 = b(off + 3) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
    val versionBits = (b1 >> 3) & 3
    if (versionBits == 1) return None // reserved
    val layerBits = (b1 >> 1) & 3
    if (layerBits == 0) return None // reserved
    val layer = 4 - layerBits       // 01→III(3), 10→II(2), 11→I(1)
    val brIdx = b2 >> 4
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val vGroup = if (versionBits == 3) 0 else 1
    val kbps = BitrateKbps(vGroup)(layer - 1)(brIdx)
    val rate = SampleRateHz(versionBits)(srIdx)
    val padding = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2 // 11 = mono
    Some(Header(versionBits, layer, kbps, rate, padding, channels,
                frameLength(versionBits, layer, kbps, rate, padding)))
  }

  /** Layer III side-info byte length (ISO 11172-3 §2.4.1.7): the
    * fixed block between the header and the main data — the Xing/
    * Info tag sits immediately after it in an info frame. */
  private def sideInfoLen(versionBits: Int, channels: Int): Int =
    if (versionBits == 3) { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  /** If the Layer III frame at `off` is a Xing/Info tag frame,
    * return its declared audio-frame count (None when the frames
    * flag is unset — still a tag frame, caller excludes it). */
  private def xingDeclared(b: Array[Byte], h: Header,
                           off: Int): Option[Option[Long]] = {
    if (h.layer != 3) return None
    val m = off + 4 + sideInfoLen(h.versionBits, h.channels)
    if (m + 8 > b.length || m + 8 > off + h.len) return None
    val magic = new String(b, m, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (magic != "Xing" && magic != "Info") return None
    val flags = ((b(m + 4) & 0xff) << 24) | ((b(m + 5) & 0xff) << 16) |
                ((b(m + 6) & 0xff) << 8) | (b(m + 7) & 0xff)
    if ((flags & 1) == 0 || m + 12 > b.length || m + 12 > off + h.len)
      Some(None)
    else Some(Some(
      (((b(m + 8) & 0xffL) << 24) | ((b(m + 9) & 0xffL) << 16) |
       ((b(m + 10) & 0xffL) << 8) | (b(m + 11) & 0xffL))))
  }

  /** Syncsafe 28-bit ID3v2 size (4 bytes, each < 0x80). */
  private def id3v2Size(b: Array[Byte]): Option[Int] =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
        (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0)
      Some(10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
                 ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)))
    else None

  /** Walk a full MPEG audio stream: ID3v2 skip → frame-by-frame →
    * optional ID3v1 tail. Strict: every byte must be accounted for
    * (tag bytes or whole frames), and version/layer/sample-rate must
    * be constant across frames — anything else is `ok = false`. */
  def parseMp3(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < 4) return Bad
    val tag = id3v2Size(bytes)
    val start = tag.getOrElse(0)
    if (start >= bytes.length) return Bad // tag declares size past EOF
    // ID3v1 tail: 128 bytes starting 'TAG'
    val end = {
      val t = bytes.length - 128
      if (t > start && bytes(t) == 'T' && bytes(t + 1) == 'A' &&
          bytes(t + 2) == 'G') t
      else bytes.length
    }
    var off = start
    var first: Header = null
    var frames = 0L
    var kbpsSum = 0L
    var vbr = false
    var firstAudioKbps = -1
    var declared: Option[Long] = None
    var isFirstFrame = true
    while (off < end) {
      header(bytes, off) match {
        case Some(h) =>
          if (first == null) first = h
          else if (h.versionBits != first.versionBits ||
                   h.layer != first.layer || h.rateHz != first.rateHz)
            return Bad // mid-stream format change = corruption
          if (off + h.len > end) return Bad // truncated final frame
          val isInfo = isFirstFrame && {
            xingDeclared(bytes, h, off) match {
              case Some(d) => declared = d; true
              case None => false
            }
          }
          // a Xing/Info tag frame is metadata, not audio: every real
          // parser excludes it from the count/bitrate/duration
          if (!isInfo) {
            if (firstAudioKbps < 0) firstAudioKbps = h.bitrateKbps
            else if (h.bitrateKbps != firstAudioKbps) vbr = true
            frames += 1
            kbpsSum += h.bitrateKbps
          }
          isFirstFrame = false
          off += h.len
        case None => return Bad
      }
    }
    if (first == null || frames == 0) return Bad
    // a declaration that disagrees with the walked truth is corruption
    if (declared.exists(_ != frames)) return Bad
    val spf = samplesPerFrame(first.versionBits, first.layer)
    val samples = frames * spf
    Parsed(Some(first.rateHz), Some(first.channels), Some(frames),
           Some(samples * 1000L / first.rateHz),
           Some((kbpsSum / frames).toInt), Some(vbr), Some(first.layer),
           Some(first.versionBits match {
             case 3 => "mpeg1"; case 2 => "mpeg2"; case _ => "mpeg2.5"
           }),
           Some(tag.getOrElse(0)), declared, ok = true)
  }

  final class Parser extends MediaKernel.Handle[Array[Byte], Parsed] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Parsed] =
      batch.map(parseMp3)
  }

  val parserFactory: MediaKernel.Factory[Array[Byte], Parsed] =
    new MediaKernel.Factory[Array[Byte], Parsed] {
      def open() = new Parser
    }

  /** Deterministic syntactically-valid MPEG audio stream: real header
    * bytes over opaque deterministic frame payloads. This is genuine
    * ENCODER-side header construction (the frame-length arithmetic is
    * the same public formula the walker inverts) — only the payload
    * bits are junk, which is exactly the part metadata extraction
    * never reads. Mirrors [[AudioIo.encodeWav]]'s role for WAV.
    *
    * @param bitrateIdxOf per-frame bitrate index (1–14); a constant
    *   function gives CBR, anything else VBR.
    * @param paddingOf per-frame padding bit (0/1).
    * @param id3v2PadBytes if > 0, prepend an ID3v2 tag with that many
    *   payload bytes.
    * @param id3v1 if true, append a 128-byte ID3v1 `TAG` block.
    * @param xing if true, prepend a Layer III Xing/Info tag frame
    *   (zeroed side info, magic, flags=1, BE frame count — `Xing`
    *   when the stream is VBR, `Info` for CBR, like real encoders)
    *   declaring the TRUE audio frame count. */
  def encodeMp3(nFrames: Int, versionBits: Int, layer: Int,
                sampleRateIdx: Int, bitrateIdxOf: Int => Int,
                channels: Int, seed: Long,
                paddingOf: Int => Int = _ => 0,
                id3v2PadBytes: Int = -1,
                id3v1: Boolean = false,
                xing: Boolean = false): Array[Byte] = {
    require(nFrames > 0 && (versionBits == 3 || versionBits == 2 ||
            versionBits == 0) && layer >= 1 && layer <= 3 &&
            sampleRateIdx >= 0 && sampleRateIdx <= 2,
            s"bad MP3 shape: $nFrames frames v$versionBits L$layer sr$sampleRateIdx")
    val out = new ByteArrayOutputStream()
    if (id3v2PadBytes >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0) // v2.3
      out.write(0)               // flags
      val sz = id3v2PadBytes
      out.write((sz >> 21) & 0x7f); out.write((sz >> 14) & 0x7f)
      out.write((sz >> 7) & 0x7f); out.write(sz & 0x7f)
      var i = 0
      while (i < sz) { // deterministic tag payload, never 0xff
        out.write((graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, 'T'.toByte, i.toByte)) & 0x7f).toInt)
        i += 1
      }
    }
    val vGroup = if (versionBits == 3) 0 else 1
    val rate = SampleRateHz(versionBits)(sampleRateIdx)
    if (xing) {
      require(layer == 3, "Xing/Info tags are a Layer III construct")
      val brIdx = bitrateIdxOf(0)
      val kbps = BitrateKbps(vGroup)(2)(brIdx)
      val len = frameLength(versionBits, 3, kbps, rate, 0)
      val isVbr = (1 until nFrames).exists(bitrateIdxOf(_) != brIdx)
      out.write(0xff)
      out.write(0xe0 | (versionBits << 3) | (1 << 1) | 1)
      out.write((brIdx << 4) | (sampleRateIdx << 2))
      out.write((if (channels == 1) 3 else 0) << 6)
      val si = sideInfoLen(versionBits, channels)
      var i = 0
      while (i < si) { out.write(0); i += 1 } // zeroed side info
      out.write((if (isVbr) "Xing" else "Info")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(0); out.write(0); out.write(0); out.write(1) // frames flag
      out.write((nFrames >> 24) & 0xff); out.write((nFrames >> 16) & 0xff)
      out.write((nFrames >> 8) & 0xff); out.write(nFrames & 0xff)
      i = 4 + si + 12
      while (i < len) { // pad the rest of the tag frame
        out.write((graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, 'X'.toByte, i.toByte)) & 0x3f).toInt)
        i += 1
      }
    }
    var f = 0
    while (f < nFrames) {
      val brIdx = bitrateIdxOf(f)
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrate index $brIdx")
      val pad = paddingOf(f) & 1
      val kbps = BitrateKbps(vGroup)(layer - 1)(brIdx)
      val len = frameLength(versionBits, layer, kbps, rate, pad)
      val layerBits = 4 - layer
      out.write(0xff)
      out.write(0xe0 | (versionBits << 3) | (layerBits << 1) | 1)
      out.write((brIdx << 4) | (sampleRateIdx << 2) | (pad << 1))
      out.write((if (channels == 1) 3 else 0) << 6)
      var i = 4
      while (i < len) { // payload: deterministic, never a false sync
        out.write((graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, f.toByte, (f >> 8).toByte, i.toByte,
                (i >> 8).toByte)) & 0x7f).toInt)
        i += 1
      }
      f += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 3
      while (i < 128) { out.write(0); i += 1 }
    }
    out.toByteArray
  }
}
