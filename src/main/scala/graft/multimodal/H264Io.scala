package graft.multimodal

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** REAL H.264/AVC Annex-B STRUCTURAL kernels — NAL-unit walking and
  * SPS parsing, the video twin of [[Mp3Io]]: an H.264 elementary
  * stream is a sequence of start-code-delimited NAL units, and the
  * Sequence Parameter Set (NAL type 7) carries the stream's geometry
  * (profile, level, coded width/height, cropping) in exp-Golomb
  * coded fields (ITU-T H.264 §7.3.2.1). Walking the start codes and
  * bit-decoding the SPS yields every curation-relevant video fact —
  * dimensions, profile/level gates, keyframe (IDR) density — with NO
  * pixel decode, exactly the `ffprobe -show_streams` path.
  *
  * With this kernel, compressed VIDEO metadata moves off the
  * documented stub list ([[Multimodal]] header): start-code scan,
  * emulation-prevention removal (EBSP→RBSP), and exp-Golomb SPS
  * decode are real work on real bytes. Only macroblock SAMPLE decode
  * (CABAC/CAVLC + transforms) remains environmental — no codec ships
  * in this container, and no fact below needs it.
  *
  * ==What the walker handles==
  *  - 3- and 4-byte start codes (`00 00 01` / `00 00 00 01`);
  *  - emulation-prevention bytes (`00 00 03 xx` → `00 00 xx`) when
  *    bit-parsing RBSP payloads;
  *  - SPS geometry incl. `frame_cropping` (crop units 2×2 for the
  *    4:2:0 baseline chroma format) and the high-profile
  *    `chroma_format_idc`/`seq_scaling_matrix` prefix fields;
  *  - NAL census: SPS / PPS / IDR / non-IDR slice counts;
  *  - corruption: no leading start code, a set `forbidden_zero_bit`,
  *    reserved NAL type 0, or a missing/undecodable SPS → `ok =
  *    false` with null facts (captured, not fatal).
  *
  * ==Scale notes==
  * Map-shaped over the [[MediaKernel]] seam (no shuffle); the walk
  * is one linear scan for start codes plus a few hundred BITS of SPS
  * decode — slice payloads are never bit-parsed. */
object H264Io {

  /** Parsed structural facts of one Annex-B stream. */
  final case class Parsed(width: Option[Int], height: Option[Int],
                          profileIdc: Option[Int], levelIdc: Option[Int],
                          nNal: Option[Int], nIdr: Option[Int],
                          nNonIdr: Option[Int], ok: Boolean)

  private val Bad = Parsed(None, None, None, None, None, None, None,
                           ok = false)

  /** MSB-first bit reader over RBSP bytes with unsigned/signed
    * exp-Golomb (ue(v)/se(v)) — the H.264 §9.1 entropy coding for
    * header fields. Throws on exhaustion; callers catch → `ok=false`. */
  private[multimodal] final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val byteIx = pos >> 3
        if (byteIx >= b.length) throw new IllegalStateException("EOS")
        v = (v << 1) | ((b(byteIx) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31) throw new IllegalStateException("bad ue")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** MSB-first bit writer with ue(v)/se(v) and RBSP trailing bits —
    * the encoder-side twin used to author real SPS/PPS payloads. */
  private[multimodal] final class BitWriter {
    private val buf = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      require(v >= 0)
      val bits = 32 - Integer.numberOfLeadingZeros(v + 1)
      u(0, bits - 1); u(v + 1, bits)
    }
    def se(v: Int): this.type =
      ue(if (v <= 0) -2 * v else 2 * v - 1)
    /** rbsp_trailing_bits: stop bit + zero-align. */
    def trailing(): Array[Byte] = {
      u(1, 1)
      if (nBits != 0) u(0, 8 - nBits)
      buf.toArray
    }
  }

  /** EBSP → RBSP: drop emulation-prevention 0x03 after two zeros. */
  private[multimodal] def stripEmulation(b: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](b.length)
    var zeros = 0
    var i = 0
    while (i < b.length) {
      val v = b(i)
      if (zeros >= 2 && v == 3) zeros = 0 // skip the EP byte
      else {
        out += v
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** RBSP → EBSP: insert 0x03 after two zeros when the next byte is
    * 0x00–0x03 (H.264 §7.4.1.1). */
  private[multimodal] def addEmulation(b: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](b.length + 8)
    var zeros = 0
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v <= 3) { out += 3; zeros = 0 }
      out += b(i)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  private final case class Sps(width: Int, height: Int, profileIdc: Int,
                               levelIdc: Int)

  /** Decode the geometry fields of an SPS RBSP (§7.3.2.1.1). */
  private def parseSps(rbsp: Array[Byte]): Option[Sps] =
    try {
      val r = new BitReader(rbsp)
      val profileIdc = r.u(8)
      r.u(8) // constraint flags + reserved
      val levelIdc = r.u(8)
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1 // default 4:2:0
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
            .contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) r.u(1) // separate_colour_plane_flag
        r.ue(); r.ue()                   // bit_depth_{luma,chroma}_minus8
        r.u(1)                           // qpprime_y_zero_transform_bypass
        if (r.u(1) == 1)                 // seq_scaling_matrix_present
          return None // scaling lists: out of structural scope
      }
      r.ue() // log2_max_frame_num_minus4
      val pocType = r.ue()
      if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (pocType == 1) {
        r.u(1); r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u(1) // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.u(1)
      if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
      r.u(1)                        // direct_8x8_inference_flag
      var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
      if (r.u(1) == 1) { // frame_cropping_flag
        cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
      }
      // Crop units (§7.4.2.1.1): 4:2:0 → x2, y2×(2−frame_mbs_only).
      val (cux, cuy) = chromaFormatIdc match {
        case 0 => (1, 2 - frameMbsOnly)
        case 1 => (2, 2 * (2 - frameMbsOnly))
        case 2 => (2, 2 - frameMbsOnly)
        case _ => (1, 2 - frameMbsOnly)
      }
      Some(Sps(widthMbs * 16 - (cropL + cropR) * cux,
               heightMapUnits * 16 * (2 - frameMbsOnly) -
                 (cropT + cropB) * cuy,
               profileIdc, levelIdc))
    } catch { case _: IllegalStateException => None }

  /** Split an Annex-B byte stream at its start codes; None when the
    * stream doesn't begin with one. Each element is one NAL (header
    * byte + EBSP payload, start code stripped). */
  private def splitNals(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def startCodeLen(i: Int): Int =
      if (i + 3 <= b.length && b(i) == 0 && b(i + 1) == 0 &&
          b(i + 2) == 1) 3
      else if (i + 4 <= b.length && b(i) == 0 && b(i + 1) == 0 &&
               b(i + 2) == 0 && b(i + 3) == 1) 4
      else 0
    val first = startCodeLen(0)
    if (first == 0) return None
    val nals = ArrayBuffer.empty[Array[Byte]]
    var nalStart = first
    var i = first
    while (i < b.length) {
      val sc = startCodeLen(i)
      if (sc > 0 && i > nalStart) {
        nals += b.slice(nalStart, i)
        nalStart = i + sc
        i += sc
      } else i += 1
    }
    if (b.length > nalStart) nals += b.slice(nalStart, b.length)
    Some(nals.toSeq)
  }

  /** Walk a full Annex-B stream: start-code split → NAL census → SPS
    * geometry. Strict: a set forbidden bit, type-0 NAL, empty NAL, or
    * absent/undecodable SPS is `ok = false`. */
  def parseAnnexB(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < 5) return Bad
    splitNals(bytes) match {
      case None => Bad
      case Some(nals) =>
        if (nals.isEmpty) return Bad
        var sps: Option[Sps] = None
        var nIdr = 0; var nNonIdr = 0
        for (nal <- nals) {
          if (nal.isEmpty) return Bad
          val h = nal(0) & 0xff
          if ((h & 0x80) != 0) return Bad // forbidden_zero_bit
          (h & 0x1f) match {
            case 0 => return Bad // unspecified
            case 7 =>
              if (sps.isEmpty) {
                sps = parseSps(stripEmulation(nal.drop(1)))
                if (sps.isEmpty) return Bad
              }
            case 5 => nIdr += 1
            case 1 => nNonIdr += 1
            case _ => () // PPS/SEI/AUD/...: counted in nNal only
          }
        }
        sps match {
          case Some(s) =>
            Parsed(Some(s.width), Some(s.height), Some(s.profileIdc),
                   Some(s.levelIdc), Some(nals.size), Some(nIdr),
                   Some(nNonIdr), ok = true)
          case None => Bad
        }
    }
  }

  /** One sampled slice NAL: its index among the stream's slices, the
    * byte offset of its NAL header (start code excluded), its type
    * (5 = IDR, 1 = non-IDR), byte length (header + EBSP payload), and
    * the unsigned byte sum of its payload — a real content read, the
    * compressed-stream analogue of [[VideoIo]]'s luma sums. */
  final case class SampledNal(sliceIdx: Int, byteOff: Long, nalType: Int,
                              nalBytes: Int, paySum: Long)

  /** REAL frame sampling for compressed video, structurally: walk the
    * start codes and emit every `everyNth`-th slice NAL (≤
    * `maxFrames`) with its exact byte offset, size, and payload byte
    * sum — the seek index a downstream (GPU) decoder consumes, built
    * without decoding a pixel. Corrupt streams (no leading start
    * code) return an empty list; quarantine on [[parseAnnexB]]'s
    * `ok`, same contract as [[VideoIo]]'s sampler. */
  def sampleNals(bytes: Array[Byte], everyNth: Int,
                 maxFrames: Int): Seq[SampledNal] = {
    if (bytes == null || bytes.length < 5) return Nil
    def startCodeLen(i: Int): Int =
      if (i + 3 <= bytes.length && bytes(i) == 0 && bytes(i + 1) == 0 &&
          bytes(i + 2) == 1) 3
      else if (i + 4 <= bytes.length && bytes(i) == 0 && bytes(i + 1) == 0 &&
               bytes(i + 2) == 0 && bytes(i + 3) == 1) 4
      else 0
    val first = startCodeLen(0)
    if (first == 0) return Nil
    val out = ArrayBuffer.empty[SampledNal]
    var sliceIdx = 0
    var nalStart = first
    var i = first
    def emit(start: Int, end: Int): Unit = {
      if (end > start) {
        val h = bytes(start) & 0xff
        val t = h & 0x1f
        if ((h & 0x80) == 0 && (t == 1 || t == 5)) {
          if (sliceIdx % everyNth == 0 && out.size < maxFrames) {
            var s = 0L
            var j = start + 1
            while (j < end) { s += bytes(j) & 0xff; j += 1 }
            out += SampledNal(sliceIdx, start.toLong, t, end - start, s)
          }
          sliceIdx += 1
        }
      }
    }
    while (i < bytes.length) {
      val sc = startCodeLen(i)
      if (sc > 0 && i > nalStart) {
        emit(nalStart, i)
        nalStart = i + sc
        i += sc
      } else i += 1
    }
    emit(nalStart, bytes.length)
    out.toSeq
  }

  def samplerFactory(everyNth: Int, maxFrames: Int)
      : MediaKernel.Factory[Array[Byte], Seq[SampledNal]] =
    new MediaKernel.Factory[Array[Byte], Seq[SampledNal]] {
      def open(): MediaKernel.Handle[Array[Byte], Seq[SampledNal]] =
        new MediaKernel.Handle[Array[Byte], Seq[SampledNal]] {
          def processBatch(batch: Seq[Array[Byte]]): Seq[Seq[SampledNal]] =
            batch.map(sampleNals(_, everyNth, maxFrames))
        }
    }

  final class Parser extends MediaKernel.Handle[Array[Byte], Parsed] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Parsed] =
      batch.map(parseAnnexB)
  }

  val parserFactory: MediaKernel.Factory[Array[Byte], Parsed] =
    new MediaKernel.Factory[Array[Byte], Parsed] {
      def open() = new Parser
    }

  private def nal(out: ByteArrayOutputStream, fourByteStart: Boolean,
                  refIdc: Int, nalType: Int, ebsp: Array[Byte]): Unit = {
    if (fourByteStart) out.write(0)
    out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | nalType)
    out.write(ebsp, 0, ebsp.length)
  }

  /** Deterministic syntactically-valid Annex-B stream: a REAL
    * bit-written SPS (constrained-baseline profile 66, level 30,
    * pic_order_cnt_type 2, frame_mbs_only) + PPS + `nIdr` IDR and
    * `nNonIdr` non-IDR slice NALs with opaque deterministic payloads
    * (emulation-prevention applied, so payload zeros round-trip). SPS
    * and PPS use 4-byte start codes, slices 3-byte — both forms
    * exercised. Cropping (right `cropRight`, bottom `cropBottom`, in
    * 2-px 4:2:0 units) makes non-multiple-of-16 dimensions real.
    * The encoder side of the same public syntax the walker decodes —
    * [[AudioIo.encodeWav]]'s role, for H.264. */
  def encodeAnnexB(widthMbs: Int, heightMbs: Int, nIdr: Int, nNonIdr: Int,
                   seed: Long, cropRight: Int = 0, cropBottom: Int = 0)
      : Array[Byte] = {
    require(widthMbs > 0 && heightMbs > 0 && nIdr >= 0 && nNonIdr >= 0,
            s"bad H264 shape: ${widthMbs}x$heightMbs mbs, $nIdr+$nNonIdr")
    val out = new ByteArrayOutputStream()
    val sps = {
      val w = new BitWriter
      w.u(66, 8)  // profile_idc: constrained baseline
      w.u(0, 8)   // constraint flags + reserved_zero_2bits
      w.u(30, 8)  // level_idc 3.0
      w.ue(0)     // seq_parameter_set_id
      w.ue(0)     // log2_max_frame_num_minus4
      w.ue(2)     // pic_order_cnt_type
      w.ue(1)     // max_num_ref_frames
      w.u(0, 1)   // gaps_in_frame_num_value_allowed_flag
      w.ue(widthMbs - 1)
      w.ue(heightMbs - 1)
      w.u(1, 1)   // frame_mbs_only_flag
      w.u(1, 1)   // direct_8x8_inference_flag
      if (cropRight > 0 || cropBottom > 0) {
        w.u(1, 1) // frame_cropping_flag
        w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom)
      } else w.u(0, 1)
      w.u(0, 1)   // vui_parameters_present_flag
      w.trailing()
    }
    nal(out, fourByteStart = true, refIdc = 3, nalType = 7,
        addEmulation(sps))
    val pps = {
      val w = new BitWriter
      w.ue(0)     // pic_parameter_set_id
      w.ue(0)     // seq_parameter_set_id
      w.u(0, 1)   // entropy_coding_mode_flag (CAVLC)
      w.u(0, 1)   // bottom_field_pic_order_in_frame_present_flag
      w.ue(0)     // num_slice_groups_minus1
      w.ue(0); w.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
      w.u(0, 1)   // weighted_pred_flag
      w.u(0, 2)   // weighted_bipred_idc
      w.se(0)     // pic_init_qp_minus26
      w.se(0)     // pic_init_qs_minus26
      w.se(0)     // chroma_qp_index_offset
      w.u(0, 1)   // deblocking_filter_control_present_flag
      w.u(0, 1)   // constrained_intra_pred_flag
      w.u(0, 1)   // redundant_pic_cnt_present_flag
      w.trailing()
    }
    nal(out, fourByteStart = true, refIdc = 3, nalType = 8,
        addEmulation(pps))
    var s = 0
    val total = nIdr + nNonIdr
    while (s < total) {
      val idr = s < nIdr
      val payload = new Array[Byte](24 + (s % 5))
      var i = 0
      while (i < payload.length) {
        payload(i) = (graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, s.toByte, i.toByte)) & 0xff).toByte
        i += 1
      }
      nal(out, fourByteStart = idr, refIdc = if (idr) 3 else 2,
          nalType = if (idr) 5 else 1, addEmulation(payload))
      s += 1
    }
    out.toByteArray
  }
}
