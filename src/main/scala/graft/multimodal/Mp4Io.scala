package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL MP4 / ISO-BMFF (ISO/IEC 14496-12) STRUCTURAL kernels — the
  * container real corpora actually ship video in ([[Mp3Io]] walks
  * elementary audio, [[H264Io]] raw Annex-B; web-crawled video is
  * almost always fragmented or flat MP4). The format is a tree of
  * length-prefixed boxes (`u32 size + 4cc type + payload`), so a
  * single forward walk with size validation yields every
  * curation-relevant fact — brand, movie/media timescales and
  * durations, track handler, coded geometry, codec profile/level,
  * and the complete sample-to-byte seek index (`stts`/`stsc`/
  * `stsz`/`stco`) — without decoding a pixel: exactly the walk
  * `ffprobe`/`mp4dump` do before any codec is invoked.
  *
  * ==Composition with the H.264 kernel==
  * Geometry does NOT come from the `avc1` display fields (a lying
  * muxer can write anything there): the walker lifts the SPS/PPS
  * byte blobs out of `avcC`, re-frames them as an Annex-B stream,
  * and hands them to [[H264Io.parseAnnexB]] — the same exp-Golomb
  * SPS decode (crop arithmetic included) the elementary-stream path
  * uses. The `avc1` display fields are then CHECKED against the
  * SPS-derived geometry; a mismatch is corruption (`ok = false`).
  *
  * ==What the walker validates==
  *  - every box size ≥ 8 (64-bit `largesize` supported) and inside
  *    its parent — a size pointing past EOF quarantines at the box
  *    where it happens;
  *  - `ftyp` leads the file (every real muxer);
  *  - exactly the boxes a flat video file needs: `moov/mvhd`,
  *    `trak/mdia/{mdhd,hdlr,minf/stbl}`;
  *  - `stts` total sample count == `stsz` sample count, and the
  *    summed sample durations == the `mdhd` media duration;
  *  - the full chunk walk: `stsc` runs expanded against `stco`
  *    offsets and `stsz` sizes must land every sample byte range
  *    inside the `mdat` payload — the seek index is PROVEN, not
  *    assumed, so a downstream (GPU) decoder can trust every
  *    (offset, size) pair it reads.
  *
  * ==Scale notes==
  * Map-shaped per partition over the [[MediaKernel]] seam (no
  * shuffle); cost is the box headers + sample tables — a few KB of
  * a multi-GB file. Sample DATA is never read. */
object Mp4Io {

  /** Structural facts of one MP4 file. `sampleSpan` = bytes from the
    * first sample's start to the last sample's end — equals
    * `mdatBytes` for a gaplessly-packed file; the two diverging is a
    * (legal) muxer gap, their RELATION being the portable fact. */
  final case class Parsed(brand: Option[String], timescale: Option[Long],
                          durationMs: Option[Long], handler: Option[String],
                          width: Option[Int], height: Option[Int],
                          profileIdc: Option[Int], levelIdc: Option[Int],
                          nSamples: Option[Long], nChunks: Option[Long],
                          mdatBytes: Option[Long], sampleSpan: Option[Long],
                          ok: Boolean)

  private val Bad = Parsed(None, None, None, None, None, None, None, None,
                           None, None, None, None, ok = false)

  // ---- big-endian field readers -----------------------------------

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One box: type + [payloadStart, payloadEnd). */
  private final case class Box(tag: String, start: Int, end: Int)

  /** Walk the boxes of [start, end); None on any malformed size. */
  private def boxes(b: Array[Byte], start: Int, end: Int)
      : Option[List[Box]] = {
    val out = List.newBuilder[Box]
    var i = start
    while (i < end) {
      if (i + 8 > end) return None // truncated box header
      val size32 = u32(b, i)
      val tag = fourcc(b, i + 4)
      var payload = i + 8
      val boxEnd: Long =
        if (size32 == 0L) end.toLong // box extends to end of parent
        else if (size32 == 1L) {     // 64-bit largesize
          if (i + 16 > end) return None
          payload = i + 16
          i + u64(b, i + 8)
        } else i + size32
      if (boxEnd < payload || boxEnd > end) return None
      out += Box(tag, payload, boxEnd.toInt)
      i = boxEnd.toInt
    }
    Some(out.result())
  }

  private def find(bs: List[Box], tag: String): Option[Box] =
    bs.find(_.tag == tag)

  /** A box whose payload is at least `n` bytes — every fixed-offset
    * read below goes through this gate first, so a truncated-but-
    * size-valid box (size field says 8, reader expects a version
    * byte) quarantines as `ok = false` instead of throwing an
    * ArrayIndexOutOfBoundsException out of the task. */
  private def sized(b: Option[Box], n: Int): Option[Box] =
    b.filter(x => x.end - x.start >= n)

  // ---- avcC → Annex-B → H264Io ------------------------------------

  /** Re-frame avcC's SPS/PPS blobs as Annex-B and decode geometry
    * through [[H264Io.parseAnnexB]]. */
  private def decodeAvcC(b: Array[Byte], box: Box): Option[H264Io.Parsed] = {
    val s = box.start
    if (box.end - s < 7) return None
    if ((b(s) & 0xff) != 1) return None // configurationVersion
    val numSps = b(s + 5) & 0x1f
    if (numSps < 1) return None
    val out = new ByteArrayOutputStream()
    var i = s + 6
    var k = 0
    while (k < numSps) {
      if (i + 2 > box.end) return None
      val len = u16(b, i); i += 2
      if (i + len > box.end) return None
      out.write(Array[Byte](0, 0, 0, 1)); out.write(b, i, len)
      i += len; k += 1
    }
    if (i >= box.end) return None
    val numPps = b(i) & 0xff; i += 1
    k = 0
    while (k < numPps) {
      if (i + 2 > box.end) return None
      val len = u16(b, i); i += 2
      if (i + len > box.end) return None
      out.write(Array[Byte](0, 0, 0, 1)); out.write(b, i, len)
      i += len; k += 1
    }
    val p = H264Io.parseAnnexB(out.toByteArray)
    if (p.ok) Some(p) else None
  }

  // ---- the walker --------------------------------------------------

  /** Walk an MP4 — flat OR fragmented (DASH/CMAF `moof`+`mdat`
    * sequences; the branch is `moov/mvex`, the spec's fragmented-file
    * marker): box tree → facts + proven seek index. Strict: any
    * malformed size, missing mandatory box, table inconsistency,
    * avc1-vs-SPS geometry disagreement, out-of-order fragment
    * sequence number, or sample range outside its `mdat` is
    * `ok = false` (quarantine, never a guess). */
  def parseMp4(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < 16) return Bad
    val top = boxes(bytes, 0, bytes.length).getOrElse(return Bad)
    top match {
      case Box("ftyp", fs, fe) :: rest =>
        if (fe - fs < 8) return Bad
        val brand = fourcc(bytes, fs)
        val moov = find(rest, "moov").getOrElse(return Bad)
        val moovKids = boxes(bytes, moov.start, moov.end)
          .getOrElse(return Bad)
        val fragmented = find(moovKids, "mvex").isDefined
        // mvhd (version 0 or 1)
        val mvhd = sized(find(moovKids, "mvhd"), 20).getOrElse(return Bad)
        val mvhdV = bytes(mvhd.start) & 0xff
        val (timescale, durationUnits) =
          if (mvhdV == 0) (u32(bytes, mvhd.start + 12),
                           u32(bytes, mvhd.start + 16))
          else if (mvhdV == 1 && mvhd.end - mvhd.start >= 32)
            (u32(bytes, mvhd.start + 20), u64(bytes, mvhd.start + 24))
          else return Bad
        if (timescale <= 0) return Bad
        // single media track: trak → mdia → {mdhd, hdlr, minf → stbl}
        val trak = find(moovKids, "trak").getOrElse(return Bad)
        val trakKids = boxes(bytes, trak.start, trak.end)
          .getOrElse(return Bad)
        val mdia = find(trakKids, "mdia").getOrElse(return Bad)
        val mdiaKids = boxes(bytes, mdia.start, mdia.end)
          .getOrElse(return Bad)
        val mdhd = sized(find(mdiaKids, "mdhd"), 20).getOrElse(return Bad)
        val mdhdV = bytes(mdhd.start) & 0xff
        val mediaDuration =
          if (mdhdV == 0) u32(bytes, mdhd.start + 16)
          else if (mdhdV == 1 && mdhd.end - mdhd.start >= 32)
            u64(bytes, mdhd.start + 24)
          else return Bad
        val hdlr = sized(find(mdiaKids, "hdlr"), 12).getOrElse(return Bad)
        val handler = fourcc(bytes, hdlr.start + 8)
        val minf = find(mdiaKids, "minf").getOrElse(return Bad)
        val stbl = find(boxes(bytes, minf.start, minf.end)
          .getOrElse(return Bad), "stbl").getOrElse(return Bad)
        val stblKids = boxes(bytes, stbl.start, stbl.end)
          .getOrElse(return Bad)
        // stsd → avc1 → avcC → SPS geometry (checked vs avc1 fields)
        val stsd = sized(find(stblKids, "stsd"), 8).getOrElse(return Bad)
        if (u32(bytes, stsd.start + 4) < 1) return Bad
        val entry = boxes(bytes, stsd.start + 8, stsd.end)
          .getOrElse(return Bad).headOption.getOrElse(return Bad)
        if (entry.tag != "avc1") return Bad
        if (entry.end - entry.start < 78) return Bad
        val dispW = u16(bytes, entry.start + 24)
        val dispH = u16(bytes, entry.start + 26)
        val avcc = find(boxes(bytes, entry.start + 78, entry.end)
          .getOrElse(return Bad), "avcC").getOrElse(return Bad)
        val sps = decodeAvcC(bytes, avcc).getOrElse(return Bad)
        if (!sps.width.contains(dispW) || !sps.height.contains(dispH))
          return Bad
        if (fragmented)
          return parseFragments(bytes, rest, stblKids, brand, timescale,
                                handler, sps)
        val mdat = find(rest, "mdat").getOrElse(return Bad)
        // stts: total samples + duration cross-check
        val stts = sized(find(stblKids, "stts"), 8).getOrElse(return Bad)
        val sttsN = u32(bytes, stts.start + 4).toInt
        if (stts.end - stts.start < 8 + 8L * sttsN) return Bad
        var sttsSamples = 0L; var sttsDuration = 0L
        var e = 0
        while (e < sttsN) {
          val c = u32(bytes, stts.start + 8 + 8 * e)
          val d = u32(bytes, stts.start + 12 + 8 * e)
          sttsSamples += c; sttsDuration += c * d
          e += 1
        }
        if (sttsDuration != mediaDuration) return Bad
        // stsz: per-sample sizes (a zero-sample video track is not a
        // corpus asset — strict quarantine, and it would otherwise
        // leave the first/last-offset sentinels in sampleSpan)
        val stsz = sized(find(stblKids, "stsz"), 12).getOrElse(return Bad)
        val uniform = u32(bytes, stsz.start + 4)
        val nSamples = u32(bytes, stsz.start + 8)
        if (nSamples != sttsSamples || nSamples == 0L) return Bad
        val sizes: Long => Long =
          if (uniform != 0) _ => uniform
          else {
            if (stsz.end - stsz.start < 12 + 4L * nSamples) return Bad
            i => u32(bytes, stsz.start + 12 + 4 * i.toInt)
          }
        // stsc runs + stco offsets: prove every sample lands in mdat
        val stsc = sized(find(stblKids, "stsc"), 8).getOrElse(return Bad)
        val stscN = u32(bytes, stsc.start + 4).toInt
        if (stsc.end - stsc.start < 8 + 12L * stscN || stscN < 1)
          return Bad
        val stco = sized(find(stblKids, "stco"), 8).getOrElse(return Bad)
        val nChunks = u32(bytes, stco.start + 4).toInt
        if (stco.end - stco.start < 8 + 4L * nChunks || nChunks < 1)
          return Bad
        var sample = 0L
        var firstOff = Long.MaxValue; var lastEnd = -1L
        var run = 0
        var chunk = 1
        while (chunk <= nChunks && sample < nSamples) {
          // advance to the stsc run covering this chunk
          while (run + 1 < stscN &&
                 u32(bytes, stsc.start + 8 + 12 * (run + 1)) <= chunk)
            run += 1
          if (u32(bytes, stsc.start + 8 + 12 * run) > chunk) return Bad
          val perChunk = u32(bytes, stsc.start + 12 + 12 * run)
          var off = u32(bytes, stco.start + 8 + 4 * (chunk - 1))
          // EVERY chunk's byte range must land inside mdat — bounding
          // only the first/last chunk would let a mid-table offset
          // point anywhere and still "validate"
          if (off < mdat.start) return Bad
          if (off < firstOff) firstOff = off
          var s = 0L
          while (s < perChunk && sample < nSamples) {
            off += sizes(sample)
            sample += 1; s += 1
          }
          if (off > mdat.end) return Bad
          if (off > lastEnd) lastEnd = off
          chunk += 1
        }
        if (sample != nSamples) return Bad
        Parsed(
          Some(brand), Some(timescale),
          Some(durationUnits * 1000L / timescale), Some(handler),
          sps.width, sps.height, sps.profileIdc, sps.levelIdc,
          Some(nSamples), Some(nChunks.toLong),
          Some((mdat.end - mdat.start).toLong),
          Some(lastEnd - firstOff), ok = true)
      case _ => Bad // first box must be ftyp
    }
  }

  /** The fragmented (DASH/CMAF) walk: `moof`+`mdat` pairs in stream
    * order. Facts: `nSamples`/duration summed over every `trun`,
    * `nChunks` = fragment count, `mdatBytes`/`sampleSpan` summed per
    * fragment. Proven like the flat path: each `trun`'s data offset
    * (relative to its `moof`'s first byte — the `default-base-is-
    * moof` addressing this walker REQUIRES in `tfhd`, the CMAF
    * profile's rule) plus its sample sizes must land inside that
    * fragment's `mdat`; `mfhd` sequence numbers must run 1..n in
    * order; the `moov` sample tables must be empty (a fragmented
    * file carrying flat samples too is a muxer bug, not a corpus). */
  private def parseFragments(bytes: Array[Byte], top: List[Box],
                             stblKids: List[Box], brand: String,
                             timescale: Long, handler: String,
                             sps: H264Io.Parsed): Parsed = {
    // strict: fragmented moov declares EMPTY tables
    val stsz = sized(find(stblKids, "stsz"), 12).getOrElse(return Bad)
    if (u32(bytes, stsz.start + 8) != 0L) return Bad
    val stts = sized(find(stblKids, "stts"), 8).getOrElse(return Bad)
    if (u32(bytes, stts.start + 4) != 0L) return Bad
    // collect (moof, following mdat) pairs in stream order
    val pairs = List.newBuilder[(Box, Box)]
    var pending: Option[Box] = None
    top.foreach {
      case b if b.tag == "moof" =>
        if (pending.isDefined) return Bad // moof without its mdat
        pending = Some(b)
      case b if b.tag == "mdat" && pending.isDefined =>
        pairs += ((pending.get, b)); pending = None
      case _ => () // moov/free/sidx between fragments are legal
    }
    if (pending.isDefined) return Bad
    val frags = pairs.result()
    if (frags.isEmpty) return Bad
    var totalSamples = 0L; var totalDur = 0L
    var totalMdat = 0L; var totalSpan = 0L
    var seq = 1L
    for ((moof, mdat) <- frags) {
      val moofKids = boxes(bytes, moof.start, moof.end)
        .getOrElse(return Bad)
      val mfhd = sized(find(moofKids, "mfhd"), 8).getOrElse(return Bad)
      if (u32(bytes, mfhd.start + 4) != seq) return Bad
      seq += 1
      val traf = find(moofKids, "traf").getOrElse(return Bad)
      val trafKids = boxes(bytes, traf.start, traf.end)
        .getOrElse(return Bad)
      val tfhd = sized(find(trafKids, "tfhd"), 8).getOrElse(return Bad)
      val tfhdFlags = u32(bytes, tfhd.start) & 0xffffffL
      if ((tfhdFlags & 0x020000L) == 0L) return Bad // default-base-is-moof
      if (u32(bytes, tfhd.start + 4) != 1L) return Bad // track_id
      val trun = sized(find(trafKids, "trun"), 12).getOrElse(return Bad)
      val trunFlags = u32(bytes, trun.start) & 0xffffffL
      // strict authored profile: data-offset + per-sample duration
      // and size present (trex defaults carry no per-sample truth)
      if ((trunFlags & 0x000001L) == 0L ||
          (trunFlags & 0x000100L) == 0L ||
          (trunFlags & 0x000200L) == 0L) return Bad
      val n = u32(bytes, trun.start + 4)
      if (n <= 0) return Bad
      var p = trun.start + 8
      val dataOffset = u32(bytes, p).toInt; p += 4
      if ((trunFlags & 0x000004L) != 0L) p += 4 // first-sample-flags
      val entryBytes =
        4 + 4 + (if ((trunFlags & 0x000400L) != 0L) 4 else 0) +
          (if ((trunFlags & 0x000800L) != 0L) 4 else 0)
      if (trun.end - p < n * entryBytes) return Bad
      var sumSizes = 0L
      var i = 0L
      while (i < n) {
        totalDur += u32(bytes, p); p += 4
        sumSizes += u32(bytes, p); p += 4
        if ((trunFlags & 0x000400L) != 0L) p += 4
        if ((trunFlags & 0x000800L) != 0L) p += 4
        i += 1
      }
      // data offset is relative to the moof's FIRST byte (header
      // included); Box.start is the payload, so back up the 8-byte
      // header (this walker rejects largesize moofs implicitly — the
      // range check below fails on the shifted base)
      val base = (moof.start - 8).toLong + dataOffset
      if (base < mdat.start || base + sumSizes > mdat.end) return Bad
      totalSamples += n
      totalSpan += sumSizes
      totalMdat += (mdat.end - mdat.start).toLong
    }
    Parsed(Some(brand), Some(timescale),
           Some(totalDur * 1000L / timescale), Some(handler),
           sps.width, sps.height, sps.profileIdc, sps.levelIdc,
           Some(totalSamples), Some(frags.size.toLong),
           Some(totalMdat), Some(totalSpan), ok = true)
  }

  final class Parser extends MediaKernel.Handle[Array[Byte], Parsed] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Parsed] =
      batch.map(parseMp4)
  }
  val parserFactory: MediaKernel.Factory[Array[Byte], Parsed] =
    new MediaKernel.Factory[Array[Byte], Parsed] {
      def open() = new Parser
    }

  // ---- the encoder (test/fixture side of the same public syntax) ---

  private def beBytes32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def beBytes16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mkBox(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val out = new ByteArrayOutputStream(total)
    out.write(beBytes32(total))
    out.write(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    payload.foreach(out.write)
    out.toByteArray
  }

  private val UnityMatrix: Array[Byte] =
    (Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(beBytes32)).toArray

  /** Author a deterministic flat MP4: ftyp + moov (full sample
    * tables, avcC carrying a REAL [[H264Io]]-authored SPS/PPS pair)
    * + mdat with seeded sample bytes. Samples pack gaplessly into
    * chunks of `samplesPerChunk`; sample i is `20 + i % 7` bytes.
    * Movie and media timescales are equal, so `durationMs` has the
    * closed form `nSamples · sampleDelta · 1000 / timescale`. */
  def encodeMp4(widthMbs: Int, heightMbs: Int, nSamples: Int,
                sampleDelta: Long, timescale: Long, seed: Long,
                cropRight: Int = 0, cropBottom: Int = 0,
                samplesPerChunk: Int = 4): Array[Byte] = {
    require(widthMbs > 0 && heightMbs > 0 && nSamples > 0 &&
            sampleDelta > 0 && timescale > 0 && samplesPerChunk > 0,
      s"bad MP4 shape: ${widthMbs}x$heightMbs, n=$nSamples")
    // SPS/PPS from the H.264 encoder (a zero-slice stream is exactly
    // start code + SPS + start code + PPS)
    val psStream = H264Io.encodeAnnexB(widthMbs, heightMbs, nIdr = 0,
      nNonIdr = 0, seed = seed, cropRight = cropRight,
      cropBottom = cropBottom)
    val scs = (0 to psStream.length - 4).filter(i =>
      psStream(i) == 0 && psStream(i + 1) == 0 && psStream(i + 2) == 0 &&
        psStream(i + 3) == 1)
    require(scs.length == 2, "expected SPS+PPS stream")
    val spsB = psStream.slice(scs(0) + 4, scs(1))
    val ppsB = psStream.slice(scs(1) + 4, psStream.length)
    val width = widthMbs * 16 - 2 * cropRight
    val height = heightMbs * 16 - 2 * cropBottom
    val duration = nSamples * sampleDelta

    def sampleSize(i: Int): Int = 20 + i % 7
    val nChunks = (nSamples + samplesPerChunk - 1) / samplesPerChunk
    val mdatBytes = (0 until nSamples).map(sampleSize).sum

    val ftyp = mkBox("ftyp",
      "isom".getBytes("US-ASCII"), beBytes32(512),
      "isom".getBytes("US-ASCII"), "avc1".getBytes("US-ASCII"))

    val mvhd = mkBox("mvhd", beBytes32(0), // version 0 + flags
      beBytes32(0), beBytes32(0),          // creation, modification
      beBytes32(timescale), beBytes32(duration),
      beBytes32(0x00010000L), beBytes16(0x0100), beBytes16(0),
      new Array[Byte](8), UnityMatrix, new Array[Byte](24),
      beBytes32(2)) // next_track_ID

    val tkhd = mkBox("tkhd", beBytes32(3), // version 0, flags enabled
      beBytes32(0), beBytes32(0), beBytes32(1), beBytes32(0),
      beBytes32(duration), new Array[Byte](8),
      beBytes16(0), beBytes16(0), beBytes16(0), beBytes16(0),
      UnityMatrix,
      beBytes32(width.toLong << 16), beBytes32(height.toLong << 16))

    val mdhd = mkBox("mdhd", beBytes32(0),
      beBytes32(0), beBytes32(0),
      beBytes32(timescale), beBytes32(duration),
      beBytes16(0x55c4), beBytes16(0)) // language "und"

    val hdlr = mkBox("hdlr", beBytes32(0), beBytes32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      "graft ".getBytes("US-ASCII"))

    val avcc = mkBox("avcC",
      Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      beBytes16(spsB.length), spsB,
      Array[Byte](1), beBytes16(ppsB.length), ppsB)

    val avc1 = mkBox("avc1",
      new Array[Byte](6), beBytes16(1),      // data_reference_index
      new Array[Byte](16),                   // pre_defined/reserved
      beBytes16(width), beBytes16(height),
      beBytes32(0x00480000L), beBytes32(0x00480000L), // 72 dpi
      beBytes32(0), beBytes16(1),            // frame_count
      new Array[Byte](32),                   // compressorname
      beBytes16(0x0018), beBytes16(0xffff),  // depth, pre_defined -1
      avcc)

    val stsd = mkBox("stsd", beBytes32(0), beBytes32(1), avc1)
    val stts = mkBox("stts", beBytes32(0), beBytes32(1),
      beBytes32(nSamples.toLong), beBytes32(sampleDelta))
    val stsc =
      if (nSamples % samplesPerChunk == 0 || nChunks == 1)
        mkBox("stsc", beBytes32(0), beBytes32(1),
          beBytes32(1), beBytes32(math.min(nSamples, samplesPerChunk)
            .toLong), beBytes32(1))
      else
        mkBox("stsc", beBytes32(0), beBytes32(2),
          beBytes32(1), beBytes32(samplesPerChunk.toLong), beBytes32(1),
          beBytes32(nChunks.toLong),
          beBytes32((nSamples % samplesPerChunk).toLong), beBytes32(1))
    val stsz = mkBox("stsz", beBytes32(0), beBytes32(0),
      beBytes32(nSamples.toLong),
      (0 until nSamples).flatMap(i => beBytes32(sampleSize(i).toLong))
        .toArray)

    def stcoWith(offsets: Seq[Long]): Array[Byte] =
      mkBox("stco", beBytes32(0), beBytes32(offsets.length.toLong),
        offsets.flatMap(beBytes32).toArray)

    def moovWith(stco: Array[Byte]): Array[Byte] = {
      val stbl = mkBox("stbl", stsd, stts, stsc, stsz, stco)
      val vmhd = mkBox("vmhd", beBytes32(1), new Array[Byte](8))
      val dref = mkBox("dref", beBytes32(0), beBytes32(1),
        mkBox("url ", beBytes32(1)))
      val dinf = mkBox("dinf", dref)
      val minf = mkBox("minf", vmhd, dinf, stbl)
      val mdia = mkBox("mdia", mdhd, hdlr, minf)
      val trak = mkBox("trak", tkhd, mdia)
      mkBox("moov", mvhd, trak)
    }
    // two passes: moov's size (hence mdat's position, hence stco's
    // offsets) is independent of the offset VALUES, so measure with
    // zeros, then rebuild with the real offsets
    val moovLen = moovWith(stcoWith(Seq.fill(nChunks)(0L))).length
    val mdatPayloadStart = ftyp.length + moovLen + 8L
    val chunkOffsets = {
      var off = mdatPayloadStart
      (0 until nChunks).map { c =>
        val here = off
        val lo = c * samplesPerChunk
        val hi = math.min(nSamples, lo + samplesPerChunk)
        (lo until hi).foreach(i => off += sampleSize(i))
        here
      }
    }
    val moov = moovWith(stcoWith(chunkOffsets))
    val mdatPayload = new Array[Byte](mdatBytes)
    var i = 0
    while (i < mdatBytes) {
      mdatPayload(i) = (graft.functions.SimHash64.fnv1a64(
        Array(seed.toByte, (i >> 8).toByte, i.toByte)) & 0xff).toByte
      i += 1
    }
    val mdat = mkBox("mdat", mdatPayload)
    val out = new ByteArrayOutputStream(
      ftyp.length + moov.length + mdat.length)
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }

  /** Author a deterministic FRAGMENTED MP4 (DASH/CMAF shape): ftyp
    * (`iso6`) + moov with EMPTY sample tables and `mvex/trex`, then
    * `nFragments` × (`moof` + `mdat`) with contiguous `mfhd`
    * sequence numbers, `default-base-is-moof` addressing, and
    * per-sample durations/sizes in `trun` (sample i of every
    * fragment is `20 + i % 7` bytes, sizes restarting per fragment).
    * Movie/media durations are 0 — in a fragmented file duration
    * truth lives in the truns, exactly what the walker sums. */
  def encodeFmp4(widthMbs: Int, heightMbs: Int, nFragments: Int,
                 samplesPerFrag: Int, sampleDelta: Long, timescale: Long,
                 seed: Long, cropRight: Int = 0, cropBottom: Int = 0)
      : Array[Byte] = {
    require(widthMbs > 0 && heightMbs > 0 && nFragments > 0 &&
            samplesPerFrag > 0 && sampleDelta > 0 && timescale > 0,
      s"bad fMP4 shape: ${widthMbs}x$heightMbs, $nFragments frags")
    val psStream = H264Io.encodeAnnexB(widthMbs, heightMbs, nIdr = 0,
      nNonIdr = 0, seed = seed, cropRight = cropRight,
      cropBottom = cropBottom)
    val scs = (0 to psStream.length - 4).filter(i =>
      psStream(i) == 0 && psStream(i + 1) == 0 && psStream(i + 2) == 0 &&
        psStream(i + 3) == 1)
    require(scs.length == 2, "expected SPS+PPS stream")
    val spsB = psStream.slice(scs(0) + 4, scs(1))
    val ppsB = psStream.slice(scs(1) + 4, psStream.length)
    val width = widthMbs * 16 - 2 * cropRight
    val height = heightMbs * 16 - 2 * cropBottom

    val ftyp = mkBox("ftyp",
      "iso6".getBytes("US-ASCII"), beBytes32(0),
      "iso6".getBytes("US-ASCII"), "dash".getBytes("US-ASCII"))

    val mvhd = mkBox("mvhd", beBytes32(0),
      beBytes32(0), beBytes32(0),
      beBytes32(timescale), beBytes32(0), // duration unknown: truns
      beBytes32(0x00010000L), beBytes16(0x0100), beBytes16(0),
      new Array[Byte](8), UnityMatrix, new Array[Byte](24),
      beBytes32(2))
    val tkhd = mkBox("tkhd", beBytes32(3),
      beBytes32(0), beBytes32(0), beBytes32(1), beBytes32(0),
      beBytes32(0), new Array[Byte](8),
      beBytes16(0), beBytes16(0), beBytes16(0), beBytes16(0),
      UnityMatrix,
      beBytes32(width.toLong << 16), beBytes32(height.toLong << 16))
    val mdhd = mkBox("mdhd", beBytes32(0),
      beBytes32(0), beBytes32(0),
      beBytes32(timescale), beBytes32(0),
      beBytes16(0x55c4), beBytes16(0))
    val hdlr = mkBox("hdlr", beBytes32(0), beBytes32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      "graft ".getBytes("US-ASCII"))
    val avcc = mkBox("avcC",
      Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      beBytes16(spsB.length), spsB,
      Array[Byte](1), beBytes16(ppsB.length), ppsB)
    val avc1 = mkBox("avc1",
      new Array[Byte](6), beBytes16(1),
      new Array[Byte](16),
      beBytes16(width), beBytes16(height),
      beBytes32(0x00480000L), beBytes32(0x00480000L),
      beBytes32(0), beBytes16(1),
      new Array[Byte](32),
      beBytes16(0x0018), beBytes16(0xffff),
      avcc)
    val stsd = mkBox("stsd", beBytes32(0), beBytes32(1), avc1)
    // fragmented: the four sample tables exist but are EMPTY
    val stts = mkBox("stts", beBytes32(0), beBytes32(0))
    val stsc = mkBox("stsc", beBytes32(0), beBytes32(0))
    val stsz = mkBox("stsz", beBytes32(0), beBytes32(0), beBytes32(0))
    val stco = mkBox("stco", beBytes32(0), beBytes32(0))
    val stbl = mkBox("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = mkBox("vmhd", beBytes32(1), new Array[Byte](8))
    val dref = mkBox("dref", beBytes32(0), beBytes32(1),
      mkBox("url ", beBytes32(1)))
    val dinf = mkBox("dinf", dref)
    val minf = mkBox("minf", vmhd, dinf, stbl)
    val mdia = mkBox("mdia", mdhd, hdlr, minf)
    val trak = mkBox("trak", tkhd, mdia)
    val trex = mkBox("trex", beBytes32(0),
      beBytes32(1), beBytes32(1), // track_id, default_sample_desc_idx
      beBytes32(0), beBytes32(0), beBytes32(0))
    val mvex = mkBox("mvex", trex)
    val moov = mkBox("moov", mvhd, trak, mvex)

    def sampleSize(i: Int): Int = 20 + i % 7
    val fragMdatBytes = (0 until samplesPerFrag).map(sampleSize).sum

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var f = 1
    while (f <= nFragments) {
      def moofWith(dataOffset: Int): Array[Byte] = {
        val mfhd = mkBox("mfhd", beBytes32(0), beBytes32(f.toLong))
        val tfhd = mkBox("tfhd", beBytes32(0x020000L), beBytes32(1))
        val trun = mkBox("trun", beBytes32(0x000301L),
          beBytes32(samplesPerFrag.toLong), beBytes32(dataOffset.toLong),
          (0 until samplesPerFrag).flatMap(i =>
            beBytes32(sampleDelta) ++ beBytes32(sampleSize(i).toLong))
            .toArray)
        mkBox("moof", mfhd, mkBox("traf", tfhd, trun))
      }
      // two passes: data_offset = moof size + 8 (the mdat header),
      // and moof's size doesn't depend on the offset VALUE
      val moofLen = moofWith(0).length
      val moof = moofWith(moofLen + 8)
      val payload = new Array[Byte](fragMdatBytes)
      var i = 0
      while (i < fragMdatBytes) {
        payload(i) = (graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, f.toByte, (i >> 8).toByte, i.toByte))
          & 0xff).toByte
        i += 1
      }
      out.write(moof); out.write(mkBox("mdat", payload))
      f += 1
    }
    out.toByteArray
  }
}
