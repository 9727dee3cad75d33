package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Magic-byte content sniffing — the ingest step BEFORE the typed
  * decoders: a real corpus arrives as bytes with unreliable (or
  * absent) modality labels, and routing each asset to the right
  * kernel ([[ImageIo]] / [[AudioIo]] / [[VideoIo]]) needs the
  * container detected from the bytes themselves. Detection is the
  * standard leading-magic-numbers check every `file(1)` /
  * Tika-shaped pipeline uses, spelled as PURE Column expressions
  * (binary `substring` + literal compares — codegen'd, no UDF, no
  * shuffle: sniffing a 100-TB asset table is a map over the scan).
  *
  * ==Structural depth (beyond leading magic)==
  * Leading magic alone routes a truncated-but-magic'd blob to a
  * decoder that then fails on it — wasted decode work and a late
  * quarantine. Each container therefore also gets the CHEAPEST
  * structural check that catches obvious corruption at sniff time,
  * still as pure Column arithmetic over header bytes:
  *  - PNG: the first chunk must be `IHDR` (bytes 12–15 — mandatory
  *    first chunk per the PNG spec), so an 8-byte magic stub fails;
  *  - JPEG: the byte after SOI must be a marker type (≥ 0xC0);
  *  - BMP: the DIB header size (bytes 14–17, LE) must be one of the
  *    real DIB sizes {12, 40, 52, 56, 64, 108, 124} — plain text
  *    starting `BM` no longer routes to the image decoder;
  *  - GIF: full `GIF87a`/`GIF89a` version, not just `GIF8`;
  *  - RIFF/WAVE and FORM/AIFF: the container's declared chunk size
  *    (bytes 4–7; RIFF little-endian, FORM big-endian) must fit in
  *    the actual byte count — a capture cut mid-file quarantines;
  *  - AU: the declared data offset (bytes 4–7, BE) must be ≥ the
  *    24-byte fixed header and present in the bytes;
  *  - Y4M: the first header parameter after `YUV4MPEG2 ` must be
  *    `W` (width — first in every real muxer's header);
  *  - MP3 (ID3-tagged): the four ID3v2 size bytes must be syncsafe
  *    (high bit clear) and the declared tag must FIT in the bytes —
  *    a tag cut mid-download quarantines;
  *  - MP3 (raw sync): the 11 sync bits plus non-reserved version and
  *    layer bits and VALID bitrate (≠ 0 free, ≠ 15 bad) /
  *    sample-rate (≠ 3) indices — random `FF Ex` junk quarantines;
  *  - H.264 Annex-B: a 4-byte start code, a clear
  *    `forbidden_zero_bit`, and a leading NAL type a real stream
  *    starts with (slice/IDR/SEI/SPS/PPS/AUD).
  *
  * A structural LIMIT, by design: compressed streams (MP3, H.264)
  * carry no declared total length, so a cut BODY with an intact
  * leading frame passes sniff and is caught by the structural
  * walkers ([[Mp3Io]]/[[H264Io]]) at parse time — `q_ingest_decode
  * _compressed` gates exactly that division of labor.
  * Byte-field reads are `hex(substring(...))` + `conv` — builtins,
  * codegen'd; on truncated input `substring` shortens, so the field
  * compare fails (or nulls out on empty bytes), the `when` branch is
  * not taken, and the asset falls through to `unknown` (quarantine)
  * with no special-casing.
  *
  * Detected types cover exactly the containers the real kernels
  * decode or structurally parse: PNG / JPEG / BMP / GIF (image),
  * WAV / AIFF / AU / MP3 (audio), YUV4MPEG2 / H.264 Annex-B
  * (video), PDF (document — [[graft.sources.Pdf]]); anything else —
  * truncated headers, declared sizes past EOF, junk with a 2-byte
  * magic prefix — is `unknown`, the quarantine route. */
object Sniff {

  private def startsWith(content: Column, bytes: Array[Byte],
                         offset: Int = 0): Column =
    substring(content, offset + 1, bytes.length) === lit(bytes)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Big-endian unsigned 32-bit field at byte offset `off` (0-based),
    * as a nullable long (null when the bytes aren't there). */
  private def beU32(content: Column, off: Int): Column =
    conv(hex(substring(content, off + 1, 4)), 16, 10).cast("long")

  /** Little-endian unsigned 32-bit field at byte offset `off`:
    * per-byte hex, concatenated most-significant-first. */
  private def leU32(content: Column, off: Int): Column =
    conv(concat((3 to 0 by -1).map(i =>
           hex(substring(content, off + 1 + i, 1))): _*),
         16, 10).cast("long")

  /** Little-endian unsigned 16-bit field at byte offset `off`. */
  private def leU16(content: Column, off: Int): Column =
    conv(concat(hex(substring(content, off + 2, 1)),
           hex(substring(content, off + 1, 1))), 16, 10).cast("long")

  /** Unsigned byte value at offset `off` (0-based), nullable long. */
  private def u8(content: Column, off: Int): Column =
    conv(hex(substring(content, off + 1, 1)), 16, 10).cast("long")

  /** The detected container of a binary column, as `kind/container`
    * (e.g. `image/png`, `audio/wav`, `video/y4m`, `unknown`). */
  def sniffModality(content: Column): Column = {
    val len = length(content)
    when(content.isNull, lit("unknown"))
      // PDF: %PDF- + a digit.digit version ("%PDF-1.4" … "%PDF-2.0")
      // — the document route ([[graft.sources.Pdf]] walks structure)
      .when(startsWith(content, ascii("%PDF-")) &&
            u8(content, 5) >= '1'.toLong && u8(content, 5) <= '9'.toLong &&
            u8(content, 6) === '.'.toLong,
            lit("application/pdf"))
      // HTML: no magic number exists — the standard sniff (what
      // `file(1)`/Tika do) is the DOCTYPE or root-element prefix
      // after optional whitespace/BOM, over the leading bytes only
      .when(lower(substring(content, 1, 256).cast("string"))
              .rlike("^[\\s\\ufeff]*<(!doctype\\s+html|html[\\s>])"),
            lit("text/html"))
      // PNG: \x89PNG\r\n\x1a\n + mandatory IHDR first chunk
      .when(startsWith(content, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
                                      0x1a, 0x0a).map(_.toByte)) &&
            startsWith(content, ascii("IHDR"), offset = 12),
            lit("image/png"))
      // JPEG: FF D8 FF + a real marker type after SOI
      .when(startsWith(content, Array(0xff, 0xd8, 0xff).map(_.toByte)) &&
            u8(content, 3) >= 0xC0L,
            lit("image/jpeg"))
      // BMP: 'BM' + a known DIB header size at bytes 14-17
      .when(startsWith(content, ascii("BM")) &&
            leU32(content, 14).isInCollection(
              Seq(12L, 40L, 52L, 56L, 64L, 108L, 124L)),
            lit("image/bmp"))
      // GIF: full version string, 87a or 89a
      .when(startsWith(content, ascii("GIF87a")) ||
            startsWith(content, ascii("GIF89a")), lit("image/gif"))
      // RIFF container, form type WAVE, declared size within the bytes
      .when(startsWith(content, ascii("RIFF")) &&
            startsWith(content, ascii("WAVE"), offset = 8) &&
            len >= leU32(content, 4) + 8L,
            lit("audio/wav"))
      // IFF FORM container, form type AIFF/AIFC, declared size within
      .when(startsWith(content, ascii("FORM")) &&
            (startsWith(content, ascii("AIFF"), offset = 8) ||
             startsWith(content, ascii("AIFC"), offset = 8)) &&
            len >= beU32(content, 4) + 8L,
            lit("audio/aiff"))
      // AU: .snd + data offset >= fixed header, present in the bytes
      .when(startsWith(content, ascii(".snd")) &&
            beU32(content, 4) >= 24L && len >= beU32(content, 4),
            lit("audio/au"))
      // Y4M: magic + the W (width) parameter leading the header
      .when(startsWith(content, ascii("YUV4MPEG2 ")) &&
            startsWith(content, ascii("W"), offset = 10),
            lit("video/y4m"))
      // ISO-BMFF (MP4): 'ftyp' at offset 4 with a sane leading box
      // size (>= 16: header + major brand + minor version) that FITS
      // in the bytes — a capture cut inside the ftyp box quarantines
      .when(startsWith(content, ascii("ftyp"), offset = 4) &&
            beU32(content, 0) >= 16L && len >= beU32(content, 0),
            lit("video/mp4"))
      // ID3v2-tagged MPEG audio: syncsafe size bytes, declared tag
      // (10-byte header + payload) fits in the bytes
      .when(startsWith(content, ascii("ID3")) &&
            u8(content, 6) < 0x80L && u8(content, 7) < 0x80L &&
            u8(content, 8) < 0x80L && u8(content, 9) < 0x80L &&
            len > lit(10L) + u8(content, 6) * lit(1L << 21) +
                  u8(content, 7) * lit(1L << 14) +
                  u8(content, 8) * lit(1L << 7) + u8(content, 9),
            lit("audio/mp3"))
      // raw MPEG audio sync: FF + 3 more sync bits, version != 01
      // (reserved), layer != 00, bitrate index not 0 (free) / 15,
      // sample-rate index != 3
      .when(u8(content, 0) === 0xffL &&
            u8(content, 1) >= 0xe0L &&
            shiftright(u8(content, 1), 3).bitwiseAND(lit(3L)) =!= 1L &&
            shiftright(u8(content, 1), 1).bitwiseAND(lit(3L)) =!= 0L &&
            shiftright(u8(content, 2), 4) =!= 0L &&
            shiftright(u8(content, 2), 4) =!= 15L &&
            shiftright(u8(content, 2), 2).bitwiseAND(lit(3L)) =!= 3L,
            lit("audio/mp3"))
      // ZIP (PK\x03\x04): discriminated by the FIRST local-file-header
      // entry name (filename length at offset 26 LE, name at 30) —
      // EPUB's OCF spec REQUIRES `mimetype` first (stored), and every
      // mainstream OOXML writer leads with `[Content_Types].xml`.
      // A zip-with-neither is `application/zip` → quarantine (sniff
      // depth limit, documented: a shuffled-entry OOXML file re-routes
      // only at parse time). EPUB additionally checks the mimetype
      // CONTENT when the extra field is empty (the spec's layout).
      .when(startsWith(content, Array[Byte](0x50, 0x4b, 0x03, 0x04)) &&
            leU16(content, 26) === 8L &&
            startsWith(content, ascii("mimetype"), offset = 30) &&
            (leU16(content, 28) =!= 0L ||
             startsWith(content, ascii("application/epub+zip"),
               offset = 38)),
            lit("application/epub+zip"))
      .when(startsWith(content, Array[Byte](0x50, 0x4b, 0x03, 0x04)) &&
            leU16(content, 26) === 19L &&
            startsWith(content, ascii("[Content_Types].xml"), offset = 30),
            lit("application/vnd.openxmlformats-officedocument" +
              ".wordprocessingml.document"))
      .when(startsWith(content, Array[Byte](0x50, 0x4b, 0x03, 0x04)),
            lit("application/zip"))
      // H.264 Annex-B: a leading 4- or 3-byte start code, clear
      // forbidden_zero_bit, and a NAL type a real stream leads with
      .when((startsWith(content, Array[Byte](0, 0, 0, 1)) &&
             u8(content, 4) < 0x80L &&
             u8(content, 4).bitwiseAND(lit(0x1fL)).isInCollection(
               Seq(1L, 5L, 6L, 7L, 8L, 9L))) ||
            (startsWith(content, Array[Byte](0, 0, 1)) &&
             u8(content, 3) < 0x80L &&
             u8(content, 3).bitwiseAND(lit(0x1fL)).isInCollection(
               Seq(1L, 5L, 6L, 7L, 8L, 9L))),
            lit("video/h264"))
      .otherwise(lit("unknown"))
  }

  /** Attach the sniffed type as a `detected` column (map-only). */
  def detect(assets: DataFrame, contentCol: String = "content"): DataFrame =
    assets.withColumn("detected", sniffModality(col(contentCol)))

  /** Route by sniffed KIND: adds `route` ∈ {image, audio, video,
    * document, quarantine} — the dispatch column an ingest pipeline
    * partitions by before handing each slice to its decoder. */
  def route(assets: DataFrame, contentCol: String = "content"): DataFrame =
    detect(assets, contentCol)
      .withColumn("route",
        when(col("detected").startsWith("image/"), lit("image"))
          .when(col("detected").startsWith("audio/"), lit("audio"))
          .when(col("detected").startsWith("video/"), lit("video"))
          .when(col("detected") === "application/pdf" ||
                col("detected") === "text/html" ||
                col("detected") === "application/epub+zip" ||
                col("detected").startsWith(
                  "application/vnd.openxmlformats"), lit("document"))
          .otherwise(lit("quarantine")))
}
