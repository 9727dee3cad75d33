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
  * Detected types cover exactly the containers the real kernels
  * decode: PNG / JPEG / BMP / GIF (image), WAV / AIFF / AU (audio),
  * YUV4MPEG2 (video); anything else — including truncated headers —
  * is `unknown`, the quarantine route. */
object Sniff {

  private def startsWith(content: Column, bytes: Array[Byte],
                         offset: Int = 0): Column =
    substring(content, offset + 1, bytes.length) === lit(bytes)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** The detected container of a binary column, as `kind/container`
    * (e.g. `image/png`, `audio/wav`, `video/y4m`, `unknown`). */
  def sniffModality(content: Column): Column =
    when(content.isNull, lit("unknown"))
      // PNG: \x89PNG\r\n\x1a\n
      .when(startsWith(content, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
                                      0x1a, 0x0a).map(_.toByte)),
            lit("image/png"))
      // JPEG: FF D8 FF
      .when(startsWith(content, Array(0xff, 0xd8, 0xff).map(_.toByte)),
            lit("image/jpeg"))
      .when(startsWith(content, ascii("BM")), lit("image/bmp"))
      .when(startsWith(content, ascii("GIF8")), lit("image/gif"))
      // RIFF container whose form type (bytes 8-11) is WAVE
      .when(startsWith(content, ascii("RIFF")) &&
            startsWith(content, ascii("WAVE"), offset = 8),
            lit("audio/wav"))
      // IFF FORM container whose form type is AIFF (or AIFC)
      .when(startsWith(content, ascii("FORM")) &&
            (startsWith(content, ascii("AIFF"), offset = 8) ||
             startsWith(content, ascii("AIFC"), offset = 8)),
            lit("audio/aiff"))
      .when(startsWith(content, ascii(".snd")), lit("audio/au"))
      .when(startsWith(content, ascii("YUV4MPEG2 ")), lit("video/y4m"))
      .otherwise(lit("unknown"))

  /** Attach the sniffed type as a `detected` column (map-only). */
  def detect(assets: DataFrame, contentCol: String = "content"): DataFrame =
    assets.withColumn("detected", sniffModality(col(contentCol)))

  /** Route by sniffed KIND: adds `route` ∈ {image, audio, video,
    * quarantine} — the dispatch column an ingest pipeline partitions
    * by before handing each slice to its decoder. */
  def route(assets: DataFrame, contentCol: String = "content"): DataFrame =
    detect(assets, contentCol)
      .withColumn("route",
        when(col("detected").startsWith("image/"), lit("image"))
          .when(col("detected").startsWith("audio/"), lit("audio"))
          .when(col("detected").startsWith("video/"), lit("video"))
          .otherwise(lit("quarantine")))
}
