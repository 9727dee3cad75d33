package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: image/audio/video as opaque `binary`
  * content plus a typed metadata struct, with the decode / feature /
  * resize / frame-sample stages of a training-data pipeline.
  *
  * ==What is real vs STUBBED==
  * The Spark-side plumbing is real and tested: asset schema, binary
  * columns, content hashing/sizing, partitioning strategy, per-stage
  * column contracts, determinism. IMAGE DECODE IS REAL: [[decodeImages]]
  * runs the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF, zero external
  * deps) through the [[MediaKernel]] seam — see [[ImageIo]]. AUDIO
  * METADATA DECODE IS REAL: [[decodeAudio]] runs `javax.sound.sampled`
  * (WAV/AIFF/AU headers) through the same seam — see [[AudioIo]].
  * VIDEO DEMUX IS REAL: [[decodeVideos]]/[[sampleVideoFrames]] walk
  * genuine YUV4MPEG2 frame boundaries and read real luma planes — see
  * [[VideoIo]]. IMAGE FEATURE EXTRACTION IS REAL in its classical
  * form: [[ImagePhash.featureFactory]] plugs the normalized DCT
  * coefficient block (genuine pixel features) into
  * [[batchedFeatureExtract]], composing with
  * `Dedup.embeddingNearDuplicates` for cosine-space image dedup.
  * COMPRESSED-CONTAINER STRUCTURAL METADATA IS REAL:
  * [[parseMp3Streams]] walks genuine MPEG audio frame headers
  * (ID3 tags, full bitrate/sample-rate tables, VBR — [[Mp3Io]]) and
  * [[parseH264Streams]] walks H.264 Annex-B NAL units with a real
  * exp-Golomb SPS decode (geometry, profile/level, IDR census —
  * [[H264Io]]) — the `ffprobe`-style facts a curation pipeline
  * filters on, no codec needed. The REMAINING KERNELS ARE STUBS —
  * this container ships no compressed-codec SAMPLE decoders
  * (H.264 macroblocks / MP3 subband synthesis / VP9) or model
  * runtime, so `featureExtractStub` /
  * [[FakeEmbedder]] (LEARNED-embedding inference) derive
  * deterministic fake values from the content bytes,
  * `frameSampleStub` remains the Spark-side frame-index plan for
  * compressed containers, and `decodeImageStub` stays as the
  * hash-derived codegen'd expression form for plans over non-image
  * binaries. A production deployment
  * swaps each remaining stub for a real kernel with the SAME column
  * signature (binary in, struct/array out) via a
  * [[MediaKernel.Factory]] — the surrounding plan, schema, and
  * partitioning do not change, exactly as [[decodeImages]] proves.
  *
  * ==Scale notes==
  * Blobs ride the shuffle, so every stage here is map-shaped (no
  * shuffle); [[repartitionForBlobs]] is the one explicit repartition,
  * sized so a partition of blobs fits executor memory. Metadata-only
  * queries never touch `content` — column pruning drops the blob column
  * at the parquet scan.
  */
object Multimodal {

  /** Deterministic fake asset table derived from `documents` (content =
    * UTF-8 bytes of the text; modality round-robins image/audio/video).
    * Gives the pipeline real binary columns without media files. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        lit("fake/v1").as("format"),
        (col("n_chars") % 1920 + 1).cast("int").as("width"),
        (col("n_chars") % 1080 + 1).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms"))
        .as("meta"))

  /** Content-addressed identity: sha-256 of the raw bytes. */
  def contentHash(content: Column): Column = sha2(content, 256)

  /** Blob size in bytes (binary `length` is octet length). */
  def contentSize(content: Column): Column = length(content)

  /** STUB image decode: real kernel = codec library mapping bytes →
    * (width, height, channels[, pixels]). Here: dimensions derived
    * deterministically from a 64-bit hash of the bytes. Same output
    * contract `struct<width:int, height:int, channels:int>`. */
  def decodeImageStub(content: Column): Column =
    struct(
      (pmod(xxhash64(content), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(content, lit(1)), lit(1080)) + 1).cast("int").as("height"),
      lit(3).as("channels"))

  /** STUB embedding extraction: real kernel = batched model inference.
    * Here: `dim` floats in [-1, 1], each a scaled keyed hash of the
    * bytes — deterministic, uniform-ish, join/ANN-compatible
    * (`array<float>`, same as the embeddings table). */
  def featureExtractStub(content: Column, dim: Int = 16): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(2000001)) - lit(1000000))
             .cast("double") / 1000000.0)
      .cast("array<float>")

  /** STUB video frame sampling: real kernel = demuxer emitting every
    * n-th frame as binary. Here: the frame INDEX PLAN (timestamps in
    * ms at `fps`, stride `everyN`) — which is the genuinely Spark-side
    * half of the real operator. */
  def frameSampleStub(durationMs: Column, fps: Int = 25,
                      everyN: Int = 50): Column = {
    val nFrames = (durationMs * fps / 1000).cast("int")
    // zero-duration assets plan ZERO frames — without the guard,
    // sequence(0, greatest(-1, 0)) = [0] would plan one (ADVICE r2)
    when(nFrames > 0,
      filter(
        transform(sequence(lit(0), nFrames - 1),
                  f => (f * lit(1000L) / fps).cast("long")),
        (_, idx) => idx % everyN === 0))
      .otherwise(array().cast("array<long>"))
  }

  /** STUB resize: real kernel re-encodes pixels; the dimension math
    * (fit inside maxDim, preserve aspect) is exact and shared. */
  def resizeMeta(meta: Column, maxDim: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(maxDim) / greatest(w, h), lit(1.0))
    struct(
      meta.getField("format").as("format"),
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  /** The BATCHED kernel form of feature extraction — the Scala analogue
    * of a Pandas UDF over `mapInPandas`, which is how a real model
    * kernel runs: a handle opened ONCE per partition (codec context,
    * model session), inputs accumulated into fixed-size batches, one
    * vectorized inference call per batch, close guaranteed on task end
    * (see [[MediaKernel.runKernel]]). The default handle is
    * [[FakeEmbedder]] (deterministic bytes→floats, this container ships
    * no model runtime); a production deployment passes its own
    * [[MediaKernel.Factory]] and NOTHING else changes — the Spark-side
    * plumbing — typed Dataset in, per-partition lifecycle, batch shape,
    * schema out — is the real production contract and is what the spec
    * pins: output is invariant to partitioning and batch size, and
    * deterministic. */
  def batchedFeatureExtract(
      assets: DataFrame, dim: Int = 16, batchSize: Int = 64,
      kernel: MediaKernel.Factory[Array[Byte], Array[Float]] = null)
      : DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val factory = Option(kernel).getOrElse(FakeEmbedder.factory(dim))
    MediaKernel.runKernel(assets, factory, batchSize)
      .toDF("asset_id", "features")
  }

  /** The batched kernel form of image decode — same seam as
    * [[batchedFeatureExtract]], struct-shaped output. The default
    * handle derives dimensions from a content hash (same contract as
    * [[decodeImageStub]], which stays as the codegen'd expression form
    * for plans that never need a native codec). */
  def batchedDecode(
      assets: DataFrame, batchSize: Int = 64,
      kernel: MediaKernel.Factory[Array[Byte], (Int, Int, Int)] = null)
      : DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val factory = Option(kernel).getOrElse(FakeDecoder.factory)
    MediaKernel.runKernel(assets, factory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2._1").as("width"), col("_2._2").as("height"),
              col("_2._3").as("channels"))
  }

  /** REAL image decode (MM2): `javax.imageio` over the [[MediaKernel]]
    * seam — one decoder per partition, fixed-size batches, blobs never
    * shuffled. Output: `asset_id, width, height, channels, format, ok`
    * with `ok = false` (null facts) for undecodable bytes, so corrupt
    * assets are CAPTURED, not fatal — the caller quarantines on the
    * flag (same posture as the corrupt-record columns in `sources/`).
    * No oracle is possible (DuckDB cannot decode PNGs), so the gate is
    * MultimodalSpec: real encoded bytes in, exact known dims/bands
    * out, partition/batch invariance. */
  def decodeImages(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, ImageIo.decoderFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.width").as("width"), col("_2.height").as("height"),
              col("_2.channels").as("channels"),
              col("_2.format").as("format"), col("_2.ok").as("ok"))
  }

  /** REAL audio metadata decode: `javax.sound.sampled` (WAV/AIFF/AU)
    * over the same [[MediaKernel]] seam — header facts only (sample
    * rate, channels, frames, duration), the PCM stream is never read,
    * so a multi-GB asset costs a header parse. `ok = false` rows are
    * quarantined corrupt bytes, as in [[decodeImages]]. Gated by
    * `q_audio_decode` (closed-form oracle) + AudioIoSpec. */
  def decodeAudio(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, AudioIo.decoderFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.sampleRateHz").as("sample_rate_hz"),
              col("_2.channels").as("channels"),
              col("_2.frames").as("frames"),
              col("_2.durationMs").as("duration_ms"),
              col("_2.format").as("format"), col("_2.ok").as("ok"))
  }

  /** REAL video demux: YUV4MPEG2 over the same [[MediaKernel]] seam —
    * stream facts (dims, fps ratio, colorspace, frame count, duration)
    * from a single-pass walk of genuine frame boundaries. `ok = false`
    * rows are quarantined corrupt/truncated bytes, as in
    * [[decodeImages]]. Gated by `q_video_decode` (closed-form oracle)
    * + VideoIoSpec. */
  def decodeVideos(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, VideoIo.decoderFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.width").as("width"), col("_2.height").as("height"),
              col("_2.fpsNum").as("fps_num"), col("_2.fpsDen").as("fps_den"),
              col("_2.colorspace").as("colorspace"),
              col("_2.nFrames").as("n_frames"),
              col("_2.durationMs").as("duration_ms"),
              col("_2.ok").as("ok"))
  }

  /** REAL frame sampling: every `everyNth`-th frame (≤ `maxFrames`),
    * each sampled frame's payload offset and exact luma-plane byte sum
    * read from the REAL bytes — one output row per sampled frame.
    * Corrupt assets vanish from the output (their frame list is
    * empty); quarantine on [[decodeVideos]]'s `ok` instead. */
  def sampleVideoFrames(assets: DataFrame, everyNth: Int = 2,
                        maxFrames: Int = 4,
                        batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(
        assets, VideoIo.samplerFactory(everyNth, maxFrames), batchSize)
      .select(col("_1").as("asset_id"), explode(col("_2")).as("f"))
      .select(col("asset_id"),
              col("f.frameIdx").as("frame_idx"),
              col("f.byteOff").as("byte_off"),
              col("f.lumaSum").as("luma_sum"))
  }

  /** REAL frame sampling for COMPRESSED video ([[H264Io.sampleNals]]):
    * every `everyNth`-th slice NAL (≤ `maxFrames`) with its exact
    * byte offset, type (5 = IDR), size, and payload byte sum — the
    * seek index a downstream decoder consumes, built structurally
    * with no pixel decode. One output row per sampled slice; corrupt
    * assets vanish (empty list) — quarantine on [[parseH264Streams]]'s
    * `ok`, the same contract as [[sampleVideoFrames]]. This retires
    * [[frameSampleStub]]'s role for Annex-B streams; the stub remains
    * only as the fps-arithmetic PLAN for containers with no
    * structural walker. */
  def sampleH264Nals(assets: DataFrame, everyNth: Int = 2,
                     maxFrames: Int = 4,
                     batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(
        assets, H264Io.samplerFactory(everyNth, maxFrames), batchSize)
      .select(col("_1").as("asset_id"), explode(col("_2")).as("s"))
      .select(col("asset_id"),
              col("s.sliceIdx").as("slice_idx"),
              col("s.byteOff").as("byte_off"),
              col("s.nalType").as("nal_type"),
              col("s.nalBytes").as("nal_bytes"),
              col("s.paySum").as("pay_sum"))
  }

  /** Deterministic REAL-video asset table: `n` Y4M streams encoded by
    * [[VideoIo.encodeY4m]] on the executors — odd ids mono (odd dims
    * allowed), even ids 420jpeg (even dims), fps cycling 25/30/NTSC
    * 30000:1001; all facts pure functions of the id. */
  def syntheticVideoAssets(spark: org.apache.spark.sql.SparkSession,
                           n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val mono = id % 2 == 1
      val w = if (mono) 3 + (id % 8).toInt else 2 * (1 + (id % 4).toInt)
      val h = if (mono) 2 + (id % 5).toInt else 2 * (1 + (id % 3).toInt)
      val (fn, fd) = Seq((25, 1), (30, 1), (30000, 1001))((id % 3).toInt)
      val frames = 3 + (id % 8).toInt
      (id, "video",
       VideoIo.encodeY4m(w, h, fn, fd, frames, seed = id,
                         colorspace = if (mono) "mono" else "420jpeg"))
    }.toDF("asset_id", "modality", "content")
  }

  /** Deterministic REAL-audio asset table: `n` 16-bit PCM WAVs encoded
    * by [[AudioIo.encodeWav]] on the executors; shape facts are pure
    * functions of the id (same design as [[syntheticImageAssets]]). */
  def syntheticAudioAssets(spark: org.apache.spark.sql.SparkSession,
                           n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val frames = 100 + (id % 400).toInt
      val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
      val channels = 1 + (id % 2).toInt
      (id, "audio", AudioIo.encodeWav(frames, rate, channels, seed = id * 6007L))
    }.toDF("asset_id", "modality", "content")
  }

  /** Deterministic REAL-image asset table: `n` PNGs (mix of RGB, ARGB,
    * grayscale) encoded by [[ImageIo.encodePng]] on the executors —
    * genuine codec bytes for exercising [[decodeImages]] without media
    * files in the container. Dims are a pure function of the id, so
    * specs can assert exact decode facts. Generation is map-shaped
    * over a `spark.range`. */
  def syntheticImageAssets(spark: org.apache.spark.sql.SparkSession,
                           n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val w = 1 + (id % 9).toInt
      val h = 1 + (id % 7).toInt
      val t = (id % 3) match {
        case 0 => java.awt.image.BufferedImage.TYPE_INT_RGB
        case 1 => java.awt.image.BufferedImage.TYPE_INT_ARGB
        case _ => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      }
      (id, "image", ImageIo.encodePng(w, h, seed = id * 7919L, imageType = t))
    }.toDF("asset_id", "modality", "content")
  }

  /** REAL MP3 structural parse ([[Mp3Io]]) over the [[MediaKernel]]
    * seam — frame-header walking for sample rate, channels, frame
    * count, duration, CBR/VBR bitrate and ID3 tag size, reading 4
    * bytes per frame and zero sample decode. `ok = false` rows are
    * corrupt/truncated streams, quarantined by the caller. Gated by
    * `q_mp3_parse` (closed-form oracle) + Mp3IoSpec. */
  def parseMp3Streams(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, Mp3Io.parserFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.sampleRateHz").as("sample_rate_hz"),
              col("_2.channels").as("channels"),
              col("_2.frames").as("frames"),
              col("_2.durationMs").as("duration_ms"),
              col("_2.bitrateKbps").as("bitrate_kbps"),
              col("_2.vbr").cast("long").as("vbr"),
              col("_2.layer").as("layer"),
              col("_2.versionId").as("version"),
              col("_2.id3v2Bytes").as("id3v2_bytes"),
              col("_2.xingFrames").as("xing_frames"),
              col("_2.ok").as("ok"))
  }

  /** REAL H.264 Annex-B structural parse ([[H264Io]]) over the same
    * seam — start-code walk + exp-Golomb SPS decode for geometry,
    * profile/level and the NAL/IDR census; slice payloads are never
    * bit-parsed. `ok = false` rows are corrupt streams, quarantined
    * by the caller. Gated by `q_h264_parse` (closed-form oracle) +
    * H264IoSpec. */
  def parseH264Streams(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, H264Io.parserFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.width").as("width"),
              col("_2.height").as("height"),
              col("_2.profileIdc").as("profile_idc"),
              col("_2.levelIdc").as("level_idc"),
              col("_2.nNal").as("n_nal"),
              col("_2.nIdr").as("n_idr"),
              col("_2.nNonIdr").as("n_non_idr"),
              col("_2.ok").as("ok"))
  }

  /** [[Mp4Io.parseMp4]] over a binary asset table — the ISO-BMFF
    * analogue of [[parseMp3Streams]]/[[parseH264Streams]]: brand,
    * timescale/duration, handler, SPS-derived geometry (decoded
    * through the real [[H264Io]] kernel via avcC), and the PROVEN
    * sample seek index census. */
  def parseMp4Streams(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, Mp4Io.parserFactory, batchSize)
      .select(col("_1").as("asset_id"),
              col("_2.brand").as("brand"),
              col("_2.handler").as("handler"),
              col("_2.timescale").as("timescale"),
              col("_2.durationMs").as("duration_ms"),
              col("_2.width").as("width"),
              col("_2.height").as("height"),
              col("_2.profileIdc").as("profile_idc"),
              col("_2.levelIdc").as("level_idc"),
              col("_2.nSamples").as("n_samples"),
              col("_2.nChunks").as("n_chunks"),
              col("_2.mdatBytes").as("mdat_bytes"),
              col("_2.sampleSpan").as("sample_span"),
              col("_2.ok").as("ok"))
  }

  /** Deterministic REAL-MP4 asset table: `n` flat ISO-BMFF files
    * authored by [[Mp4Io.encodeMp4]] on the executors — geometry
    * cycling (every 5th id cropped to non-multiple-of-16 dims, same
    * contract as [[syntheticH264Assets]]), sample counts 8–20,
    * sample deltas in multiples of 30 against timescales
    * 1000·(1 + id % 3) so `duration_ms` stays integer-exact; all
    * facts pure functions of the id. */
  def syntheticMp4Assets(spark: org.apache.spark.sql.SparkSession,
                         n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val crop = id % 5 == 0
      (id, "video", Mp4Io.encodeMp4(
        widthMbs = 2 + (id % 6).toInt, heightMbs = 2 + (id % 4).toInt,
        nSamples = 8 + (id % 13).toInt,
        sampleDelta = 120L + 30L * (id % 5),
        timescale = 1000L * (1 + id % 3), seed = id * 6301L,
        cropRight = if (crop) 1 else 0, cropBottom = if (crop) 1 else 0))
    }.toDF("asset_id", "modality", "content")
  }

  /** Deterministic REAL fragmented-MP4 asset table (DASH/CMAF
    * `moof`+`mdat` shape, [[Mp4Io.encodeFmp4]]): fragment counts 2–6,
    * 4–9 samples per fragment, same geometry/timescale cycling as
    * [[syntheticMp4Assets]]; all facts pure functions of the id. */
  def syntheticFmp4Assets(spark: org.apache.spark.sql.SparkSession,
                          n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val crop = id % 5 == 0
      (id, "video", Mp4Io.encodeFmp4(
        widthMbs = 2 + (id % 6).toInt, heightMbs = 2 + (id % 4).toInt,
        nFragments = 2 + (id % 5).toInt,
        samplesPerFrag = 4 + (id % 6).toInt,
        sampleDelta = 120L + 30L * (id % 5),
        timescale = 1000L * (1 + id % 3), seed = id * 8597L,
        cropRight = if (crop) 1 else 0, cropBottom = if (crop) 1 else 0))
    }.toDF("asset_id", "modality", "content")
  }

  /** Deterministic REAL-MP3 asset table: `n` MPEG-1 Layer III streams
    * authored by [[Mp3Io.encodeMp3]] on the executors — sample rate
    * cycling 44.1/48/32 kHz, even ids CBR / odd ids two-rate VBR,
    * every 4th id ID3v2-tagged, every 5th ID3v1-tailed, every 3rd
    * with alternating padding bits, every 6th carrying a Xing/Info
    * tag frame declaring the true count; all facts pure functions of
    * the id (same design as [[syntheticAudioAssets]]). */
  def syntheticMp3Assets(spark: org.apache.spark.sql.SparkSession,
                         n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val frames = 20 + (id % 30).toInt
      val a = 5 + (id % 8).toInt
      val b = 5 + ((id + 1) % 8).toInt
      (id, "audio", Mp3Io.encodeMp3(
        nFrames = frames, versionBits = 3, layer = 3,
        sampleRateIdx = (id % 3).toInt,
        bitrateIdxOf = f => if (id % 2 == 0 || f % 2 == 0) a else b,
        channels = if (id % 4 < 2) 1 else 2, seed = id * 9103L,
        paddingOf = f => if (id % 3 == 0) f % 2 else 0,
        id3v2PadBytes = if (id % 4 == 0) 17 + id.toInt else -1,
        id3v1 = id % 5 == 0, xing = id % 6 == 0))
    }.toDF("asset_id", "modality", "content")
  }

  /** Deterministic REAL-H.264 asset table: `n` Annex-B streams
    * authored by [[H264Io.encodeAnnexB]] on the executors — bit-real
    * SPS/PPS, every 5th id cropped to non-multiple-of-16 dims, IDR
    * and non-IDR slice counts cycling; all facts pure functions of
    * the id. */
  def syntheticH264Assets(spark: org.apache.spark.sql.SparkSession,
                          n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val crop = id % 5 == 0
      (id, "video", H264Io.encodeAnnexB(
        widthMbs = 1 + (id % 6).toInt, heightMbs = 1 + (id % 4).toInt,
        nIdr = 1 + (id % 3).toInt, nNonIdr = (id % 5).toInt,
        seed = id * 7877L,
        cropRight = if (crop) 1 else 0, cropBottom = if (crop) 1 else 0))
    }.toDF("asset_id", "modality", "content")
  }

  /** STUB model handle for [[batchedFeatureExtract]]: deterministic
    * keyed-FNV floats in [-1, 1] (a real handle wraps a model session;
    * the batch-in/batch-out signature is the contract). */
  final class FakeEmbedder(dim: Int)
      extends MediaKernel.Handle[Array[Byte], Array[Float]]
      with Serializable {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map { bytes =>
        Array.tabulate(dim) { i =>
          val h = graft.functions.SimHash64.fnv1a64(bytes :+ i.toByte)
          ((java.lang.Math.floorMod(h, 2000001L) - 1000000L).toDouble /
            1000000.0).toFloat
        }
      }
    /** Pre-seam name, kept for source compatibility. */
    def embedBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      processBatch(batch)
  }
  object FakeEmbedder {
    def factory(dim: Int): MediaKernel.Factory[Array[Byte], Array[Float]] =
      new MediaKernel.Factory[Array[Byte], Array[Float]] {
        def open() = new FakeEmbedder(dim)
      }
  }

  /** STUB decode handle for [[batchedDecode]]: dimensions from a 64-bit
    * content hash — the kernel-form twin of [[decodeImageStub]]. */
  final class FakeDecoder
      extends MediaKernel.Handle[Array[Byte], (Int, Int, Int)] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[(Int, Int, Int)] =
      batch.map { bytes =>
        val h = graft.functions.SimHash64.fnv1a64(bytes)
        ((java.lang.Math.floorMod(h, 1920L) + 1).toInt,
         (java.lang.Math.floorMod(h >>> 32, 1080L) + 1).toInt, 3)
      }
  }
  object FakeDecoder {
    val factory: MediaKernel.Factory[Array[Byte], (Int, Int, Int)] =
      new MediaKernel.Factory[Array[Byte], (Int, Int, Int)] {
        def open() = new FakeDecoder
      }
  }

  /** Blob-aware repartition: hash-distribute by asset id so each task
    * holds ~targetPartitionBytes of blob payload (the analogue of
    * maxPartitionBytes, which only governs scan splits). */
  def repartitionForBlobs(assets: DataFrame, totalBytes: Long,
                          targetPartitionBytes: Long = 128L << 20)
      : DataFrame = {
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    assets.repartition(parts, col("asset_id"))
  }

  /** The full stub pipeline: decode + features + frame plan + hash —
    * one map-shaped pass, no shuffle. */
  def enrich(assets: DataFrame, featureDim: Int = 16): DataFrame =
    assets
      .withColumn("content_hash", contentHash(col("content")))
      .withColumn("n_bytes", contentSize(col("content")))
      .withColumn("decoded", decodeImageStub(col("content")))
      .withColumn("features", featureExtractStub(col("content"), featureDim))
      .withColumn("frame_times_ms",
        when(col("modality") === "video",
             frameSampleStub(col("meta.duration_ms")))
          .otherwise(array().cast("array<long>")))
}
