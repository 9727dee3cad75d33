package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec kernels over the [[MediaKernel]] seam, the audio
  * twin of [[ImageIo]]: decode via the JDK's built-in
  * `javax.sound.sampled` (WAV / AIFF / AU — zero external
  * dependencies), in the same batched per-partition shape. With this,
  * audio METADATA decode (sample rate, channels, frame count,
  * duration — the facts a curation pipeline filters on) does real work
  * on real bytes; compressed-codec audio (MP3/OGG) and video demux
  * remain the documented stubs (the JDK ships no codec for them).
  *
  * ==Failure semantics==
  * Same as [[ImageIo]]: undecodable bytes yield `ok = false` with null
  * facts — corrupt assets are captured, not fatal.
  *
  * ==Scale notes==
  * Decode is map-shaped (no shuffle). Only the HEADER facts are
  * materialized — the PCM stream is closed unread, so a multi-GB
  * asset costs a header parse, not a full read. */
object AudioIo {

  final case class Decoded(sampleRateHz: Option[Int], channels: Option[Int],
                           frames: Option[Long], durationMs: Option[Long],
                           format: Option[String], ok: Boolean)

  final class Decoder extends MediaKernel.Handle[Array[Byte], Decoded] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Decoded] =
      batch.map(decodeOne)

    private def decodeOne(bytes: Array[Byte]): Decoded = {
      var in: AudioInputStream = null
      try {
        val fileFmt: AudioFileFormat =
          AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
        in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durMs =
          if (frames >= 0 && fmt.getFrameRate > 0)
            Some((frames * 1000.0 / fmt.getFrameRate).toLong)
          else None
        Decoded(Some(fmt.getSampleRate.toInt), Some(fmt.getChannels),
                if (frames >= 0) Some(frames) else None, durMs,
                Some(fileFmt.getType.toString.toLowerCase), ok = true)
      } catch {
        case _: Exception => Decoded(None, None, None, None, None, ok = false)
      } finally if (in != null) in.close()
    }
  }

  val decoderFactory: MediaKernel.Factory[Array[Byte], Decoded] =
    new MediaKernel.Factory[Array[Byte], Decoded] {
      def open() = new Decoder
    }

  /** Deterministic 16-bit PCM WAV: `nFrames` frames at `sampleRateHz`
    * × `channels`, each sample a pure function of (seed, frame,
    * channel). Real bytes through the real encoder
    * (`AudioSystem.write`), so the decode kernel is exercised on
    * genuine WAV content. */
  def encodeWav(nFrames: Int, sampleRateHz: Int, channels: Int,
                seed: Long): Array[Byte] = {
    require(nFrames > 0 && sampleRateHz > 0 && channels > 0,
      s"bad WAV shape: $nFrames frames, $sampleRateHz Hz, $channels ch")
    val bytesPerFrame = 2 * channels
    val pcm = new Array[Byte](nFrames * bytesPerFrame)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val h = graft.functions.SimHash64.fnv1a64(
          Array(seed.toByte, (seed >> 8).toByte, f.toByte,
                (f >> 8).toByte, c.toByte))
        val sample = (h & 0xffff).toInt - 32768 // full 16-bit range
        val off = f * bytesPerFrame + c * 2
        pcm(off) = (sample & 0xff).toByte          // little-endian
        pcm(off + 1) = ((sample >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(sampleRateHz.toFloat, 16, channels,
                              true, false) // signed, little-endian
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    finally stream.close()
    out.toByteArray
  }
}
