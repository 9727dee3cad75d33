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

  /** Deterministic MELODY fixture: the clip is split into
    * `notesHz.size` equal note segments, each a single sine at that
    * note's frequency, rendered at `bits` ∈ {8, 16} and `amplitude` ∈
    * (0, 1] — the fixture writer behind the audio-fingerprint dedup
    * plants, where the SAME melody re-rendered at a different depth
    * or gain must land within a few fingerprint bits while different
    * melodies land far apart. A melody (not a stationary mixture) on
    * purpose: a Haitsma–Kalker fingerprint is the sign of TIME deltas
    * of band energies, which a stationary signal leaves at numeric
    * noise — the degenerate fixture two different mixtures can
    * collide on. `StrictMath.sin` keeps the PCM bit-deterministic
    * across JVMs. */
  def encodeToneWav(nFrames: Int, sampleRateHz: Int, bits: Int,
                    amplitude: Double, notesHz: Seq[Double],
                    seed: Long): Array[Byte] = {
    require(nFrames > 0 && sampleRateHz > 0, "bad tone shape")
    require(bits == 8 || bits == 16, s"bits must be 8 or 16, got $bits")
    require(amplitude > 0 && amplitude <= 1.0, s"bad amplitude $amplitude")
    require(notesHz.nonEmpty, "need at least one note")
    val phase =
      ((graft.functions.SimHash64.fnv1a64(Array(
        seed.toByte, (seed >> 8).toByte)) & 0xffffL)
        .toDouble / 65536.0) * 2.0 * StrictMath.PI
    val bytesPerFrame = bits / 8
    val pcm = new Array[Byte](nFrames * bytesPerFrame)
    val n = notesHz.size
    var f = 0
    while (f < nFrames) {
      val note = math.min(((f.toLong * n) / nFrames).toInt, n - 1)
      val v = amplitude * StrictMath.sin(
        2.0 * StrictMath.PI * notesHz(note) * f / sampleRateHz + phase)
      if (bits == 16) {
        val q = math.max(-32768, math.min(32767,
          math.round(v * 32767.0))).toInt
        pcm(f * 2) = (q & 0xff).toByte
        pcm(f * 2 + 1) = ((q >> 8) & 0xff).toByte
      } else {
        // 8-bit WAV is UNSIGNED PCM
        val q = math.max(0, math.min(255,
          math.round(v * 127.0) + 128)).toInt
        pcm(f) = q.toByte
      }
      f += 1
    }
    val fmt = new AudioFormat(sampleRateHz.toFloat, bits, 1,
                              bits == 16, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    finally stream.close()
    out.toByteArray
  }
}
