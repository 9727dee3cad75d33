package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned audio-embedding inference ([[AudioEmbed]]): PCM decode,
  * grid math, partition invariance, quarantine, and the
  * clones-nearest retrieval composition. */
class AudioEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dOut = 8
  private lazy val matrix = graft.text.EmbedModel.collectMatrix(
    graft.text.EmbedModel.syntheticWeightRows(
      spark, AudioEmbed.FeatureDim, dOut),
    AudioEmbed.FeatureDim, dOut)

  test("pcmMono reads back exactly what encodeWav wrote") {
    // mono 16-bit: sample f = the seeded hash the encoder used
    val n = 200
    val bytes = AudioIo.encodeWav(n, 8000, 1, seed = 77L)
    val x = AudioEmbed.pcmMono(bytes).get
    assert(x.length == n)
    (0 until n).foreach { f =>
      val h = graft.functions.SimHash64.fnv1a64(
        Array(77L.toByte, (77L >> 8).toByte, f.toByte,
              (f >> 8).toByte, 0.toByte))
      val want = ((h & 0xffff).toInt - 32768) / 32768.0
      assert(math.abs(x(f) - want) < 1e-12, s"frame $f")
    }
    // stereo averages the two channels
    val st = AudioEmbed.pcmMono(AudioIo.encodeWav(n, 8000, 2, 77L)).get
    assert(st.length == n)
  }

  test("grid: a pure band-k cosine concentrates energy in band k") {
    // one segment's worth of cos(pi*3*(j+0.5)/L) has all its DCT-II
    // energy at k=3; build 8 identical segments so every time slot
    // shows the same concentration
    val L = 512
    val x = Array.tabulate(AudioEmbed.Segments * L)(j =>
      math.cos(math.Pi * 3 * ((j % L) + 0.5) / L))
    val g = AudioEmbed.grid(x)
    (0 until AudioEmbed.Segments).foreach { t =>
      val seg = g.slice(t * AudioEmbed.Bands, (t + 1) * AudioEmbed.Bands)
      val top = seg.indexOf(seg.max)
      assert(top == 2, s"segment $t peak at band ${top + 1}, want 3")
      // off-band energy is orthogonal-zero up to rounding
      seg.zipWithIndex.filter(_._2 != 2).foreach { case (v, _) =>
        assert(v < 1e-6f)
      }
    }
  }

  test("embedAudio: deterministic, partition-invariant, quarantines junk") {
    val assets = Multimodal.syntheticAudioAssets(spark, 48)
    def run(df: org.apache.spark.sql.DataFrame) =
      AudioEmbed.embedAudio(df, matrix, dOut)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
        .toMap
    val a = run(assets.repartition(1))
    val b = run(assets.repartition(7))
    assert(a == b && a.size == 48)
    assert(a.values.forall(_.length == dOut))
    // junk bytes and too-short clips embed to the empty vector
    val junk = Seq(
      (98L, "not audio at all".getBytes("US-ASCII")),
      (99L, AudioIo.encodeWav(16, 8000, 1, 1L))) // 16 < FeatureDim
      .toDF("asset_id", "content")
    val q = run(junk)
    assert(q(98L).isEmpty && q(99L).isEmpty)
  }

  test("composition: a re-encoded clone is its original's nearest neighbor") {
    // clones = the same seeded PCM re-encoded under a new id; the
    // learned head must keep clone pairs nearest in cosine
    val base = Multimodal.syntheticAudioAssets(spark, 8)
    val clones = base
      .select((col("asset_id") + 1000L).as("asset_id"),
              col("modality"), col("content"))
    val emb = AudioEmbed.embedAudio(base.unionByName(clones), matrix,
        dOut, normalize = true)
      .filter(size(col("embedding")) > 0)
      .withColumnRenamed("asset_id", "vec_id")
    val top = graft.similarity.Similarity.cosineTopK(emb, emb, k = 1)
    top.collect().foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(math.abs(q - n) == 1000L,
        s"nearest of $q should be its clone, got $n")
    }
  }
}
