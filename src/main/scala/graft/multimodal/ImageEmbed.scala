package graft.multimodal

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEARNED image-embedding inference — the image half of the
  * [[graft.text.EmbedModel]] story, closing the same `FakeEmbedder`
  * gap for vision: a REAL model (a learned linear projection head)
  * runs over REAL pixel features (the [[ImagePhash]] DCT block — the
  * classic frozen-backbone-plus-linear-probe architecture) through
  * the production [[MediaKernel]] seam. Deep convolutional backbones
  * stay environmental (no model runtime in this container, scaladoc'd
  * in [[Multimodal]]); the linear head is genuinely learned weights
  * doing genuine inference on genuine decoded pixels.
  *
  * ==Model contract==
  * Weights live in [[graft.text.EmbedModel]]'s checkpoint format —
  * parquet `(bucket, dim, w)` rows, `bucket` = input feature index
  * (0 until 63: the K×K DCT block minus DC), `dim` = output index.
  * The forward pass is the same accumulate loop as the text
  * embedding-bag with the feature VALUE as the bag weight:
  * `y[k] = Σ_i x[i] · W[i·dOut + k]` — so text and image models
  * share storage, broadcast, and driver-bound machinery
  * (`saveWeights`/`loadMatrix`/`collectMatrix`).
  *
  * ==Scale notes==
  * Decode + DCT + GEMV are one map over the asset scan (no shuffle);
  * the matrix is 63·dOut floats — KBs — shipped once per executor by
  * torrent broadcast. Output lands on the `embedding` column
  * contract, feeding [[graft.similarity.Similarity]]/`Pq` and
  * [[graft.dedup.Dedup.embeddingNearDuplicates]] directly. */
object ImageEmbed {

  /** DCT feature width: [[ImagePhash.dctFeatures]]'s K×K block minus
    * the DC coefficient. */
  val FeatureDim = 63

  /** `y = Wᵀx` accumulate kernel (EmbedModel's memory layout). */
  private[multimodal] def project(x: Array[Float], w: Array[Float],
                                  dOut: Int,
                                  normalize: Boolean): Array[Float] = {
    val out = new Array[Float](dOut)
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      if (xi != 0f) {
        val row = i * dOut
        var k = 0
        while (k < dOut) { out(k) += xi * w(row + k); k += 1 }
      }
      i += 1
    }
    if (normalize) {
      var s = 0.0
      var k = 0
      while (k < dOut) { s += out(k).toDouble * out(k); k += 1 }
      if (s > 0) {
        val inv = (1.0 / math.sqrt(s)).toFloat
        k = 0
        while (k < dOut) { out(k) *= inv; k += 1 }
      }
    }
    out
  }

  /** The decode→DCT→project pass as a [[MediaKernel]] factory —
    * plug into [[Multimodal.batchedFeatureExtract]] like the text
    * kernel. Undecodable bytes yield an EMPTY vector (quarantine on
    * `size(features) > 0`, the [[ImagePhash.featureFactory]]
    * contract). */
  def kernelFactory(bc: Broadcast[Array[Float]], dOut: Int,
                    normalize: Boolean = false)
      : MediaKernel.Factory[Array[Byte], Array[Float]] =
    new MediaKernel.Factory[Array[Byte], Array[Float]] {
      def open(): MediaKernel.Handle[Array[Byte], Array[Float]] =
        new MediaKernel.Handle[Array[Byte], Array[Float]] {
          javax.imageio.ImageIO.setUseCache(false)
          def processBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
            batch.map { bytes =>
              ImagePhash.dctFeatures(bytes) match {
                case Some(x) =>
                  require(x.length == FeatureDim,
                    s"feature width ${x.length} != $FeatureDim")
                  project(x, bc.value, dOut, normalize)
                case None => Array.empty[Float]
              }
            }
        }
    }

  /** Embed an asset table → `(asset_id, embedding)`; empty embedding
    * = undecodable bytes (kept for the caller's quarantine policy). */
  def embedImages(assets: DataFrame, matrix: Array[Float], dOut: Int,
                  normalize: Boolean = false,
                  batchSize: Int = 64): DataFrame = {
    require(matrix.length == FeatureDim * dOut,
      s"matrix length ${matrix.length} != $FeatureDim x $dOut")
    val spark = assets.sparkSession
    val bc = spark.sparkContext.broadcast(matrix)
    Multimodal.batchedFeatureExtract(assets, dOut, batchSize,
        kernelFactory(bc, dOut, normalize))
      .withColumnRenamed("features", "embedding")
  }
}
