package graft.text

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MediaKernel

/** REAL learned-embedding inference — the embedding-bag forward pass
  * (the fastText / `EmbeddingBag` architecture): a trained weight
  * matrix `W : vocab × dim`, a document embeds as
  * `Σ_tokens W[bucket(token)]`. This closes the inference half of the
  * learned-embedding seam: the MODEL is a real artifact (a parquet
  * weight table, loaded and broadcast once per executor), the FORWARD
  * PASS is real GEMM-shaped arithmetic, and only the *training* of a
  * deep model stays outside the engine (as it should — training is a
  * different system). The deterministic [[syntheticWeightRows]] stands
  * in for a trained checkpoint in tests exactly the way a fixture
  * checkpoint would.
  *
  * Two spellings, spec-proven equal on integer weights:
  *
  *  - [[embedRelational]] — inference as a relational plan: explode →
  *    portable md5 bucket ([[TextVectors.tokenBucket]]) → broadcast
  *    join against the weight TABLE → per-dim sum. Integer weights
  *    make it hash-oracleable (declared `q_embed_infer`), the
  *    engine-independent ground truth for the kernel path.
  *  - [[embedBag]] — the PRODUCTION spelling: one narrow map over the
  *    scan. The matrix ships once per executor (torrent broadcast,
  *    never per-task), each partition runs the accumulate loop
  *    in-place, and NOTHING shuffles — at 100 TB the cost is the scan
  *    plus `O(tokens · dim)` FLOPs, the floor for any inference pass.
  *    Contrast the relational form, whose explode×join×re-aggregate
  *    would shuffle `tokens × dim` rows.
  *
  * [[kernelFactory]] adapts the same forward pass to the
  * [[MediaKernel]] seam, so [[graft.multimodal.Multimodal
  * .batchedFeatureExtract]] gains its first fully REAL model handle —
  * batched, per-partition lifecycle, broadcast weights — with the
  * environmental [[graft.multimodal.Multimodal.FakeEmbedder]] left
  * only for modalities whose encoders don't ship in this container.
  *
  * Reference anchor: the capstone's feature pipelines stop at
  * CountVectorizer-style bags (`segmentation.py`); this is the same
  * bag lifted through a learned projection, the op a training-data
  * pipeline needs for embedding-based dedup/selection at scale. */
object EmbedModel {

  /** Deterministic synthetic weight table `(bucket, dim, w)` with
    * `w = uint32(md5(bucket+":"+dim))[0,8) mod 2001 − 1000 ∈
    * [−1000, 1000]` — the portable md5-Horner arithmetic of
    * [[graft.pipelines.Sharding.shardId]], so a DuckDB twin can
    * regenerate the model bit-for-bit (what makes `q_embed_infer`
    * hash-gated rather than tolerance-compared). */
  def syntheticWeightRows(spark: SparkSession, vocab: Int, dim: Int)
      : DataFrame = {
    require(vocab > 0 && dim > 0, s"bad model shape: $vocab x $dim")
    spark.range(vocab.toLong).toDF("bucket")
      .crossJoin(spark.range(dim.toLong).toDF("dim"))
      .select(col("bucket"), col("dim"),
        (pmod(conv(substring(md5(concat_ws(":", col("bucket"), col("dim"))
                     .cast("binary")), 1, 8), 16, 10).cast("long"),
              lit(2001L)) - 1000L).as("w"))
  }

  /** Collects a weight table `(bucket, dim, w)` into the row-major
    * `Array[Float]` matrix the kernel path broadcasts. The collect is
    * BOUNDED by construction — `vocab · dim` entries, checked against
    * `maxEntries` (default 2²⁶ ≈ 256 MB of floats) the way
    * [[graft.text.Bpe]] bounds its driver dictionary; a model beyond
    * the bound belongs in an executor-side store, not a broadcast.
    * Missing `(bucket, dim)` cells default to 0 (sparse checkpoints
    * are valid models). */
  def collectMatrix(weights: DataFrame, vocab: Int, dim: Int,
                    maxEntries: Long = 1L << 26): Array[Float] = {
    require(vocab.toLong * dim <= maxEntries,
      s"model $vocab x $dim exceeds driver bound $maxEntries; " +
        "use an executor-side weight store instead of a broadcast")
    val m = new Array[Float](vocab * dim)
    weights.select(col("bucket").cast("int"), col("dim").cast("int"),
                   col("w").cast("float"))
      .collect().foreach { r =>
        val b = r.getInt(0); val d = r.getInt(1)
        require(b >= 0 && b < vocab && d >= 0 && d < dim,
          s"weight cell ($b,$d) outside model shape $vocab x $dim")
        m(b * dim + d) = r.getFloat(2)
      }
    m
  }

  /** Loads a parquet weight checkpoint `(bucket, dim, w)` written by
    * [[saveWeights]] (or any trainer honoring the contract) into the
    * broadcastable matrix form. */
  def loadMatrix(spark: SparkSession, path: String, vocab: Int,
                 dim: Int): Array[Float] =
    collectMatrix(spark.read.parquet(path), vocab, dim)

  /** Persists a weight table as the parquet checkpoint [[loadMatrix]]
    * reads — the model artifact boundary between trainer and engine. */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.select(col("bucket").cast("long"), col("dim").cast("long"),
                   col("w").cast("double"))
      .write.mode("overwrite").parquet(path)

  /** Inference as a relational plan → `(doc_id, dim, val)` long form,
    * integer-exact when `w` is integral: explode tokens, portable
    * md5 bucket, broadcast-join the weight table, per-dim sum of
    * `tf · w`. Docs with no tokens produce no rows (inner-join
    * semantics; [[embedBag]] gives them the zero vector — the spec
    * pins both). The oracle twin for [[embedBag]], not the scale
    * path: it shuffles `docs × dim` rows where the bag shuffles
    * nothing. */
  def embedRelational(docs: DataFrame, weights: DataFrame, vocab: Int,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(idCol),
               TextVectors.tokenBucket(col("tok"), vocab).as("bucket"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("tf") * col("w")).as("val"))

  /** JVM twin of [[TextVectors.tokenBucket]]:
    * `uint32(md5(token)[0,4 bytes)) mod vocab`, byte-identical to the
    * SQL `conv(substring(md5(tok),1,8),16,10) % vocab`. */
  private[graft] def bucketOf(md: MessageDigest, token: String,
                              vocab: Int): Int = {
    md.reset()
    val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % vocab).toInt
  }

  /** In-place embedding-bag forward pass for one document. */
  private def forward(md: MessageDigest, text: String, w: Array[Float],
                      vocab: Int, dim: Int,
                      normalize: Boolean): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    val n = text.length
    while (i < n) {
      var j = i
      while (j < n && text.charAt(j) != ' ') j += 1
      if (j > i) {
        val base = bucketOf(md, text.substring(i, j), vocab) * dim
        var k = 0
        while (k < dim) { out(k) += w(base + k); k += 1 }
      }
      i = j + 1
    }
    if (normalize) {
      var s = 0.0; var k = 0
      while (k < dim) { s += out(k).toDouble * out(k); k += 1 }
      if (s > 0) {
        val inv = (1.0 / math.sqrt(s)).toFloat
        k = 0
        while (k < dim) { out(k) *= inv; k += 1 }
      }
    }
    out
  }

  /** The PRODUCTION inference pass → `(idCol, embedding Array[Float])`:
    * one narrow map over the scan, weight matrix broadcast once per
    * executor, zero shuffles. Token-less docs embed to the zero
    * vector (the model's value on the empty bag). `normalize` adds
    * the L2 unit-norm head most retrieval stacks train with (breaks
    * integer exactness — the normalized path is golden/spec-gated,
    * the raw path oracle-gated). Output feeds the `embedding` column
    * contract of [[graft.similarity.Similarity]] / `Pq` directly. */
  def embedBag(docs: DataFrame, matrix: Array[Float], vocab: Int,
               dim: Int, textCol: String = "text",
               idCol: String = "doc_id",
               normalize: Boolean = false): DataFrame = {
    require(matrix.length == vocab * dim,
      s"matrix length ${matrix.length} != $vocab x $dim")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(matrix)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        val w = bc.value
        it.map { case (id, text) =>
          (id, forward(md, Option(text).getOrElse(""), w, vocab, dim,
                       normalize))
        }
      }
      .toDF(idCol, "embedding")
  }

  /** The same forward pass as a [[MediaKernel]] handle (input =
    * UTF-8 text bytes), giving [[graft.multimodal.Multimodal
    * .batchedFeatureExtract]] a fully REAL model kernel: broadcast
    * weights, per-partition open/close, one vectorized loop per
    * batch. Pass a `Broadcast` so the matrix ships via torrent
    * broadcast, not inside every task's serialized closure. */
  def kernelFactory(bc: Broadcast[Array[Float]], vocab: Int, dim: Int,
                    normalize: Boolean = false)
      : MediaKernel.Factory[Array[Byte], Array[Float]] =
    new MediaKernel.Factory[Array[Byte], Array[Float]] {
      def open(): MediaKernel.Handle[Array[Byte], Array[Float]] =
        new MediaKernel.Handle[Array[Byte], Array[Float]] {
          private val md = MessageDigest.getInstance("MD5")
          def processBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
            batch.map { bytes =>
              forward(md, new String(bytes, StandardCharsets.UTF_8),
                      bc.value, vocab, dim, normalize)
            }
        }
    }
}
