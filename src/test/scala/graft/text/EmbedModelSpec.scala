package graft.text

import graft.TestSpark
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned-embedding inference ([[EmbedModel]]): the map-only
  * embedding-bag kernel equals the relational oracle spelling on
  * integer weights, is partitioning-invariant, round-trips through a
  * parquet checkpoint, and drops into the [[graft.multimodal
  * .MediaKernel]] seam as a real model handle. */
class EmbedModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val V = 32
  private val D = 6

  private lazy val docs = Seq(
    (1L, "red apple pie with red apple"),
    (2L, "red apple pie with red apple"),   // clone of 1
    (3L, "pie apple red with apple red"),   // permutation of 1
    (4L, "quantum flux capacitor manifold"),
    (5L, ""),                               // token-less
    (6L, "solo"))
    .toDF("doc_id", "text")

  private lazy val weights = EmbedModel.syntheticWeightRows(spark, V, D)
  private lazy val matrix  = EmbedModel.collectMatrix(weights, V, D)

  private def bagMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](r.fieldIndex("embedding")).toVector).toMap

  test("synthetic weights are in [-1000,1000] and cover the grid") {
    val w = weights.collect()
    assert(w.length == V * D)
    assert(w.forall(r => math.abs(r.getAs[Long]("w")) <= 1000))
  }

  test("JVM bucket twin matches the SQL tokenBucket bit-for-bit") {
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").distinct()
    val sql = toks
      .select(col("t"), TextVectors.tokenBucket(col("t"), V).as("b"))
      .as[(String, Long)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    sql.foreach { case (tok, b) =>
      assert(EmbedModel.bucketOf(md, tok, V).toLong == b, s"token $tok")
    }
  }

  test("embedding-bag kernel equals the relational oracle spelling") {
    val rel = EmbedModel.embedRelational(docs, weights, V)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("dim")) ->
        r.getAs[Long]("val").toFloat).toMap
    val bag = bagMap(EmbedModel.embedBag(docs, matrix, V, D))
    // every doc with tokens: per-dim agreement, integer-exact
    rel.foreach { case ((id, d), v) =>
      assert(bag(id)(d.toInt) == v, s"doc $id dim $d") }
    // relational form has no rows for token-less docs; bag gives 0⃗
    assert(!rel.keys.exists(_._1 == 5L))
    assert(bag(5L).forall(_ == 0f))
    // clone + permutation invariance (bag-of-words model)
    assert(bag(1L) == bag(2L) && bag(1L) == bag(3L))
  }

  test("bag output is invariant to partitioning") {
    val one = bagMap(EmbedModel.embedBag(docs.repartition(1), matrix, V, D))
    val many = bagMap(EmbedModel.embedBag(docs.repartition(7), matrix, V, D))
    assert(one == many)
  }

  test("normalized head: unit norm for non-empty, zero for empty") {
    val n = bagMap(EmbedModel.embedBag(docs, matrix, V, D, normalize = true))
    docs.collect().map(_.getLong(0)).foreach { id =>
      val norm = math.sqrt(n(id).map(x => x.toDouble * x).sum)
      if (id == 5L) assert(norm == 0.0)
      else assert(math.abs(norm - 1.0) < 1e-5, s"doc $id norm $norm")
    }
  }

  test("checkpoint round-trip: save -> loadMatrix -> same embeddings") {
    val dir = java.nio.file.Files
      .createTempDirectory("embed-ckpt").toString + "/w"
    EmbedModel.saveWeights(weights, dir)
    val loaded = EmbedModel.loadMatrix(spark, dir, V, D)
    assert(loaded.toSeq == matrix.toSeq)
  }

  test("driver bound refuses an over-budget matrix collect") {
    intercept[IllegalArgumentException] {
      EmbedModel.collectMatrix(weights, V, D, maxEntries = V * D - 1L)
    }
  }

  test("kernel seam: batchedFeatureExtract with the real model handle") {
    val assets = docs
      .select(col("doc_id").as("asset_id"),
              col("text").cast("binary").as("content"))
    val bc = spark.sparkContext.broadcast(matrix)
    val viaSeam = Multimodal.batchedFeatureExtract(
        assets, dim = D, batchSize = 2,
        kernel = EmbedModel.kernelFactory(bc, V, D))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toVector).toMap
    val direct = bagMap(EmbedModel.embedBag(docs, matrix, V, D))
    assert(viaSeam == direct)
  }

  test("embeddings feed the similarity family: clones are nearest") {
    val emb = EmbedModel.embedBag(docs, matrix, V, D, normalize = true)
      .filter(col("doc_id") =!= 5L) // zero vector has no direction
    val top = graft.similarity.Similarity
      .cosineTopK(emb.filter(col("doc_id") === 1L), emb, k = 2,
                  qId = "doc_id", cId = "doc_id")
    val best = top.orderBy(col("rank")).collect()
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(Set(2L, 3L).contains(best.head)) // a clone/permutation wins
  }
}
