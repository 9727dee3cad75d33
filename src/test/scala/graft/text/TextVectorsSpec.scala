package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-TF text vectors ([[TextVectors]]): portable buckets, dense/
  * sparse agreement, integer-exact similarity ranking, and
  * composition with the float-cosine similarity family. */
class TextVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "red apple pie with red apple"),
    (2L, "red apple pie with red apple"),     // exact clone of 1
    (3L, "red apple pie with green apple"),   // one word off
    (4L, "quantum flux capacitor manifold"),  // unrelated
    (5L, "pie apple red with apple red"))     // permutation of 1
    .toDF("doc_id", "text")

  test("buckets are in range and deterministic across evaluations") {
    val b = docs.select(explode(split(col("text"), " ")).as("t"))
      .select(TextVectors.tokenBucket(col("t"), 64).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 64))
    val again = docs.select(explode(split(col("text"), " ")).as("t"))
      .select(TextVectors.tokenBucket(col("t"), 64).as("b"))
      .as[Long].collect()
    assert(b.toSeq == again.toSeq)
  }

  test("dense vectors: d-dim, mass = token count, clones identical") {
    val v = TextVectors.hashedTfVectors(docs, d = 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toVector).toMap
    assert(v.values.forall(_.length == 32))
    assert(v(1L).sum == 6f) // six tokens
    assert(v(1L) == v(2L))  // clone: identical text, identical vector
    assert(v(1L) == v(5L))  // bag-of-words: permutation-invariant
    assert(v(1L) != v(4L))
  }

  test("integer ranking: clone first at exactly 2^20, unrelated last") {
    val top = TextVectors.topKBySparseCosine(
        docs, queryPred = col("doc_id") === 1L, k = 3, d = 32)
      .orderBy(col("rank")).collect()
    // rank 1-2: the exact clone and the permutation (cos = 1,
    // score = 2^20 exactly, tie broken by id), rank 3: one-word-off
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 5L, 3L))
    assert(top(0).getAs[Long]("score_q") == 1048576L)
    assert(top(1).getAs[Long]("score_q") == 1048576L)
    assert(top(2).getAs[Long]("score_q") < 1048576L)
  }

  test("integer ranking agrees with float cosine over the dense form") {
    val vecs = TextVectors.hashedTfVectors(docs, d = 32)
      .withColumnRenamed("doc_id", "vec_id")
    val floatTop = graft.similarity.Similarity.cosineTopK(
        vecs.filter(col("vec_id") === 1L), vecs, k = 3)
      .orderBy(col("rank"))
      .select(col("neighbor_id")).as[Long].collect().toSeq
    val intTop = TextVectors.topKBySparseCosine(
        docs, queryPred = col("doc_id") === 1L, k = 3, d = 32)
      .orderBy(col("rank"))
      .select(col("neighbor_id")).as[Long].collect().toSeq
    assert(floatTop == intTop)
  }

  test("inverted-index join: no cartesian in the plan") {
    val plan = TextVectors.topKBySparseCosine(
        docs, queryPred = col("doc_id") === 1L, k = 2, d = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
  }
}
