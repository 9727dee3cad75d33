package graft.pipelines

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("features: unigram+bigram multiset, not set") {
    val f = Dsir.features(Seq((1L, "a b a"), (2L, "x")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 1: unigrams a,b,a + bigrams "a b","b a" — repeats kept
    assert(f.count(_ == (1L, "a")) == 2, "repeated unigram must count twice")
    assert(f.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      Seq("a", "a", "a b", "b", "b a"))
    // single-token doc: unigram only, no degenerate bigram
    assert(f.filter(_._1 == 2L).map(_._2).toSeq == Seq("x"))
  }

  test("planted skew: target-like docs outscore target-unlike docs") {
    // raw corpus: half the docs speak "alpha beta", half "zeta yotta";
    // target = the alpha half. DSIR must rank every alpha doc above
    // every zeta doc.
    val raw = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "alpha beta alpha gamma beta alpha")
      else (i, "zeta yotta zeta omega yotta zeta")
    }.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 2 === 0)
    val scores = Dsir.scoreExact(raw, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alphaMin = scores.filter(_._1 % 2 == 0).values.min
    val zetaMax = scores.filter(_._1 % 2 == 1).values.max
    assert(alphaMin > zetaMax,
      s"every target-like doc must outscore every other: $alphaMin <= $zetaMax")
    // hashed variant preserves the same separation (no bucket has both
    // an alpha and a zeta feature at 2^18 buckets and 8 features)
    val hashed = Dsir.scoreHashed(raw, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed.filter(_._1 % 2 == 0).values.min >
           hashed.filter(_._1 % 2 == 1).values.max)
  }

  test("hashed variant tracks exact scores on the real corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") % 7 === 0)
    val exact = Dsir.scoreExact(docs, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hashed = Dsir.scoreHashed(docs, target)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet == hashed.keySet)
    // rank agreement: top-decile-by-exact overlaps top-decile-by-hashed
    // by >= 80% (hash collisions can perturb the tail, not the head)
    val n = exact.size / 10
    val topE = exact.toSeq.sortBy(-_._2).take(n).map(_._1).toSet
    val topH = hashed.toSeq.sortBy(-_._2).take(n).map(_._1).toSet
    val overlap = (topE & topH).size.toDouble / n
    assert(overlap >= 0.8, s"top-decile overlap $overlap < 0.8")
  }

  test("determinism: scores identical across repartitionings") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") % 7 === 0)
    val a = Dsir.scoreExact(docs, target)
    val b = Dsir.scoreExact(docs.repartition(7), target.repartition(3))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "integer-grid scores must not depend on partitioning")
  }

  test("resample: seeded Gumbel top-k is deterministic and weight-biased") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val scored = Dsir.scoreExact(docs, docs.filter(col("doc_id") % 7 === 0))
      .cache()
    val k = 50
    val s1 = Dsir.resample(scored, k).collect().map(_.getLong(0)).toSet
    val s2 = Dsir.resample(scored, k).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1.size == k)
    val s3 = Dsir.resample(scored, k, seed = 7L).collect()
      .map(_.getLong(0)).toSet
    assert(s1 != s3, "a different seed must perturb the sample")
    // bias: the sample's mean score beats the corpus mean (the whole
    // point of importance resampling)
    val all = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusMean = all.values.map(_.toDouble).sum / all.size
    val sampleMean = s1.toSeq.map(all(_).toDouble).sum / k
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean must exceed corpus mean $corpusMean")
  }
}
