package graft.similarity

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("cosine column helpers: identity 1, orthogonal 0, scale-invariant") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 2.0f), Seq(10.0f, 20.0f))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(1L) - 1.0) < 1e-12)
    assert(math.abs(rows(2L)) < 1e-12)
    assert(math.abs(rows(3L) - 1.0) < 1e-12)
  }

  test("exact cosineTopK: k rows per query, descending, no self") {
    val queries = emb.filter(col("vec_id") < 5)
    val top = Similarity.cosineTopK(queries, emb, k = 5).cache()
    assert(top.count() == 5 * 5)
    assert(top.filter(col("query_id") === col("neighbor_id")).count() == 0)
    top.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to 5))
      val cs = byRank.map(_.getDouble(2)).toSeq
      assert(cs == cs.sorted.reverse, s"cos not descending: $cs")
    }
  }

  test("planted duplicate embeddings are found by the LSH pair join") {
    val clones = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"),
              col("label"))
    val planted = emb.union(clones)
    val pairs = Similarity.cosinePairsLsh(planted, minCosine = 0.99)
      .cache()
    val found = pairs.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000)).toSet
    assert(want.subsetOf(found),
      s"missing planted pairs: ${(want -- found).take(5)}")
    assert(pairs.filter(col("cos") < 0.99 - 1e-9).count() == 0)
  }

  test("IVF top-k: recall rises with probes, high at nProbe = nCells") {
    val queries = emb.filter(col("vec_id") < 30)
    val k = 10
    val exact = Similarity.cosineTopK(queries, emb, k = k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(queries, emb, k = k,
          nCells = 8, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val rLow = recallAt(2)
    val rFull = recallAt(8)
    assert(rFull >= 0.99, s"probing every cell must be ~exact: $rFull")
    assert(rLow <= rFull + 1e-9, s"recall must not drop with more probes")
    assert(rLow >= 0.3, s"2/8 cells should still find some neighbors: $rLow")
  }

  test("materialized IVF index: pruned partitions, same results as in-memory") {
    val queries = emb.filter(col("vec_id") < 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfIndex(emb, tmp, nCells = 8)
    val got = Similarity.searchIvfIndex(spark, tmp, queries,
      k = 5, nProbe = 2).cache()
    val mem = Similarity.ivfTopK(queries, emb, k = 5, nCells = 8,
      nProbe = 2).cache()
    assert(got.count() > 0)
    assert(got.exceptAll(mem).count() == 0 && mem.exceptAll(got).count() == 0,
      "same seed must give the same quantizer and identical results")
    // the cell filter resolves against directory names — a pruned scan
    val prunedRead = spark.read.parquet(s"$tmp/cells")
      .filter(col("cell").isin(0, 1))
    assert(graft.sources.Layout.isPartitionPruned(prunedRead),
      "cell-partitioned layout must partition-prune the search scan")
  }

  test("ANN top-k recall >= 0.9 against brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val k = 10
    val exact = Similarity.cosineTopK(queries, emb, k = k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(queries, emb, k = k,
        minCosine = -1.0, numHashTables = 8)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall < 0.9")
  }
}
