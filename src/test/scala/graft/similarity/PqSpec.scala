package graft.similarity

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.embeddings(spark, TestSpark.sf0001).cache()

  test("trainPq/encodePq: codes shaped m, values in [0, kCodes), " +
       "deterministic for a fixed seed") {
    val model = Pq.trainPq(emb, m = 8, kCodes = 16, seed = 7L)
    assert(model.m == 8 && model.dsub == 8 && model.kCodes == 16)
    val codes = Pq.encodePq(emb, model).cache()
    assert(codes.count() == emb.count())
    assert(codes.filter(size(col("codes")) =!= 8).count() == 0)
    assert(codes.filter(
      exists(col("codes"), c => c < 0 || c >= 16)).count() == 0)
    val again = Pq.encodePq(emb, Pq.trainPq(emb, m = 8, kCodes = 16,
                                            seed = 7L))
    assert(codes.join(again, Seq("vec_id"))
      .filter(codes("codes") =!= again("codes")).count() == 0,
      "same seed must give identical codes")
  }

  test("trainPq on an empty / all-zero corpus fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Pq.trainPq(emb.filter(col("vec_id") < 0))
    }
    assert(e.getMessage.contains("non-zero-norm"))
  }

  test("quantization error shrinks as kCodes grows") {
    // ADC distance of each vector to ITS OWN codes = reconstruction
    // error; exact self-cosine is 1, so error = mean(1 − cos_adc).
    // searchCodes drops equal-id pairs, so the code table carries
    // shifted ids and k covers every candidate before the self filter.
    def meanAdcSelfError(kCodes: Int): Double = {
      val model = Pq.trainPq(emb, m = 8, kCodes = kCodes, seed = 7L)
      val q = emb.filter(col("vec_id") < 50)
      val shifted = Pq.encodePq(q, model)
        .select((col("vec_id") + 1000000L).as("neighbor_id"), col("codes"))
      Pq.searchCodes(q, shifted, model, k = 50)
        .filter(col("neighbor_id") === col("query_id") + 1000000L)
        .agg(avg(lit(1.0) - col("cos"))).head.getDouble(0)
    }
    val e2 = meanAdcSelfError(2)
    val e16 = meanAdcSelfError(16)
    assert(e16 >= 0.0 && e16 < e2,
      s"kCodes=16 error $e16 must beat kCodes=2 error $e2")
    assert(e16 < 0.35, s"self reconstruction error too large: $e16")
  }

  test("pqTopK: k rows per query, ranks contiguous, descending cos, " +
       "no self, and decent recall vs the exact scan") {
    val queries = emb.filter(col("vec_id") < 30)
    val k = 10
    val pq = Pq.pqTopK(queries, emb, k = k, m = 8, kCodes = 16).cache()
    assert(pq.count() == 30 * k)
    assert(pq.filter(col("query_id") === col("neighbor_id")).count() == 0)
    pq.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to k))
      val cs = byRank.map(_.getDouble(2)).toSeq
      assert(cs == cs.sorted.reverse, s"cos not descending: $cs")
    }
    val exact = Similarity.cosineTopK(queries, emb, k = k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pq.select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain ADC on these near-random 64-dim embeddings measures ~0.32
    // (random-guess baseline: k/N ≈ 0.02); the production-recall path
    // is pqTopKRefined below — this bound just pins "far above chance"
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ recall@$k vs exact too low: $recall")
  }

  test("pqTopKRefined: exact re-rank lifts recall high and reports " +
       "true cosines") {
    val queries = emb.filter(col("vec_id") < 30)
    val k = 10
    val exact = Similarity.cosineTopK(queries, emb, k = k).cache()
    val exactSet = exact
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Pq.pqTopKRefined(queries, emb, k = k, refine = 10,
        m = 8, kCodes = 16).cache()
    assert(refined.count() == 30 * k)
    val got = refined.select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & got).size.toDouble / exactSet.size
    assert(recall >= 0.7, s"refined recall@$k too low: $recall")
    // on the overlap, the reported cos must equal the exact scan's
    val mism = refined.as("r")
      .join(exact.as("e"), Seq("query_id", "neighbor_id"))
      .filter(abs(col("r.cos") - col("e.cos")) > 1e-9)
    assert(mism.count() == 0, "refined cos must be the true cosine")
  }

  test("ivfPqTopK: contract holds, recall rises with probes, full " +
       "probe ≈ pqTopKRefined") {
    val queries = emb.filter(col("vec_id") < 30)
    val k = 10
    val exact = Similarity.cosineTopK(queries, emb, k = k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val got = Pq.ivfPqTopK(queries, emb, k = k, nCells = 8,
          nProbe = nProbe, refine = 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val r2 = recallAt(2)
    val rFull = recallAt(8)
    assert(rFull >= r2 - 0.02,
      s"recall must not fall as probes widen: $r2 -> $rFull")
    // at full probe the cell filter is a no-op: same candidates as the
    // flat refined search, so recall matches it (both ADC@(k·refine)
    // shortlists over the identical code table)
    val flat = Pq.pqTopKRefined(queries, emb, k = k, refine = 10,
        m = 8, kCodes = 16)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flatRecall = (exact & flat).size.toDouble / exact.size
    assert(math.abs(rFull - flatRecall) < 1e-9,
      s"full-probe IVFPQ recall $rFull != flat refined $flatRecall")
  }

  test("residual encoding: contract holds; recall >= shared codebooks " +
       "at equal code budget, with a clear win on clustered data") {
    val k = 10
    def recallOf(queries: org.apache.spark.sql.DataFrame,
                 corpus: org.apache.spark.sql.DataFrame,
                 topk: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.cosineTopK(queries, corpus, k = k)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = topk.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    // organic testdata (weak cluster structure): residual at FULL
    // probe must at least hold the shared-codebook line — same m and
    // kCodes, same rows scanned, only codebook construction differs
    val queries = emb.filter(col("vec_id") < 30)
    val resid = Pq.ivfPqResidualTopK(queries, emb, k = k, nCells = 8,
        nProbe = 8, m = 8, kCodes = 16).cache()
    assert(resid.count() == 30 * k)
    assert(resid.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val rResid = recallOf(queries, emb, resid)
    val rPlain = recallOf(queries, emb,
      Pq.pqTopK(queries, emb, k = k, m = 8, kCodes = 16))
    assert(rResid >= rPlain - 0.05,
      s"residual $rResid fell below shared-codebook $rPlain")

    // clustered corpus (the regime IVF exists for): 16 tight clusters;
    // residuals concentrate near the origin, so the same 8x16 budget
    // quantizes far finer than raw-vector codebooks — the recall gap
    // must be decisive, not marginal
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(64))
    val clustered = (0 until 640).map { i =>
      val c = centers(i % 16)
      val noise = unit(64)
      val v = c.indices.map(d => c(d) + 0.25 * noise(d))
      (i.toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val cq = clustered.filter(col("vec_id") < 30)
    val cResid = recallOf(cq, clustered,
      Pq.ivfPqResidualTopK(cq, clustered, k = k, nCells = 16,
        nProbe = 16, m = 8, kCodes = 16))
    val cPlain = recallOf(cq, clustered,
      Pq.pqTopK(cq, clustered, k = k, m = 8, kCodes = 16))
    assert(cResid > cPlain,
      s"clustered: residual $cResid must beat shared $cPlain")
  }

  test("materialized index: searchPqIndex equals the in-memory pqTopK") {
    val dir = java.nio.file.Files.createTempDirectory("pq_index")
      .toString
    try {
      Pq.writePqIndex(emb, dir, m = 8, kCodes = 16, seed = 42L)
      val queries = emb.filter(col("vec_id") < 10)
      val fromIndex = Pq.searchPqIndex(spark, dir, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      val inMemory = Pq.pqTopK(queries, emb, k = 5, m = 8, kCodes = 16,
          seed = 42L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      assert(fromIndex == inMemory)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("pre-lifecycle flat codes/ layout fails fast on append and search") {
    val dir = java.nio.file.Files.createTempDirectory("pq_flat").toString
    try {
      // author a legacy-shaped index: codes written FLAT (no batch=
      // partition dirs) next to valid codebooks
      val model = Pq.trainPq(emb, m = 8, kCodes = 16, seed = 42L)
      Pq.encodePq(emb, model)
        .withColumnRenamed("vec_id", "neighbor_id")
        .write.mode("overwrite").parquet(s"$dir/idx/codes")
      import spark.implicits._
      (for {
        j <- model.codebooks.indices
        c <- model.codebooks(j).indices
      } yield (j, c, model.codebooks(j)(c).toSeq))
        .toDF("subspace", "code", "center")
        .write.mode("overwrite").parquet(s"$dir/idx/codebooks")
      val queries = emb.filter(col("vec_id") < 5)
      val e1 = intercept[IllegalArgumentException] {
        Pq.appendPqIndex(emb.filter(col("vec_id") < 3), s"$dir/idx", "b1")
      }
      assert(e1.getMessage.contains("flat codes/ layout"))
      val e2 = intercept[IllegalArgumentException] {
        Pq.searchPqIndex(spark, s"$dir/idx", queries, k = 3)
      }
      assert(e2.getMessage.contains("rebuild"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("index lifecycle: build+append equals full-corpus encode under " +
       "the shared codebooks; re-append is idempotent; gc removes ids") {
    val dir = java.nio.file.Files.createTempDirectory("pq_lifecycle")
      .toString
    try {
      val half = emb.filter(col("vec_id") % 2 === 0)
      val rest = emb.filter(col("vec_id") % 2 =!= 0)
      Pq.writePqIndex(half, s"$dir/idx", m = 8, kCodes = 16, seed = 42L)
      Pq.appendPqIndex(rest, s"$dir/idx", "b1")
      val queries = emb.filter(col("vec_id") < 10)
      def hits(path: String) =
        Pq.searchPqIndex(spark, path, queries, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
          .toSet
      val appended = hits(s"$dir/idx")
      // parity target: the WHOLE corpus encoded with the build-half
      // codebooks (the shared-codebooks contract — not a retrain)
      val model = Pq.trainPq(half, m = 8, kCodes = 16, seed = 42L)
      val expected = Pq.searchCodes(queries,
          Pq.encodePq(emb, model)
            .withColumnRenamed("vec_id", "neighbor_id"),
          model, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      assert(appended == expected)
      // at-least-once retry: same tag overwrites, results unchanged
      Pq.appendPqIndex(rest, s"$dir/idx", "b1")
      assert(hits(s"$dir/idx") == appended)
      // fresh tags must be fresh; the build tag is reserved
      intercept[IllegalArgumentException] {
        Pq.appendPqIndex(rest, s"$dir/idx", "b0")
      }
      // gc: searching the collapsed index never returns a removed id
      val removed = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"))
      Pq.gcPqIndex(spark, removed, s"$dir/idx", s"$dir/gc")
      val afterGc = Pq.searchPqIndex(spark, s"$dir/gc", queries, k = 5)
        .collect()
      assert(afterGc.nonEmpty &&
             afterGc.forall(_.getLong(1) % 5 != 0))
      // gc parity: identical to encoding corpus-minus-removed with
      // the same codebooks
      val expectedGc = Pq.searchCodes(queries,
          Pq.encodePq(emb.filter(col("vec_id") % 5 =!= 0), model)
            .withColumnRenamed("vec_id", "neighbor_id"),
          model, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      assert(afterGc.map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet == expectedGc)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
