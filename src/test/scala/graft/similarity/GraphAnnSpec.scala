package graft.similarity

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned NSW-lite graph ANN ([[GraphAnn]]): recall against the
  * exact scan at the default dial, determinism, and the scale
  * contract — the search plans only the probed cells' partitions and
  * the per-cell graphs are never recomputed at query time. */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf0001)
    .cache()

  // These testdata embeddings are near-random 64-dim vectors (PqSpec
  // measures plain ADC at ~0.32 recall on them): a query's true
  // neighbors spread ~uniformly over cells, so probing nProbe of
  // nCells caps ANY within-cell method at ~nProbe/nCells recall —
  // that ceiling belongs to the COARSE quantizer (shared with IVF),
  // not the graph. The graph's own quality is measured two ways:
  // at FULL probe (the walk vs the exact scan), and at equal probe
  // budget (the walk vs IVF's exact within-cell scan).

  test("beam search >= 0.9 recall vs the EXACT scan at full probe " +
    "(the graph approximation alone); results deterministic") {
    val idx = Files.createTempDirectory("graft-nsw").toString + "/i"
    GraphAnn.writeNswIndex(emb, idx, nCells = 8, m = 8)
    val queries = emb.filter(col("vec_id") < 50)
    val k = 10
    val got = GraphAnn.searchNswIndex(spark, idx, queries, k = k,
      nProbe = 8, beam = 16, hops = 3)
    val exact = Similarity.cosineTopK(queries, emb, k = k)
    val gotPairs = got.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gotPairs & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, f"NSW recall $recall%.3f < 0.9")
    // deterministic: a second search returns the identical ranking
    val again = GraphAnn.searchNswIndex(spark, idx, queries, k = k,
      nProbe = 8, beam = 16, hops = 3)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("at EQUAL probe budget the walk matches IVF's exact " +
    "within-cell scan >= 0.9; recall rises with the beam/probe dial") {
    val idx = Files.createTempDirectory("graft-nsw2").toString + "/i"
    GraphAnn.writeNswIndex(emb, idx, nCells = 8, m = 8)
    val queries = emb.filter(col("vec_id") < 30)
    // same seed + same nCells => the same coarse quantizer as the
    // index build: IVF's result IS "exact over the probed cells"
    val ivf = Similarity.ivfTopK(queries, emb, k = 10,
      nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val walk = GraphAnn.searchNswIndex(spark, idx, queries, k = 10,
      nProbe = 4, beam = 16, hops = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vsIvf = (walk & ivf).size.toDouble / ivf.size
    assert(vsIvf >= 0.9,
      f"graph walk lost $vsIvf%.3f of IVF's equal-budget recall")
    // and the dial is a dial: more probes + wider beam never hurts
    val exact = Similarity.cosineTopK(queries, emb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int, beam: Int): Double = {
      val g = GraphAnn.searchNswIndex(spark, idx, queries, k = 10,
        nProbe = nProbe, beam = beam, hops = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (g & exact).size.toDouble / exact.size
    }
    val narrow = recallAt(1, 2)
    val wide = recallAt(8, 24)
    assert(wide >= narrow,
      f"widening the dial lowered recall: $narrow%.3f -> $wide%.3f")
    assert(wide >= 0.9, f"wide-dial recall $wide%.3f < 0.9")
  }

  test("the search is PARTITION-PRUNED to the probed cells and never " +
    "recomputes edges: node/edge scans carry cell filters, and a " +
    "1-probe search reads fewer index files than the index holds") {
    val idx = Files.createTempDirectory("graft-nsw3").toString + "/i"
    GraphAnn.writeNswIndex(emb, idx, nCells = 8, m = 8)
    val one = emb.filter(col("vec_id") === 3L)
    val res = GraphAnn.searchNswIndex(spark, idx, one, k = 5,
      nProbe = 1, beam = 8, hops = 2)
    res.collect() // bind the executed plan
    // descend through AQE query stages — a plain collect on the
    // adaptive plan stops at stage boundaries (LexicalIndexSpec's
    // scansOf pattern)
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => scansOf(q.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(f)
        case other => other.children.flatMap(scansOf)
      }
    val indexScans = scansOf(res.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(idx)))
    assert(indexScans.nonEmpty)
    // nodes/ and edges/ scans (the partitioned halves) bind a `cell`
    // partition filter; the tiny centroids/entries tables are not
    // partitioned and carry none
    val partitioned = indexScans.filter(_.relation.location.rootPaths
      .exists(p => p.toString.contains("/nodes") ||
        p.toString.contains("/edges")))
    assert(partitioned.nonEmpty)
    assert(partitioned.forall(_.partitionFilters.exists(
      _.references.exists(_.name == "cell"))),
      "an index scan planned without a cell partition filter:\n" +
        res.queryExecution.executedPlan)
    // and the files actually READ (the executed scan metric) are a
    // strict subset of the index's files
    val readFiles = partitioned
      .map(_.metrics("numFiles").value).sum
    val allFiles = spark.read.parquet(s"$idx/nodes").inputFiles.length +
      spark.read.parquet(s"$idx/edges").inputFiles.length
    assert(readFiles > 0 && readFiles < allFiles,
      s"1-probe search read $readFiles of $allFiles index files")
  }
}
