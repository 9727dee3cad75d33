package graft.similarity

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The persisted BM25 index: exact parity with the in-memory path,
  * multi-batch composition, append idempotence. */
class LexicalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(from: Int, until: Int) =
    (from until until).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      (i.toLong, (0 to i % 7).map(j => words((i + j) % 5)).mkString(" "))
    }.toDF("doc_id", "text")

  private val queries = Seq((1L, "alpha gamma"), (2L, "delta"))
    .toDF("query_id", "qtext")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("searchBm25 over a built index is byte-identical to the " +
    "in-memory bm25TopK") {
    val path = Files.createTempDirectory("graft-lexidx").toString
    val docs = corpus(0, 60)
    LexicalIndex.build(docs, path)
    val fromIndex = LexicalIndex.searchBm25(spark, path, queries, k = 7)
    val inMemory = Lexical.bm25TopK(docs, queries, k = 7)
    assert(canon(fromIndex) == canon(inMemory))
  }

  test("multi-batch index equals the whole-corpus index; appends are " +
    "tag-idempotent") {
    val path = Files.createTempDirectory("graft-lexidx2").toString
    LexicalIndex.build(corpus(0, 30), path)
    LexicalIndex.append(corpus(30, 60), path, "b1")
    LexicalIndex.append(corpus(60, 80), path, "b2")
    // an at-least-once retry of b2 replaces its own files
    LexicalIndex.append(corpus(60, 80), path, "b2")
    val fromIndex = LexicalIndex.searchBm25(spark, path, queries, k = 7)
    val inMemory = Lexical.bm25TopK(corpus(0, 80), queries, k = 7)
    assert(canon(fromIndex) == canon(inMemory))
  }

  test("searchHybrid over a built index is byte-identical to the " +
    "in-memory hybridTopK (BM25 + stored-norm cosine, RRF-fused)") {
    val path = Files.createTempDirectory("graft-lexidx-hy").toString
    val docs = corpus(0, 60)
    LexicalIndex.build(docs, path)
    val fromIndex = LexicalIndex.searchHybrid(spark, path, queries,
      k = 5, kEach = 7)
    val inMemory = Lexical.hybridTopK(docs, queries, k = 5, kEach = 7)
    assert(canon(fromIndex) == canon(inMemory))
    // and parity holds across a multi-batch build too (stored n2
    // composes per batch exactly like len)
    val path2 = Files.createTempDirectory("graft-lexidx-hy2").toString
    LexicalIndex.build(corpus(0, 30), path2)
    LexicalIndex.append(corpus(30, 60), path2, "b1")
    val fromIndex2 = LexicalIndex.searchHybrid(spark, path2, queries,
      k = 5, kEach = 7)
    assert(canon(fromIndex2) == canon(inMemory))
  }

  test("word-bucketed postings: probes PARTITION-PRUNE to the query " +
    "words' buckets and stay byte-identical to the flat layout") {
    val path = Files.createTempDirectory("graft-lexidx-bk").toString
    val docs = corpus(0, 80)
    LexicalIndex.build(docs, path, wordBuckets = 8)
    LexicalIndex.append(corpus(80, 100), path, "b1")
    val fromBucketed = LexicalIndex.searchBm25(spark, path, queries,
      k = 7)
    val inMemory = Lexical.bm25TopK(corpus(0, 100), queries, k = 7)
    assert(canon(fromBucketed) == canon(inMemory))
    val hyBucketed = LexicalIndex.searchHybrid(spark, path, queries,
      k = 5, kEach = 7)
    val hyMemory = Lexical.hybridTopK(corpus(0, 100), queries,
      k = 5, kEach = 7)
    assert(canon(hyBucketed) == canon(hyMemory))
    // the probe's postings scans must carry a PARTITION filter — the
    // scale contract, not just the values (the q_snapshot_skip
    // pattern applied to the inverted index)
    val probed = LexicalIndex.searchBm25(spark, path, queries, k = 7)
    probed.collect() // bind the executed plan
    // descend through AQE query stages — a plain collect on the
    // adaptive plan stops at stage boundaries
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
    val scans = scansOf(probed.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "tf")) // the postings scans
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "bucket"))),
      s"bucketed probe planned no bucket partition filter:\n" +
        probed.queryExecution.executedPlan)
  }

  test("compact folds batches into one; gc removes docs exactly — " +
    "both preserve search results byte-identically") {
    val path = Files.createTempDirectory("graft-lexidx-c").toString
    LexicalIndex.build(corpus(0, 30), path, wordBuckets = 4)
    LexicalIndex.append(corpus(30, 60), path, "b1")
    LexicalIndex.append(corpus(60, 80), path, "b2")
    val before = LexicalIndex.searchHybrid(spark, path, queries,
      k = 5, kEach = 7)
    // fold: one batch dir, same answers, layout preserved
    val folded = Files.createTempDirectory("graft-lexidx-c2").toString
    LexicalIndex.compact(path, folded)
    assert(new java.io.File(s"$folded/postings").listFiles()
      .count(_.getName.startsWith("batch=")) == 1)
    assert(canon(LexicalIndex.searchHybrid(spark, folded, queries,
      k = 5, kEach = 7)) == canon(before))
    // still bucket-pruned after the fold
    val probed = LexicalIndex.searchBm25(spark, folded, queries, k = 5)
    probed.collect()
    // gc: the index minus removed docs answers exactly like an index
    // built from the corpus minus those docs (N shrinks too — idf
    // parity, not just missing rows)
    val removed = Seq(3L, 17L, 41L, 66L).toDF("doc_id")
    val gced = Files.createTempDirectory("graft-lexidx-c3").toString
    LexicalIndex.gc(removed, folded, gced)
    val survivors = corpus(0, 80)
      .join(removed, Seq("doc_id"), "left_anti")
    val rebuilt = Files.createTempDirectory("graft-lexidx-c4").toString
    LexicalIndex.build(survivors, rebuilt)
    assert(canon(LexicalIndex.searchBm25(spark, gced, queries, k = 7))
      == canon(LexicalIndex.searchBm25(spark, rebuilt, queries, k = 7)))
    assert(canon(LexicalIndex.searchHybrid(spark, gced, queries,
        k = 5, kEach = 7))
      == canon(LexicalIndex.searchHybrid(spark, rebuilt, queries,
        k = 5, kEach = 7)))
  }

  test("null-text docs count toward N in both paths (the avgdl/idf " +
    "denominator parity edge)") {
    val path = Files.createTempDirectory("graft-lexidx3").toString
    val docs = corpus(0, 20).unionByName(
      Seq((900L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    LexicalIndex.build(docs, path)
    val fromIndex = LexicalIndex.searchBm25(spark, path, queries, k = 5)
    val inMemory = Lexical.bm25TopK(docs, queries, k = 5)
    assert(canon(fromIndex) == canon(inMemory))
  }

  test("layout.json rides Hadoop FS: a file:-scheme index path keeps " +
    "the bucket pin (and pruning) that java.nio would silently lose") {
    val local = Files.createTempDirectory("graft-lexidx-fs").toString
    val uri = "file://" + local
    LexicalIndex.build(corpus(0, 60), uri, wordBuckets = 8)
    LexicalIndex.append(corpus(60, 80), uri, "b1")
    // the pin exists where the scheme says, and probes through BOTH
    // spellings of the path agree with the in-memory ranking
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(local, "layout.json")))
    val inMemory = Lexical.bm25TopK(corpus(0, 80), queries, k = 7)
    assert(canon(LexicalIndex.searchBm25(spark, uri, queries, k = 7))
      == canon(inMemory))
    assert(canon(LexicalIndex.searchBm25(spark, local, queries, k = 7))
      == canon(inMemory))
    // the bucket layout was honored, not silently degraded to flat
    assert(new java.io.File(s"$local/postings/batch=b1").listFiles()
      .exists(_.getName.startsWith("bucket=")),
      "file:-scheme build lost the word-bucket layout")
    // compact through the scheme path preserves the pin
    val folded = Files.createTempDirectory("graft-lexidx-fs2").toString
    LexicalIndex.compact(uri, "file://" + folded)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(folded, "layout.json")))
    assert(canon(LexicalIndex.searchBm25(spark, folded, queries, k = 7))
      == canon(inMemory))
  }

  test("mixed-schema meta (a legacy batch without tot_len) never " +
    "undercounts avgdl: ranking stays byte-identical, and compact " +
    "persists the honest total") {
    val path = Files.createTempDirectory("graft-lexidx-mx").toString
    LexicalIndex.build(corpus(0, 40), path)
    // simulate a batch landed by a pre-tot_len build: strip the
    // column from its meta dir (read fully before the overwrite)
    val legacy = spark.read.parquet(s"$path/meta/batch=base")
      .select("n_docs").collect().map(_.getLong(0)).toSeq
      .toDF("n_docs")
    legacy.write.mode("overwrite")
      .parquet(s"$path/meta/batch=base")
    // a post-upgrade append writes tot_len: the meta table now holds
    // BOTH schemas; trusting a partial sum would halve avgdl here
    LexicalIndex.append(corpus(40, 80), path, "b1")
    val inMemory = Lexical.bm25TopK(corpus(0, 80), queries, k = 7)
    assert(canon(LexicalIndex.searchBm25(spark, path, queries, k = 7))
      == canon(inMemory),
      "mixed meta coverage skewed the avgdl prior")
    // compact folds to full coverage (one batch, tot_len present and
    // exact) — and the folded index still answers identically
    val folded = Files.createTempDirectory("graft-lexidx-mx2").toString
    LexicalIndex.compact(path, folded)
    val meta = spark.read.parquet(s"$folded/meta")
    val r = meta.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col("tot_len"))).head()
    val trueTot = spark.read.parquet(s"$folded/doclen")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("len"))).head().getLong(0)
    assert(!r.isNullAt(0) && r.getLong(0) == trueTot,
      "compact persisted a wrong corpus length")
    assert(canon(LexicalIndex.searchBm25(spark, folded, queries, k = 7))
      == canon(inMemory))
  }

  test("gc refuses phantom ids (an id never landed would skew every " +
    "idf); null-text removals within the accounted population pass") {
    val path = Files.createTempDirectory("graft-lexidx-ph").toString
    val docs = corpus(0, 20).unionByName(
      Seq((900L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    LexicalIndex.build(docs, path)
    // removing a landed null-text doc is legitimate (it has no doclen
    // row, but the index accounts exactly one null-text doc)
    val ok = Files.createTempDirectory("graft-lexidx-ph2").toString
    LexicalIndex.gc(Seq(900L, 3L).toDF("doc_id"), path, ok)
    val survivors = corpus(0, 20).filter(!$"doc_id".isin(3L))
    val rebuilt = Files.createTempDirectory("graft-lexidx-ph3").toString
    LexicalIndex.build(survivors, rebuilt)
    assert(canon(LexicalIndex.searchBm25(spark, ok, queries, k = 7))
      == canon(LexicalIndex.searchBm25(spark, rebuilt, queries, k = 7)))
    // one MORE no-doclen id than the null-text population proves a
    // phantom — refused loudly instead of corrupting N
    val bad = Files.createTempDirectory("graft-lexidx-ph4").toString
    val e = intercept[IllegalArgumentException] {
      LexicalIndex.gc(Seq(900L, 7777L).toDF("doc_id"), path, bad)
    }
    assert(e.getMessage.contains("phantom"))
  }
}
