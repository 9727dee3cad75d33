package graft.streaming

import graft.TestSpark
import graft.similarity.{Lexical, LexicalIndex}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming lexical-index landing: batches land once under crash
  * replay, and search over the streamed index is byte-identical to a
  * one-shot batch build over the same corpus. */
class LexicalIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-lex-ingest").toString

  private def corpus(from: Int, until: Int) =
    (from until until).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      (i.toLong, (0 to i % 7).map(j => words((i + j) % 5)).mkString(" "))
    }

  private val queries = Seq((1L, "alpha gamma"), (2L, "delta"))
    .toDF("query_id", "qtext")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed index == one-shot batch build (bm25 AND hybrid); " +
    "snapshot table and index stay in step; crash-replayed batches " +
    "land once") {
    implicit val sqlCtx = spark.sqlContext
    val (table, indexPath, ckpt) = (tmp() + "/t", tmp(), tmp())
    // pin a word-bucketed layout from an empty frame (cold start)
    LexicalIndex.build(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), indexPath,
      wordBuckets = 4)
    val mem = MemoryStream[(Long, String)]
    val q = LexicalIngest.start(mem.toDF().toDF("doc_id", "text"),
      table, indexPath, ckpt, statsCols = Seq("doc_id"))
    try {
      mem.addData(corpus(0, 30): _*)
      q.processAllAvailable()
      mem.addData(corpus(30, 60): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the landed snapshot carries exactly the streamed docs
    val landed = graft.sources.Snapshot.read(spark, table)
    assert(landed.count() == 60)
    // CRASH REPLAY: re-run an already-processed batch id against both
    // halves directly (foreachBatch at-least-once) — the snapshot tag
    // dedups the commit, the index overwrite replaces its own files
    val preVersion = graft.sources.Snapshot
      .latestVersion(spark, table).get
    LexicalIngest.processBatch(
      corpus(30, 60).toDF("doc_id", "text"), 1L, table, indexPath,
      statsCols = Seq("doc_id"))
    assert(graft.sources.Snapshot.latestVersion(spark, table).get
      == preVersion, "replayed batch double-landed in the snapshot")
    assert(graft.sources.Snapshot.read(spark, table).count() == 60)
    // search over the streamed-and-replayed index is byte-identical
    // to a one-shot build over the same corpus
    val oneShot = tmp()
    LexicalIndex.build(corpus(0, 60).toDF("doc_id", "text"), oneShot,
      wordBuckets = 4)
    assert(canon(LexicalIndex.searchBm25(spark, indexPath, queries,
        k = 7))
      == canon(LexicalIndex.searchBm25(spark, oneShot, queries, k = 7)))
    assert(canon(LexicalIndex.searchHybrid(spark, indexPath, queries,
        k = 5, kEach = 7))
      == canon(LexicalIndex.searchHybrid(spark, oneShot, queries,
        k = 5, kEach = 7)))
    // and both agree with the in-memory ranking over the landed table
    assert(canon(LexicalIndex.searchBm25(spark, indexPath, queries,
        k = 7))
      == canon(Lexical.bm25TopK(
        landed.select(col("doc_id"), col("text")), queries, k = 7)))
    // compaction on the maintenance cadence preserves the answers
    val folded = tmp()
    LexicalIndex.compact(indexPath, folded)
    assert(canon(LexicalIndex.searchHybrid(spark, folded, queries,
        k = 5, kEach = 7))
      == canon(LexicalIndex.searchHybrid(spark, oneShot, queries,
        k = 5, kEach = 7)))
  }
}
