package graft.pipelines

import java.nio.file.Files

import graft.TestSpark
import graft.dedup.DedupIndex
import graft.similarity.{Lexical, LexicalIndex, Pq}
import graft.sources.Snapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed right-to-erasure ([[Retention.erase]]): ONE call removes
  * a key set from the snapshot table and every derived index, after
  * which no surface — table read, BM25/hybrid search, incremental
  * dedup, PQ search — can return an erased doc, and the lexical
  * index's BM25 statistics equal a from-scratch rebuild over the
  * survivors. */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // unique texts (no exact dups — the DedupIndex.gc contract) over a
  // shared vocabulary, plus one per-doc distinctive token
  private def corpus(from: Int, until: Int) =
    (from until until).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      val shared = (0 to i % 7).map(j => words((i + j) % 5))
      (i.toLong, (shared :+ s"tok$i").mkString(" "))
    }.toDF("doc_id", "text")

  private def embOf(i: Long): Seq[Double] =
    Seq.tabulate(16)(d => ((i * 31 + d * 17) % 97) / 97.0)

  private val queries = Seq((1L, "alpha gamma"), (2L, "delta tok17"))
    .toDF("query_id", "qtext")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("erase removes a key set from the table and EVERY index; " +
    "BM25 stats match a survivor rebuild; rerun is a no-op") {
    val root = Files.createTempDirectory("graft-erase").toString
    val table = s"$root/t"
    val lex = s"$root/lex"
    val ded = s"$root/dedup"
    val pq = s"$root/pq"
    val docs = corpus(0, 80).cache()
    Snapshot.append(docs, table)
    LexicalIndex.build(docs, lex)
    DedupIndex.build(docs, ded)
    Pq.writePqIndex(
      (0L until 80L).map(i => (i, embOf(i)))
        .toDF("vec_id", "embedding"),
      pq, m = 8, kCodes = 16, seed = 42L)

    val erasedIds = Seq(3L, 17L, 41L)
    val req = (erasedIds :+ 9999L).toDF("doc_id") // one never landed
    val report = Retention.erase(spark, req, table,
      lexicalIndex = Some(lex), dedupIndex = Some(ded),
      pqIndex = Some(pq))
    assert(report.requested == 4L && report.erased == 3L &&
      report.skipped == 1L && report.tableVersion.nonEmpty)

    // table: the erased keys are gone, everything else intact
    val live = Snapshot.read(spark, table)
    assert(live.count() == 77L)
    assert(live.filter(col("doc_id").isin(erasedIds: _*)).count() == 0L)

    // lexical: no erased doc in any ranking, and the index's BM25
    // statistics (N, avgdl, df) EQUAL a from-scratch rebuild over the
    // survivors — idf parity, not just missing rows
    val survivors = docs.filter(!col("doc_id").isin(erasedIds: _*))
    val rebuilt = s"$root/lex-rebuilt"
    LexicalIndex.build(survivors, rebuilt)
    val got = LexicalIndex.searchBm25(spark, lex, queries, k = 10)
    assert(canon(got) ==
      canon(LexicalIndex.searchBm25(spark, rebuilt, queries, k = 10)))
    assert(got.filter(col("doc_id").isin(erasedIds: _*)).count() == 0L)
    val hy = LexicalIndex.searchHybrid(spark, lex, queries,
      k = 5, kEach = 10)
    assert(canon(hy) == canon(LexicalIndex.searchHybrid(spark,
      rebuilt, queries, k = 5, kEach = 10)))

    // dedup: a new doc whose text exactly duplicates an ERASED doc
    // must now survive ingest (its hash and postings are gone), while
    // a dup of a SURVIVOR is still dropped
    val erasedText = docs.filter(col("doc_id") === 3L)
      .head().getString(1)
    val survivorText = docs.filter(col("doc_id") === 10L)
      .head().getString(1)
    val probe = Seq((900L, erasedText), (901L, survivorText))
      .toDF("doc_id", "text")
    val kept = DedupIndex.dropDuplicatesAgainstIndex(probe, ded)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(900L),
      s"dedup index kept $kept; expected only the erased doc's twin")

    // PQ: a query AT an erased vector can no longer return it
    val q = Seq((3L, embOf(3L))).toDF("vec_id", "embedding")
    val nn = Pq.searchPqIndex(spark, pq, q, k = 5)
    assert(nn.count() == 5L)
    assert(nn.filter(col("neighbor_id").isin(erasedIds: _*))
      .count() == 0L)

    // rerun with the SAME request: everything already gone — no-op
    // report, surfaces unchanged (at-least-once erasure queues)
    val again = Retention.erase(spark, req, table,
      lexicalIndex = Some(lex), dedupIndex = Some(ded),
      pqIndex = Some(pq))
    assert(again.erased == 0L && again.skipped == 4L &&
      again.tableVersion.isEmpty)
    assert(Snapshot.read(spark, table).count() == 77L)
    assert(canon(LexicalIndex.searchBm25(spark, lex, queries, k = 10))
      == canon(got))
  }

  test("erase composes with null-text docs (they count in the " +
    "lexical N) and with a table-only deployment (no indexes)") {
    val root = Files.createTempDirectory("graft-erase2").toString
    val table = s"$root/t"
    val lex = s"$root/lex"
    val docs = corpus(0, 20).unionByName(
      Seq((900L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    Snapshot.append(docs, table)
    LexicalIndex.build(docs, lex)
    val report = Retention.erase(spark,
      Seq(900L, 5L).toDF("doc_id"), table,
      lexicalIndex = Some(lex))
    assert(report.erased == 2L)
    // N shrank by BOTH (the null-text doc counted): parity with a
    // survivor rebuild proves the accounting
    val rebuilt = s"$root/lex-rebuilt"
    LexicalIndex.build(corpus(0, 20).filter(col("doc_id") =!= 5L),
      rebuilt)
    assert(canon(LexicalIndex.searchBm25(spark, lex, queries, k = 10))
      == canon(LexicalIndex.searchBm25(spark, rebuilt, queries,
        k = 10)))
    // table-only: no index paths, just the snapshot delete
    val t2 = s"$root/t2"
    Snapshot.append(corpus(0, 10), t2)
    val r2 = Retention.erase(spark, Seq(1L).toDF("doc_id"), t2)
    assert(r2.erased == 1L &&
      Snapshot.read(spark, t2).count() == 9L)
  }
}
