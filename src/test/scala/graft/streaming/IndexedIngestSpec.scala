package graft.streaming

import graft.TestSpark
import graft.dedup.DedupIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexedIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-indexed-ingest").toString

  // >= 5 words each so the default 5-shingle near-dedup engages
  private val A = (1 to 20).map(i => s"a$i").mkString(" ")
  private val B = (1 to 20).map(i => s"b$i").mkString(" ")
  private val C = (1 to 20).map(i => s"c$i").mkString(" ")
  private val D = (1 to 20).map(i => s"d$i").mkString(" ")
  private val nearA = "zz1 zz2 zz3 " + A // Jaccard 16/19 >= 0.5

  private def landedIds(landPath: String): Set[Long] =
    spark.read.parquet(landPath).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet

  test("streaming loop: within-batch, cross-corpus, and CROSS-BATCH " +
       "duplicates all dropped; novels land and extend the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (indexPath, landPath, ckpt) = (tmp(), tmp(), tmp())
    DedupIndex.build(Seq((0L, A)).toDF("doc_id", "text"), indexPath)
    val mem = MemoryStream[(Long, String)]
    val q = IndexedIngest.start(mem.toDF().toDF("doc_id", "text"),
                                indexPath, landPath, ckpt)
    try {
      mem.addData(
        (10L, B),      // novel -> lands
        (11L, A),      // exact copy of the BUILT corpus -> dropped
        (12L, B),      // within-batch exact dup -> dropped
        (13L, nearA))  // near-dup of built corpus -> dropped
      q.processAllAvailable()
      assert(landedIds(landPath) == Set(10L))
      mem.addData(
        (20L, B),      // CROSS-BATCH dup: B landed in batch 0 and is
                       // only known via the index append
        (21L, C))      // novel -> lands
      q.processAllAvailable()
      assert(landedIds(landPath) == Set(10L, 21L))
      mem.addData((30L, C), (31L, B)) // all dups -> empty landing
      q.processAllAvailable()
      assert(landedIds(landPath) == Set(10L, 21L))
    } finally q.stop()
    // the index now carries build + three append batches; a direct
    // query against it still dedups everything ever landed
    val probe = Seq((40L, A), (41L, B), (42L, C), (43L, D))
      .toDF("doc_id", "text")
    val kept = DedupIndex.dropDuplicatesAgainstIndex(probe, indexPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(43L))
  }

  test("a retried batch (same id) is idempotent: identical landing, " +
       "no duplicated postings, index still exact") {
    import spark.implicits._
    val (indexPath, landPath) = (tmp(), tmp())
    DedupIndex.build(Seq((0L, A)).toDF("doc_id", "text"), indexPath)
    val batch = Seq((10L, B), (11L, A), (12L, C)).toDF("doc_id", "text")
    val n1 = IndexedIngest.processBatch(batch, 7L, indexPath, landPath)
    val postings1 = spark.read.parquet(s"$indexPath/postings")
      .filter(col("batch") === "i7").count()
    // the crash-after-append re-attempt: same batch, same id
    val n2 = IndexedIngest.processBatch(batch, 7L, indexPath, landPath)
    val postings2 = spark.read.parquet(s"$indexPath/postings")
      .filter(col("batch") === "i7").count()
    assert(n1 == 2L && n2 == 2L, s"landed counts $n1 / $n2")
    assert(postings1 == postings2, "retry must not duplicate postings")
    assert(landedIds(landPath) == Set(10L, 12L))
    // and the index is still exact: copies of the retried batch's docs
    // are dropped exactly once each, novels kept
    val probe = Seq((20L, B), (21L, C), (22L, D)).toDF("doc_id", "text")
    val kept = DedupIndex.dropDuplicatesAgainstIndex(probe, indexPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(22L))
  }
}
