package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.sources.Snapshot
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest landing as snapshot commits: micro-batch →
  * manifest-version mapping, replay idempotence via the batch tag,
  * and compaction under a live pinned reader of the landed table. */
class SnapshotStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-snapstream").toString + "/t"

  test("micro-batches land as tagged snapshot versions; totals exact") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-snapstream-ck").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = CurationStream.landSnapshot(stream, t, ckpt)
    try {
      mem.addData((0L until 30L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      mem.addData((30L until 50L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      val vs = Snapshot.versions(spark, t)
      assert(vs.nonEmpty && vs.forall(_._2 == "append"))
      assert(vs.forall(_._5.startsWith("batch-")),
        s"untagged stream commit: $vs")
      assert(vs.last._4 == 50L)
      assert(Snapshot.read(spark, t).count() == 50)
    } finally q.stop()
  }

  test("statsCols flow through the streaming landing: the landed " +
    "table data-skips from birth") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-snapstream-ck2").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = CurationStream.landSnapshot(stream, t, ckpt,
      statsCols = Seq("doc_id"))
    try {
      mem.addData((0L until 40L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      mem.addData((1000L until 1040L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      // two landed commits with disjoint id ranges: a range read of
      // the second batch must prune the first batch's files
      val (total, kept) = Snapshot.pruneCount(spark, t, "doc_id",
        1000L, 1039L)
      assert(kept < total,
        s"streamed stats did not prune: kept $kept of $total")
      assert(Snapshot.readWhere(spark, t, "doc_id", 1000L, 1039L)
        .count() == 40)
    } finally q.stop()
  }

  test("a crash-replayed batch lands nothing (tag idempotence)") {
    val t = freshTable()
    val batch = (0L until 25L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val v1 = Snapshot.append(batch, t, tag = Some("batch-7"))
    // the at-least-once replay: same batch, same tag
    val v2 = Snapshot.append(batch, t, tag = Some("batch-7"))
    assert(v1 == v2, s"replay committed a new version: $v1 -> $v2")
    assert(Snapshot.versions(spark, t).size == 1)
    assert(Snapshot.read(spark, t).count() == 25)
    // a DIFFERENT batch still lands
    val v3 = Snapshot.append(batch.withColumn("doc_id",
      col("doc_id") + 100L), t, tag = Some("batch-8"))
    assert(v3 == v1 + 1)
    assert(Snapshot.read(spark, t).count() == 50)
  }

  test("compaction of the landed table under a live pinned reader") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-snapstream-ck2").toString
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.landSnapshot(
      mem.toDF().toDF("doc_id", "text"), t, ckpt)
    try {
      (0 until 5).foreach { k =>
        mem.addData((k * 10 until k * 10 + 10).map(i =>
          (i.toLong, s"doc $i")): _*)
        q.processAllAvailable()
      }
      val v = Snapshot.latestVersion(spark, t).get
      val pinned = Snapshot.read(spark, t, Some(v))
      val cv = Snapshot.compact(spark, t)
      // the reader pinned BEFORE the compaction commit is untouched
      assert(pinned.count() == 50)
      assert(Snapshot.read(spark, t, Some(cv)).count() == 50)
      val post = Snapshot.versions(spark, t).last
      assert(post._2 == "compact" && post._3 < 5,
        s"expected a compacted file list, got $post")
      // …and the stream keeps landing on top of the compacted version
      mem.addData((100L until 110L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      assert(Snapshot.read(spark, t).count() == 60)
    } finally q.stop()
  }

  test("streaming landing composes with merge-on-read deletes and " +
    "a polling consumer: deletes stay pending, new batches land " +
    "untouched, the consumer sees exact windows") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-snapstream-ck4").toString
    val state = Files.createTempDirectory("graft-snapstream-st").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = CurationStream.landSnapshot(stream, t, ckpt,
      statsCols = Seq("doc_id"))
    try {
      mem.addData((0L until 40L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      // consumer baseline at the first landed batch
      var ids = Seq.empty[Long]
      assert(Snapshot.consumeChanges(spark, t, state) { df =>
        ids = df.select("doc_id").collect().map(_.getLong(0)).toSeq
      }.nonEmpty && ids.size == 40)
      // a retention pass deletes MoR mid-stream: zero data rewrites
      val preFiles = Snapshot.readManifest(spark, t,
        Snapshot.latestVersion(spark, t).get).get.files.map(_.path)
      Snapshot.deleteRangeMor(spark, t, "doc_id", 10L, 19L)
      val postM = Snapshot.readManifest(spark, t,
        Snapshot.latestVersion(spark, t).get).get
      assert(postM.files.map(_.path) == preFiles)
      // the NEXT landed batch re-inserts ids inside the deleted
      // range; the sequence rule keeps them live
      mem.addData((10L until 15L).map(i => (i, s"again $i")): _*)
      q.processAllAvailable()
      val cur = Snapshot.read(spark, t)
      assert(cur.count() == 35)
      assert(cur.filter(col("text").startsWith("again")).count() == 5)
      assert(cur.filter(col("doc_id") === 12L).count() == 1)
      // the consumer's next window nets the delete AND the re-insert
      var changes = Seq.empty[(String, Long)]
      assert(Snapshot.consumeChanges(spark, t, state) { df =>
        changes = df.select(col("_change"), col("doc_id")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
      }.nonEmpty)
      assert(changes.count(_._1 == "delete") == 10)
      assert(changes.count(_._1 == "insert") == 5)
    } finally q.stop()
  }
}
