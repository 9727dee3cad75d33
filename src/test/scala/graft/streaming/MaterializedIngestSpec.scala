package graft.streaming

import graft.TestSpark
import graft.sources.{Materialized, Snapshot}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming materialized-view maintenance: every micro-batch lands
  * and folds exactly once, the view equals a from-scratch aggregate
  * after every batch, and non-stream writers (deletes) fold in on
  * the next batch. */
class MaterializedIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-mv-ingest").toString

  private def rows(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, s"k${i % 4}", (i % 9).toLong)
    }

  private def recompute(table: String) =
    Snapshot.read(spark, table)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("v")), lit(0L)).as("sum_v"),
        count(col("v")).as("cnt_v"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("k"), col("n_rows"), col("sum_v"), col("cnt_v"))
      .collect().map(_.toString).sorted.toSeq

  test("stream lands + folds per micro-batch from a COLD start; " +
    "view == recompute after every batch; external deletes fold in; " +
    "crash-replayed batches land and fold once") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp()
    val (table, mv, ckpt) = (s"$root/t", s"$root/mv", s"$root/ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = MaterializedIngest.start(
      mem.toDF().toDF("id", "k", "v"), table, mv,
      keyCols = Seq("k"), sumCols = Seq("v"), checkpoint = ckpt)
    try {
      // batch 0: cold start — lazy create seeds the view
      mem.addData(rows(0, 100): _*)
      q.processAllAvailable()
      assert(canon(Materialized.read(spark, mv))
        == canon(recompute(table)))
      // batch 1: incremental fold
      mem.addData(rows(100, 150): _*)
      q.processAllAvailable()
      assert(canon(Materialized.read(spark, mv))
        == canon(recompute(table)))
      // a NON-stream writer deletes between micro-batches: the next
      // batch's refresh folds the table's whole CDC window, not just
      // the stream's rows
      Snapshot.deleteRangeMor(spark, table, "id", 20L, 49L)
      mem.addData(rows(150, 160): _*)
      q.processAllAvailable()
      assert(canon(Materialized.read(spark, mv))
        == canon(recompute(table)))
    } finally q.stop()
    assert(Snapshot.read(spark, table).count() == 160 - 30)
    // CRASH REPLAY of an already-processed batch id: the tagged
    // landing dedupes and the refresh advances nothing
    val preV = Snapshot.latestVersion(spark, table).get
    val preState = canon(Materialized.read(spark, mv))
    MaterializedIngest.processBatch(rows(100, 150).toDF("id", "k", "v"),
      1L, table, mv, Seq("k"), Seq("v"))
    assert(Snapshot.latestVersion(spark, table).get == preV,
      "replayed batch double-landed")
    assert(canon(Materialized.read(spark, mv)) == preState,
      "replayed batch double-folded")
  }

  test("a crashed lazy CREATE replays to the same seed: pinned " +
    "snapshot, deduped seed commit, no double aggregation") {
    val root = tmp()
    val (table, mv) = (s"$root/t", s"$root/mv")
    Snapshot.append(rows(0, 80).toDF("id", "k", "v"), table)
    Materialized.create(spark, table, mv, Seq("k"), Seq("v"))
    // simulate the crash window: config.json (written last) lost,
    // while the pin and the seed commit survived
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$mv/config.json"), false)
    // the table moved on before the replay — the pin must hold the
    // ORIGINAL version so the seed isn't recomputed over v2
    Snapshot.append(rows(80, 90).toDF("id", "k", "v"), table)
    Materialized.create(spark, table, mv, Seq("k"), Seq("v"))
    // one seed commit only (the replay's append deduped on its tag)
    assert(Snapshot.versions(spark, s"$mv/state").map(_._2)
      == Seq("append"))
    // baseline still pins v1, so the next refresh folds (1, 2]
    assert(Materialized.refresh(spark, table, mv) == Some((1L, 2L)))
    assert(canon(Materialized.read(spark, mv))
      == canon(recompute(table)))
  }
}
