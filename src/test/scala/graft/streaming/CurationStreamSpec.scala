package graft.streaming

import graft.{Tables, TestSpark}
import graft.pipelines.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")

  // fixtures with known langId/quality behavior (TextSpec)
  private val en1 = "the cat is in the house and it is not far from the barn"
  private val en2 = "the quick brown fox jumps over the lazy dog near the river bank"
  private val fr = "le chien est dans la maison et les chats sont sur le toit"
  private val junk = "!!! ??? *** !!! ??? *** !!! ???"

  test("streaming ingest: lang/quality filters + dedup within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    val cfg = Curation.Config(langs = Set("en"), minQuality = 0.3)
    val out = CurationStream.ingest(stream, cfg, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("curation_ingest")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, en1, ts("10:00:00")),
        (2L, junk, ts("10:00:10")),
        (3L, fr, ts("10:00:20")),
        (4L, en2, ts("10:00:30")),
        (5L, en1, ts("10:00:40"))) // exact dup of 1, same batch
      q.processAllAvailable()
      mem.addData(
        (6L, en1, ts("10:10:00")), // exact dup of 1, NEXT batch, in horizon
        (7L, en2 + " again and again", ts("10:10:10")))
      q.processAllAvailable()
      val table = spark.table("curation_ingest")
      val got = table.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 4L, 7L),
        s"expected survivors {1,4,7}, got $got")
      assert(!got.contains(2L), "junk quality must be filtered")
      assert(!got.contains(3L), "language outside the allow-list must be filtered")
      // the streaming state dropped both the in-batch and cross-batch dup
      assert(table.columns.toSet
        == Set("doc_id", "text", "event_time", "detected", "quality"))
      assert(table.filter(col("detected") =!= "en").count() == 0)
      assert(table.filter(col("quality") < 0.3).count() == 0)
    } finally q.stop()
  }

  test("ingestStats: windowed per-language acceptance counters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    // stats over an already-accepted stream: separate query, so the
    // two stateful operators are not chained in one plan
    val accepted = stream
      .withColumn("detected", graft.text.Text.langId(col("text")))
      .withColumn("quality", graft.text.Text.qualityScore(col("text")))
    val agg = CurationStream.ingestStats(accepted, width = "1 hour")
    val q = agg.writeStream.format("memory").queryName("curation_stats")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, en1, ts("10:05:00")),
        (2L, en2, ts("10:25:00")),
        (3L, fr, ts("10:45:00")),
        (4L, en1, ts("11:05:00")))
      q.processAllAvailable()
      val rows = spark.table("curation_stats").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      val h11 = Timestamp.valueOf("2024-01-01 11:00:00").getTime / 1000
      assert(rows((h10, "en")) == 2L)
      assert(rows((h10, "fr")) == 1L)
      assert(rows((h11, "en")) == 1L)
    } finally q.stop()
  }

  test("streaming ingest honors redactPii: streamed output carries no raw PII") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    val cfg = Curation.Config(langs = Set("en"), redactPii = true)
    val out = CurationStream.ingest(stream, cfg)
    val q = out.writeStream.format("memory").queryName("curation_redact")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, en1 + " mail bob@example.com now", ts("10:00:00")),
        (2L, en1 + " mail bob@example.com now", ts("10:00:10"))) // dup AFTER redaction
      q.processAllAvailable()
      val rows = spark.table("curation_redact").cache()
      assert(rows.count() == 1, "redacted duplicates must dedup on redacted text")
      assert(rows.filter(col("text").contains("bob@example.com")).count() == 0)
      assert(rows.filter(col("text").contains("[EMAIL]")).count() == 1)
    } finally q.stop()
  }

  test("land: accepted stream lands as partitioned parquet; restart " +
       "resumes from the checkpoint without replaying") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    val cfg = Curation.Config(langs = Set("en"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-land").toString
    val (path, ckpt) = (s"$base/corpus", s"$base/ckpt")
    val accepted = CurationStream.ingest(stream, cfg)
    val q1 = CurationStream.land(accepted, path, ckpt)
    try {
      mem.addData((1L, en1, ts("10:00:00")), (2L, en2, ts("10:00:10")),
                  (3L, junk, ts("10:00:20")))
      q1.processAllAvailable()
    } finally q1.stop()
    val landed1 = spark.read.parquet(path)
    assert(landed1.count() == 2, "junk must be filtered before landing")
    // hive-style language partitions for pruned compaction scans
    assert(new java.io.File(path).listFiles()
      .exists(f => f.isDirectory && f.getName == "detected=en"))
    // restart against the same checkpoint: old batches are NOT
    // replayed, new data lands exactly once
    val q2 = CurationStream.land(
      CurationStream.ingest(stream, cfg), path, ckpt)
    try {
      mem.addData((4L, en1 + " again today", ts("11:00:00")))
      q2.processAllAvailable()
    } finally q2.stop()
    val landed2 = spark.read.parquet(path)
    assert(landed2.count() == 3,
      s"expected 2 old + 1 new rows, got ${landed2.count()}")
    assert(landed2.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 4L))
  }

  test("lambda round-trip: stream-land micro-batches -> compact the " +
       "retired dir -> batch near-dedup over the compacted landing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    val base = java.nio.file.Files
      .createTempDirectory("graft-lambda").toString
    val (path, ckpt) = (s"$base/corpus", s"$base/ckpt")
    val q = CurationStream.land(
      CurationStream.ingest(stream, Curation.Config(langs = Set("en"))),
      path, ckpt)
    try { // several batches; batch 3 carries NEAR-clones of batch 1 —
          // different hash, so the online exact dedup correctly lands
          // them; catching them is the batch layer's job
      // word-reversed texts keep the token-multiset lang/quality
      // kernels happy but share no word 5-shingles with the originals
      // — genuinely distinct docs, not near-dups
      val en1r = en1.split(" ").reverse.mkString(" ")
      val en2r = en2.split(" ").reverse.mkString(" ")
      mem.addData((1L, en1, ts("10:00:00")), (2L, en2, ts("10:00:05")))
      q.processAllAvailable()
      mem.addData((3L, en1r, ts("10:10:00")))
      q.processAllAvailable()
      mem.addData((11L, "zz1 zz2 zz3 " + en1, ts("10:20:00")),
                  (12L, "zz1 zz2 zz3 " + en2, ts("10:20:05")))
      q.processAllAvailable()
      mem.addData((13L, en2r, ts("10:30:00")))
      q.processAllAvailable()
    } finally q.stop()

    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.startsWith("_") || f.getName.startsWith("."))
          Nil else Seq(f)
      walk(new java.io.File(path)).size
    }
    val before = dataFiles()
    assert(before >= 4, s"one file set per micro-batch expected, $before")
    val stats = graft.sources.Layout.compact(spark, path)
    assert(stats.rows == 6 && dataFiles() < before)

    // the batch (compaction-time) half of the lambda split: near-dedup
    // over the compacted landing, reading the lang partition PRUNED
    val landed = spark.read.parquet(path)
      .filter(col("detected") === "en")
    assert(graft.sources.Layout.isPartitionPruned(landed))
    val survivors = graft.dedup.Dedup
      .markNearDuplicates(landed.select(col("doc_id"), col("text")))
      .filter(col("kept"))
    // planted near-clones 11/12 must collapse onto their batch-1
    // originals; the genuinely-new docs survive
    val ids = survivors.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 13L),
      s"near-clones 11/12 must collapse onto their batch-1 originals " +
      s"at compaction time, distinct docs survive; got $ids")
  }

  test("streaming ingest honors the C4 and Gopher opt-in stages") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    // C4-survivable english: every line terminal-punctuated, >=3
    // sentences, >=5 words each, per-line-unique words (a repeated
    // phrase would trip Gopher's top-n-gram gate — it did, in this
    // test's first draft)
    val clean = (1 to 10).map(i =>
      s"the token$i alpha$i beta$i gamma$i delta$i today$i.")
      .mkString("\n")
    val badword = clean + "\nvisit the casino bonus page now."
    val cfg = Curation.Config(langs = Set("en"), minQuality = 0.0,
      c4 = Some(graft.text.C4.Config()),
      gopher = Some(graft.text.Gopher.Config(
        minWords = 30L, minStopHits = 1L)))
    val out = CurationStream.ingest(stream, cfg, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("c4_ingest")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, clean, ts("10:00:00")),
        (2L, badword, ts("10:00:10")),       // C4 page drop
        (3L, "too short doc here.", ts("10:00:20"))) // C4 sentence floor
      q.processAllAvailable()
      val ids = spark.table("c4_ingest").select("doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L), s"got $ids")
      // the streamed survivor set equals the batch curate's on the
      // same rows and config (parity — both run the same stages)
      val batch = Curation.curate(
        Seq((1L, clean), (2L, badword), (3L, "too short doc here."))
          .toDF("doc_id", "text"), cfg)
        .select("doc_id").as[Long].collect().toSet
      assert(batch == ids)
    } finally q.stop()
  }

  test("batch twin: ingest filter+dedup counts agree with the funnel report") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
      .withColumn("event_time", lit(ts("10:00:00")))
    val cfg = Curation.Config()
    // on a batch frame the watermark is a no-op and the within-watermark
    // dedup degrades to exact dedup — survivor count must equal the
    // funnel's independently-computed exact_dedup stage
    val streamed = CurationStream.ingest(docs, cfg).count()
    val funnel = Curation.funnel(docs.drop("event_time"), cfg).toMap
    assert(streamed == funnel("exact_dedup"),
      s"ingest-as-batch $streamed != funnel ${funnel("exact_dedup")}")
  }

  test("noveltyStats hashCol: reusing ingest(keepHash)'s content_hash " +
       "equals the recompute path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(40)
      .localCheckpoint(false)
    val refHashes = ref.select(sha2(col("text"), 256).as("h"))
      .localCheckpoint(false)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    // keepHash retains the dedup hash on ingest's output…
    val accepted = CurationStream.ingest(stream,
      graft.pipelines.Curation.Config(langs = Set("en", "und"),
        minQuality = 0.0, maxUrls = 1000), keepHash = true)
    assert(accepted.columns.contains("content_hash"))
    // …and noveltyStats reuses it instead of re-hashing every text
    val out = CurationStream.noveltyStats(accepted, refHashes,
      width = "1 hour", hashCol = Some("content_hash"))
    val q = out.writeStream.format("memory").queryName("novelty_hashcol")
      .outputMode("complete").start()
    try {
      val rows = ref.as[(Long, String)].collect()
        .map { case (id, t) => (id, t, ts("10:00:01")) }
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("novelty_hashcol")
        .select("n_cur", "n_novel").as[(Long, Long)].collect()
      assert(got.length == 1)
      // every row re-fetches the reference verbatim -> zero novelty,
      // proving the reused hash column carries the same sha2-256 the
      // fallback recompute would produce
      assert(got.head._1 > 0 && got.head._2 == 0L,
        s"expected (n>0, 0 novel), got ${got.head}")
    } finally q.stop()
  }

  test("noveltyStats: stream-computed window equals the batch " +
       "Drift.noveltyRate on identical data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q_novelty_rate planting: %3==0 docs re-fetch the reference
    // verbatim, the rest arrive as new (prefixed) content
    val ref = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(60)
      .localCheckpoint(false)
    val cur = ref.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(lit("refreshed page "), col("doc_id"),
          lit(" "), col("text"))).as("text"))
      .localCheckpoint(false)
    val batch = graft.ops.Drift.noveltyRate(ref, cur)
      .select("n_cur", "n_novel", "novelty")
      .as[(Long, Long, Double)].head()

    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "event_time")
    // the accepted-stream contract: exact-deduped within the
    // watermark horizon (what ingest guarantees) — so per-window
    // counts are DISTINCT contents like the batch operator's
    val accepted = stream
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("content_hash"))
      .drop("content_hash")
    val out = CurationStream.noveltyStats(accepted,
      ref.select(sha2(col("text"), 256).as("h")), width = "1 hour")
    val q = out.writeStream.format("memory").queryName("novelty_stream")
      .outputMode("complete").start()
    try {
      val rows = cur.as[(Long, String)].collect()
        .map { case (id, t) => (id, t, ts("10:00:01")) }
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("novelty_stream")
        .select("n_cur", "n_novel", "novelty")
        .as[(Long, Long, Double)].collect()
      assert(got.length == 1, s"expected one window, got ${got.length}")
      assert(got.head == batch,
        s"stream ${got.head} != batch $batch")
    } finally q.stop()
  }

  test("compactionPsi: PSI over stream-landed files equals the batch " +
       "psiBins on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("n_chars")).limit(80)
      .localCheckpoint(false)
    val ref = base.select(col("n_chars").cast("double").as("v"))
    // the q_drift_psi planting: shifted current snapshot
    val curBatch = base
      .select((col("n_chars") + (col("doc_id") % 5) * 40)
        .cast("double").as("v"))
      .localCheckpoint(false)
    val batchBins = graft.ops.Drift.psiBins(ref, curBatch, "v")
      .as[(Long, Long, Long, Long)].collect().toSet

    val tmp = java.nio.file.Files.createTempDirectory("graft-psi-land")
    val mem = MemoryStream[(Double, Timestamp)]
    val stream = mem.toDF().toDF("v", "event_time")
    val q = CurationStream.land(stream, s"$tmp/data", s"$tmp/ckpt",
      partitionCols = Nil)
    try {
      mem.addData(curBatch.as[Double].collect().toSeq
        .map(v => (v, ts("10:00:01"))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$tmp/data").select("v")
    val streamBins = CurationStream.compactionPsi(ref, landed, "v")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamBins == batchBins,
      s"landed-PSI $streamBins != batch $batchBins")
  }
}
