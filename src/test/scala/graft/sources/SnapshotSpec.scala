package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-based snapshot table: reader isolation under
  * compaction, concurrent appenders, every crash window, retention. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-snap").toString + "/t"

  private def batch(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"doc $i")).toDF("id", "text")

  test("append/read round trip; versions are monotonic with lineage") {
    val t = freshTable()
    val v1 = Snapshot.append(batch(0, 100), t)
    val v2 = Snapshot.append(batch(100, 150), t)
    assert(v1 == 1L && v2 == 2L)
    assert(Snapshot.read(spark, t).count() == 150)
    assert(Snapshot.read(spark, t, Some(1)).count() == 100)
    val vs = Snapshot.versions(spark, t)
    assert(vs.map(_._1) == Seq(1L, 2L))
    assert(vs.map(_._2) == Seq("append", "append"))
    assert(vs.map(_._4) == Seq(100L, 150L))
  }

  test("reader pins its snapshot across a compaction commit") {
    val t = freshTable()
    (0 until 6).foreach(k => Snapshot.append(batch(k * 10, k * 10 + 10), t))
    val preVersion = Snapshot.latestVersion(spark, t).get
    val preFiles = Snapshot.versions(spark, t).last._3
    // reader opens v6 (a concrete file list) BEFORE compaction commits
    val pinned = Snapshot.read(spark, t, Some(preVersion))
    val cv = Snapshot.compact(spark, t)
    assert(cv == preVersion + 1)
    // the pinned frame still reads the exact pre-compaction snapshot
    assert(pinned.count() == 60)
    assert(pinned.agg(sum("id")).head().getLong(0) == (0L until 60L).sum)
    // a fresh read resolves the compacted snapshot: same rows, fewer files
    val post = Snapshot.versions(spark, t).last
    assert(post._2 == "compact" && post._4 == 60L)
    assert(post._3 < preFiles,
      s"compaction did not reduce files: $preFiles -> ${post._3}")
    assert(Snapshot.read(spark, t).count() == 60)
  }

  test("two concurrent appenders: both land, distinct versions, " +
    "union of rows") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val a = scala.concurrent.Future {
        gate.await(); Snapshot.append(batch(1000, 1100), t) }
      val b = scala.concurrent.Future {
        gate.await(); Snapshot.append(batch(2000, 2100), t) }
      gate.countDown()
      val (va, vb) = (
        scala.concurrent.Await.result(a,
          scala.concurrent.duration.Duration.Inf),
        scala.concurrent.Await.result(b,
          scala.concurrent.duration.Duration.Inf))
      assert(va != vb, s"both appenders claimed v$va")
      assert(Set(va, vb) == Set(2L, 3L))
    } finally pool.shutdown()
    // the final snapshot carries BOTH appends (the loser retried
    // against the winner's manifest, keeping the winner's files)
    val all = Snapshot.read(spark, t)
    assert(all.count() == 210)
    assert(all.filter(col("id") >= 1000 && col("id") < 1100).count() == 100)
    assert(all.filter(col("id") >= 2000).count() == 100)
  }

  test("crash windows: staged-without-manifest is invisible; an " +
    "unclaimed scratch manifest is ignored; expire sweeps both") {
    val t = freshTable()
    Snapshot.append(batch(0, 20), t)
    // window 1: a writer crashed after staging data, before commit —
    // simulate by writing straight into data/ with no manifest
    batch(900, 950).write.parquet(s"$t/data/orphan-commit")
    assert(Snapshot.read(spark, t).count() == 20,
      "staged-but-uncommitted data leaked into a read")
    // window 2: a writer crashed after writing the manifest body,
    // before claiming the version name
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_snapshots/.tmp-deadwriter"),
      "{\"version\":99}".getBytes("UTF-8"))
    assert(Snapshot.latestVersion(spark, t).contains(1L))
    assert(Snapshot.read(spark, t).count() == 20)
    // expire sweeps the orphan data files and the scratch manifest
    Snapshot.append(batch(20, 30), t)
    val (droppedManifests, droppedFiles) = Snapshot.expire(spark, t,
      keepLast = 1, graceMicros = 0L)
    assert(droppedManifests == 1)
    assert(droppedFiles > 0, "orphan sweep removed nothing")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$t/_snapshots/.tmp-deadwriter")))
    assert(Snapshot.read(spark, t).count() == 30)
    // the expired version now fails loudly at resolve time
    intercept[NoSuchElementException] {
      Snapshot.read(spark, t, Some(1L))
    }
  }

  test("expire keeps pinned-window versions readable and removes " +
    "compacted-away files") {
    val t = freshTable()
    (0 until 4).foreach(k => Snapshot.append(batch(k * 5, k * 5 + 5), t))
    Snapshot.compact(spark, t)
    // both the compacted version and its parent survive keepLast=2
    val (_, removed) = Snapshot.expire(spark, t, keepLast = 2, graceMicros = 0L)
    assert(removed == 0,
      "files of a retained manifest were removed") // v4 files ⊂ kept set
    assert(Snapshot.read(spark, t, Some(4L)).count() == 20)
    assert(Snapshot.read(spark, t, Some(5L)).count() == 20)
    // dropping to keepLast=1 removes v4 and its now-unreferenced files
    val (dropped2, removed2) = Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    assert(dropped2 == 1 && removed2 > 0)
    assert(Snapshot.read(spark, t).count() == 20)
  }

  test("overwrite replaces contents; prior version stays readable " +
    "until expired") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t)
    val v2 = Snapshot.overwrite(batch(500, 510), t)
    assert(v2 == 2L)
    assert(Snapshot.read(spark, t).count() == 10)
    assert(Snapshot.read(spark, t, Some(1L)).count() == 50)
  }

  test("partitioned snapshots: partition pruning binds through the " +
    "manifest read; compaction preserves the layout") {
    val t = freshTable()
    def facetBatch(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, s"doc $i", if (i % 3 == 0) "en" else "de"))
        .toDF("id", "text", "lang")
    val v1 = Snapshot.appendPartitioned(facetBatch(0, 60), t, Seq("lang"))
    Snapshot.appendPartitioned(facetBatch(60, 90), t, Seq("lang"))
    assert(v1 == 1L)
    val full = Snapshot.read(spark, t)
    // partition column recovered from the staged k=v directories
    assert(full.columns.contains("lang"))
    assert(full.count() == 90)
    val en = full.filter(col("lang") === "en")
    assert(en.count() == 30)
    // the filtered snapshot read is PARTITION-PRUNED — the whole
    // point of the partitioned staging layout
    assert(Layout.isPartitionPruned(en),
      "snapshot read planned a full scan for a partition predicate:\n" +
        en.queryExecution.executedPlan)
    // a pinned pre-compaction reader + the layout surviving compaction
    val pinned = Snapshot.read(spark, t, Some(2L))
    val cv = Snapshot.compact(spark, t)
    assert(pinned.filter(col("lang") === "de").count() == 60)
    val post = Snapshot.read(spark, t, Some(cv))
    assert(post.count() == 90)
    val postEn = post.filter(col("lang") === "en")
    assert(postEn.count() == 30)
    assert(Layout.isPartitionPruned(postEn),
      "compaction lost the partition layout")
    // replay idempotence composes with the partitioned path too
    val v4 = Snapshot.appendPartitioned(facetBatch(90, 100), t,
      Seq("lang"), tag = Some("b-1"))
    val v5 = Snapshot.appendPartitioned(facetBatch(90, 100), t,
      Seq("lang"), tag = Some("b-1"))
    assert(v4 == v5)
    assert(Snapshot.read(spark, t).count() == 100)
  }

  test("file stats: readWhere data-skips at the manifest and stays " +
    "exact; stats survive the JSON round trip and compaction") {
    val t = freshTable()
    // four key-sorted appends → four files with disjoint id ranges
    (0 until 4).foreach(k =>
      Snapshot.append(batch(k * 100, k * 100 + 100).coalesce(1), t,
        statsCols = Seq("id", "text")))
    val (total, kept) = Snapshot.pruneCount(spark, t, "id", 150L, 250L)
    assert(total == 4 && kept == 2,
      s"expected 2 of 4 files kept for [150,250], got $kept of $total")
    // the pruned read answers exactly the unpruned filter
    val pruned = Snapshot.readWhere(spark, t, "id", 150L, 250L)
    val full = Snapshot.read(spark, t)
      .filter(col("id") >= 150 && col("id") <= 250)
    assert(pruned.count() == 101)
    assert(pruned.agg(sum("id")).head().getLong(0) ==
      full.agg(sum("id")).head().getLong(0))
    // a point lookup plans ONE file
    assert(Snapshot.pruneCount(spark, t, "id", 42L, 42L) == ((4, 1)))
    assert(Snapshot.readWhere(spark, t, "id", 42L, 42L).count() == 1)
    // string stats prune too (every batch's text is "doc <id>")
    val (_, keptS) = Snapshot.pruneCount(spark, t, "text", "doc 0", "doc 1")
    assert(keptS < 4)
    // provably-empty range: zero files planned, empty frame, schema kept
    val (_, kept0) = Snapshot.pruneCount(spark, t, "id", 5000L, 6000L)
    assert(kept0 == 0)
    val empty = Snapshot.readWhere(spark, t, "id", 5000L, 6000L)
    assert(empty.columns.toSeq == Seq("id", "text") && empty.count() == 0)
    // compaction re-gathers stats over the rewritten files: the
    // out-of-range probe still proves skipping works post-rewrite
    Snapshot.compact(spark, t)
    val (totalC, keptC) = Snapshot.pruneCount(spark, t, "id", 5000L, 6000L)
    assert(keptC == 0, s"compacted files lost stats: kept $keptC/$totalC")
    assert(Snapshot.readWhere(spark, t, "id", 150L, 250L).count() == 101)
  }

  test("a stats-less table never prunes but readWhere stays exact") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t) // no statsCols
    val (total, kept) = Snapshot.pruneCount(spark, t, "id", 10L, 19L)
    assert(total == kept, "files without stats must be kept")
    assert(Snapshot.readWhere(spark, t, "id", 10L, 19L).count() == 10)
  }

  test("merge: copy-on-write upsert rewrites only the files that " +
    "contain a matched key; pinned versions see pre-merge data") {
    val t = freshTable()
    (0 until 4).foreach(k =>
      Snapshot.append(batch(k * 100, k * 100 + 100).coalesce(1), t,
        statsCols = Seq("id")))
    val preVersion = Snapshot.latestVersion(spark, t).get
    val preFiles = Snapshot
      .readManifest(spark, t, preVersion).get.files.map(_.path).toSet
    // updates hit ONLY the first file's range; plus two inserts
    val source = Seq((5L, "updated 5"), (17L, "updated 17"),
      (9999L, "insert 9999"), (10000L, "insert 10000"))
      .toDF("id", "text")
    val mv = Snapshot.merge(source, t, "id")
    assert(mv == preVersion + 1)
    val post = Snapshot.readManifest(spark, t, mv).get
    assert(post.action == "merge")
    assert(post.rows == 400L + 2L, s"row accounting: ${post.rows}")
    // exactly one pre-merge file was rewritten; the other three carried
    val carried = post.files.map(_.path).toSet.intersect(preFiles)
    assert(carried.size == 3,
      s"expected 3 untouched files carried, got ${carried.size}")
    // merged state: updates landed, inserts landed, rest untouched
    val cur = Snapshot.read(spark, t)
    assert(cur.filter(col("id") === 5).head().getString(1) == "updated 5")
    assert(cur.filter(col("id") === 17).head().getString(1) == "updated 17")
    assert(cur.filter(col("id") === 9999).count() == 1)
    assert(cur.filter(col("id") === 123).head().getString(1) == "doc 123")
    assert(cur.count() == 402)
    // the pinned pre-merge snapshot is untouched
    val pinned = Snapshot.read(spark, t, Some(preVersion))
    assert(pinned.filter(col("id") === 5).head().getString(1) == "doc 5")
    assert(pinned.count() == 400)
    // stats coverage survived the merge: the rewritten+insert file has
    // id stats, so an out-of-range probe still prunes everything
    val (_, kept0) = Snapshot.pruneCount(spark, t, "id", 50000L, 60000L)
    assert(kept0 == 0, "merge output files lost their stats")
    // a second merge whose keys miss every file range is a pure
    // insert: all files carry over, none rewritten
    val pre2 = Snapshot.readManifest(spark, t, mv).get.files.map(_.path)
    val mv2 = Snapshot.merge(
      Seq((70000L, "pure insert")).toDF("id", "text"), t, "id")
    val post2 = Snapshot.readManifest(spark, t, mv2).get
    assert(pre2.forall(post2.files.map(_.path).contains),
      "a no-match merge rewrote existing files")
    assert(post2.rows == 403L)
  }

  test("merge rejects a source with duplicate keys; empty source is " +
    "a no-op returning the current version") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "text")
    intercept[IllegalArgumentException] { Snapshot.merge(dup, t, "id") }
    val v = Snapshot.merge(batch(0, 0), t, "id")
    assert(v == Snapshot.latestVersion(spark, t).get)
    assert(Snapshot.read(spark, t).count() == 10)
  }

  test("merge on a partitioned table preserves the layout") {
    val t = freshTable()
    def facetBatch(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de"))
        .toDF("id", "text", "lang")
    Snapshot.appendPartitioned(facetBatch(0, 40), t, Seq("lang"),
      statsCols = Seq("id"))
    Snapshot.merge(
      Seq((0L, "updated", "en"), (100L, "inserted", "de"))
        .toDF("id", "text", "lang"), t, "id")
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 41)
    assert(cur.filter(col("id") === 0).head().getString(1) == "updated")
    val en = cur.filter(col("lang") === "de")
    assert(Layout.isPartitionPruned(en),
      "merge broke the partitioned layout")
  }

  test("deleteRange: a file provably inside the range drops " +
    "wholesale; overlapping files rewrite; null rows survive") {
    val t = freshTable()
    (0 until 4).foreach(k =>
      Snapshot.append(batch(k * 100, k * 100 + 100).coalesce(1), t,
        statsCols = Seq("id")))
    val preFiles = Snapshot
      .readManifest(spark, t, 4L).get.files.map(_.path).toSet
    // [100, 299] covers file 2 fully (drop) and file 3 fully... no:
    // files are [0,99][100,199][200,299][300,399] -> 100..299 covers
    // files 2 and 3 wholesale; 0 rewrites needed
    val v = Snapshot.deleteRange(spark, t, "id", 100L, 299L)
    val post = Snapshot.readManifest(spark, t, v).get
    assert(post.action == "delete" && post.rows == 200L)
    assert(post.files.map(_.path).toSet.subsetOf(preFiles),
      "a pure wholesale delete must stage nothing")
    assert(post.files.size == 2)
    assert(Snapshot.read(spark, t).count() == 200)
    // partial overlap rewrites: [350, 1000] hits file 4 only, halfway
    val v2 = Snapshot.deleteRange(spark, t, "id", 350L, 1000L)
    val post2 = Snapshot.readManifest(spark, t, v2).get
    assert(post2.rows == 150L)
    assert(Snapshot.read(spark, t)
      .agg(max("id")).head().getLong(0) == 349L)
    // null rows survive a range delete even when the file's non-null
    // range sits fully inside the deleted range
    val t2 = freshTable()
    val withNull = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"))
      .toDF("id", "text")
    Snapshot.append(withNull.coalesce(1), t2, statsCols = Seq("id"))
    Snapshot.deleteRange(spark, t2, "id", 0L, 10L)
    val left = Snapshot.read(spark, t2).collect()
    assert(left.length == 1 && left.head.isNullAt(0) &&
      left.head.getString(1) == "c",
      s"null row did not survive: ${left.mkString(",")}")
  }

  test("deleteRange out of every file's range is a no-op; deleting " +
    "everything leaves an empty (loudly unreadable) snapshot") {
    val t = freshTable()
    Snapshot.append(batch(0, 50).coalesce(1), t, statsCols = Seq("id"))
    val v0 = Snapshot.latestVersion(spark, t).get
    assert(Snapshot.deleteRange(spark, t, "id", 900L, 999L) == v0,
      "out-of-range delete must commit nothing")
    val v = Snapshot.deleteRange(spark, t, "id", 0L, 49L)
    assert(Snapshot.readManifest(spark, t, v).get.rows == 0L)
    intercept[NoSuchElementException] { Snapshot.read(spark, t) }
  }

  test("deleteWhere: only files containing a predicate match are " +
    "rewritten; the keep filter is null-safe") {
    val t = freshTable()
    (0 until 3).foreach(k =>
      Snapshot.append(batch(k * 10, k * 10 + 10).coalesce(1), t))
    val preFiles = Snapshot
      .readManifest(spark, t, 3L).get.files.map(_.path).toSet
    // 'doc 25' lives only in the third file
    val v = Snapshot.deleteWhere(spark, t, col("text") === "doc 25")
    val post = Snapshot.readManifest(spark, t, v).get
    assert(post.rows == 29L)
    assert(post.files.map(_.path).toSet.intersect(preFiles).size == 2,
      "untouched files must carry by reference")
    assert(Snapshot.read(spark, t)
      .filter(col("text") === "doc 25").count() == 0)
    assert(Snapshot.read(spark, t).count() == 29)
  }

  test("readAppendsSince: the file-diff CDC over an append-only " +
    "interval; rewriting actions poison the interval loudly") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)   // v1
    Snapshot.append(batch(10, 25), t)  // v2
    Snapshot.append(batch(25, 30), t)  // v3
    val inc = Snapshot.readAppendsSince(spark, t, 1L)
    assert(inc.count() == 20)
    assert(inc.agg(min("id")).head().getLong(0) == 10L)
    // fully caught up: empty frame, schema intact
    val none = Snapshot.readAppendsSince(spark, t, 3L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "text"))
    // a compaction in the interval breaks file identity = row identity
    Snapshot.compact(spark, t) // v4
    intercept[IllegalStateException] {
      Snapshot.readAppendsSince(spark, t, 2L).count()
    }
    // re-baselined on the compacted snapshot, appends flow again
    Snapshot.append(batch(30, 33), t) // v5
    assert(Snapshot.readAppendsSince(spark, t, 4L).count() == 3)
  }

  test("clustered compaction restores the data skipping that " +
    "interleaved appends destroyed; plain compaction cannot") {
    val t = freshTable()
    // four interleaved appends: every file spans the whole key range,
    // so the stats index can prune nothing
    (0 until 4).foreach(k => Snapshot.append(
      batch(0, 400).filter(col("id") % 4 === k).coalesce(1), t,
      statsCols = Seq("id")))
    val (t0, k0) = Snapshot.pruneCount(spark, t, "id", 100L, 120L)
    assert(k0 == t0, "interleaved appends should admit no pruning")
    val bytes = Snapshot.readManifest(spark, t, 4L).get
      .files.map(_.bytes).sum
    val target = math.max(1L, bytes / 4)
    // control: a plain compaction keeps the interleaving
    Snapshot.compact(spark, t, target)
    val (t1, k1) = Snapshot.pruneCount(spark, t, "id", 100L, 120L)
    assert(k1 == t1, "plain compaction cannot create locality")
    // the maintenance pass: range-clustered rewrite on the key
    Snapshot.compactClustered(spark, t, Seq("id"), target)
    val (t2, k2) = Snapshot.pruneCount(spark, t, "id", 100L, 120L)
    assert(t2 > 1, s"need multiple output files for the contrast: $t2")
    assert(k2 < t2,
      s"clustered compaction did not restore pruning: kept $k2 of $t2")
    // and it is still a value-preserving compaction
    assert(Snapshot.readWhere(spark, t, "id", 100L, 120L).count() == 21)
    assert(Snapshot.read(spark, t).count() == 400)
  }

  test("readAsOf: time travel by commit timestamp; pre-window times " +
    "fail loudly") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t) // v1
    val at1 = Snapshot.readManifest(spark, t, 1L).get.atMicros
    assert(at1 > 0L, "commit was not timestamped")
    Snapshot.append(batch(10, 30), t) // v2
    val at2 = Snapshot.readManifest(spark, t, 2L).get.atMicros
    assert(at2 >= at1)
    assert(Snapshot.readAsOf(spark, t, at1).count() == 10)
    assert(Snapshot.readAsOf(spark, t, at2).count() == 30)
    assert(Snapshot.readAsOf(spark, t, at2 + 1000000L).count() == 30)
    intercept[NoSuchElementException] {
      Snapshot.readAsOf(spark, t, at1 - 1L)
    }
  }

  test("additive schema evolution: a commit may introduce columns; " +
    "earlier rows read them as null") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    Snapshot.append(
      (10 until 20).map(i => (i.toLong, s"doc $i", s"en"))
        .toDF("id", "text", "lang"), t)
    val cur = Snapshot.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "text", "lang"))
    assert(cur.count() == 20)
    assert(cur.filter(col("lang").isNull).count() == 10,
      "pre-evolution rows must read the new column as null")
    assert(cur.filter(col("lang") === "en").count() == 10)
    // and the evolved table still compacts (one rewrite, one schema)
    Snapshot.compact(spark, t)
    assert(Snapshot.read(spark, t).count() == 20)
  }

  test("layout mismatch is loud at APPEND time, not a silent " +
    "read-side null-fill") {
    val t = freshTable()
    Snapshot.appendPartitioned(
      (0 until 10).map(i => (i.toLong, s"doc $i", "en"))
        .toDF("id", "text", "lang"), t, Seq("lang"))
    intercept[IllegalArgumentException] {
      Snapshot.append(batch(10, 20), t) // unpartitioned into partitioned
    }
    val t2 = freshTable()
    Snapshot.append(batch(0, 10), t2)
    intercept[IllegalArgumentException] {
      Snapshot.appendPartitioned(
        (10 until 20).map(i => (i.toLong, s"doc $i", "en"))
          .toDF("id", "text", "lang"), t2, Seq("lang"))
    }
  }

  test("expireOlderThan: time-based retention drops pre-cutoff " +
    "manifests but never empties a quiet table") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)  // v1
    Snapshot.append(batch(10, 20), t) // v2
    val at2 = Snapshot.readManifest(spark, t, 2L).get.atMicros
    Snapshot.append(batch(20, 30), t) // v3
    val (dropped, _) = Snapshot.expireOlderThan(spark, t, at2, graceMicros = 0L)
    assert(dropped == 1, s"expected v1 dropped, got $dropped")
    intercept[NoSuchElementException] { Snapshot.read(spark, t, Some(1L)) }
    assert(Snapshot.read(spark, t, Some(2L)).count() == 20)
    assert(Snapshot.read(spark, t).count() == 30)
    // a cutoff in the future keeps minKeepLast, never zero
    val (dropped2, _) = Snapshot.expireOlderThan(spark, t,
      Long.MaxValue, minKeepLast = 1)
    assert(dropped2 == 1) // v2 dropped, v3 kept
    assert(Snapshot.read(spark, t).count() == 30)
  }

  test("manifest splitting: appends write O(new) metadata — carried " +
    "groups are reused by content hash, never rewritten") {
    val t = freshTable()
    (0 until 5).foreach(k => Snapshot.append(batch(k * 10, k * 10 + 10), t))
    def groupFiles() = new java.io.File(s"$t/_snapshots").listFiles()
      .map(_.getName).filter(_.startsWith("g-")).toSet
    val after5 = groupFiles()
    // one group per commit: 5 commits -> 5 group files, NOT 1+2+3+4+5
    // (a per-version copy of the full list would betray O(table) work)
    assert(after5.size == 5,
      s"expected 5 content-addressed groups, got ${after5.size}")
    // the sixth append adds exactly ONE group; the carried five reuse
    Snapshot.append(batch(50, 60), t)
    val after6 = groupFiles()
    assert(after6.size == 6 && after5.subsetOf(after6),
      "append rewrote carried groups instead of reusing them")
    assert(Snapshot.read(spark, t).count() == 60)
    // expire sweeps the groups only dropped manifests referenced
    Snapshot.compact(spark, t) // v7: one fresh group
    Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    val afterExpire = groupFiles()
    assert(afterExpire.size == 1,
      s"expire left ${afterExpire.size} groups for a 1-group manifest")
    assert(Snapshot.read(spark, t).count() == 60)
  }

  test("legacy inline-files manifests still load") {
    val t = freshTable()
    Snapshot.append(batch(0, 7), t)
    // rewrite v1 in the pre-split inline format by hand
    val m = Snapshot.readManifest(spark, t, 1L).get
    val inline = new StringBuilder
    inline ++= s"""{"version":1,"parent":0,"action":"append","rows":7,"""
    inline ++= s""""tag":"","atMicros":${m.atMicros},"files":["""
    inline ++= m.files.map(f =>
      s"""{"path":"${f.path}","bytes":${f.bytes}}""").mkString(",")
    inline ++= "]}"
    val p = java.nio.file.Paths.get(
      s"$t/_snapshots/v${"%012d".format(1)}.json")
    java.nio.file.Files.delete(p)
    java.nio.file.Files.write(p, inline.toString.getBytes("UTF-8"))
    val loaded = Snapshot.readManifest(spark, t, 1L).get
    assert(loaded.files.map(_.path) == m.files.map(_.path))
    assert(Snapshot.read(spark, t).count() == 7)
  }

  test("footer stats across physical types: dates prune with string " +
    "and java.sql.Date bounds; NaN floats stay conservatively " +
    "stat-less; exactness never depends on stats") {
    // dates: INT32 epoch-day footers -> yyyy-MM-dd reprs
    val t = freshTable()
    def dayBatch(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, java.sql.Date.valueOf(
          java.time.LocalDate.of(2026, 1, 1).plusDays(i.toLong))))
        .toDF("id", "day")
    (0 until 4).foreach(k =>
      Snapshot.append(dayBatch(k * 30, k * 30 + 30).coalesce(1), t,
        statsCols = Seq("day")))
    val (total, kept) = Snapshot.pruneCount(spark, t, "day",
      "2026-02-01", "2026-02-10")
    assert(total == 4 && kept == 1,
      s"date pruning failed: kept $kept of $total")
    val viaString = Snapshot.readWhere(spark, t, "day",
      "2026-02-01", "2026-02-10")
    assert(viaString.count() == 10)
    val viaDate = Snapshot.readWhere(spark, t, "day",
      java.sql.Date.valueOf("2026-02-01"),
      java.sql.Date.valueOf("2026-02-10"))
    assert(viaDate.count() == 10)

    // doubles: FLOAT/DOUBLE footers; a NaN-carrying file must stay
    // stat-less (parquet float stats are unreliable under NaN) and
    // therefore always planned — exactness over eagerness
    val t2 = freshTable()
    Snapshot.append(Seq((1L, 0.5), (2L, 1.5)).toDF("id", "x")
      .coalesce(1), t2, statsCols = Seq("x"))
    Snapshot.append(Seq((3L, 10.5), (4L, 11.5)).toDF("id", "x")
      .coalesce(1), t2, statsCols = Seq("x"))
    Snapshot.append(Seq((5L, 100.5), (6L, Double.NaN)).toDF("id", "x")
      .coalesce(1), t2, statsCols = Seq("x"))
    val (t2total, t2kept) = Snapshot.pruneCount(spark, t2, "x", 0.0, 2.0)
    assert(t2total == 3 && t2kept <= 2,
      s"double pruning failed: kept $t2kept of $t2total")
    assert(t2kept >= 1, "the in-range file must be kept")
    assert(Snapshot.readWhere(spark, t2, "x", 0.0, 2.0).count() == 2)
    // the NaN hazard: parquet float stats may silently IGNORE NaN
    // values (the file's recorded max can be 100.5 while a NaN row
    // sits beside it), so a range delete covering the file's recorded
    // range must REWRITE, never wholesale-drop — the NaN row matches
    // no range predicate and has to survive
    val v = Snapshot.deleteRange(spark, t2, "x", 100.0, 101.0)
    assert(Snapshot.readManifest(spark, t2, v).get.rows == 5L)
    val left = Snapshot.read(spark, t2).collect()
    assert(left.count(r => r.getDouble(1).isNaN) == 1,
      "the NaN row did not survive a covering range delete")
    assert(!left.map(_.getDouble(1)).contains(100.5))
    // NaN is rejected as a bound outright
    intercept[IllegalArgumentException] {
      Snapshot.readWhere(spark, t2, "x", Double.NaN, 1.0).count()
    }

    // timestamps: stats presence depends on the session's parquet
    // timestamp physical type (INT96 writes no usable stats; INT64
    // micros/millis do) — pin whichever this session produces, and
    // exactness regardless
    val t3 = freshTable()
    def tsBatch(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2026, 3, 1, 0, 0)
            .plusMinutes(i.toLong))))
        .toDF("id", "at")
    (0 until 3).foreach(k =>
      Snapshot.append(tsBatch(k * 60, k * 60 + 60).coalesce(1), t3,
        statsCols = Seq("at")))
    val hasTsStats = Snapshot.readManifest(spark, t3, 1L).get
      .files.head.stats.contains("at")
    val lo = java.sql.Timestamp.valueOf("2026-03-01 01:00:00")
    val hi = java.sql.Timestamp.valueOf("2026-03-01 01:59:00")
    val (t3total, t3kept) = Snapshot.pruneCount(spark, t3, "at", lo, hi)
    if (hasTsStats)
      assert(t3kept == 1, s"timestamp pruning failed: $t3kept/$t3total")
    else
      assert(t3kept == t3total, "stat-less files must all be kept")
    assert(Snapshot.readWhere(spark, t3, "at", lo, hi).count() == 60)
  }

  test("compaction commits ACROSS a mid-flight append, carrying the " +
    "appended file forward (maintenance never starves under a " +
    "steady append stream)") {
    val t = freshTable()
    Snapshot.append(batch(0, 40), t)  // v1
    Snapshot.append(batch(40, 80), t) // v2
    // a streaming append lands BETWEEN the compaction's rewrite and
    // its commit attempt (the test seam fires once at CAS entry)
    Snapshot.onCommitAttempt =
      () => Snapshot.append(batch(200, 220), t) // v3
    val v = Snapshot.compact(spark, t)          // v4, NOT an abort
    assert(v == 4L)
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.action == "compact" && m.rows == 100L)
    // the interleaved append's file rides the compacted manifest BY
    // REFERENCE (same path + seq as its own commit staged it)
    val appended = Snapshot.readManifest(spark, t, 3L).get.files
      .filterNot(Snapshot.readManifest(spark, t, 2L).get.files.toSet)
    assert(appended.nonEmpty &&
      appended.forall(m.files.contains),
      "interleaved append's files were not carried forward")
    // rows exact, values exact, time travel intact
    assert(Snapshot.read(spark, t).agg(sum("id")).head().getLong(0) ==
      (0L until 80L).sum + (200L until 220L).sum)
    assert(Snapshot.read(spark, t, Some(2L)).count() == 80L)
    assert(Snapshot.read(spark, t, Some(3L)).count() == 100L)
  }

  test("rewrite commits retry across DISJOINTNESS-PROVEN appends and " +
    "abort loudly on genuine conflicts") {
    // merge: an interleaved append outside the source key envelope
    // carries forward; one that might contain a merge key aborts
    val t = freshTable()
    def keyed(from: Int, until: Int) =
      (from until until).map(i => (i.toLong, s"v$i")).toDF("id", "text")
    Snapshot.append(keyed(0, 100), t, statsCols = Seq("id"))
    val source = (0 until 10).map(i => (i.toLong, "UPDATED"))
      .toDF("id", "text")
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(1000, 1020).coalesce(1), t,
        statsCols = Seq("id"))
    val v = Snapshot.merge(source, t, "id")
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.action == "merge" && m.rows == 120L)
    val r = Snapshot.read(spark, t)
    assert(r.count() == 120L)
    assert(r.filter(col("text") === "UPDATED").count() == 10L)
    assert(r.filter(col("id") >= 1000L).count() == 20L)
    // conflicting append (overlapping keys) → loud abort
    val t2 = freshTable()
    Snapshot.append(keyed(0, 100), t2, statsCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(5, 8).coalesce(1), t2,
        statsCols = Seq("id"))
    val e = intercept[IllegalStateException] {
      Snapshot.merge(source, t2, "id")
    }
    assert(e.getMessage.contains("CONFLICTING"))

    // mergeMor: same rule, zero-rewrite path
    val t3 = freshTable()
    Snapshot.append(keyed(0, 100), t3, statsCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(1000, 1020).coalesce(1), t3,
        statsCols = Seq("id"))
    val v3 = Snapshot.mergeMor(source, t3, "id")
    assert(Snapshot.readManifest(spark, t3, v3).get.rows == 120L)
    assert(Snapshot.read(spark, t3).count() == 120L)

    // deleteRange: append provably OUTSIDE the range carries forward
    val t4 = freshTable()
    Snapshot.append(keyed(0, 100), t4, statsCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(1000, 1020).coalesce(1), t4,
        statsCols = Seq("id"))
    Snapshot.deleteRange(spark, t4, "id", 10L, 19L)
    assert(Snapshot.read(spark, t4).count() == 110L)
    assert(Snapshot.read(spark, t4)
      .filter(col("id").between(10L, 19L)).count() == 0L)

    // deleteKeysMor: disjoint append carries; accounting exact
    val t5 = freshTable()
    Snapshot.append(keyed(0, 100), t5, statsCols = Seq("id"),
      bloomCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(1000, 1020).coalesce(1), t5,
        statsCols = Seq("id"), bloomCols = Seq("id"))
    val v5 = Snapshot.deleteKeysMor(
      Seq(3L, 7L).toDF("id"), t5)
    assert(Snapshot.readManifest(spark, t5, v5).get.rows == 118L)
    assert(Snapshot.read(spark, t5).count() == 118L)

    // deleteWhere proves nothing about appended rows: ANY
    // interleaved append aborts
    val t6 = freshTable()
    Snapshot.append(keyed(0, 100), t6, statsCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.append(keyed(1000, 1020).coalesce(1), t6,
        statsCols = Seq("id"))
    val e6 = intercept[IllegalStateException] {
      Snapshot.deleteWhere(spark, t6, col("text") === "v5")
    }
    assert(e6.getMessage.contains("CONFLICTING"))

    // an interleaved REWRITE is always a genuine conflict
    val t7 = freshTable()
    Snapshot.append(keyed(0, 100), t7, statsCols = Seq("id"))
    Snapshot.append(keyed(100, 140), t7, statsCols = Seq("id"))
    Snapshot.onCommitAttempt = () =>
      Snapshot.deleteKeysMor(Seq(5L).toDF("id"), t7)
    val e7 = intercept[IllegalStateException] {
      Snapshot.compact(spark, t7)
    }
    assert(e7.getMessage.contains("CONFLICTING"))
  }

  private def forgeStamp(t: String, v: Long, micros: Long): Unit = {
    val p = java.nio.file.Paths.get(
      f"$t/_snapshots/v$v%012d.json")
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val forged = body.replaceAll(
      "\"atMicros\"\\s*:\\s*\\d+", s""""atMicros" : $micros""")
    assert(forged != body, s"stamp forge matched nothing in v$v")
    java.nio.file.Files.write(p, forged.getBytes("UTF-8"))
  }

  test("expireOlderThan selects the keep set by stamp, surviving the " +
    "clock skew readAsOf tolerates") {
    val t = freshTable()
    (0 until 3).foreach(k => Snapshot.append(batch(k * 10, k * 10 + 10), t))
    // stamps 100, 50, 200: v2's clock ran behind v1's
    forgeStamp(t, 1L, 100L); forgeStamp(t, 2L, 50L); forgeStamp(t, 3L, 200L)
    // cutoff 90: v1 is stamped AT/AFTER the cutoff, so nothing may
    // expire (keeping skewed-early v2 errs retentive, never lossy) —
    // the old count-the-recent spelling dropped v1 here
    val (d1, _) = Snapshot.expireOlderThan(spark, t, 90L, graceMicros = 0L)
    assert(d1 == 0, s"skewed expire dropped $d1 manifests at cutoff 90")
    assert(Snapshot.read(spark, t, Some(1L)).count() == 10)
    // cutoff 150: only v3 clears the stamp; v1 and v2 both expire
    val (d2, _) = Snapshot.expireOlderThan(spark, t, 150L, graceMicros = 0L)
    assert(d2 == 2)
    assert(Snapshot.read(spark, t).count() == 30)
  }

  test("string partition values with Hive-escaped chars prune " +
    "correctly (no silent row loss)") {
    val t = freshTable()
    // ':' is %3A in the partition dir name; stats must record 'a:b'
    Snapshot.appendPartitioned(
      Seq((1L, "x", "a:b"), (2L, "y", "plain"))
        .toDF("id", "text", "lang"), t, Seq("lang"),
      statsCols = Seq("lang"))
    val hit = Snapshot.readWhere(spark, t, "lang", "a:b", "a:b")
    assert(hit.count() == 1, "escaped partition value was pruned away")
    assert(hit.head().getAs[Long]("id") == 1L)
    // and the stats themselves carry the unescaped value
    val m = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    val langStats = m.files.flatMap(_.stats.get("lang")).map(_.min)
    assert(langStats.contains("a:b"),
      s"partition stats kept the escaped spelling: $langStats")
  }

  test("a -0.0 stats bound does not prune rows a [0.0, x] readWhere " +
    "matches") {
    val t = freshTable()
    // one file whose double max is -0.0: footer stats say max=-0.0,
    // but BETWEEN 0.0 AND 1.0 matches the -0.0 row (SQL equates them)
    Snapshot.append(
      Seq((1L, -5.0), (2L, -0.0)).toDF("id", "score").coalesce(1), t,
      statsCols = Seq("score"))
    val hit = Snapshot.readWhere(spark, t, "score", 0.0, 1.0)
    assert(hit.count() == 1,
      "-0.0 max pruned the file a zero-bound range matches")
    assert(hit.head().getAs[Long]("id") == 2L)
    // and the mirrored delete classification does not leave the row
    Snapshot.deleteRange(spark, t, "score", 0.0, 1.0)
    assert(Snapshot.read(spark, t).count() == 1)
    assert(Snapshot.read(spark, t).head().getAs[Long]("id") == 1L)
  }

  test("deleteRangeMor commits ZERO data writes: overlapping files " +
    "stay, the residual applies at read, time travel still sees " +
    "the dead rows") {
    val t = freshTable()
    // two files straddling the range boundary: neither is wholesale
    Snapshot.append(batch(0, 50).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.append(batch(50, 100).coalesce(1), t, statsCols = Seq("id"))
    val pre = Snapshot.readManifest(spark, t, 2L).get
    val v = Snapshot.deleteRangeMor(spark, t, "id", 30L, 70L)
    val post = Snapshot.readManifest(spark, t, v).get
    assert(post.action == "delete-mor")
    assert(post.files.map(_.path).toSet == pre.files.map(_.path).toSet,
      "merge-on-read delete touched the data file set")
    assert(post.rangeDeletes.nonEmpty && post.rows == 100L - 41L)
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 59L)
    assert(cur.filter(col("id") >= 30 && col("id") <= 70).count() == 0)
    // a pinned pre-delete read still sees every row (snapshot isolation)
    assert(Snapshot.read(spark, t, Some(2L)).count() == 100)
    // stats-selective reads apply the residual too
    assert(Snapshot.readWhere(spark, t, "id", 25L, 35L).count() == 5)
  }

  test("deleteRangeMor: a provably-contained file still drops " +
    "WHOLESALE (manifest surgery), no residual recorded") {
    val t = freshTable()
    (0 until 4).foreach(k => Snapshot.append(
      batch(k * 25, k * 25 + 25).coalesce(1), t, statsCols = Seq("id")))
    val v = Snapshot.deleteRangeMor(spark, t, "id", 25L, 49L)
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.files.size == 3, "contained file was not dropped")
    assert(m.rangeDeletes.isEmpty,
      "wholesale-only delete recorded a needless residual")
    assert(m.rows == 75L && Snapshot.read(spark, t).count() == 75)
  }

  test("rows appended AFTER a merge-on-read delete are never " +
    "retro-deleted (the sequence rule)") {
    val t = freshTable()
    Snapshot.append(batch(0, 50).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.deleteRangeMor(spark, t, "id", 10L, 60L)
    assert(Snapshot.read(spark, t).count() == 10)
    // re-insert ids inside the deleted range: they must survive
    Snapshot.append(batch(20, 30).coalesce(1), t, statsCols = Seq("id"))
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 20,
      s"re-inserted rows were retro-deleted: ${cur.count()}")
    assert(cur.filter(col("id") >= 20 && col("id") < 30).count() == 10)
  }

  test("compaction folds pending merge-on-read deletes into clean " +
    "data files; time travel across the fold still works") {
    val t = freshTable()
    Snapshot.append(batch(0, 50).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.append(batch(50, 100).coalesce(1), t, statsCols = Seq("id"))
    val vDel = Snapshot.deleteRangeMor(spark, t, "id", 30L, 70L)
    val vC = Snapshot.compact(spark, t)
    val m = Snapshot.readManifest(spark, t, vC).get
    assert(!m.hasDeletes, "compaction carried pending deletes forward")
    assert(m.rows == 59L && Snapshot.read(spark, t).count() == 59)
    // pre-fold and pre-delete states both remain readable
    assert(Snapshot.read(spark, t, Some(vDel)).count() == 59)
    assert(Snapshot.read(spark, t, Some(vDel - 1)).count() == 100)
  }

  test("deleteKeysMor: equality-delete file, zero data writes; " +
    "merge and CoW delete respect pending key deletes; expire keeps " +
    "the key file while referenced") {
    val t = freshTable()
    Snapshot.append(batch(0, 40).coalesce(1), t, statsCols = Seq("id"))
    val pre = Snapshot.readManifest(spark, t, 1L).get
    val dead = Seq(3L, 7L, 11L).toDF("id")
    val v = Snapshot.deleteKeysMor(dead, t)
    val post = Snapshot.readManifest(spark, t, v).get
    assert(post.action == "delete-mor" && post.eqDeletes.size == 1)
    assert(post.files.map(_.path) == pre.files.map(_.path))
    assert(post.rows == 37L)
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 37)
    assert(cur.filter(col("id").isin(3L, 7L, 11L)).count() == 0)
    // an unmatched key frame is a no-op commit
    assert(Snapshot.deleteKeysMor(Seq(999L).toDF("id"), t) == v)
    // merge on top of a pending key delete: upsert id 5, insert 100
    Snapshot.merge(Seq((5L, "edited"), (100L, "new"))
      .toDF("id", "text"), t, "id")
    val merged = Snapshot.read(spark, t)
    assert(merged.count() == 38)
    assert(merged.filter(col("id") === 3L).count() == 0,
      "merge rewrite resurrected a key-deleted row")
    assert(merged.filter(col("id") === 5L)
      .head().getAs[String]("text") == "edited")
    // expire with everything referenced: the key file must survive
    Snapshot.expire(spark, t, keepLast = 3, graceMicros = 0L)
    assert(Snapshot.read(spark, t).count() == 38)
    // compact folds; after expire to the clean snapshot the key dir
    // is unreferenced and sweeps
    Snapshot.compact(spark, t)
    Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    val leftoverKeys = {
      val root = java.nio.file.Paths.get(s"$t/deletes")
      if (!java.nio.file.Files.exists(root)) Nil
      else {
        val st = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
            .toList
        } finally st.close()
      }
    }
    assert(leftoverKeys.isEmpty,
      s"expired equality-delete files were not swept: $leftoverKeys")
    assert(Snapshot.read(spark, t).count() == 38)
  }

  test("readChangesSince rides through rewrites: append-only fast " +
    "path, empty diff across compaction, inserts+deletes across a " +
    "merge") {
    val t = freshTable()
    Snapshot.append(batch(0, 20), t)                      // v1
    Snapshot.append(batch(20, 30), t)                     // v2
    // append-only interval: the manifest file-diff path, all inserts
    val fast = Snapshot.readChangesSince(spark, t, 1L)
    assert(fast.filter(col("_change") === "insert").count() == 10)
    assert(fast.count() == 10)
    // a value-preserving compaction nets to ZERO changes
    Snapshot.compact(spark, t)                            // v3
    assert(Snapshot.readChangesSince(spark, t, 2L).count() == 0,
      "compaction churned the row-level CDC")
    // and readAppendsSince still throws on the same interval (the
    // strict file-identity contract is unchanged)
    intercept[IllegalStateException] {
      Snapshot.readAppendsSince(spark, t, 2L)
    }
    // merge: edit id 5, insert id 100 — the diff is exactly the
    // replaced row (delete+insert) and the fresh row (insert)
    Snapshot.merge(Seq((5L, "edited"), (100L, "new"))
      .toDF("id", "text"), t, "id")                       // v4
    val d = Snapshot.readChangesSince(spark, t, 2L)
    assert(d.count() == 3)
    assert(d.filter(col("_change") === "delete")
      .head().getAs[Long]("id") == 5L)
    assert(d.filter(col("_change") === "insert" && col("id") === 5L)
      .head().getAs[String]("text") == "edited")
    assert(d.filter(col("_change") === "insert" && col("id") === 100L)
      .count() == 1)
    // duplicate-row multisets diff by COUNT: appending a second copy
    // of an existing row is one insert, not zero
    Snapshot.append(batch(7, 8), t)                       // v5: dup id 7
    Snapshot.compact(spark, t)                            // v6: rewrite
    val dup = Snapshot.readChangesSince(spark, t, 4L)
    assert(dup.count() == 1 &&
      dup.head().getAs[String]("_change") == "insert" &&
      dup.head().getAs[Long]("id") == 7L,
      "multiset CDC lost a duplicate-row insert across compaction")
  }

  test("renameColumn is metadata-only; old files read under the new " +
    "name; the rename survives compaction; reusing the old name is " +
    "a fresh column") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    val pre = Snapshot.readManifest(spark, t, 1L).get.files.map(_.path)
    val v = Snapshot.renameColumn(spark, t, "text", "body")
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.action == "schema" && m.files.map(_.path) == pre,
      "rename touched data files")
    val cur = Snapshot.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "body"))
    assert(cur.filter(col("body") === "doc 3").count() == 1)
    // validation is loud
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, t, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, t, "id", "body")
    }
    // an append carrying the CURRENT schema, then compaction folds
    Snapshot.append(Seq((100L, "new doc")).toDF("id", "body"), t)
    Snapshot.compact(spark, t)
    val folded = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(folded.schemaChanges.isEmpty,
      "compaction carried schema changes forward")
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "body"))
    assert(Snapshot.read(spark, t).count() == 11)
    // reusing the retired name afterwards is a genuinely new column
    Snapshot.append(Seq((200L, "b", "resurrected"))
      .toDF("id", "body", "text"), t)
    val wide = Snapshot.read(spark, t)
    assert(wide.columns.toSet == Set("id", "body", "text"))
    assert(wide.filter(col("text").isNotNull).count() == 1)
  }

  test("widenColumn: old int/float files read as long/double; " +
    "compaction folds the cast") {
    val t = freshTable()
    Snapshot.append((0 until 10).map(i => (i, i.toFloat / 2))
      .toDF("n", "x"), t)
    intercept[IllegalArgumentException] {
      Snapshot.widenColumn(spark, t, "x", "long") // float -> long: lossy
    }
    Snapshot.widenColumn(spark, t, "n", "long")
    Snapshot.widenColumn(spark, t, "x", "double")
    val cur = Snapshot.read(spark, t)
    assert(cur.schema("n").dataType == LongType)
    assert(cur.schema("x").dataType == DoubleType)
    assert(cur.agg(sum("n")).head().getLong(0) == 45L)
    // post-widen appends write the wide type; the union holds
    Snapshot.append(Seq((100L, 2.5d)).toDF("n", "x"), t)
    assert(Snapshot.read(spark, t).agg(sum("n")).head().getLong(0) == 145L)
    Snapshot.compact(spark, t)
    val folded = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(folded.schemaChanges.isEmpty)
    assert(Snapshot.read(spark, t).schema("n").dataType == LongType)
    assert(Snapshot.read(spark, t).count() == 11)
  }

  test("dropColumn hides the column at read and compaction makes the " +
    "removal physical; rename rekeys pending MoR delete entries") {
    val t = freshTable()
    Snapshot.append(batch(0, 20), t, statsCols = Seq("id"))
    // a pending MoR range delete, then a rename of the SAME column:
    // the delete entry must follow the name
    Snapshot.deleteRangeMor(spark, t, "id", 5L, 8L)
    Snapshot.renameColumn(spark, t, "id", "key")
    val m = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(m.rangeDeletes.forall(_.column == "key"),
      "rename left a pending delete keyed on the old name")
    val cur = Snapshot.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "text"))
    assert(cur.count() == 16)
    assert(cur.filter(col("key") === 6L).count() == 0)
    // drop the text column; reads lose it, compaction folds
    Snapshot.dropColumn(spark, t, "text")
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("key"))
    Snapshot.compact(spark, t)
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("key"))
    assert(Snapshot.read(spark, t).count() == 16)
    // the only-column guard is loud
    intercept[IllegalArgumentException] {
      Snapshot.dropColumn(spark, t, "key")
    }
  }

  test("readChangesBetween: a bounded historical window diffs " +
    "without racing live commits") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)   // v1
    Snapshot.append(batch(10, 20), t)  // v2
    Snapshot.compact(spark, t)         // v3
    Snapshot.append(batch(20, 30), t)  // v4
    // append-only bounded window (1,2]: file-diff fast path
    val w12 = Snapshot.readChangesBetween(spark, t, 1L, 2L)
    assert(w12.count() == 10 &&
      w12.filter(col("_change") =!= "insert").count() == 0)
    // window (2,3] spans only the compaction: empty multiset diff
    assert(Snapshot.readChangesBetween(spark, t, 2L, 3L).count() == 0)
    // window (1,4] spans the rewrite: net = the 20 appended rows
    val w14 = Snapshot.readChangesBetween(spark, t, 1L, 4L)
    assert(w14.count() == 20)
    intercept[IllegalArgumentException] {
      Snapshot.readChangesBetween(spark, t, 3L, 1L)
    }
  }

  test("metadata tables: filesTable exposes stats and seq, " +
    "historyTable exposes the commit chain with pending-work counts") {
    val t = freshTable()
    Snapshot.append(batch(0, 10).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.append(batch(10, 30).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.deleteRangeMor(spark, t, "id", 5L, 12L) // v3: residual
    val files = Snapshot.filesTable(spark, t)
    assert(files.count() == 2)
    val r = files.orderBy(col("seq")).collect()
    assert(r(0).getAs[Long]("seq") == 1L &&
      r(0).getAs[String]("stats_id_min") == "0" &&
      r(0).getAs[String]("stats_id_max") == "9" &&
      r(0).getAs[Long]("stats_id_nulls") == 0L)
    assert(r(1).getAs[Long]("seq") == 2L)
    val hist = Snapshot.historyTable(spark, t).orderBy(col("version"))
      .collect()
    assert(hist.map(_.getAs[String]("action")).toSeq ==
      Seq("append", "append", "delete-mor"))
    assert(hist(2).getAs[Long]("rows") == 22L &&
      hist(2).getAs[Long]("pending_deletes") == 1L)
    Snapshot.compact(spark, t)
    val folded = Snapshot.historyTable(spark, t)
      .orderBy(col("version").desc).head()
    assert(folded.getAs[String]("action") == "compact" &&
      folded.getAs[Long]("pending_deletes") == 0L)
  }

  test("merge-on-read deletes compose with PARTITIONED snapshots: " +
    "residual reads keep partition pruning") {
    val t = freshTable()
    def facet(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de"))
        .toDF("id", "text", "lang")
    Snapshot.appendPartitioned(facet(0, 40), t, Seq("lang"),
      statsCols = Seq("id"))
    Snapshot.appendPartitioned(facet(40, 60), t, Seq("lang"),
      statsCols = Seq("id"))
    val v = Snapshot.deleteRangeMor(spark, t, "id", 10L, 49L)
    assert(Snapshot.readManifest(spark, t, v).get.action == "delete-mor")
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 20)
    assert(cur.filter(col("id") >= 10 && col("id") <= 49).count() == 0)
    // a facet filter on the MoR-filtered read still partition-prunes
    val en = cur.filter(col("lang") === "en")
    assert(en.count() == 10)
    assert(Layout.isPartitionPruned(en),
      "MoR residual broke partition pruning:\n" +
        en.queryExecution.executedPlan)
    // and the fold keeps both the rows and the layout
    Snapshot.compact(spark, t)
    val post = Snapshot.read(spark, t)
    assert(post.count() == 20)
    assert(Layout.isPartitionPruned(post.filter(col("lang") === "de")))
  }

  test("consumeChanges: durable baseline, at-least-once replay, " +
    "rides through rewrites") {
    val t = freshTable()
    val state = Files.createTempDirectory("graft-consumer").toString
    Snapshot.append(batch(0, 10), t) // v1
    var seen = Seq.empty[(String, Long)]
    def collectInto(df: org.apache.spark.sql.DataFrame): Unit =
      seen = df.select(col("_change"), col("id")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    // first poll: the whole snapshot as inserts
    val w1 = Snapshot.consumeChanges(spark, t, state)(collectInto)
    assert(w1.contains((0L, 1L)) && seen.size == 10 &&
      seen.forall(_._1 == "insert"))
    // up to date: handler not invoked
    seen = Nil
    assert(Snapshot.consumeChanges(spark, t, state)(collectInto).isEmpty
      && seen.isEmpty)
    // a crash AFTER the handler but BEFORE the baseline write
    // replays the same window (at-least-once)
    Snapshot.append(batch(10, 15), t) // v2
    intercept[RuntimeException] {
      Snapshot.consumeChanges(spark, t, state) { df =>
        collectInto(df); throw new RuntimeException("crash mid-consume")
      }
    }
    val wReplay = Snapshot.consumeChanges(spark, t, state)(collectInto)
    assert(wReplay.contains((1L, 2L)) &&
      seen.map(_._2).sorted == (10L until 15L).toSeq)
    // a compaction + append window nets to just the appended rows
    Snapshot.compact(spark, t)        // v3
    Snapshot.append(batch(15, 18), t) // v4
    val w3 = Snapshot.consumeChanges(spark, t, state)(collectInto)
    assert(w3.contains((2L, 4L)) &&
      seen.map(_._2).sorted == (15L until 18L).toSeq &&
      seen.forall(_._1 == "insert"))
    // fell behind retention: loud failure, no silent skip
    Snapshot.append(batch(18, 20), t) // v5
    Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    intercept[NoSuchElementException] {
      Snapshot.consumeChanges(spark, t, state)(collectInto)
    }
  }

  test("stats pruning survives a rename: old files' stats resolve " +
    "under the written name; physical-scan ops guard loudly") {
    val t = freshTable()
    (0 until 4).foreach(k => Snapshot.append(
      batch(k * 25, k * 25 + 25).coalesce(1), t, statsCols = Seq("id")))
    Snapshot.renameColumn(spark, t, "id", "key")
    // data skipping binds through the rename — no compaction needed
    val (total, kept) = Snapshot.pruneCount(spark, t, "key", 30L, 40L)
    assert(total == 4 && kept == 1,
      s"rename broke data skipping: kept $kept of $total files")
    assert(Snapshot.readWhere(spark, t, "key", 30L, 40L).count() == 11)
    // a MoR delete on the renamed column still wholesale-drops the
    // provably-contained file via the written-name stats
    val v = Snapshot.deleteRangeMor(spark, t, "key", 25L, 49L)
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.files.size == 3 && m.rangeDeletes.isEmpty)
    assert(Snapshot.read(spark, t).count() == 75)
    // physical-name scans refuse until the rename folds
    intercept[IllegalArgumentException] {
      Snapshot.merge(Seq((1L, "x")).toDF("key", "text"), t, "key")
    }
    intercept[IllegalArgumentException] {
      Snapshot.deleteWhere(spark, t, col("key") === 1L)
    }
    Snapshot.compact(spark, t)
    Snapshot.merge(Seq((1L, "edited")).toDF("key", "text"), t, "key")
    assert(Snapshot.read(spark, t).filter(col("key") === 1L)
      .head().getAs[String]("text") == "edited")
  }

  test("deleteWhereMor: predicate delete lands as an equality key " +
    "file, zero data writes; NULL-key matches refuse loudly") {
    val t = freshTable()
    Snapshot.append(batch(0, 30).coalesce(1), t, statsCols = Seq("id"))
    val pre = Snapshot.readManifest(spark, t, 1L).get.files.map(_.path)
    val v = Snapshot.deleteWhereMor(spark, t,
      col("text").endsWith("7"), "id")
    val m = Snapshot.readManifest(spark, t, v).get
    assert(m.action == "delete-mor" && m.files.map(_.path) == pre &&
      m.eqDeletes.size == 1)
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 27)
    assert(cur.filter(col("id").isin(7L, 17L, 27L)).count() == 0)
    // a later re-insert of a deleted key survives (sequence rule)
    Snapshot.append(Seq((7L, "resurrected")).toDF("id", "text"), t)
    assert(Snapshot.read(spark, t).filter(col("id") === 7L)
      .head().getAs[String]("text") == "resurrected")
    // NULL keys among matches refuse (they would silently survive)
    val t2 = freshTable()
    Snapshot.append(Seq((java.lang.Long.valueOf(1L), "a"),
        (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("id", "text"), t2)
    intercept[IllegalArgumentException] {
      Snapshot.deleteWhereMor(spark, t2, lit(true), "id")
    }
  }

  test("expire grace horizon shields just-written unreferenced files " +
    "from a concurrent sweep") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    // an in-flight commit's staged-but-unclaimed data file
    batch(100, 110).write.parquet(s"$t/data/inflight-commit")
    // default grace: the young orphan survives the sweep
    Snapshot.expire(spark, t, keepLast = 1)
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$t/data/inflight-commit"))
      .iterator().hasNext, "grace horizon failed to shield staged data")
    // grace 0 (no concurrent writers): the orphan sweeps as before
    val (_, removed) = Snapshot.expire(spark, t, keepLast = 1,
      graceMicros = 0L)
    assert(removed > 0)
    assert(Snapshot.read(spark, t).count() == 10)
  }

  test("partition evolution: repartitionTable is metadata-only; old " +
    "and new layouts read as one table; pruning binds on new files; " +
    "compaction folds the whole table into the new layout") {
    val t = freshTable()
    def facet(from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de"))
        .toDF("id", "text", "lang")
    // phase 1: FLAT layout
    Snapshot.append(facet(0, 40), t, statsCols = Seq("id"))   // v1
    val files1 = Snapshot.readManifest(spark, t, 1L).get.files
      .map(f => (f.path, f.bytes))
    // evolve: declare lang-partitioning — zero files touched
    val v2 = Snapshot.repartitionTable(spark, t, Seq("lang"))
    val m2 = Snapshot.readManifest(spark, t, v2).get
    assert(m2.action == "layout" &&
      m2.files.map(f => (f.path, f.bytes)) == files1)
    // old-layout appends now refuse; new-layout appends land
    intercept[IllegalArgumentException] {
      Snapshot.append(facet(40, 50), t)
    }
    Snapshot.appendPartitioned(facet(40, 60), t, Seq("lang"),
      statsCols = Seq("id"))                                  // v3
    // one table across both layouts
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 60)
    assert(cur.filter(col("lang") === "en").count() == 30)
    // facet filters partition-prune the NEW-layout files (the old
    // flat file still answers through its data column — correct,
    // prunable only after the fold)
    val en = Snapshot.read(spark, t).filter(col("lang") === "en")
    val scans = en.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.exists(
      _.references.exists(_.name == "lang"))),
      "no partition filter bound on the new-layout files:\n" +
        en.queryExecution.executedPlan)
    // compaction folds EVERYTHING into the declared layout
    Snapshot.compact(spark, t)                                // v4
    val folded = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(folded.files.forall(_.path.split('/')
      .exists(_.startsWith("lang="))),
      "compaction did not fold the old files into the new layout")
    val post = Snapshot.read(spark, t)
    assert(post.count() == 60 &&
      post.filter(col("lang") === "de").count() == 30)
    assert(Layout.isPartitionPruned(post.filter(col("lang") === "de")))
    // stats survive the evolution: the id range read stays exact
    assert(Snapshot.readWhere(spark, t, "id", 10L, 19L).count() == 10)
    // repartition back to FLAT is also just metadata
    val v5 = Snapshot.repartitionTable(spark, t, Nil)
    assert(Snapshot.readManifest(spark, t, v5).get.action == "layout")
    Snapshot.append(facet(60, 65), t, statsCols = Seq("id"))  // v6
    assert(Snapshot.read(spark, t).count() == 65)
    // renaming a column that is a partition directory ANYWHERE in
    // the retained files still refuses
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, t, "lang", "language")
    }
    // overwrite honors the declared layout (never silently
    // de-partitions an evolved table)
    Snapshot.repartitionTable(spark, t, Seq("lang"))
    Snapshot.overwrite(facet(0, 20), t)
    val ow = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(ow.files.forall(_.path.split('/')
      .exists(_.startsWith("lang="))),
      "overwrite ignored the declared layout")
    assert(Snapshot.read(spark, t).count() == 20)
  }

  test("chain-walk CDC reads only CHANGED files: a compaction in the " +
    "window contributes zero reads, a MoR delete reads only its " +
    "stats-affected file") {
    val t = freshTable()
    (0 until 6).foreach(k => Snapshot.append(
      batch(k * 100, k * 100 + 100).coalesce(1), t,
      statsCols = Seq("id")))                              // v1..v6
    val v7 = Snapshot.deleteRangeMor(spark, t, "id", 150L, 160L)
    // window (6,7]: only file 2 (range 100-199) can be affected —
    // the differ must read IT alone, not the table
    val w1 = Snapshot.readChangesBetween(spark, t, 6L, v7)
    assert(w1.filter(col("_change") === "delete").count() == 11L &&
      w1.count() == 11L)
    assert(w1.inputFiles.toSet.size == 1,
      s"MoR-delete diff read ${w1.inputFiles.toSet.size} files, " +
        "expected only the affected one")
    Snapshot.compact(spark, t)                             // v8
    Snapshot.append(batch(1000, 1005).coalesce(1), t,
      statsCols = Seq("id"))                               // v9
    // window (6,9]: the compaction REWROTE EVERY FILE but is
    // value-preserving by contract — the chain-walk differ reads
    // none of it; total plan inputs = the delete's affected file +
    // the fresh append file
    val w2 = Snapshot.readChangesBetween(spark, t, 6L, 9L)
    val byChange = w2.groupBy(col("_change")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange("delete") == 11L && byChange("insert") == 5L)
    val read = w2.inputFiles.toSet
    assert(read.size == 2,
      s"diff across a compaction read ${read.size} files " +
        "(expected affected + fresh only):\n" + read.mkString("\n"))
  }

  test("mergeMor: upsert with ZERO matched-file rewrites; compact " +
    "folds; time travel across the fold; CDC reads delete+insert " +
    "per updated row") {
    val t = freshTable()
    Snapshot.append(batch(0, 10).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.append(batch(10, 20).coalesce(1), t, statsCols = Seq("id"))
    val pre = Snapshot.readManifest(spark, t, 2L).get.files
      .map(f => (f.path, f.bytes))
    // updates ids 3 and 12 (one per file), inserts ids 100..102
    val source = Seq((3L, "UPDATED 3"), (12L, "UPDATED 12"),
      (100L, "doc 100"), (101L, "doc 101"), (102L, "doc 102"))
      .toDF("id", "text")
    val v = Snapshot.mergeMor(source, t, "id")
    val m = Snapshot.readManifest(spark, t, v).get
    // every pre-merge file carried byte-identical; only staged added
    assert(m.action == "merge-mor" &&
      m.files.map(f => (f.path, f.bytes)).take(pre.size) == pre &&
      m.files.size > pre.size)
    assert(m.eqDeletes.size == 1 && m.eqDeletes.head.rows == 2L &&
      m.eqDeletes.head.cols == Seq("id"))
    assert(m.rows == 23L)
    val cur = Snapshot.read(spark, t)
    assert(cur.count() == 23)
    assert(cur.filter(col("id") === 3L).select(col("text"))
      .head().getString(0) == "UPDATED 3")
    assert(cur.filter(col("id") === 12L).count() == 1)
    // CDC across the MoR merge: delete+insert per updated row,
    // plain insert per new row
    val w = Snapshot.readChangesBetween(spark, t, 2L, v)
    val byChange = w.groupBy(col("_change")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange("delete") == 2L && byChange("insert") == 5L)
    // fold: compaction rewrites clean, answers unchanged, pending
    // delete cleared; the pre-fold version still time-travels
    val cv = Snapshot.compact(spark, t)
    val folded = Snapshot.readManifest(spark, t, cv).get
    assert(folded.eqDeletes.isEmpty)
    assert(Snapshot.read(spark, t).count() == 23)
    assert(Snapshot.read(spark, t).filter(col("id") === 3L)
      .select(col("text")).head().getString(0) == "UPDATED 3")
    val pinned = Snapshot.read(spark, t, Some(v))
    assert(pinned.count() == 23 &&
      pinned.filter(col("id") === 12L).select(col("text"))
        .head().getString(0) == "UPDATED 12")
    // and the pre-merge snapshot still reads the ORIGINAL rows
    assert(Snapshot.read(spark, t, Some(2L)).filter(col("id") === 3L)
      .select(col("text")).head().getString(0) == "doc 3")
  }

  test("mergeMor: a pure-insert source records NO delete entry; " +
    "duplicate source keys refuse loudly; rows re-inserted after " +
    "an earlier MoR merge are never retro-deleted") {
    val t = freshTable()
    Snapshot.append(batch(0, 10), t)
    // pure inserts: no matched key, so no eq-delete file lands
    val v = Snapshot.mergeMor(batch(50, 55), t, "id")
    assert(Snapshot.readManifest(spark, t, v).get.eqDeletes.isEmpty)
    assert(Snapshot.read(spark, t).count() == 15)
    intercept[IllegalArgumentException] {
      Snapshot.mergeMor(
        Seq((1L, "a"), (1L, "b")).toDF("id", "text"), t, "id")
    }
    // an upsert of id 3, then a LATER append re-inserting id 3: the
    // earlier delete (seq rule) must not reach the newer row
    Snapshot.mergeMor(Seq((3L, "v2")).toDF("id", "text"), t, "id")
    Snapshot.append(Seq((3L, "v3")).toDF("id", "text"), t)
    val texts = Snapshot.read(spark, t).filter(col("id") === 3L)
      .select(col("text")).collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("v2", "v3"))
  }

  test("schema changes inside a CDC window do not churn: a rename or " +
    "widen commit alone diffs EMPTY; later appends net under the " +
    "new names") {
    val t = freshTable()
    val base = (0 until 20).map(i =>
      (i.toLong, i.toFloat / 2, s"doc $i")).toDF("id", "score", "text")
    Snapshot.append(base, t)                             // v1
    Snapshot.renameColumn(spark, t, "text", "body")      // v2
    Snapshot.widenColumn(spark, t, "score", "double")    // v3
    // metadata-only window: the net-change contract demands EMPTY —
    // the base side must map through the rename (no null-keyed churn)
    // and the widen (no '0.1' vs '0.10000000149011612' churn)
    assert(Snapshot.readChangesBetween(spark, t, 1L, 3L).count() == 0,
      "a metadata-only schema window emitted spurious changes")
    // an append after the changes nets exactly its rows, new names
    Snapshot.append((20 until 25).map(i =>
      (i.toLong, i.toDouble / 2, s"doc $i")).toDF("id", "score", "body"),
      t)                                                 // v4
    val w = Snapshot.readChangesBetween(spark, t, 1L, 4L)
    assert(w.columns.contains("body"))
    assert(w.count() == 5 &&
      w.filter(col("_change") === "insert").count() == 5)
    // a compaction folding the changes inside the window still nets
    // the same (the fold clears the pending list; changes are
    // collected from every manifest in the window, not just the last)
    Snapshot.compact(spark, t)                           // v5
    assert(Snapshot.readChangesBetween(spark, t, 1L, 5L).count() == 5)
    // drop inside the window: the dropped column leaves the diff key
    Snapshot.dropColumn(spark, t, "score")               // v6
    assert(Snapshot.readChangesBetween(spark, t, 5L, 6L).count() == 0)
  }

  test("a mass-duplicate fingerprint delta expands CHUNKED, not as " +
    "one giant array") {
    val t = freshTable()
    // 70 001 copies of ONE row: the single-explode spelling would
    // materialize a 70 001-element array in one generator row
    val dup = spark.range(70001L).select(lit(1L).as("id"),
      lit("same").as("text"))
    Snapshot.append(dup, t)                              // v1
    Snapshot.overwrite(batch(5, 6), t)                   // v2: rewrite
    val w = Snapshot.readChangesBetween(spark, t, 1L, 2L)
    val byChange = w.groupBy(col("_change")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange("delete") == 70001L && byChange("insert") == 1L)
  }

  test("filesTable surfaces stats under CURRENT-schema names after " +
    "a rename (old and new files in one column)") {
    val t = freshTable()
    Snapshot.append(batch(0, 10).coalesce(1), t, statsCols = Seq("id"))
    Snapshot.renameColumn(spark, t, "id", "doc_id")      // v2
    Snapshot.append(
      (10 until 30).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .coalesce(1), t, statsCols = Seq("doc_id"))      // v3
    val files = Snapshot.filesTable(spark, t)
    // ONE stats column family, keyed on the current name — the
    // pre-rename file's stats must not hide under stats_id_*
    assert(files.columns.count(_.startsWith("stats_")) == 4,
      files.columns.mkString(","))
    assert(files.columns.contains("stats_doc_id_min"))
    val r = files.orderBy(col("seq")).collect()
    assert(r(0).getAs[String]("stats_doc_id_min") == "0" &&
      r(0).getAs[String]("stats_doc_id_max") == "9")
    assert(r(1).getAs[String]("stats_doc_id_min") == "10" &&
      r(1).getAs[String]("stats_doc_id_max") == "29")
  }

  test("consumeChanges baseline rides Hadoop FS: an explicit " +
    "file:-scheme stateDir reads and advances the same baseline") {
    val t = freshTable()
    val stateLocal = Files.createTempDirectory("graft-consumer-fs")
      .toString
    val stateUri = "file://" + stateLocal
    Snapshot.append(batch(0, 10), t) // v1
    var n = -1L
    Snapshot.consumeChanges(spark, t, stateUri)(df => n = df.count())
    assert(n == 10L)
    // the baseline landed where the scheme says (and is complete)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(stateLocal, "baseline.json")))
    // a second poll through the SCHEME-LESS spelling of the same dir
    // sees the advanced baseline: one state, one FS, no silent re-send
    assert(Snapshot.consumeChanges(spark, t, stateLocal)(df => ())
      .isEmpty)
    Snapshot.append(batch(10, 12), t) // v2
    val w = Snapshot.consumeChanges(spark, t, stateUri)(df =>
      n = df.count())
    assert(w.contains((1L, 2L)) && n == 2L)
  }

  test("branch refs: commits on a branch are invisible to main, " +
    "audit reads see them, fast-forward publish promotes " +
    "metadata-only, diverged main refuses, CDC stays lineage-scoped") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t) // v1 (main)
    Snapshot.createBranch(spark, t, "audit")
    assert(Snapshot.branches(spark, t) ==
      Map("main" -> 1L, "audit" -> 1L))
    // risky data lands on the branch — v2 claims a GLOBAL version
    // number but only the audit ref moves
    val bv = Snapshot.append(batch(100, 120), t, branch = "audit")
    assert(bv == 2L)
    assert(Snapshot.read(spark, t).count() == 50L,
      "branch commit leaked into main reads")
    assert(Snapshot.versions(spark, t).map(_._1) == Seq(1L),
      "branch commit leaked into the main version chain")
    assert(Snapshot.readBranch(spark, t, "audit").count() == 70L)
    // maintenance runs ON the branch too (a compaction commit)
    val cv = Snapshot.compact(spark, t, branch = "audit")
    assert(Snapshot.read(spark, t).count() == 50L)
    assert(Snapshot.readBranch(spark, t, "audit").count() == 70L)
    // publish: fast-forward main onto the audited head; branch ref
    // released; the promoted files are EXACTLY the branch's (no move)
    val branchFiles = Snapshot.readManifest(spark, t, cv).get.files
    val published = Snapshot.publish(spark, t, "audit")
    assert(published == cv)
    assert(Snapshot.branches(spark, t) == Map("main" -> published))
    assert(Snapshot.readManifest(spark, t, published).get.files ==
      branchFiles)
    assert(Snapshot.read(spark, t).count() == 70L)
    assert(Snapshot.read(spark, t).agg(sum("id")).head().getLong(0) ==
      (0L until 50L).sum + (100L until 120L).sum)
    // divergence: main advances while a second branch is audited —
    // publish must refuse rather than drop main's commit
    Snapshot.createBranch(spark, t, "audit2")
    Snapshot.append(batch(200, 210), t, branch = "audit2")
    Snapshot.append(batch(300, 310), t) // main advances
    val e = intercept[IllegalArgumentException] {
      Snapshot.publish(spark, t, "audit2")
    }
    assert(e.getMessage.contains("not an ancestor"))
    // CDC on main sees ONLY main-lineage changes (the branch's
    // version numbers interleave but its rows never appear)
    val mainHead = Snapshot.branches(spark, t)("main")
    val changes = Snapshot.readChangesBetween(spark, t, published,
      mainHead)
    val ids = changes.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (300L until 310L).toSet,
      s"main CDC window leaked branch rows: $ids")
    // audit reads survive expire while the ref exists; dropping the
    // branch releases its manifests to the orphan sweep
    Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    assert(Snapshot.readBranch(spark, t, "audit2").count() == 80L)
    Snapshot.dropBranch(spark, t, "audit2")
    Snapshot.expire(spark, t, keepLast = 1, graceMicros = 0L)
    assert(Snapshot.branches(spark, t) == Map("main" -> mainHead))
    assert(Snapshot.read(spark, t).count() == 80L) // main intact
  }

  test("a months-behind CDC window (30 delta commits) diffs via the " +
    "SEGMENTED chain walk: net equals the endpoint diff, the final " +
    "frame plans only from materialized segment nets") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t) // v1: the consumer's baseline
    var next = 100
    (0 until 28).foreach { _ =>
      Snapshot.append(batch(next, next + 5).coalesce(1), t,
        statsCols = Seq("id"))
      next += 5
    }
    // two merge-on-read deletes complete the 30-delta-commit window:
    // one kills an appended slice (insert+delete must CANCEL across
    // segment boundaries), one kills baseline rows (a net delete)
    Snapshot.deleteRangeMor(spark, t, "id", 100L, 104L)
    Snapshot.deleteKeysMor(Seq(0L, 1L).toDF("id"), t)
    val until = Snapshot.latestVersion(spark, t).get
    assert(until == 31L)
    val changes = Snapshot.readChangesBetween(spark, t, 1L, until)
    val sinceIds = Snapshot.read(spark, t, Some(1L))
      .select("id").collect().map(_.getLong(0)).toSet
    val untilIds = Snapshot.read(spark, t)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = changes.select(col("id"), col("_change")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (untilIds -- sinceIds).map((_, "insert")) ++
      (sinceIds -- untilIds).map((_, "delete"))
    assert(got == want, "segmented chain walk diverged from the " +
      "endpoint diff")
    assert(changes.count() == want.size) // multiset: no double rows
    // rows 100-104 were inserted AND deleted inside the window — the
    // telescoped segment nets must cancel them
    assert(!got.exists(_._1 == 100L))
    // bounded plans: every segment net materialized, so the final
    // frame reads NO table file — its leaves are the checkpointed
    // nets, and Catalyst never saw more than one segment's subtree
    val scans = changes.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"segmented CDC planned ${scans.size} file scans; expected 0")
  }

  test("over-manifest-cap files carry PARQUET FOOTER Bloom filters: " +
    "the manifest refuses the filter (saturation cutoff) but the " +
    "footer prunes row groups for point probes") {
    val t = freshTable()
    // 40k distinct EVEN keys in one file: far past FileBloom.fold's
    // ~12k-key cutoff, so the manifest stores no filter — the regime
    // the footer filter exists for
    val wide = spark.range(40000).select((col("id") * 2).as("k"),
      (col("id") % 97).as("v"))
    Snapshot.append(wide.coalesce(1), t, statsCols = Seq("k"),
      bloomCols = Seq("k"))
    val m = Snapshot.readManifest(spark, t, 1L).get
    assert(m.files.size == 1)
    val entry = m.files.head
    assert(entry.stats("k").bloom.isEmpty,
      "manifest should refuse a saturated filter at this key count")
    // the staged file's FOOTER carries the filter parquet wrote
    // (stage() enabled parquet.bloom.filter.enabled#k): prove the
    // row-group prune decision directly off the footer metadata —
    // an in-range ABSENT key (any odd value) rejects every row
    // group; a present key accepts at least one
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$t/${entry.path}"), conf))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(!blocks.isEmpty)
      var keptPresent = 0
      var keptAbsent = 0
      blocks.forEach { b =>
        var chunk: org.apache.parquet.hadoop.metadata
          .ColumnChunkMetaData = null
        b.getColumns.forEach(c =>
          if (c.getPath.toDotString == "k") chunk = c)
        assert(chunk != null)
        assert(chunk.getBloomFilterOffset >= 0,
          "no footer bloom filter written for k")
        val bf = reader.readBloomFilter(chunk)
        assert(bf != null)
        if (bf.findHash(bf.hash(39999L))) keptAbsent += 1 // odd: absent
        if (bf.findHash(bf.hash(39998L))) keptPresent += 1 // present
      }
      assert(keptAbsent == 0,
        s"footer bloom failed to prune any row group for an absent " +
          s"key ($keptAbsent of ${blocks.size()} kept)")
      assert(keptPresent >= 1,
        "footer bloom wrongly rejected a present key")
    } finally reader.close()
    // end-to-end: the point reads stay exact either way
    assert(Snapshot.readEquals(spark, t, "k", 39998L).count() == 1L)
    assert(Snapshot.readEquals(spark, t, "k", 39999L).count() == 0L)
  }

  test("overwrite preserves the table's bloom coverage (like every " +
    "other rewrite) unless explicitly re-declared") {
    val t = freshTable()
    val d = spark.range(2000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    Snapshot.append(d, t, statsCols = Seq("k"), bloomCols = Seq("k"))
    // replace contents, declaring stats but SAYING NOTHING about
    // blooms: coverage must carry over, not silently vanish
    Snapshot.overwrite(d.filter(col("k") < 1000), t,
      statsCols = Seq("k"))
    val m = Snapshot.readManifest(spark, t,
      Snapshot.latestVersion(spark, t).get).get
    assert(m.action == "overwrite")
    assert(m.files.exists(f =>
      f.stats.get("k").exists(_.bloom.nonEmpty)),
      "overwrite dropped the table's point-lookup pruning")
    // and the preserved filters actually prune a point probe
    val (total, kept) = Snapshot.equalsPruneCount(spark, t, "k", 3L)
    assert(kept <= total)
    assert(Snapshot.readEquals(spark, t, "k", 3L).count() == 1L)
  }

  test("readIn past the bloom probe cap degrades to range-only " +
    "pruning and stays exact") {
    val t = freshTable()
    val d = spark.range(3000).select(col("id").as("k"))
    (0 until 3).foreach { r =>
      Snapshot.append(d.filter(col("k") % 3 === r).coalesce(1), t,
        statsCols = Seq("k"), bloomCols = Seq("k"))
    }
    // 10 001 values: over MaxBloomProbeValues — the bloom layer is
    // skipped (hash work bounded), the residual isin keeps it exact
    val values: Seq[Any] = (0L until 10001L).map(v => v: Any)
    val got = Snapshot.readIn(spark, t, "k", values).count()
    assert(got == 3000L)
    // under the cap, blooms prune: values all ≡ 0 (mod 3) live in
    // one residue file
    val small: Seq[Any] = (0L until 300L).map(v => v * 3: Any)
    assert(Snapshot.readIn(spark, t, "k", small).count() == 300L)
  }

  test("rollback restores the target's WHOLE state (files, pending " +
    "MoR deletes) metadata-only and preserves history") {
    val t = freshTable()
    Snapshot.append(batch(0, 100), t)                    // v1
    Snapshot.append(batch(100, 150), t)                  // v2
    Snapshot.deleteRangeMor(spark, t, "id", 20L, 40L)    // v3: pending
    Snapshot.append(batch(150, 200), t)                  // v4
    val rb = Snapshot.rollback(spark, t, 3L)             // v5 = v3 again
    assert(rb == 5L)
    // row-identical to read(v3); the pending delete came back with it
    assert(Snapshot.read(spark, t).count() == 150 - 21)
    val m5 = Snapshot.readManifest(spark, t, 5L).get
    val m3 = Snapshot.readManifest(spark, t, 3L).get
    assert(m5.files == m3.files, "rollback moved or re-staged files")
    assert(m5.rangeDeletes == m3.rangeDeletes,
      "pending MoR delete not restored")
    assert(m5.action == "rollback" && m5.parent == 4L)
    // history preserved: the rolled-past v4 still time-travels
    assert(Snapshot.read(spark, t, Some(4L)).count() == 200 - 21)
    // a second rollback can walk further back through the first
    Snapshot.rollback(spark, t, 2L)                      // v6 = v2 again
    assert(Snapshot.read(spark, t).count() == 150)
  }

  test("rollback refuses a version outside the branch's lineage") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t)                      // v1
    Snapshot.createBranch(spark, t, "side")
    val bv = Snapshot.append(batch(50, 80), t, branch = "side")
    val e = intercept[IllegalArgumentException] {
      Snapshot.rollback(spark, t, bv) // a side-branch head, not main's
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("cherryPick replays an audit append onto a diverged main by " +
    "reference; idempotent; refuses rewrites and double-picks") {
    val t = freshTable()
    Snapshot.append(batch(0, 60), t)                      // v1 (main)
    Snapshot.createBranch(spark, t, "audit")
    val bv = Snapshot.append(batch(60, 90), t, branch = "audit")
    Snapshot.append(batch(90, 120), t)                    // main moved
    // diverged: the WAP fast-forward must refuse…
    assertThrows[IllegalArgumentException] {
      Snapshot.publish(spark, t, "audit")
    }
    // …and the pick lands the audited rows anyway
    val pv = Snapshot.cherryPick(spark, t, bv)
    assert(Snapshot.read(spark, t).count() == 120)
    assert(Snapshot.read(spark, t).agg(sum(col("id"))).head()
      .getLong(0) == (0L until 120L).sum)
    // by reference: the branch commit's own files are in main's head
    val own = Snapshot.readManifest(spark, t, bv).get.files
      .map(_.path).toSet --
      Snapshot.readManifest(spark, t, 1L).get.files.map(_.path).toSet
    val head = Snapshot.readManifest(spark, t, pv).get
    assert(own.subsetOf(head.files.map(_.path).toSet))
    // re-stamped: picked entries carry the NEW commit's seq
    assert(head.files.filter(f => own.contains(f.path))
      .forall(_.seq == pv))
    // idempotent replay
    assert(Snapshot.cherryPick(spark, t, bv) == pv)
    // a rewrite doesn't replay by reference
    val cv = Snapshot.compact(spark, t, branch = "audit")
    val e1 = intercept[IllegalArgumentException] {
      Snapshot.cherryPick(spark, t, cv)
    }
    assert(e1.getMessage.contains("only pure appends"))
    // an append already in main's lineage would double its rows
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.cherryPick(spark, t, 1L)
    }
    assert(e2.getMessage.contains("already"))
  }

  test("cherryPick refuses when schema changes diverged between the " +
    "pick's parent state and the target head") {
    val t = freshTable()
    Snapshot.append(batch(0, 50), t)                      // v1
    Snapshot.createBranch(spark, t, "audit")
    val bv = Snapshot.append(batch(50, 80), t, branch = "audit")
    Snapshot.renameColumn(spark, t, "id", "key")          // main only
    val e = intercept[IllegalArgumentException] {
      Snapshot.cherryPick(spark, t, bv)
    }
    assert(e.getMessage.contains("schema changes diverged"))
  }

  test("compactSmall rewrites ONLY the small files (pending deletes " +
    "fold into them), carries right-sized files by reference") {
    val t = freshTable()
    Snapshot.append(batch(0, 1000).coalesce(1), t)        // the big file
    (0 until 4).foreach { k =>
      Snapshot.append(batch(1000 + k * 10, 1010 + k * 10)
        .coalesce(1), t)
    }                                                     // 4 small
    Snapshot.deleteRangeMor(spark, t, "id", 1005L, 1014L) // pending
    val base = Snapshot.readManifest(spark, t, 6L).get
    val bigBytes = base.files.map(_.bytes).max
    val big = base.files.find(_.bytes == bigBytes).get
    val cv = Snapshot.compactSmall(spark, t, smallBytes = bigBytes,
      targetFileBytes = Long.MaxValue / 2)
    val after = Snapshot.readManifest(spark, t, cv).get
    assert(after.files.contains(big), "right-sized file not carried " +
      "byte-identically")
    assert(after.files.size == 2,
      s"1 carried + 1 packed expected, got ${after.files.size}")
    // the carried big file still needs the delete entry at read
    assert(after.rangeDeletes.nonEmpty)
    // rewritten files are PAST the pending delete: their rows fold it
    assert(after.files.filterNot(_ == big).forall(_.seq == cv))
    assert(Snapshot.read(spark, t).count() == 1040 - 10)
    assert(Snapshot.read(spark, t).agg(sum(col("id"))).head()
      .getLong(0) ==
      (0L until 1040L).map(_ + 0L).sum - (1005L to 1014L).sum)
  }

  test("compactSmall with FULL coverage commits a clean manifest; " +
    "below minInputFiles it is a no-op") {
    val t = freshTable()
    Snapshot.append(batch(0, 30).coalesce(1), t)
    Snapshot.append(batch(30, 60).coalesce(1), t)
    Snapshot.deleteRangeMor(spark, t, "id", 10L, 19L)
    // every file under the threshold → everything rewrites, pending
    // entries fold away, manifest goes clean
    val cv = Snapshot.compactSmall(spark, t,
      smallBytes = Long.MaxValue / 2,
      targetFileBytes = Long.MaxValue / 2)
    val m = Snapshot.readManifest(spark, t, cv).get
    assert(m.rangeDeletes.isEmpty && m.eqDeletes.isEmpty)
    assert(m.files.size == 1)
    assert(Snapshot.read(spark, t).count() == 50)
    // nothing small enough → same version back, no commit
    assert(Snapshot.compactSmall(spark, t, smallBytes = 1L) == cv)
  }

  test("compactSmall carries a mid-flight append forward (conflict-" +
    "scoped retry, like compact)") {
    val t = freshTable()
    Snapshot.append(batch(0, 20).coalesce(1), t)
    Snapshot.append(batch(20, 40).coalesce(1), t)
    Snapshot.onCommitAttempt =
      () => { Snapshot.append(batch(40, 55), t); () }
    val cv = Snapshot.compactSmall(spark, t,
      smallBytes = Long.MaxValue / 2,
      targetFileBytes = Long.MaxValue / 2)
    assert(Snapshot.read(spark, t).count() == 55,
      "interleaved append lost by the small-file compaction")
    val m = Snapshot.readManifest(spark, t, cv).get
    assert(m.rows == 55L)
  }

  test("driver-side bloom build is BYTE-IDENTICAL to the distributed " +
    "aggregate across long/string/double/date/timestamp columns") {
    // the same frame staged twice: once through the driver parquet
    // read (small files qualify), once with the driver path disabled
    // — every stored filter must match byte-for-byte, or point
    // pruning would differ by build path
    val df = (0 until 500).map { i =>
      (i.toLong, s"key-$i%${i * 37}", i * 0.75 - 3.0,
       java.sql.Date.valueOf(java.time.LocalDate
         .ofEpochDay(18000L + i % 400)),
       java.sql.Timestamp.from(
         java.time.Instant.ofEpochSecond(1600000000L + i * 7L)))
    }.toDF("id", "name", "score", "d", "ts")
      .union(Seq((-1L, null.asInstanceOf[String], -0.0d,
        null.asInstanceOf[java.sql.Date],
        null.asInstanceOf[java.sql.Timestamp]))
        .toDF("id", "name", "score", "d", "ts"))
    val cols = Seq("id", "name", "score", "d", "ts")
    val t1 = freshTable()
    Snapshot.append(df.coalesce(2), t1, statsCols = cols,
      bloomCols = cols)
    val t2 = freshTable()
    val saved = Snapshot.bloomDriverMaxBytes
    try {
      Snapshot.bloomDriverMaxBytes = 0L // force the Spark aggregate
      Snapshot.append(df.coalesce(2), t2, statsCols = cols,
        bloomCols = cols)
    } finally Snapshot.bloomDriverMaxBytes = saved
    def bloomsOf(t: String) = Snapshot.readManifest(spark, t, 1L).get
      .files.sortBy(_.path)
      .map(f => f.stats.toSeq.sortBy(_._1)
        .map { case (c, s) => c -> s.bloom })
    val a = bloomsOf(t1)
    val b = bloomsOf(t2)
    assert(a.flatten.exists(_._2.nonEmpty),
      "fixture produced no filters at all")
    assert(a == b, "driver-built filters differ from the " +
      "distributed build")
  }

  test("merge small-source fast path matches the aggregate " +
    "spelling: SQL-equal duplicate keys (-0.0 vs 0.0) refuse " +
    "driver-side, and an over-cap source (no driver sample) still " +
    "upserts with exact accounting") {
    // -0.0 and 0.0 are ONE key under SQL equality: the driver-side
    // distinct check must refuse exactly as count_distinct did
    val t = freshTable()
    Snapshot.append(Seq((1.0d, "a")).toDF("k", "text"), t)
    intercept[IllegalArgumentException] {
      Snapshot.mergeMor(Seq((0.0d, "x"), (-0.0d, "y"))
        .toDF("k", "text"), t, "k")
    }
    intercept[IllegalArgumentException] {
      Snapshot.merge(Seq((0.0d, "x"), (-0.0d, "y"))
        .toDF("k", "text"), t, "k")
    }
    // over the probe cap (12000 distinct keys > 10000): the
    // aggregate fallback must produce the same exact accounting the
    // collected path does — matched keys, killed rows, final state
    val big = freshTable()
    Snapshot.append(batch(0, 12000).coalesce(1), big,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    val src = (6000 until 18000).map(i => (i.toLong, s"v2 $i"))
      .toDF("id", "text")
    val v = Snapshot.mergeMor(src, big, "id")
    val m = Snapshot.readManifest(spark, big, v).get
    assert(m.rows == 18000L)
    assert(m.eqDeletes.size == 1 && m.eqDeletes.head.rows == 6000L)
    val cur = Snapshot.read(spark, big)
    assert(cur.count() == 18000L)
    assert(cur.filter(col("id") === 7000L).select(col("text"))
      .head().getString(0) == "v2 7000")
    assert(cur.filter(col("id") === 3L).select(col("text"))
      .head().getString(0) == "doc 3")
  }
}
