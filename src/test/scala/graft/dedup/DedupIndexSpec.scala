package graft.dedup

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[DedupIndex]]'s contract: serving incremental dedup from the
  * materialized posting index is byte-equivalent to
  * [[Dedup.dropDuplicatesAgainst]] rescanning the full landed corpus —
  * including the subtle hot-shingle-under-appends case the index
  * scaladoc argues from df monotonicity. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-dedup-index-spec").toString

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  lazy val docs: DataFrame = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("text")).cache()

  test("index path is byte-equivalent to the rescan path " +
       "across build + append") {
    val batch = docs.select(
      (col("doc_id") + 500000).as("doc_id"),
      when(col("doc_id") % 5 === 0,
           concat(lit("zz1 zz2 zz3 "), col("text")))
        .when(col("doc_id") % 5 === 1, col("text"))
        .otherwise(concat_ws(" ", reverse(split(col("text"), " "))))
        .as("text"))
    val path = tmp()
    DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), path)
    DedupIndex.append(docs.filter(col("doc_id") % 2 =!= 0), path, "b1")
    val viaIndex = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, path))
    val viaRescan = rows(Dedup.dropDuplicatesAgainst(batch, docs))
    assert(viaIndex == viaRescan,
      s"index-only=${(viaIndex -- viaRescan).take(3)} " +
      s"rescan-only=${(viaRescan -- viaIndex).take(3)}")
    assert(viaIndex.nonEmpty, "planted novels must survive")
  }

  /** A shingle under the cap at build time crosses it only through an
    * append. The stored postings still hold its TRUE df (it was never
    * dropped), so the query-time recount must exclude it exactly like
    * the rescan path's full-corpus hot set does — and with a higher cap
    * the same candidate must flip back to dropped, proving the recount
    * (not luck) carries the semantics. */
  test("shingle made hot only by appends is excluded by the " +
       "query-time recount, exactly matching the rescan path") {
    import spark.implicits._
    val built = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val landed = Seq((3L, "a b d")).toDF("doc_id", "text")
    val full = built.union(landed)
    // batch doc shares only the "a b" shingle with landed doc 1 at
    // Jaccard 1/(1+2-1) = 0.5: dropped iff "a b" is indexable
    val batch = Seq((10L, "a b q")).toDF("doc_id", "text")
    for (cap <- Seq(2L, 10L)) {
      val path = tmp()
      DedupIndex.build(built, path, k = 2, maxShingleFreq = cap)
      DedupIndex.append(landed, path, "b1")
      val viaIndex = rows(
        DedupIndex.dropDuplicatesAgainstIndex(batch, path))
      val viaRescan = rows(Dedup.dropDuplicatesAgainst(
        batch, full, k = 2, maxShingleFreq = cap))
      assert(viaIndex == viaRescan, s"cap=$cap")
      // cap 2: df("a b")=3 > 2 only after the append → no candidate →
      // kept; cap 10: never hot → near-hit at 0.5 → dropped
      assert(viaIndex.nonEmpty == (cap == 2L), s"cap=$cap")
    }
  }

  test("append and query read k from meta, not from defaults") {
    import spark.implicits._
    // 14-word docs sharing a 10-word run: 8 of 12 shingles in common at
    // k=3 → Jaccard 8/16 = 0.5 (dropped), but only 6 of 10 at k=5 →
    // 6/14 ≈ 0.43 (kept). Any stage silently falling back to the
    // default k=5 flips doc 10's fate and breaks rescan parity. The
    // shared-run doc lands via APPEND, so append's meta read is on the
    // hook too.
    val ws = (1 to 14).map(i => s"w$i")
    val built = Seq((1L, (1 to 14).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val landed = Seq((2L, ws.mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, ("b1 b2 b3 b4 " + ws.take(10).mkString(" "))),
      (11L, (1 to 14).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    val path = tmp()
    DedupIndex.build(built, path, k = 3)
    DedupIndex.append(landed, path, "b1")
    val viaIndex = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, path))
    val viaRescan = rows(
      Dedup.dropDuplicatesAgainst(batch, built.union(landed), k = 3))
    assert(viaIndex == viaRescan)
    assert(viaIndex.map(_._1) == Set(11L),
      "k=3 near-clone of the appended doc must be dropped, novel kept")
  }

  test("compact folds batches, promotes append-made-hot shingles, " +
       "and preserves query results exactly") {
    import spark.implicits._
    // same planted shapes as the recount test: "a b" (df 3 > cap 2)
    // goes hot only through the append, so compact must promote it
    val built = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val landed = Seq((3L, "a b d")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b q"), (11L, "x y z w v u"))
      .toDF("doc_id", "text")
    val path = tmp()
    val dst = tmp() + "/compacted"
    DedupIndex.build(built, path, k = 2, maxShingleFreq = 2L)
    DedupIndex.append(landed, path, "b1")
    val before = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, path))
    DedupIndex.compact(path, dst)
    val after = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, dst))
    assert(after == before)
    assert(after.map(_._1) == Set(10L, 11L)) // "a b" hot -> 10 kept
    // append-made-hot shingle physically left the postings and joined
    // the stored hot set (keys are the wordShingleHashes longs —
    // xxhash64 of the window string, same as Spark's xxhash64)
    val abKey = Seq("a b").toDF("s")
      .select(xxhash64(col("s"))).as[Long].head()
    val hot = spark.read.parquet(s"$dst/hot")
      .as[Long].collect().toSet
    assert(hot.contains(abKey))
    assert(spark.read.parquet(s"$dst/postings")
      .filter(col("shingle") === abKey).count() == 0)
    assert(spark.read.parquet(s"$dst/postings")
      .select(col("batch")).distinct().as[String].collect().toSeq
      == Seq("b0"))
    // the compacted index keeps working: appends anti-join the
    // promoted hot set, and a doc riding only the hot shingle stays
    // un-droppable while exact copies of appended docs drop
    DedupIndex.append(Seq((4L, "a b e")).toDF("doc_id", "text"),
                      dst, "b1")
    val probe = Seq((20L, "a b e"), (21L, "a b r"), (22L, "n o p q r s"))
      .toDF("doc_id", "text")
    val kept = rows(DedupIndex.dropDuplicatesAgainstIndex(probe, dst))
      .map(_._1)
    assert(kept == Set(21L, 22L),
      "exact copy of post-compact append dropped; hot-only near miss kept")
  }

  test("gc purges removed docs' postings and hashes; queries match a " +
       "rescan of the post-removal corpus exactly") {
    val keptDocs = docs.filter(col("doc_id") % 2 === 0)
    val removed = docs.filter(col("doc_id") % 2 =!= 0)
    val path = tmp()
    val dst = tmp() + "/gc"
    DedupIndex.build(docs, path) // default cap: nothing hot -> exact
    DedupIndex.gc(removed, path, dst)
    // verbatim copies of every doc: copies of REMOVED docs must now
    // survive ingest (their suppressors are gone), copies of kept
    // docs must still drop — and the index must agree with a rescan
    // of the corpus-as-it-now-is in every row
    val batch = docs.select((col("doc_id") + 700000).as("doc_id"),
                            col("text"))
    val viaIndex = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, dst))
    val viaRescan = rows(Dedup.dropDuplicatesAgainst(batch, keptDocs))
    assert(viaIndex == viaRescan,
      s"index-only=${(viaIndex -- viaRescan).take(3)} " +
      s"rescan-only=${(viaRescan -- viaIndex).take(3)}")
    assert(viaIndex.exists(_._1 % 2 == 1),
      "some removed-doc copy must survive after gc")
    assert(!viaIndex.exists(_._1 % 2 == 0),
      "kept-doc copies must still be dropped")
    // physical retention: no posting carries a removed id, no removed
    // content hash remains
    val postIds = spark.read.parquet(s"$dst/postings")
      .select(col("id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(postIds.nonEmpty && postIds.forall(_ % 2 == 0))
    val removedHashes = removed
      .select(sha2(col("text"), 256).as("hash")).distinct()
    assert(spark.read.parquet(s"$dst/hashes")
      .join(removedHashes, Seq("hash"), "left_semi").count() == 0)
  }

  test("exact copies of appended (not just built) docs are dropped " +
       "by the hash side alone") {
    import spark.implicits._
    val built = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val landed = Seq((2L, "f g h i j k")).toDF("doc_id", "text")
    val batch = Seq((10L, "f g h i j k"), (11L, "n o v e l z"))
      .toDF("doc_id", "text")
    val path = tmp()
    DedupIndex.build(built, path)
    DedupIndex.append(landed, path, "b1")
    val kept = rows(DedupIndex.dropDuplicatesAgainstIndex(batch, path))
    assert(kept.map(_._1) == Set(11L))
  }
}
