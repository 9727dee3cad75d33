package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT incremental-dedup index — the materialized form of the
  * existing-corpus side of [[Dedup.dropDuplicatesAgainst]], promised
  * by that operator's scaladoc ("a real deployment materializes this
  * pruned index once and appends to it"). A continuously-growing
  * corpus builds the index ONCE, appends each landed batch, and every
  * arriving batch dedups against the index without touching the
  * corpus again: the 100 TB never rescans; the index is
  * hashes + pruned posting lists (content-bounded, heavily smaller).
  *
  * Layout under `path` (plain parquet; a deployment buckets
  * `postings` by shingle for co-located candidate joins):
  *  - `hashes/batch=<tag>/`   distinct sha-256 of each landed batch's
  *                 texts
  *  - `postings/batch=<tag>/` (shingle, id, n_sh) with write-time-hot
  *                 shingles excluded
  *  - `hot/`       shingles whose document frequency exceeded
  *                 `maxShingleFreq` at write time (never indexed;
  *                 appends are anti-joined against this so a hot
  *                 shingle cannot re-enter)
  *  - `meta/`      one row (k, max_shingle_freq) — append and query
  *                 read the parameters here, so a mismatched `k`
  *                 cannot silently corrupt semantics
  *
  * Hashes and postings land in BATCH-SCOPED partition directories,
  * each written with per-directory OVERWRITE: re-running an append
  * with the same tag replaces its own files instead of duplicating
  * postings. That makes the whole ingest loop idempotent under
  * at-least-once retry semantics — exactly what
  * [[graft.streaming.IndexedIngest]] needs from `foreachBatch`, where
  * a crashed micro-batch is re-attempted with the same batch id.
  * Readers discover the `batch` column and drop it.
  *
  * ==Exact parity with the batch path==
  * [[dropDuplicatesAgainstIndex]] returns byte-identical survivors to
  * `dropDuplicatesAgainst(batch, allLandedSoFar)` (spec-pinned). The
  * subtle case is the hot cap under appends, and it works because
  * document frequency is MONOTONE: a shingle hot at write time stays
  * hot forever (both paths exclude it — here it has no postings at
  * all); a shingle that becomes hot only through appends was never
  * dropped, so its stored df is its true df and the query-time
  * recount excludes it exactly when the batch path would.
  *
  * ==Scale notes==
  * `build` scans the corpus (twice: hot set, then postings — the
  * one-time price the per-batch path paid on EVERY batch); `append`
  * and `dropDuplicatesAgainstIndex` scan only the batch and the
  * index. Query-time work: one narrow recount over the index, one
  * hash anti-join, one shingle-keyed candidate join. */
object DedupIndex {

  def build(existing: DataFrame, path: String,
            textCol: String = "text", idCol: String = "doc_id",
            k: Int = 5, maxShingleFreq: Long = 1000L): Unit = {
    val spark = existing.sparkSession
    writeMeta(spark, path, k, maxShingleFreq)
    existing.select(sha2(col(textCol), 256).as("hash")).distinct()
      .write.mode("overwrite").parquet(s"$path/hashes/batch=b0")
    val es = Dedup.shingleSides(existing, textCol, idCol, k)
    es.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleFreq)
      .select(col("shingle"))
      .write.mode("overwrite").parquet(s"$path/hot")
    // read the hot set back from disk so this plan scans the written
    // files instead of re-running the frequency aggregate
    es.join(spark.read.parquet(s"$path/hot"), Seq("shingle"), "left_anti")
      .select(col("shingle"), col("id"), col("n_sh"))
      .write.mode("overwrite").parquet(s"$path/postings/batch=b0")
  }

  /** Land a new batch into the index (hashes + postings written into
    * the batch's own partition directory; the stored hot set keeps
    * write-time-hot shingles out). Call AFTER dedup-filtering the
    * batch — the index stores what was kept. `batchTag` must be unique
    * per landed batch ("b0" is the build); re-using a tag OVERWRITES
    * that batch's files, which is exactly the retry-idempotence an
    * at-least-once ingest loop needs. */
  def append(batch: DataFrame, path: String, batchTag: String,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    require(batchTag.nonEmpty && batchTag != "b0" &&
            batchTag.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"batchTag must be a fresh directory-safe tag, got '$batchTag'")
    val spark = batch.sparkSession
    val (k, _) = readMeta(spark, path)
    batch.select(sha2(col(textCol), 256).as("hash")).distinct()
      .write.mode("overwrite").parquet(s"$path/hashes/batch=$batchTag")
    Dedup.shingleSides(batch, textCol, idCol, k)
      .join(spark.read.parquet(s"$path/hot"), Seq("shingle"), "left_anti")
      .select(col("shingle"), col("id"), col("n_sh"))
      .write.mode("overwrite").parquet(s"$path/postings/batch=$batchTag")
  }

  /** [[Dedup.dropDuplicatesAgainst]] with the existing side served
    * entirely from the index: exact copies (hash anti-join) and
    * near-duplicates (k-gram Jaccard ≥ `minJaccard` against the
    * posting lists) of anything landed are dropped from `newDocs`.
    * The landed corpus itself is never read.
    *
    * `excludeBatchTag`: ignore that batch's own index partitions
    * (partition-pruned at the scan). An at-least-once ingest retry
    * whose previous attempt already appended THIS batch must not see
    * the batch's own entries — it would drop every doc and overwrite
    * the landing with nothing ([[graft.streaming.IndexedIngest]]). */
  def dropDuplicatesAgainstIndex(newDocs: DataFrame, path: String,
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 minJaccard: Double = 0.5,
                                 excludeBatchTag: Option[String] = None)
      : DataFrame = {
    val spark = newDocs.sparkSession
    val (k, maxShingleFreq) = readMeta(spark, path)
    def excluded(df: DataFrame): DataFrame = excludeBatchTag match {
      case Some(tag) => df.filter(col("batch") =!= lit(tag))
      case None      => df
    }
    val seen = excluded(spark.read.parquet(s"$path/hashes"))
    val afterExact = newDocs
      .withColumn("__h", sha2(col(textCol), 256))
      .join(seen, col("__h") === col("hash"), "left_anti")
      .drop("__h")
      // consumed twice (candidate probe + final anti-join) across the
      // query's single action — but the probe side feeds a groupBy
      // whose exchange cannot be reused for the anti-join, so the
      // checkpoint holds the batch at one hash-scan (the same contract
      // as dropDuplicatesAgainst's own checkpoint)
      .localCheckpoint(false)
    val postings = excluded(spark.read.parquet(s"$path/postings"))
    // appends may have pushed a shingle past the cap since write time;
    // stored df is true df for never-hot shingles (monotonicity note
    // in the header), so this recount is exact
    val hotNow = postings.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleFreq)
      .select(col("shingle"))
    val lists = postings
      .join(hotNow, Seq("shingle"), "left_anti")
      .groupBy(col("shingle"))
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("ds"))
    val candidates = Dedup.shingleSides(afterExact, textCol, idCol, k)
      .withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
      .join(lists, Seq("shingle"))
      .select(col("id_a"), col("n_a"), explode(col("ds")).as("b"))
      .groupBy(col("id_a"), col("b.id").as("id_b"),
               col("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_common"))
    val nearHits = Dedup.finishJaccard(candidates, minJaccard)
      .select(col("id_a").as(idCol)).distinct()
    afterExact.join(nearHits, Seq(idCol), "left_anti")
  }

  /** Maintenance: fold an index that has accumulated many append
    * batches into a fresh single-batch layout at `dst`. Two things
    * compact away: (1) thousands of `batch=` partition directories
    * (file-listing pressure on every query) collapse to one, and
    * (2) append-made-hot shingles — which the per-query recount has
    * been re-excluding on every query, while their postings kept
    * accumulating — are PROMOTED into the stored hot set and their
    * postings physically dropped, so future appends anti-join them
    * away at write time and future recounts scan less. Query results
    * against the compacted index are identical (the recount was
    * already excluding exactly these), pinned by DedupIndexSpec.
    * `dst` must differ from `path`: the swap (rename dst over path)
    * belongs to the deployment's catalog/filesystem, not the engine —
    * rename semantics differ per store. */
  def compact(path: String, dst: String): Unit = {
    require(dst != path, "compact to a fresh directory, then swap")
    val spark = SparkSession.active
    val (k, maxShingleFreq) = readMeta(spark, path)
    writeMeta(spark, dst, k, maxShingleFreq)
    spark.read.parquet(s"$path/hashes").select(col("hash")).distinct()
      .write.mode("overwrite").parquet(s"$dst/hashes/batch=b0")
    val postings = spark.read.parquet(s"$path/postings")
      .select(col("shingle"), col("id"), col("n_sh"))
    val hotNow = postings.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleFreq)
      .select(col("shingle"))
    spark.read.parquet(s"$path/hot").select(col("shingle"))
      .union(hotNow).distinct()
      .write.mode("overwrite").parquet(s"$dst/hot")
    // re-read the written hot set so this scan-and-filter plan reads
    // files, not a re-run of the frequency aggregate (same as build)
    postings
      .join(spark.read.parquet(s"$dst/hot"), Seq("shingle"), "left_anti")
      .write.mode("overwrite").parquet(s"$dst/postings/batch=b0")
  }

  /** Retention GC: rebuild the index at `dst` WITHOUT the `removed`
    * docs — the takedown/expiry half of the index lifecycle
    * ([[compact]] folds batches; nothing before this expired
    * postings for docs deleted from the landed corpus, so a removed
    * doc kept suppressing future near-duplicates of itself forever).
    * `removed` carries the removed docs themselves (id + text): ids
    * drive the posting purge, text hashes drive the exact-hash purge.
    * Only the index and the (small) removal set are scanned — the
    * landed corpus is never read, preserving the module's
    * no-rescan contract.
    *
    * ==Semantics==
    *  - postings: every posting of a removed id is dropped — a new
    *    doc near-duplicating ONLY removed docs now survives ingest
    *    (the spec's parity gate: equals `dropDuplicatesAgainst`
    *    vs the corpus with the removals applied);
    *  - hashes: the removed docs' content hashes are dropped. This
    *    assumes the landed corpus is exact-deduped (every ingest path
    *    in this module guarantees it: only dedup survivors are
    *    appended), so a removed doc's hash cannot also belong to a
    *    surviving doc;
    *  - hot set: kept, plus the usual recount promotion — deletions
    *    NEVER un-hot a shingle. Un-hotting would need the dropped
    *    postings back (a corpus rescan, exactly what the index
    *    exists to avoid), so a once-hot shingle stays excluded: the
    *    conservative direction — strictly fewer near-dup candidates
    *    than a from-scratch rebuild, never a spurious drop. A
    *    deployment wanting exact un-hotting runs [[build]] over the
    *    landed corpus at maintenance cadence instead.
    *
    * Output is the compacted single-batch layout of [[compact]];
    * same `dst != path` swap contract. */
  def gc(removed: DataFrame, path: String, dst: String,
         textCol: String = "text", idCol: String = "doc_id"): Unit = {
    require(dst != path, "gc to a fresh directory, then swap")
    val spark = removed.sparkSession
    val (k, maxShingleFreq) = readMeta(spark, path)
    writeMeta(spark, dst, k, maxShingleFreq)
    val removedHashes = removed
      .select(sha2(col(textCol), 256).as("hash")).distinct()
    spark.read.parquet(s"$path/hashes").select(col("hash")).distinct()
      .join(removedHashes, Seq("hash"), "left_anti")
      .write.mode("overwrite").parquet(s"$dst/hashes/batch=b0")
    val removedIds = removed.select(col(idCol).as("id")).distinct()
    val postings = spark.read.parquet(s"$path/postings")
      .select(col("shingle"), col("id"), col("n_sh"))
      .join(removedIds, Seq("id"), "left_anti")
    val hotNow = postings.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleFreq)
      .select(col("shingle"))
    spark.read.parquet(s"$path/hot").select(col("shingle"))
      .union(hotNow).distinct()
      .write.mode("overwrite").parquet(s"$dst/hot")
    // re-read the written hot set so this plan scans files, not a
    // re-run of the frequency aggregate (same as build/compact)
    postings
      .join(spark.read.parquet(s"$dst/hot"), Seq("shingle"), "left_anti")
      .write.mode("overwrite").parquet(s"$dst/postings/batch=b0")
  }

  /** Key-format stamp. The round-10 move from string shingles to
    * 8-byte xxhash64 keys changed the PERSISTED posting key type: a
    * pre-move index joined against new long keys type-coerces
    * (string → bigint → null) and silently matches NOTHING — hot-set
    * anti-joins stop excluding and candidate joins stop finding.
    * Every writer stamps the format into `meta/`; every reader fails
    * FAST on a mismatch (or on a pre-stamp index) instead of
    * returning quietly wrong survivors. Bump when the key type or
    * shingle hash changes again. */
  private[dedup] val KeyFormat = "xxhash64-long-v1"

  private def writeMeta(spark: SparkSession, dir: String, k: Int,
                        maxShingleFreq: Long): Unit = {
    import spark.implicits._
    Seq((k, maxShingleFreq, KeyFormat))
      .toDF("k", "max_shingle_freq", "key_format")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Long) = {
    val meta = spark.read.parquet(s"$path/meta")
    val stored =
      if (meta.schema.fieldNames.contains("key_format"))
        meta.head().getAs[String]("key_format")
      else "<unstamped pre-xxhash64 index (string shingle keys)>"
    if (stored != KeyFormat)
      throw new IllegalStateException(
        s"DedupIndex at $path has key format '$stored' but this build " +
        s"expects '$KeyFormat' — joins across formats silently match " +
        "nothing; rebuild the index with DedupIndex.build")
    val m = meta.head()
    (m.getAs[Int]("k"), m.getAs[Long]("max_shingle_freq"))
  }
}
