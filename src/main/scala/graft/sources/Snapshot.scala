package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, count,
  count_distinct, lit, max, min, sum, when}
import org.apache.spark.sql.types._

/** Snapshot-isolated table commits — the manifest-based layout
  * (Iceberg-shape, public architecture) that closes [[Layout.compact]]'s
  * operational gap: `compact` is restart-safe for ONE writer, but a
  * reader listing files mid-swap, or a second concurrent appender, has
  * no snapshot to pin. Here every committed state is an immutable
  * MANIFEST (the list of data files that ARE the table at version N),
  * and:
  *
  *  - readers resolve the file list through the manifest they opened —
  *    a compaction committing underneath them changes nothing they can
  *    see (old files are deleted only by [[expire]], never by a
  *    commit); time travel is the same mechanism (`read(version = N)`);
  *  - writers commit by CAS-publishing manifest N+1 (stage data files
  *    → write the manifest body to a scratch name → atomically claim
  *    the `vN+1` name); two concurrent appenders race for the version
  *    number and the loser RETRIES against the new parent — its staged
  *    files are untouched, only the tiny manifest write repeats
  *    (optimistic concurrency, the Iceberg/Delta commit shape);
  *  - compaction is just another commit: a new manifest whose file
  *    list is the rewrite, row-count-verified against the snapshot it
  *    compacts — never an in-place swap under a reader.
  *
  * ==Crash windows (all resumable, SnapshotSpec walks each)==
  * Data files staged but no manifest committed → invisible to every
  * reader, removed by [[expire]]'s orphan sweep. Manifest body written
  * to scratch but never claimed → ignored by readers (only `v*.json`
  * names resolve), swept with the orphans. The claim itself is atomic
  * (hard-link on local filesystems, rename-without-replace on
  * HDFS-semantics filesystems), so a manifest name is only ever bound
  * to COMPLETE content — there is no torn-manifest window.
  *
  * ==Scale shape==
  * A manifest is one line per data file. At 100 TB with 128 MB files
  * that is ~800 K entries ≈ 80 MB of JSON — listable in one driver
  * read, no directory walk (the object-store listing problem this
  * layout exists to avoid). Past that, the public next step is
  * manifest SPLITTING (a manifest-list pointing at per-partition
  * manifests, Iceberg's exact move); the commit protocol here is
  * unchanged by it. Reads plan from the explicit file list, so
  * footer-prune/pushdown behave exactly as a directory scan.
  */
object Snapshot {

  /** Per-file column statistics: `min`/`max` in a TYPED string
    * serialization chosen so the comparison that reads them back is
    * exact — integral and timestamp values as decimal longs
    * (timestamps as microseconds since epoch), floating point through
    * `Double.toString` round-trip, dates as `yyyy-MM-dd` (lexicographic
    * = chronological), strings as themselves. A column whose file
    * slice is entirely null records no stats (absent key), which every
    * pruning decision treats as "must keep" — conservative, never
    * wrong.
    *
    * `nulls` is the file's null count for the column (-1 = unknown,
    * for manifests written before the field existed). min/max ignore
    * nulls, so any WHOLESALE decision about a file — [[deleteRange]]
    * dropping a file its stats prove fully inside the range — must
    * also prove `nulls == 0`: a null row matches no range predicate
    * and must survive the delete (the Iceberg null-count lesson).
    *
    * `bloom` is an optional per-file Bloom filter over the column's
    * values ([[FileBloom]] encoding; empty = none): the POINT-lookup
    * complement to min/max — [[readEquals]] and the key-delete
    * accounting scans prune files the filter proves cannot contain a
    * probed key, even when every file's range overlaps. Requested at
    * write time ([[append]]'s `bloomCols`); rewrites preserve
    * coverage. */
  final case class ColStats(min: String, max: String, typ: String,
                            nulls: Long = -1L, bloom: String = "")

  /** One data file of a snapshot; `path` is table-root-relative (the
    * table directory is relocatable as a unit). `stats` carries the
    * per-file min/max of the columns the writer asked to track
    * ([[append]]'s `statsCols`) — the manifest-level DATA-SKIPPING
    * index ([[readWhere]]) and the file pruner for [[merge]]. Empty
    * for untracked tables (all reads then plan every file, exactly
    * the pre-stats behavior). `rows` is the file's footer row count
    * (the Iceberg `record_count` field), gathered free at stage time
    * from the same footer read that collects stats: accounting counts
    * over whole files ([[deleteRange]] wholesale drops,
    * [[compactSmall]] verification, [[merge]] touched-row math)
    * become pure driver arithmetic instead of a Spark scan — at
    * 100 TB, expiring a month of data without counting it. -1 =
    * unknown (legacy manifests); every consumer falls back to the
    * scan. */
  final case class FileEntry(path: String, bytes: Long,
                             stats: Map[String, ColStats] = Map.empty,
                             seq: Long = 0L, rows: Long = -1L)

  /** A MERGE-ON-READ range delete: rows of the tracked `column` in
    * `[lo, hi]` (typed-string reprs, [[ColStats]] serialization) are
    * dead — applied as a residual `NOT BETWEEN` filter at read time,
    * folded into data files only at compaction. `seq` is the delete's
    * commit version: it applies ONLY to data files staged by earlier
    * commits (`file.seq < seq`, the Iceberg sequence-number rule), so
    * rows (re-)inserted after the delete are never retro-deleted. */
  final case class RangeDelete(column: String, lo: String, hi: String,
                               typ: String, seq: Long)

  /** A MERGE-ON-READ equality delete: a parquet directory under the
    * table (`dir` is table-root-relative) holding the KEY TUPLES of
    * dead rows over columns `cols` — applied as an anti-join at read
    * time (the Iceberg v2 equality-delete file shape). Same `seq`
    * applicability rule as [[RangeDelete]]. */
  final case class EqDelete(dir: String, bytes: Long, rows: Long,
                            cols: Seq[String], seq: Long)

  /** A NON-ADDITIVE schema change, applied at READ to files staged
    * before it (`file.seq < seq` — the same sequencing as deletes)
    * and folded into data files at compaction:
    *  - `rename`: column `from` reads as `to`;
    *  - `widen`: column `from` casts to `typ` (`long` or `double` —
    *    int→long / float→double, the safe widenings);
    *  - `drop`: column `from` disappears from reads.
    * Files staged AFTER the change already carry the new shape and
    * are untouched — reusing a renamed-away or dropped name later
    * creates a genuinely new column (the Iceberg field-id semantic,
    * expressed through commit sequence instead of ids). */
  final case class SchemaChange(kind: String, from: String, to: String,
                                typ: String, seq: Long)

  /** One committed version: `files` IS the table at `version`.
    * `tag` is the writer's idempotence token (empty when unused): a
    * replayed commit carrying a tag some committed manifest already
    * holds is a DUPLICATE and must be skipped — the foreachBatch
    * at-least-once contract ([[append]] with `tag = Some(batchId)`).
    * `atMicros` is the commit wall-clock (epoch micros, stamped at
    * claim time; 0 in manifests written before the field existed) —
    * the [[readAsOf]] time-travel axis.
    *
    * `layout` is the table's DECLARED partition layout
    * ([[repartitionTable]] sets it; commits carry it forward): the
    * layout NEW appends must match and rewrites re-stage under.
    * `None` (legacy manifests, never-evolved tables) derives the
    * layout from the files themselves — old behavior exactly. Old
    * files written under a previous layout stay readable through
    * their own directory scheme (per-commit `basePath` groups). */
  final case class Manifest(version: Long, parent: Long, action: String,
                            rows: Long, files: Seq[FileEntry],
                            tag: String = "", atMicros: Long = 0L,
                            rangeDeletes: Seq[RangeDelete] = Nil,
                            eqDeletes: Seq[EqDelete] = Nil,
                            schemaChanges: Seq[SchemaChange] = Nil,
                            layout: Option[Seq[String]] = None) {
    def hasDeletes: Boolean = rangeDeletes.nonEmpty || eqDeletes.nonEmpty
    def needsMapping: Boolean = hasDeletes || schemaChanges.nonEmpty
  }

  private val SnapDir = "_snapshots"
  private val MaxRetries = 20

  /** Cap on DRIVER-COLLECTED key sets for point-lookup pruning and
    * the merge paths' small-source fast path: at or under it, a key
    * set collects once (a LIMIT — one early-out scan, not a full
    * pass) and row count, duplicate check, range envelope and Bloom
    * probes are driver arithmetic; above it the distributed aggregate
    * spellings run unchanged. */
  private val MaxProbeKeys = 10000

  // ---- commit paths ---------------------------------------------------

  /** Append `df` as a new snapshot; returns the committed version.
    * Stages data files once, then CAS-commits (retrying against newer
    * parents if another writer wins the version race — staged files
    * are never re-written).
    *
    * `tag` makes the append IDEMPOTENT for at-least-once writers
    * (Structured Streaming `foreachBatch` replays a batch after a
    * crash): when some committed manifest already carries the tag,
    * the replay is a duplicate — nothing is committed and the
    * existing version is returned. The tag check rides the same
    * commit race as the version CAS (a lost race re-reads the chain,
    * so two replayers of the same batch cannot both land).
    *
    * `statsCols` asks the writer to record per-file min/max for those
    * columns in the manifest (one narrow aggregate over the freshly
    * staged files — the only data this commit wrote): the
    * DATA-SKIPPING index that lets [[readWhere]] plan a selective read
    * over only the files whose range can match, and [[merge]] rewrite
    * only the files whose key range overlaps its source.
    *
    * `bloomCols` (each must also be in `statsCols` — the filter rides
    * the stat entry) additionally records a per-file BLOOM FILTER
    * ([[FileBloom]]): the point-lookup index that lets [[readEquals]]
    * and the key-delete accounting scans prune files even when every
    * file's min/max range overlaps the probe. */
  def append(df: DataFrame, table: String,
             tag: Option[String] = None,
             statsCols: Seq[String] = Nil,
             bloomCols: Seq[String] = Nil,
             branch: String = "main"): Long = {
    val spark = df.sparkSession
    requireBloomTracked(statsCols, bloomCols)
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v // replayed batch: already committed
      case None => ()
    }
    val (staged0, stagedRows) = withStatsAndRows(spark, table,
      stage(spark, df, table, Nil, bloomCols), statsCols)
    val staged = withBlooms(spark, table, staged0, bloomCols)
    commitRetryingOn(spark, table, branch) { (parent, v) =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) } // raced replayer landed it first
      requireSameLayout(parent, Nil)
      Manifest(v, parent.version, "append",
        parent.rows + stagedRows,
        parent.files ++ staged.map(_.copy(seq = v)),
        tag.getOrElse(""),
        rangeDeletes = parent.rangeDeletes, eqDeletes = parent.eqDeletes,
        schemaChanges = parent.schemaChanges)
    } match {
      case Right(v) => v
      case Left(v) => v // duplicate detected mid-retry
    }
  }

  /** [[append]] with a Hive-partitioned staging layout
    * (`data/<uuid>/k=v/part-*.parquet`): the partition columns stay
    * DIRECTORY-ENCODED inside each commit's staging dir, and
    * [[read]] recovers them via `basePath`, so a facet-filtered scan
    * of a snapshot table is PARTITION-PRUNED exactly like a
    * [[Layout.writePartitioned]] directory — the isolation layer
    * costs none of the read-side pruning (SnapshotSpec proves
    * `partitionFilters` bind on a filtered snapshot read). Keep
    * partition columns at directory-count sanity (the Layout
    * contract: hundreds-to-thousands of values, never ids). */
  def appendPartitioned(df: DataFrame, table: String,
                        partitionCols: Seq[String],
                        tag: Option[String] = None,
                        statsCols: Seq[String] = Nil,
                        bloomCols: Seq[String] = Nil,
                        branch: String = "main"): Long = {
    require(partitionCols.nonEmpty, "use append for unpartitioned data")
    val spark = df.sparkSession
    requireBloomTracked(statsCols, bloomCols)
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v
      case None => ()
    }
    val (staged0, stagedRows) = withStatsAndRows(spark, table,
      stage(spark, df, table, partitionCols, bloomCols), statsCols)
    val staged = withBlooms(spark, table, staged0, bloomCols)
    commitRetryingOn(spark, table, branch) { (parent, v) =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) }
      requireSameLayout(parent, partitionCols)
      Manifest(v, parent.version, "append",
        parent.rows + stagedRows,
        parent.files ++ staged.map(_.copy(seq = v)),
        tag.getOrElse(""),
        rangeDeletes = parent.rangeDeletes, eqDeletes = parent.eqDeletes,
        schemaChanges = parent.schemaChanges)
    } match {
      case Right(v) => v
      case Left(v) => v
    }
  }

  /** Committed version carrying `tag`, if any (scans the retained
    * manifest chain — O(versions), driver-side, tiny files). */
  private def findTag(spark: SparkSession, table: String,
                      t: String): Option[Long] =
    reachableManifests(spark, table).iterator
      .collectFirst { case m if m.tag == t => m.version }

  /** The committed version carrying `tag`, if any — the PUBLIC probe
    * for at-least-once callers that must know whether a tagged commit
    * from a crashed run already landed BEFORE recomputing work that
    * depends on the pre-commit state (the [[Materialized.refresh]]
    * window-replay shape: a fold recomputed against already-folded
    * state would be wrong, so the caller short-circuits on this). */
  def tagVersion(spark: SparkSession, table: String,
                 tag: String): Option[Long] = {
    require(tag.nonEmpty, "empty tag")
    findTag(spark, table, tag)
  }

  private final class DuplicateTag(val version: Long)
      extends RuntimeException

  private def requireBloomTracked(statsCols: Seq[String],
                                  bloomCols: Seq[String]): Unit = {
    val untracked = bloomCols.filterNot(statsCols.contains)
    require(untracked.isEmpty,
      s"bloomCols ${untracked.mkString("[", ", ", "]")} not in " +
        "statsCols — the filter rides the column's stats entry; " +
        "track it there too")
  }

  /** Replace the table contents with `df` (a new snapshot whose file
    * list is only the staged files — prior versions stay readable
    * until [[expire]]). Stages under the table's DECLARED partition
    * layout ([[repartitionTable]]) so a replace never silently
    * de-partitions an evolved table; fresh tables stage flat.
    *
    * Bloom coverage follows the same preservation rule as the other
    * rewrite paths ([[compact]], [[merge]]): when `bloomCols` is
    * empty, the replaced snapshot's bloom-covered columns that are
    * still tracked in `statsCols` keep their filters on the new
    * files — a replace never silently drops the table's point-lookup
    * pruning. Pass `bloomCols` explicitly to set (or, with no
    * overlap, effectively reset) coverage. */
  def overwrite(df: DataFrame, table: String,
                statsCols: Seq[String] = Nil,
                bloomCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    requireBloomTracked(statsCols, bloomCols)
    val base = currentManifest(spark, table)
    val pCols = base.map(declaredLayout).getOrElse(Nil)
    val effBloom =
      if (bloomCols.nonEmpty) bloomCols
      else base.map(currentBloomColsOf).getOrElse(Nil)
        .filter(statsCols.contains)
    val (staged0, stagedRows) = withStatsAndRows(spark, table,
      stage(spark, df, table, pCols, effBloom), statsCols)
    val staged = withBlooms(spark, table, staged0, effBloom)
    commitRetrying(spark, table) { (parent, v) =>
      Manifest(v, parent.version, "overwrite",
        stagedRows, staged.map(_.copy(seq = v)))
    }.merge
  }

  /** Compact the CURRENT snapshot to `ceil(bytes/targetFileBytes)`
    * files — committed as a new version, row-verified against the
    * snapshot it rewrites; a reader pinned on any version ≤ current
    * is untouched (its files are not deleted). Returns the committed
    * version. If another writer commits between the rewrite and the
    * claim, the compaction REVALIDATES against the advanced parent
    * and retries: interleaved PURE APPENDS carry forward by reference
    * (their files join the compacted manifest untouched — maintenance
    * never starves under a steady append stream); any interleaved
    * rewrite/delete/schema change is a genuine conflict and aborts
    * loudly (the rewrite no longer represents the table) — rerun. */
  def compact(spark: SparkSession, table: String,
              targetFileBytes: Long = 128L << 20,
              branch: String = "main"): Long =
    compactClustered(spark, table, Nil, targetFileBytes, branch)

  /** [[compact]] that additionally CLUSTERS the rewrite on
    * `clusterCols` (range-partition + sort within files): after many
    * interleaved appends every file's key range spans the table and
    * the stats index ([[readWhere]]) can prune nothing — a clustered
    * compaction re-establishes file-level locality, so range reads
    * drop back to O(selectivity) files. This is the lakehouse
    * `OPTIMIZE ... ZORDER`/`sortBy` maintenance pass expressed as
    * just another snapshot commit (pinned readers unaffected, same
    * row-count verification, same revalidate-and-retry contract). Track
    * the cluster column in `statsCols` at append time or the pruning
    * the clustering buys has no index to bind to. For range locality
    * on several columns at once, pre-compute [[Layout]]'s Z-order
    * key and cluster on that. */
  def compactClustered(spark: SparkSession, table: String,
                       clusterCols: Seq[String],
                       targetFileBytes: Long = 128L << 20,
                       branch: String = "main"): Long = {
    require(targetFileBytes > 0)
    val base = headManifest(spark, table, branch).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot on '$branch' in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val totalBytes = base.files.map(_.bytes).sum
    val nf = math.max(1L, (totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt
    // a partitioned table's rewrite preserves its layout: partition
    // columns are recovered from the manifest's own k=v path segments
    // (coalesce bounds files per WRITE, so each partition dir gets at
    // most nf files — the writePartitionedCompact shape)
    val pCols = declaredLayout(base)
    // the rewrite reads LIVE rows: pending merge-on-read deletes fold
    // into the new files here and the committed manifest is clean
    val src = readLive(spark, table, base, base.files)
    val rewrite =
      if (clusterCols.isEmpty) src.coalesce(nf)
      else src.repartitionByRange(nf, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
    // the rewrite keeps the table's stats AND bloom coverage:
    // whatever the parent tracked is re-gathered over the new files
    val (staged0, rewrittenRows) = withStatsAndRows(spark, table,
      stage(spark, rewrite, table, pCols, currentBloomColsOf(base)),
      currentStatsColsOf(base))
    val staged = withBlooms(spark, table, staged0,
      currentBloomColsOf(base))
    require(rewrittenRows == base.rows,
      s"compact row mismatch: snapshot=${base.rows} " +
        s"rewritten=$rewrittenRows — nothing committed")
    commitRetryingOn(spark, table, branch) { (parent, v) =>
      // a value-preserving rewrite of base's LIVE rows overlaps
      // nothing an append adds: interleaved appends carry forward by
      // reference (their files stay newer than every folded delete /
      // schema change, so the clean manifest is still exact for them)
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "compact", _ => false)
      Manifest(v, parent.version, "compact",
        base.rows + (parent.rows - base.rows),
        staged.map(_.copy(seq = v)) ++ carriedAppends)
    }.merge
  }

  /** BIN-PACKING small-file compaction: rewrite ONLY the files under
    * `smallBytes` into ~`targetFileBytes` files; every right-sized
    * file carries into the new manifest BY REFERENCE, byte-untouched.
    * This is the steady-state maintenance pass for a table landing
    * streaming micro-batches (one small file per batch is the normal
    * state of a landed table): cost scales with the SMALL-FILE MASS,
    * never the table — a 100 TB table with 2 GB of micro-batch
    * droppings reads and rewrites 2 GB, where [[compact]] would
    * rewrite 100 TB to fix a listing problem.
    *
    * Pending merge-on-read deletes and schema changes FOLD into the
    * rewritten files only (their re-stamped `seq` puts them past every
    * pending entry); the manifest keeps the delete/schema entries
    * because the carried files still need them at read — unless the
    * rewrite covered EVERY old file, in which case the manifest
    * commits clean (carried interleaved appends are newer than every
    * pending entry, so the entries are inert for them too). Row-count
    * verified: the staged rows must equal the small subset's live
    * count, or nothing commits. Same revalidate-and-retry contract as
    * [[compact]] (a value-preserving rewrite overlaps nothing an
    * append adds). Returns the committed version — unchanged when
    * fewer than `minInputFiles` files are under the threshold. */
  def compactSmall(spark: SparkSession, table: String,
                   smallBytes: Long = 32L << 20,
                   targetFileBytes: Long = 128L << 20,
                   minInputFiles: Int = 2,
                   branch: String = "main"): Long = {
    require(smallBytes > 0 && targetFileBytes > 0 && minInputFiles >= 2)
    val base = headManifest(spark, table, branch).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot on '$branch' in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val (small, kept) = base.files.partition(_.bytes < smallBytes)
    if (small.size < minInputFiles) return base.version
    val pCols = declaredLayout(base)
    val src = readLive(spark, table, base, small)
    // the verification count: manifest footer rows when no pending
    // delete applies to the small set (driver math, no job); else one
    // read bounded by the same small-file mass as the rewrite itself
    val expect = liveRowsFromMeta(base, small).getOrElse(src.count())
    val totalBytes = small.map(_.bytes).sum
    val nf = math.max(1L, (totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt
    val (staged0, rewrittenRows) = withStatsAndRows(spark, table,
      stage(spark, src.coalesce(nf), table, pCols,
        currentBloomColsOf(base)),
      currentStatsColsOf(base))
    val staged = withBlooms(spark, table, staged0,
      currentBloomColsOf(base))
    require(rewrittenRows == expect,
      s"compactSmall row mismatch: small-file live rows=$expect " +
        s"rewritten=$rewrittenRows — nothing committed")
    val clean = kept.isEmpty // full coverage: pending entries fold away
    commitRetryingOn(spark, table, branch) { (parent, v) =>
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "compactSmall", _ => false)
      Manifest(v, parent.version, "compact", parent.rows,
        kept ++ staged.map(_.copy(seq = v)) ++ carriedAppends,
        rangeDeletes = if (clean) Nil else base.rangeDeletes,
        eqDeletes = if (clean) Nil else base.eqDeletes,
        schemaChanges = if (clean) Nil else base.schemaChanges)
    }.merge
  }

  /** MERGE (upsert) `source` into the table by `key`, COPY-ON-WRITE:
    * a target row whose key appears in `source` is replaced by the
    * source row; source rows with unseen keys are inserted. Only the
    * files that actually CONTAIN a matched key are rewritten — every
    * other file carries over into the new manifest untouched (no data
    * movement), which is what makes point-wise upserts affordable on a
    * 100 TB table: cost scales with the files hit, not the table.
    *
    * File-hit detection is two-staged, both stages cheap:
    *  1. manifest stats on `key` (when tracked) drop files whose key
    *     range cannot intersect the source's — pure driver math;
    *  2. a key-column-only scan of the survivors (columnar: one column
    *     off disk) semi-joined with the source keys names the files
    *     that truly contain a match.
    *
    * `source` must carry the table's schema and DISTINCT keys (two
    * source rows for one key would make the upsert order-dependent —
    * rejected loudly). Like [[compact]], the commit revalidates when
    * the table advanced mid-flight: interleaved appends whose files
    * provably contain NONE of the merge keys (manifest stats/Blooms)
    * carry forward; an append that might hold a key — its rows would
    * dodge the upsert — aborts loudly; rerun against the new
    * snapshot. Returns the committed version (the current one when
    * `source` is empty). */
  def merge(source: DataFrame, table: String, key: String): Long = {
    val spark = source.sparkSession
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    // ONE aggregate answers row count, duplicate-key check and the
    // key bounds (formerly three jobs over the source): distinct-count
    // spells count_distinct + a null adjustment, matching
    // `select(key).distinct().count()` exactly (nulls collapse to one)
    val sagg = source.agg(count(lit(1)), count(col(key)),
      count_distinct(col(key)), min(col(key)), max(col(key))).head()
    val srcRows = sagg.getLong(0)
    if (srcRows == 0L) return base.version
    requireUnrenamed(base, Seq(key), "merge key")
    val distinctKeyCount = sagg.getLong(2) +
      (if (sagg.getLong(0) > sagg.getLong(1)) 1L else 0L)
    require(distinctKeyCount == srcRows,
      s"merge source carries duplicate '$key' values — upsert would be " +
        "order-dependent; dedup the source first")
    // stage 1: manifest stats drop files outside the source key range
    val ranged =
      if (sagg.isNullAt(3)) Nil // all-null source keys match no row
      else keptByRange(base.files, key, sagg.get(3), sagg.get(4),
        base.schemaChanges)
    // a probe-cap source with Bloom coverage on any ranged survivor
    // buys per-file Bloom probes for one bounded collect: files that
    // provably hold none of the keys skip stage 2's scan entirely,
    // and the commit's conflict test becomes driver arithmetic
    val smallKeys: Option[Array[Any]] =
      if (srcRows > MaxProbeKeys || !ranged.exists(f =>
            fileStats(f, key, base.schemaChanges)
              .exists(_.bloom.nonEmpty))) None
      else smallKeySample(source.select(col(key)))
        .map(_.filter(_ != null))
    val candidates = smallKeys match {
      case Some(vs) =>
        keptByKeyBloomVals(ranged, key, vs, base.schemaChanges)
      case None => ranged
    }
    // stage 2: which candidate files truly contain a matched key
    val srcKeys = source.select(col(key).as("__merge_key"))
    val touchedPaths: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFilesWithPath(spark, table, candidates, Seq(key))
        .join(srcKeys, col(key) === col("__merge_key"), "left_semi")
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet // bounded by file count
    val touched = candidates.filter(e =>
      touchedPaths.exists(p => p.endsWith("/" + e.path)))
    val touchedSet = touched.map(_.path).toSet
    val carried = base.files.filterNot(f => touchedSet.contains(f.path))
    // the rewrite: surviving rows of the hit files + ALL source rows
    // (replacements and inserts land together in the new files)
    val newData = (if (touched.isEmpty) source
                   else readLive(spark, table, base, touched)
                     .join(source.select(col(key)), Seq(key), "left_anti")
                     .unionByName(source))
    val pCols = declaredLayout(base)
    val (staged0, stagedRows) = withStatsAndRows(spark, table,
      stage(spark, newData, table, pCols, currentBloomColsOf(base)),
      currentStatsColsOf(base))
    val staged = withBlooms(spark, table, staged0,
      currentBloomColsOf(base))
    val touchedRows =
      if (touched.isEmpty) 0L
      else liveRowsFromMeta(base, touched).getOrElse(
        readLive(spark, table, base, touched).count())
    commitRetrying(spark, table) { (parent, v) =>
      // an interleaved append conflicts iff it might contain a merge
      // key (its rows would dodge the upsert): stats/Bloom-proven
      // disjoint appends carry forward, anything else aborts
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "merge", appended => (smallKeys match {
          case Some(vs) => keyCandidatesVals(appended,
            base.schemaChanges, key, vs)
          case None => keyCandidatesIn(appended, base.schemaChanges,
            source.select(col(key)), Seq(key))
        }).nonEmpty)
      Manifest(v, parent.version, "merge",
        base.rows - touchedRows + stagedRows
          + (parent.rows - base.rows),
        carried ++ carriedAppends ++
          staged.map(_.copy(seq = v)),
        rangeDeletes = base.rangeDeletes, eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges)
    }.merge
  }

  /** MERGE (upsert), MERGE-ON-READ — the at-scale spelling of
    * [[merge]]: matched keys land as an EQUALITY DELETE and ALL
    * source rows (replacements and inserts alike) append as new
    * files, in ONE commit — ZERO matched-file rewrites. A point-wise
    * upsert into a 100 TB table then costs one key-file write, one
    * narrow accounting scan, and the source's own staging — never a
    * data-file rewrite; [[compact]] folds the pending delete into
    * clean files when maintenance runs, exactly as for
    * [[deleteKeysMor]].
    *
    * Sequencing makes the one-commit composition sound: the
    * [[EqDelete]] commits at seq v and applies only to files staged
    * by EARLIER commits (`file.seq < v`), while the source's files
    * stage at seq v — the delete kills the old versions of matched
    * rows and can never touch their replacements.
    *
    * Same contracts as [[merge]]: `source` carries the table's
    * schema with DISTINCT keys (rejected loudly otherwise), the
    * commit revalidates-and-retries across interleaved appends
    * (aborting only on genuine conflicts), and CDC across
    * the commit reads delete+insert per updated row. Prefer [[merge]]
    * when read amplification matters more than write cost (every
    * read until compaction pays the anti-join). */
  def mergeMor(source: DataFrame, table: String, key: String,
               tag: Option[String] = None): Long = {
    val spark = source.sparkSession
    // the at-least-once dedupe rides the same tag machinery as
    // [[append]]: a replayed upsert (crash after the state commit but
    // before its caller's baseline write — the [[Materialized]]
    // refresh shape) must find its first run and not re-apply
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v
      case None => ()
    }
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val srcKeys = source.select(col(key))
    val dupMsg =
      s"merge source carries duplicate '$key' values — upsert would " +
        "be order-dependent; dedup the source first"
    // ONE bounded collect replaces the count/duplicate aggregate AND
    // the candidate probe's own collect (guide §1.2): a source at or
    // under the probe cap — the micro-batch/MV-state upsert shape
    // this MoR spelling exists for — yields row count, duplicate
    // check, range envelope and Bloom probes as driver arithmetic in
    // one job; a bigger source pays the LIMIT's early-out scan and
    // falls back to the aggregate spelling unchanged
    val smallVals: Option[Array[Any]] = smallKeySample(srcKeys)
    // candidate files (stats- and bloom-pruned as in [[deleteKeysMor]]:
    // files that provably hold none of the source keys never join the
    // accounting scan) + the emptiness/distinct-keys contract
    val (candidates, smallKeys) = smallVals match {
      case Some(vals) =>
        if (vals.isEmpty) return base.version
        val nonNull = vals.filter(_ != null)
        require(vals.length - nonNull.length <= 1 &&
          sqlDistinctCount(nonNull) == nonNull.length, dupMsg)
        (keyCandidatesVals(base.files, base.schemaChanges, key,
          nonNull), Some(nonNull))
      case None =>
        // count_distinct + null adjustment ==
        // `select(key).distinct().count()` exactly
        val sagg = source.agg(count(lit(1)), count(col(key)),
          count_distinct(col(key)), min(col(key)), max(col(key)))
          .head()
        val srcRows = sagg.getLong(0)
        if (srcRows == 0L) return base.version
        require(sagg.getLong(2) +
          (if (sagg.getLong(0) > sagg.getLong(1)) 1L else 0L)
            == srcRows, dupMsg)
        val cands =
          if (sagg.isNullAt(3)) Nil // all-null keys match nothing
          else keptByRange(base.files, key, sagg.get(3), sagg.get(4),
            base.schemaChanges)
        (cands, None)
    }
    // matched keys + exact dead-row accounting in ONE pass: the
    // candidates' live rows semi-join the source keys and group to
    // the distinct matched keys — which ARE the equality-delete
    // file's rows — while the pre-group row count (the rows the
    // delete kills) and the matched-key count ride the SAME job as
    // CollectMetrics observations. The old spelling ran a count job
    // AND a write job over the same join.
    val (rel, delBytes, nMatched, dead) =
      if (candidates.isEmpty) ("", 0L, 0L, 0L)
      else {
        val obs = new org.apache.spark.sql.Observation()
        val matched = readLive(spark, table, base, candidates)
          .select(col(key))
          .join(srcKeys, Seq(key), "left_semi")
          .groupBy(col(key)).agg(count(lit(1)).as("__graft_live"))
          .observe(obs,
            coalesce(sum(col("__graft_live")), lit(0L)).as("dead"),
            count(lit(1)).as("matched"))
          .select(col(key))
        val r = s"deletes/${java.util.UUID.randomUUID()}"
        matched.write.mode("errorifexists")
          .option("mapreduce.fileoutputcommitter.algorithm.version",
            "2") // published by the manifest CAS, as in [[stage]]
          .parquet(s"$table/$r")
        val killed = obs.get("dead").asInstanceOf[Long]
        stagedSchemaCache.put(s"$table/$r", matched.schema) // as in stage()
        val fs = hadoopFs(spark, table)
        if (killed == 0L) {
          // pure inserts: no delete entry lands (unmatched keys would
          // anti-join nothing but cost every read's accounting); the
          // empty unpublished dir is garbage — remove it now
          fs.delete(new org.apache.hadoop.fs.Path(s"$table/$r"), true)
          ("", 0L, 0L, 0L)
        } else {
          var bytes = 0L
          val it = fs.listFiles(
            new org.apache.hadoop.fs.Path(s"$table/$r"), true)
          while (it.hasNext) bytes += it.next().getLen
          (r, bytes, obs.get("matched").asInstanceOf[Long], killed)
        }
      }
    val pCols = declaredLayout(base)
    val (staged0, stagedRows) = withStatsAndRows(spark, table,
      stage(spark, source, table, pCols, currentBloomColsOf(base)),
      currentStatsColsOf(base))
    val staged = withBlooms(spark, table, staged0,
      currentBloomColsOf(base))
    commitRetrying(spark, table) { (parent, v) =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) } // raced replayer landed it first
      // same conflict rule as [[merge]]: a disjointness-proven append
      // carries forward (the new EqDelete applies to it by seq, but
      // provably touches none of its rows — accounting stays exact).
      // With the collected sample the test is driver arithmetic.
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "merge", appended => (smallKeys match {
          case Some(vs) => keyCandidatesVals(appended,
            base.schemaChanges, key, vs)
          case None => keyCandidatesIn(appended, base.schemaChanges,
            srcKeys, Seq(key))
        }).nonEmpty)
      Manifest(v, parent.version, "merge-mor",
        base.rows - dead + stagedRows + (parent.rows - base.rows),
        base.files ++ carriedAppends ++ staged.map(_.copy(seq = v)),
        tag.getOrElse(""),
        rangeDeletes = base.rangeDeletes,
        eqDeletes = base.eqDeletes ++ (
          if (dead == 0L) Nil
          else Seq(EqDelete(rel, delBytes, nMatched, Seq(key), v))),
        schemaChanges = base.schemaChanges)
    }.merge
  }

  /** Row-level RANGE DELETE (`lower ≤ column ≤ upper`, inclusive),
    * copy-on-write — the retention-expiry / right-to-erasure shape.
    * The manifest stats triage every file into three classes:
    *
    *  - provably DISJOINT from the range → carried by reference;
    *  - provably fully INSIDE the range AND null-free on the column
    *    (`nulls == 0` — min/max ignore nulls, and a null row matches
    *    no range predicate, so it must survive) → dropped WHOLESALE,
    *    zero data movement — at 100 TB, expiring a month of
    *    time-partitioned data is pure manifest surgery;
    *  - overlapping, stat-less, or null-carrying → rewritten with the
    *    keep filter.
    *
    * The keep filter is null-safe (`NOT coalesce(between, false)`):
    * rows where the column IS NULL are kept, the SQL DELETE contract.
    * Commits like [[compact]]: interleaved appends provably OUTSIDE
    * the range carry forward; an append that might hold an in-range
    * row aborts loudly. Returns the committed version. */
  def deleteRange(spark: SparkSession, table: String, column: String,
                  lower: Any, upper: Any): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val (inRange, disjoint) = base.files.partition { f =>
      fileStats(f, column, base.schemaChanges) match {
        case None => true // unknown: must inspect
        case Some(s) =>
          val lo = reprOf(s.typ, lower)
          val hi = reprOf(s.typ, upper)
          cmp(s.typ, s.max, lo) >= 0 && cmp(s.typ, s.min, hi) <= 0
      }
    }
    val (dropped, rewrite) = inRange.partition { f =>
      fileStats(f, column, base.schemaChanges) match {
        // floating-point columns NEVER wholesale-drop: parquet float
        // stats may silently ignore NaN values, and a NaN row matches
        // no range predicate, so it must survive the delete — only
        // the rewrite path (whose null-safe keep filter NaN also
        // passes, NaN failing every bounded BETWEEN) can guarantee
        // that. Range READS stay stats-pruned for doubles: a pruned
        // read only needs "no row MATCHES in this file", which holds
        // for NaN under any bounded range.
        case Some(s) if s.nulls == 0L && s.typ != "double" =>
          val lo = reprOf(s.typ, lower)
          val hi = reprOf(s.typ, upper)
          cmp(s.typ, s.min, lo) >= 0 && cmp(s.typ, s.max, hi) <= 0
        case _ => false // stat-less, null-carrying, or float: rewrite
      }
    }
    val cond = col(column) >= lit(lower) && col(column) <= lit(upper)
    // an interleaved append conflicts iff any of its files might hold
    // a row INSIDE the delete range (its rows would dodge the delete)
    deleteCommit(spark, table, base, disjoint, dropped, rewrite, cond,
      appended => keptByRange(appended, column, lower, upper,
        base.schemaChanges).nonEmpty)
  }

  /** Row-level DELETE by an arbitrary predicate, copy-on-write: one
    * predicate-column scan names the files that contain a matching
    * row (columnar — only the referenced columns leave disk); only
    * those are rewritten with the null-safe keep filter, everything
    * else carries by reference. No wholesale file drops here — an
    * arbitrary `Column` can't be proven against min/max stats; use
    * [[deleteRange]] when the predicate is a range on a tracked
    * column. Returns the committed version. */
  def deleteWhere(spark: SparkSession, table: String,
                  cond: Column): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    requireUnrenamed(base, {
      // the predicate's referenced columns, read off the ANALYZED
      // filter (a Spark-4 Column is an opaque node tree until it
      // resolves against a frame; analysis costs no job)
      val probe = readLive(spark, table, base, base.files)
        .filter(coalesce(cond, lit(false)))
      probe.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.references.map(_.name).toSeq
      }.flatten.distinct
    }, "deleteWhere predicate")
    val hit: Set[String] =
      readFilesAllWithPath(spark, table, base.files)
        .filter(coalesce(cond, lit(false)))
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    val rewrite = base.files.filter(e =>
      hit.exists(p => p.endsWith("/" + e.path)))
    val rewriteSet = rewrite.map(_.path).toSet
    val carried = base.files.filterNot(f => rewriteSet.contains(f.path))
    // an arbitrary predicate proves nothing about appended files:
    // ANY interleaved append is a conflict (abort, rerun)
    deleteCommit(spark, table, base, carried, Nil, rewrite, cond,
      _.nonEmpty)
  }

  /** Shared delete tail: stage the null-safe-kept rows of the rewrite
    * files, account rows (wholesale drops counted off their footers —
    * a metadata read, no data scan), commit `carried ++ staged` with
    * the parent-unchanged guard. */
  private def deleteCommit(spark: SparkSession, table: String,
                           base: Manifest, carried: Seq[FileEntry],
                           dropped: Seq[FileEntry],
                           rewrite: Seq[FileEntry], cond: Column,
                           appendConflicts: Seq[FileEntry] => Boolean)
      : Long = {
    if (dropped.isEmpty && rewrite.isEmpty)
      return base.version // nothing can match: no-op, nothing committed
    val pCols = declaredLayout(base)
    val keep = !coalesce(cond, lit(false)) // NULL never deletes
    val (staged, stagedRows, rewriteRows) =
      if (rewrite.isEmpty) (Nil: Seq[FileEntry], 0L, 0L)
      else {
        val src = readLive(spark, table, base, rewrite)
        // ONE pass answers both accounting counts (kept and total —
        // formerly two jobs over the same files); the keep filter is
        // never null, so the conditional count is exact
        val cnts = src.agg(count(lit(1)),
          count(when(keep, lit(1)))).head()
        val rewriteCount = cnts.getLong(0)
        val keptCount = cnts.getLong(1)
        val st =
          if (keptCount == 0L) Nil // every row deleted: stage nothing
          else withBlooms(spark, table,
            withStats(spark, table,
              stage(spark, src.filter(keep), table, pCols,
                currentBloomColsOf(base)),
              currentStatsColsOf(base)),
            currentBloomColsOf(base))
        (st, keptCount, rewriteCount)
      }
    // wholesale drops: counted off the manifest's stored footer rows
    // when no pending delete applies (pure driver math); the scan is
    // only the legacy-manifest fallback
    val droppedRows =
      if (dropped.isEmpty) 0L
      else liveRowsFromMeta(base, dropped).getOrElse(
        readLive(spark, table, base, dropped).count())
    commitRetrying(spark, table) { (parent, v) =>
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "delete", appendConflicts)
      Manifest(v, parent.version, "delete",
        base.rows - droppedRows - (rewriteRows - stagedRows)
          + (parent.rows - base.rows),
        carried ++ carriedAppends ++
          staged.map(_.copy(seq = v)),
        rangeDeletes = base.rangeDeletes, eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges)
    }.merge
  }

  // ---- merge-on-read deletes --------------------------------------------

  /** Row-level RANGE DELETE, MERGE-ON-READ — the at-scale spelling of
    * [[deleteRange]]: the commit REWRITES ZERO DATA FILES. Files whose
    * stats prove them fully inside the range (and null-free,
    * non-float — [[deleteRange]]'s wholesale rules) leave the manifest
    * outright (pure metadata surgery); files that merely OVERLAP the
    * range stay, and a [[RangeDelete]] entry makes every subsequent
    * read apply the `NOT BETWEEN` residual. A daily retention pass
    * over a 100 TB table is then one manifest write, not a rewrite of
    * every boundary file; [[compact]]/[[compactClustered]] fold the
    * pending deletes into data files when maintenance runs.
    *
    * Row accounting stays EXACT via one column-pruned COUNT over only
    * the affected files (a read, never a write). Same
    * revalidate-and-retry contract as [[deleteRange]]. */
  def deleteRangeMor(spark: SparkSession, table: String, column: String,
                     lower: Any, upper: Any): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val (inRange, _) = base.files.partition { f =>
      fileStats(f, column, base.schemaChanges) match {
        case None => true
        case Some(s) =>
          val lo = reprOf(s.typ, lower)
          val hi = reprOf(s.typ, upper)
          cmp(s.typ, s.max, lo) >= 0 && cmp(s.typ, s.min, hi) <= 0
      }
    }
    if (inRange.isEmpty) return base.version // provably nothing matches
    val (dropped, overlapping) = inRange.partition { f =>
      fileStats(f, column, base.schemaChanges) match {
        case Some(s) if s.nulls == 0L && s.typ != "double" =>
          val lo = reprOf(s.typ, lower)
          val hi = reprOf(s.typ, upper)
          cmp(s.typ, s.min, lo) >= 0 && cmp(s.typ, s.max, hi) <= 0
        case _ => false
      }
    }
    val typ = {
      val fromStats = base.files
        .flatMap(f => fileStats(f, column, base.schemaChanges))
        .headOption.map(_.typ)
      fromStats.getOrElse {
        val field = readFiles(spark, table, base.files).schema
          .find(_.name == column).getOrElse(throw new
            IllegalArgumentException(s"no column '$column' in $table"))
        statTyp(field.dataType).getOrElse(throw new
          IllegalArgumentException(
            s"range delete unsupported for '$column': ${field.dataType}"))
      }
    }
    val cond = col(column) >= lit(lower) && col(column) <= lit(upper)
    val deadDropped =
      if (dropped.isEmpty) 0L
      else liveRowsFromMeta(base, dropped).getOrElse(
        readLive(spark, table, base, dropped).count())
    val deadOverlap =
      if (overlapping.isEmpty) 0L
      else readLive(spark, table, base, overlapping)
        .filter(coalesce(cond, lit(false))).count()
    if (deadDropped + deadOverlap == 0L && dropped.isEmpty)
      return base.version // nothing matches: no-op, nothing committed
    val droppedSet = dropped.map(_.path).toSet
    commitRetrying(spark, table) { (parent, v) =>
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "delete", appended => keptByRange(appended, column, lower,
          upper, base.schemaChanges).nonEmpty)
      val newRange =
        if (deadOverlap > 0L)
          Seq(RangeDelete(column, reprOf(typ, lower), reprOf(typ, upper),
            typ, v))
        else Nil // overlap was a stats over-approximation: no residual
      Manifest(v, parent.version, "delete-mor",
        base.rows - deadDropped - deadOverlap
          + (parent.rows - base.rows),
        base.files.filterNot(f => droppedSet.contains(f.path))
          ++ carriedAppends,
        rangeDeletes = base.rangeDeletes ++ newRange,
        eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges)
    }.merge
  }

  /** Row-level DELETE BY KEY, MERGE-ON-READ (the Iceberg v2
    * equality-delete shape): `keys` — one row per dead key over any
    * subset of table columns — lands as a small parquet directory
    * under the table, the manifest records it as an [[EqDelete]], and
    * every subsequent read anti-joins it away. ZERO data files are
    * rewritten; the right-to-erasure pass over a 100 TB table costs
    * one key-file write plus one narrow accounting scan.
    * [[compact]] folds pending key deletes into data; [[expire]]
    * sweeps the key files once no retained manifest references them.
    *
    * Rows whose key columns are NULL never match (anti-join equality
    * semantics — the SQL DELETE contract). Returns the current
    * version unchanged when no live row matches. */
  def deleteKeysMor(keys: DataFrame, table: String,
                    tag: Option[String] = None): Long = {
    val spark = keys.sparkSession
    // replay dedupe, as in [[mergeMor]]: a crashed caller re-running
    // the same logical delete must not re-stage a second delete file
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v
      case None => ()
    }
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val cols = keys.columns.toSeq
    require(cols.nonEmpty, "empty key frame")
    val distinctKeys0 = keys.distinct()
    // a single-column key set at or under the probe cap collects ONCE
    // and replays as a LOCAL relation: candidate pruning and the
    // commit's conflict test become driver arithmetic, and the
    // accounting scan's semi-join side and the delete-file write stop
    // re-evaluating (and re-shuffling) the caller's lineage — the old
    // spelling ran the distinct three times (probe, count, write)
    val smallKeys: Option[Array[Any]] =
      if (cols.size == 1) smallKeySample(distinctKeys0) else None
    val distinctKeys = smallKeys match {
      case Some(vals) =>
        spark.createDataFrame(
          java.util.Arrays.asList(
            vals.map(v => org.apache.spark.sql.Row(v)): _*),
          StructType(Seq(distinctKeys0.schema.head)))
      case None => distinctKeys0
    }
    // the exact-accounting scan stats-prunes like merge does: with a
    // single tracked key column, files whose range cannot intersect
    // the keys' [min, max] never join the count (all-null key frames
    // match nothing by anti-join semantics — zero candidates), and
    // per-file Bloom filters drop range-overlapping files that
    // provably hold none of the keys
    val candidates = smallKeys match {
      case Some(vals) => keyCandidatesVals(base.files,
        base.schemaChanges, cols.head, vals.filter(_ != null))
      case None => keyCandidates(base, distinctKeys, cols)
    }
    val dead =
      if (candidates.isEmpty) 0L
      else readLive(spark, table, base, candidates)
        .select(cols.map(col): _*)
        .join(distinctKeys, cols, "left_semi").count()
    if (dead == 0L) return base.version
    val rel = s"deletes/${java.util.UUID.randomUUID()}"
    distinctKeys.write.mode("errorifexists")
      .option("mapreduce.fileoutputcommitter.algorithm.version",
        "2") // published by the manifest CAS, as in [[stage]]
      .parquet(s"$table/$rel")
    stagedSchemaCache.put(s"$table/$rel", distinctKeys.schema) // as in stage()
    val fs = hadoopFs(spark, table)
    var bytes = 0L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$table/$rel"),
      true)
    while (it.hasNext) bytes += it.next().getLen
    // key count off the just-written footers — a metadata read, not
    // another Spark job re-running the distinct
    val nKeys = footerRowsUnder(spark, s"$table/$rel")
    commitRetrying(spark, table) { (parent, v) =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) }
      val carriedAppends = carriedOrAbort(spark, table, base, parent,
        "delete", appended => (smallKeys match {
          case Some(vs) => keyCandidatesVals(appended,
            base.schemaChanges, cols.head, vs.filter(_ != null))
          case None => keyCandidatesIn(appended, base.schemaChanges,
            distinctKeys, cols)
        }).nonEmpty)
      Manifest(v, parent.version, "delete-mor",
        base.rows - dead + (parent.rows - base.rows),
        base.files ++ carriedAppends,
        tag.getOrElse(""),
        rangeDeletes = base.rangeDeletes,
        eqDeletes = base.eqDeletes :+
          EqDelete(rel, bytes, nKeys, cols, v),
        schemaChanges = base.schemaChanges)
    }.merge
  }

  // ---- metadata tables ---------------------------------------------------

  /** The manifest's FILE LIST as a DataFrame (the Iceberg
    * `table$files` surface): one row per data file with its size,
    * staging commit (`seq`), and per-column min/max/null stats
    * flattened to `stats_<col>_min`/`_max`/`_nulls`. Driver-built
    * from metadata already in memory — no data file is opened. The
    * operational queries this answers ("which files would a range
    * read keep", "how skewed are file sizes", "what does compaction
    * owe") otherwise need ad-hoc manifest parsing. */
  def filesTable(spark: SparkSession, table: String,
                 version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.{Row, types => T}
    val m = manifestAt(spark, table, version)
    // stats surface under CURRENT-schema names: a file written before
    // a rename stores its stats under the old name — exposing that
    // raw key would split the column across stats_<old>_* (old files)
    // and stats_<new>_* (new files), so an operational query keyed on
    // the current name silently reads nulls for old files. Each
    // file's keys walk forward through its applicable changes, the
    // same mapping the read path's pruning uses in reverse.
    val changes = m.schemaChanges.sortBy(_.seq)
    val perFile: Seq[Map[String, ColStats]] = m.files.map { f =>
      f.stats.flatMap { case (k0, st) =>
        currentName(f, k0, changes).map(_ -> st)
      }
    }
    val statCols = perFile.flatMap(_.keys).distinct.sorted
    val schema = T.StructType(
      Seq(T.StructField("path", T.StringType, nullable = false),
          T.StructField("bytes", T.LongType, nullable = false),
          T.StructField("seq", T.LongType, nullable = false)) ++
        statCols.flatMap(c => Seq(
          T.StructField(s"stats_${c}_min", T.StringType),
          T.StructField(s"stats_${c}_max", T.StringType),
          T.StructField(s"stats_${c}_nulls", T.LongType),
          T.StructField(s"stats_${c}_bloom_bits", T.LongType))))
    val rows = m.files.zip(perFile).map { case (f, stats) =>
      Row.fromSeq(Seq(f.path, f.bytes, f.seq) ++
        statCols.flatMap(c => stats.get(c) match {
          case Some(st) => Seq(st.min, st.max,
            if (st.nulls < 0) null else st.nulls,
            // bloom coverage surfaced for the maintenance dashboard:
            // which files would a point/key probe still have to open
            if (st.bloom.isEmpty) null
            else java.lang.Long.valueOf(
              java.util.Base64.getDecoder.decode(st.bloom).length * 8L))
          case None => Seq(null, null, null, null)
        }))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The COMMIT HISTORY as a DataFrame (the Iceberg `table$history`
    * surface): one row per retained version — action, row count,
    * file count/bytes, commit stamp, idempotence tag, and the counts
    * of pending merge-on-read deletes and schema changes the version
    * carries. Driver-built from the manifests. */
  def historyTable(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    mainLineage(spark, table)
      .map(m => (m.version, m.parent, m.action, m.rows,
        m.files.size.toLong, m.files.map(_.bytes).sum, m.tag,
        m.atMicros,
        (m.rangeDeletes.size + m.eqDeletes.size).toLong,
        m.schemaChanges.size.toLong))
      .toDF("version", "parent", "action", "rows", "n_files",
        "total_bytes", "tag", "at_micros", "pending_deletes",
        "pending_schema_changes")
  }

  // ---- non-additive schema evolution ------------------------------------

  /** RENAME a column — a METADATA-ONLY commit (action `schema`): no
    * data file is touched; reads map the old name to the new one for
    * files staged before the rename ([[SchemaChange]] sequencing),
    * and [[compact]] folds the mapping into real files. Pending
    * merge-on-read delete entries on the renamed column are REKEYED
    * in the new manifest so read-side delete filters always reference
    * post-rename names. Partition columns cannot be renamed (their
    * name is baked into the directory layout — compact into a new
    * layout instead). Reusing `from` in a later append creates a NEW
    * column: old files' data stays under `to`. */
  def renameColumn(spark: SparkSession, table: String,
                   from: String, to: String): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    require(from != to, "rename to the same name is a no-op")
    require(!isPartitionColumn(base, from),
      s"'$from' is a partition column — its name is the directory " +
        "layout; rewrite via compact instead")
    val cur = readLive(spark, table, base, base.files).columns.toSeq
    require(cur.contains(from), s"no column '$from' in $table " +
      cur.mkString("[", ", ", "]"))
    require(!cur.contains(to), s"column '$to' already exists in $table")
    commitRetrying(spark, table) { (parent, v) =>
      require(parent.version == base.version,
        s"table advanced v${base.version} -> v${parent.version} during " +
          "rename; rerun against the new snapshot")
      Manifest(v, parent.version, "schema", base.rows, base.files,
        rangeDeletes = base.rangeDeletes.map(d =>
          if (d.column == from) d.copy(column = to) else d),
        eqDeletes = base.eqDeletes.map(d =>
          d.copy(cols = d.cols.map(c => if (c == from) to else c))),
        schemaChanges = base.schemaChanges :+
          SchemaChange("rename", from, to, "", v))
    }.merge
  }

  /** WIDEN a column's type (`int→long` family → `"long"`,
    * `float→double` → `"double"`) — metadata-only like
    * [[renameColumn]]: old files cast at read, compaction folds.
    * Appends after the widen should write the widened type; narrower
    * appends still read correctly through Spark's union coercion. */
  def widenColumn(spark: SparkSession, table: String,
                  column: String, toTyp: String): Long = {
    require(toTyp == "long" || toTyp == "double",
      s"widen target must be 'long' or 'double', got '$toTyp'")
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    require(!isPartitionColumn(base, column),
      s"'$column' is a partition column — its values live in the " +
        "directory layout; rewrite via compact instead")
    val schema = readLive(spark, table, base, base.files).schema
    val field = schema.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"no column '$column' in " +
        schema.fieldNames.mkString("[", ", ", "]")))
    val ok = (field.dataType, toTyp) match {
      case (ByteType | ShortType | IntegerType | LongType, "long") => true
      case (FloatType | DoubleType, "double") => true
      case _ => false
    }
    require(ok, s"cannot widen ${field.dataType} to $toTyp — only " +
      "int-family to long and float-family to double are lossless")
    commitRetrying(spark, table) { (parent, v) =>
      require(parent.version == base.version,
        s"table advanced v${base.version} -> v${parent.version} during " +
          "widen; rerun against the new snapshot")
      Manifest(v, parent.version, "schema", base.rows, base.files,
        rangeDeletes = base.rangeDeletes,
        eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges :+
          SchemaChange("widen", column, column, toTyp, v))
    }.merge
  }

  /** DROP a column — metadata-only: reads of pre-drop files project
    * it away; compaction folds the removal into real files (after
    * which [[expire]] reclaims the old files and the bytes are
    * truly gone). Pending equality deletes keyed on the column block
    * the drop (they could no longer be applied) — compact first.
    * Partition columns cannot drop (directory layout). */
  def dropColumn(spark: SparkSession, table: String,
                 column: String): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    require(!isPartitionColumn(base, column),
      s"'$column' is a partition column — rewrite via compact instead")
    require(!base.eqDeletes.exists(_.cols.contains(column)) &&
      !base.rangeDeletes.exists(_.column == column),
      s"pending merge-on-read deletes reference '$column' — compact " +
        "to fold them before dropping the column")
    val cur = readLive(spark, table, base, base.files).columns.toSeq
    require(cur.contains(column), s"no column '$column' in $table " +
      cur.mkString("[", ", ", "]"))
    require(cur.size > 1, s"cannot drop the only column of $table")
    commitRetrying(spark, table) { (parent, v) =>
      require(parent.version == base.version,
        s"table advanced v${base.version} -> v${parent.version} during " +
          "drop; rerun against the new snapshot")
      Manifest(v, parent.version, "schema", base.rows, base.files,
        rangeDeletes = base.rangeDeletes,
        eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges :+
          SchemaChange("drop", column, "", "", v))
    }.merge
  }

  /** PARTITION EVOLUTION — change the table's partition layout as a
    * METADATA-ONLY commit (action `layout`, zero files touched,
    * asserted by the oracle): subsequent appends must match the NEW
    * layout ([[appendPartitioned]] validates against it), while files
    * written under the OLD layout stay readable through their own
    * directory scheme ([[readFiles]]'s per-commit `basePath` groups —
    * partition columns parse per group and union as ordinary columns,
    * the Iceberg spec-evolution semantic). Facet-filtered reads
    * partition-prune the new-layout files immediately; old-layout
    * files answer through their data columns (and manifest stats,
    * when tracked) until [[compact]] folds the whole table into the
    * new layout — compaction always re-stages under the DECLARED
    * layout, so one maintenance pass completes the migration.
    * Repartitioning to `Nil` declares the table flat. Partition
    * columns must exist in the current schema; keep them at
    * directory-count sanity (the [[appendPartitioned]] contract). */
  def repartitionTable(spark: SparkSession, table: String,
                       partitionCols: Seq[String]): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    if (declaredLayout(base) == partitionCols) return base.version
    val cur = readLive(spark, table, base, base.files).columns.toSeq
    partitionCols.foreach(c => require(cur.contains(c),
      s"no column '$c' in $table " + cur.mkString("[", ", ", "]")))
    commitRetrying(spark, table) { (parent, v) =>
      require(parent.version == base.version,
        s"table advanced v${base.version} -> v${parent.version} during " +
          "repartition; rerun against the new snapshot")
      Manifest(v, parent.version, "layout",
        base.rows, base.files,
        rangeDeletes = base.rangeDeletes, eqDeletes = base.eqDeletes,
        schemaChanges = base.schemaChanges,
        layout = Some(partitionCols))
    }.merge
  }

  /** Row-level DELETE BY PREDICATE, MERGE-ON-READ — the arbitrary-
    * condition face of [[deleteKeysMor]]: one schema-mapped scan
    * names the matching rows' `keyCol` values, and those land as an
    * equality delete (zero data files rewritten). `keyCol` must be
    * unique per row for the predicate's matches to delete EXACTLY
    * them (a shared key value would take innocent rows with it —
    * the caller's contract, same as [[merge]]'s key); matches whose
    * key is NULL are refused loudly (an equality delete can never
    * reach them — silent survival otherwise). Rows inserted later
    * with a matched key are NOT retro-deleted (the [[EqDelete]]
    * sequence rule). Use [[deleteWhere]] when a copy-on-write
    * rewrite is acceptable and predicate-exactness on duplicate
    * keys is required. */
  def deleteWhereMor(spark: SparkSession, table: String, cond: Column,
                     keyCol: String): Long = {
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val matches = readLive(spark, table, base, base.files)
      .filter(coalesce(cond, lit(false)))
    val nullKeyMatches = matches.filter(col(keyCol).isNull).count()
    require(nullKeyMatches == 0L,
      s"$nullKeyMatches matching row(s) carry a NULL '$keyCol' — an " +
        "equality delete cannot reach them; use deleteWhere " +
        "(copy-on-write) or a non-null key column")
    deleteKeysMor(matches.select(col(keyCol)).distinct(), table)
  }

  /** The typed literal a stored stat/delete repr deserializes to —
    * the exact inverse of [[reprOf]]. */
  private def reprToLit(typ: String, repr: String): Column = typ match {
    case "long" => lit(repr.toLong)
    case "double" => lit(repr.toDouble)
    case "string" => lit(repr)
    case "date" => lit(java.sql.Date.valueOf(repr))
    case "timestamp" =>
      val us = repr.toLong
      lit(java.time.Instant.ofEpochSecond(us / 1000000L,
        (us % 1000000L) * 1000L))
    case other =>
      throw new IllegalArgumentException(s"unsupported repr type $other")
  }

  /** The LIVE rows of `files` under manifest `m`: [[readFiles]] with
    * `m`'s pending merge-on-read deletes applied. A delete applies to
    * a file iff the file was staged by an EARLIER commit
    * (`file.seq < delete.seq`), so files are grouped by which deletes
    * reach them — the group count is bounded by the number of pending
    * deletes (small by construction: compaction folds them), never by
    * the file count. Range deletes become residual `NOT BETWEEN`
    * filters (codegen'd, no shuffle); equality deletes become
    * anti-joins against the key files (AQE broadcasts the small
    * side). Tables with no pending deletes pass through untouched —
    * the plan is identical to the pre-MoR one. */
  private def readLive(spark: SparkSession, table: String, m: Manifest,
                       files: Seq[FileEntry]): DataFrame = {
    if (!m.needsMapping || files.isEmpty)
      return readFiles(spark, table, files)
    val seqs = (m.rangeDeletes.map(_.seq) ++ m.eqDeletes.map(_.seq) ++
        m.schemaChanges.map(_.seq))
      .distinct.sorted
    val buckets = files.groupBy { f =>
      val i = seqs.indexWhere(_ > f.seq)
      if (i < 0) seqs.length else i
    }
    buckets.toSeq.sortBy(_._1).map { case (idx, fs) =>
      var df = readFiles(spark, table, fs)
      if (idx < seqs.length) {
        val applicable = seqs.drop(idx).toSet
        // schema changes FIRST (in commit order): delete entries are
        // rekeyed to post-change names when the change commits
        // ([[renameColumn]]), so the delete filters below always see
        // the mapped frame
        m.schemaChanges.filter(c => applicable.contains(c.seq))
          .sortBy(_.seq).foreach { c =>
            c.kind match {
              case "rename" =>
                if (df.columns.contains(c.from))
                  df = df.withColumnRenamed(c.from, c.to)
              case "widen" =>
                if (df.columns.contains(c.from))
                  df = df.withColumn(c.from, col(c.from).cast(
                    if (c.typ == "double") DoubleType else LongType))
              case "drop" =>
                if (df.columns.contains(c.from)) df = df.drop(c.from)
              case other => throw new IllegalStateException(
                s"unknown schema change kind '$other' in manifest")
            }
          }
        m.rangeDeletes.filter(d => applicable.contains(d.seq))
          .foreach { d =>
            // keep = outside the range, null, or NaN. This OR-of-
            // comparisons spelling (rather than NOT coalesce(BETWEEN))
            // is parquet-PUSHDOWN-friendly: row groups inside
            // surviving files still skip. NaN keeps through `> hi`
            // (Spark orders NaN above every double), null through the
            // explicit isNull — same rows as the null-safe NOT-BETWEEN.
            df = df.filter(
              col(d.column) < reprToLit(d.typ, d.lo) ||
                col(d.column) > reprToLit(d.typ, d.hi) ||
                col(d.column).isNull)
          }
        m.eqDeletes.filter(d => applicable.contains(d.seq))
          .groupBy(_.cols).toSeq.sortBy(_._1.mkString(","))
          .foreach { case (cols, ds) =>
            val keys = ds.map(d =>
                readStaged(spark, s"$table/${d.dir}",
                  Seq(s"$table/${d.dir}")))
              .reduce(_ unionByName _)
              .select(cols.map(col): _*).distinct()
            df = df.join(keys, cols, "left_anti")
          }
      }
      df
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Incremental consumption: the rows appended AFTER `sinceVersion`,
    * read straight off the file-list DIFF of the two manifests — the
    * cheap CDC a downstream pipeline polls ("give me what landed since
    * my last run") with no flag columns and no data rewritten. Sound
    * only while the interval is append-only, so any rewriting action
    * ([[compact]], [[overwrite]], [[merge]], delete) in
    * `(sinceVersion, current]` throws loudly — after a rewrite, file
    * identity no longer means row identity; re-baseline on the new
    * snapshot instead of silently double-reading rewritten rows. */
  def readAppendsSince(spark: SparkSession, table: String,
                       sinceVersion: Long): DataFrame = {
    val from = readManifest(spark, table, sinceVersion).getOrElse(
      throw new NoSuchElementException(
        s"no snapshot v$sinceVersion in $table (expired or never " +
          "committed)"))
    val cur = currentManifest(spark, table).getOrElse(
      throw new NoSuchElementException(s"no committed snapshot in $table"))
    // lineage walk (see readChangesBetween): version-range arithmetic
    // would mix branch lineages once refs exist
    val chain = scala.collection.mutable.ArrayBuffer.empty[Manifest]
    var walker: Option[Manifest] = Some(cur)
    while (walker.exists(_.version > sinceVersion)) {
      chain += walker.get
      val pv = walker.get.parent
      walker = if (pv == 0L) Some(Manifest(0L, -1L, "init", 0L, Nil))
               else readManifest(spark, table, pv)
    }
    if (!walker.exists(_.version == sinceVersion))
      throw new IllegalStateException(
        s"v$sinceVersion is not an ancestor of the current head " +
          s"v${cur.version} in $table (expired, or another lineage); " +
          "re-baseline the consumer on the current snapshot")
    chain.find(_.action != "append").foreach { m =>
      throw new IllegalStateException(
        s"v${m.version} is a '${m.action}' — the interval " +
          s"($sinceVersion, ${cur.version}] is not append-only; " +
          "re-baseline the consumer on the current snapshot")
    }
    val known = from.files.map(_.path).toSet
    val fresh = cur.files.filterNot(f => known.contains(f.path))
    if (fresh.isEmpty)
      readFiles(spark, table, cur.files).filter(lit(false))
    else readFiles(spark, table, fresh)
  }

  /** Row-level CDC that SURVIVES REWRITES — the consumer-facing
    * superset of [[readAppendsSince]]: every table row plus a
    * `_change` column (`insert` / `delete`) describing the NET
    * change from `sinceVersion` to the current snapshot.
    *
    * Three regimes, picked automatically:
    *  - APPEND-ONLY interval → the free path: the manifest file diff
    *    ([[readAppendsSince]]), every row an `insert`, no shuffle, no
    *    old-snapshot read.
    *  - Rewrites in the interval, full chain retained → the
    *    CHAIN-WALK DIFF: each commit contributes its own delta
    *    derived from its action (appends read only fresh files,
    *    merge-on-read deletes read only the stats/bloom-pruned files
    *    they could affect, CoW commits read only the files they
    *    swapped, COMPACTION CONTRIBUTES NOTHING — it is
    *    row-count-verified value-preserving), and the weighted
    *    fingerprint combine nets everything: work scales with
    *    CHANGED rows, never table size (the Iceberg-v3 row-lineage
    *    goal, achieved from the manifest chain alone with no lineage
    *    columns stored in data files).
    *  - Chain incomplete / unknown action → the FINGERPRINT MULTISET
    *    DIFF of the two endpoint snapshots: both group by a full-row
    *    md5 ([[graft.ops.Diff.rowFingerprint]]) with counts; two
    *    snapshot scans plus one shuffle on 16-byte keys — the honest
    *    lower bound with nothing else to trust.
    *
    * All regimes share multiset semantics: a value-preserving
    * compaction diffs EMPTY and rows inserted-then-deleted inside
    * the window cancel — downstream incremental consumers ride
    * through maintenance instead of re-baselining. Columns added by
    * the interval (additive evolution) read as null on the base
    * side, so a row that merely gained a null column does NOT
    * churn. */
  def readChangesSince(spark: SparkSession, table: String,
                       sinceVersion: Long): DataFrame = {
    val cur = currentManifest(spark, table).getOrElse(
      throw new NoSuchElementException(s"no committed snapshot in $table"))
    readChangesBetween(spark, table, sinceVersion, cur.version)
  }

  /** [[readChangesSince]] bounded on BOTH ends: the net row-level
    * change from `sinceVersion` to `untilVersion` (both retained) —
    * the replay/backfill spelling: a consumer that processed up to a
    * pinned version can diff any historical window without racing
    * live commits. Same two regimes as the open-ended form. */
  def readChangesBetween(spark: SparkSession, table: String,
                         sinceVersion: Long,
                         untilVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{abs, count => fCount,
      explode, first, least, lit => fLit, sequence, shiftright,
      struct, sum => fSum, when}
    require(untilVersion >= sinceVersion,
      s"inverted interval: ($sinceVersion, $untilVersion]")
    val cur = manifestAt(spark, table, Some(untilVersion))
    // the window is a LINEAGE, not a version range: walk parent
    // pointers from `until` down to `since` (identical to the version
    // range on a linear chain; with branch refs, version numbers are
    // shared across lineages and range arithmetic would mix them)
    val lineageBuf =
      scala.collection.mutable.ArrayBuffer.empty[Manifest]
    var walker: Option[Manifest] = Some(cur)
    while (walker.exists(_.version > sinceVersion)) {
      lineageBuf += walker.get
      val pv = walker.get.parent
      walker = if (pv == 0L) Some(Manifest(0L, -1L, "init", 0L, Nil))
               else readManifest(spark, table, pv)
    }
    // walked exactly onto `since` = the chain is trustable; an
    // expired link or a `since` on another lineage falls back to the
    // endpoint multiset diff (always correct between two states)
    val sinceManifest: Option[Manifest] =
      walker.filter(_.version == sinceVersion)
    val windowManifests = lineageBuf.reverse.toSeq
    val lineageComplete = sinceManifest.nonEmpty
    val appendOnly = lineageComplete &&
      windowManifests.forall(_.action == "append")
    if (appendOnly) {
      // the file-diff fast path against the BOUNDED end: fresh files
      // of `until` not in `since` (readAppendsSince spells the same
      // diff against the current version only)
      val from = sinceManifest.get
      val known = from.files.map(_.path).toSet
      val fresh = cur.files.filterNot(f => known.contains(f.path))
      return (if (fresh.isEmpty)
                readFiles(spark, table, cur.files).filter(lit(false))
              else readFiles(spark, table, fresh))
        .withColumn("_change", fLit("insert"))
    }
    val after = read(spark, table, Some(cur.version))
    val cols = after.columns.toSeq
    // IN-WINDOW schema changes must map every delta frame (and, on
    // the fallback path, the base snapshot) before fingerprinting: a
    // rename inside the window would otherwise null-fill the new name
    // on the base side (every row churns as a null-keyed delete +
    // insert), and a float->double widen changes the string rendering
    // of numerically identical values — either way a metadata-only
    // commit would emit a full-table spurious diff, breaking the
    // net-change contract. Changes are collected from EVERY manifest
    // in the window (not just `until`'s pending list — a compaction
    // inside the window folds and clears it) and applied in commit
    // order, exactly as the read path does.
    val winChanges = windowManifests.flatMap(_.schemaChanges)
      .filter(c => c.seq > sinceVersion && c.seq <= cur.version)
      .distinct.sortBy(_.seq)
    // conform a frame produced in the schema of `fromVersion` to the
    // until-schema: later in-window changes applied, added columns
    // null-filled, column order fixed
    def conform(df: DataFrame, fromVersion: Long): DataFrame = {
      val mapped = winChanges.filter(_.seq > fromVersion)
        .foldLeft(df) { (d, c) =>
          c.kind match {
            case "rename" =>
              if (d.columns.contains(c.from) &&
                  !d.columns.contains(c.to))
                d.withColumnRenamed(c.from, c.to) else d
            case "widen" =>
              if (d.columns.contains(c.from))
                d.withColumn(c.from, col(c.from).cast(
                  if (c.typ == "double") DoubleType else LongType))
              else d
            case "drop" =>
              if (d.columns.contains(c.from)) d.drop(c.from) else d
            case _ => d
          }
        }
      cols.foldLeft(mapped) { (d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, fLit(null))
      }.select(cols.map(col): _*)
    }
    val fp = graft.ops.Diff.rowFingerprint(cols)
    // a delta frame weighted +1 (inserted rows) or -1 (deleted rows),
    // pre-aggregated by fingerprint so the global combine sums counts
    def weighted(df: DataFrame, w: Int) = df
      .groupBy(fp.as("__fp"))
      .agg((fCount(fLit(1)) * w).cast("long").as("__w"),
        first(struct(cols.map(col): _*)).as("__row"))

    // ==CHAIN-WALK DIFF (the at-scale path)==
    // Instead of fingerprinting BOTH endpoint snapshots (O(table) no
    // matter how small the change), walk the window's commits and
    // derive each one's own delta from its action — the multiset
    // identity `until - since = Σ per-commit deltas` makes the union
    // of weighted deltas net to exactly the endpoint diff, and rows
    // inserted then deleted inside the window cancel in the combine:
    //  - append: +fresh files (a file read, no old-snapshot scan);
    //  - compact: NOTHING — the rewrite is row-count-verified and
    //    value-preserving by construction, the whole point: a
    //    maintenance pass contributes zero diff work (the Iceberg v3
    //    row-lineage goal achieved from the manifest chain alone,
    //    with no lineage columns in the data);
    //  - schema: nothing (metadata-only; conform handles rendering);
    //  - delete-mor / merge-mor: ±only the files the new delete
    //    entries can AFFECT (stats/bloom-pruned exactly like the
    //    operation's own accounting scan) plus dropped/fresh files —
    //    unaffected files have identical live sets on both sides and
    //    are never read;
    //  - CoW delete / merge / overwrite: ±only the files the commit
    //    actually swapped (removed on the parent side, staged on the
    //    child side); carried files are never read. overwrite
    //    degenerates to the full table — honest, it replaced it.
    // Work scales with CHANGED rows (+ the pruning-kept superset),
    // not table size. Falls back to the endpoint diff when the chain
    // is incomplete or carries an unrecognized action.
    val byV = windowManifests.map(m => m.version -> m).toMap
    val versions: Seq[Long] = windowManifests.map(_.version)
    val knownActions = Set("append", "compact", "schema", "layout",
      "delete", "merge", "overwrite", "delete-mor", "merge-mor")
    // each window manifest's parent is its lineage predecessor (the
    // since manifest for the first)
    val parentByV: Map[Long, Manifest] =
      windowManifests.zip(sinceManifest.toSeq ++ windowManifests)
        .map { case (m, par) => m.version -> par }.toMap
    def parentOf(v: Long): Option[Manifest] = parentByV.get(v)
    val chainComplete = lineageComplete &&
      windowManifests.forall(m => knownActions.contains(m.action))
    // plan-size guard: each delta-contributing commit adds a grouped
    // subtree to the union; a consumer that fell months behind could
    // otherwise hand Catalyst hundreds of them. Past the cap the
    // window walks in SEGMENTS of <= MaxChainDeltas delta commits,
    // each segment's net materialized before the next plans — still
    // O(changed rows), never the two-full-scan endpoint diff.
    val MaxChainDeltas = 24
    val deltaCommits = versions.count(v => byV.get(v).exists(m =>
      !Set("compact", "schema", "layout").contains(m.action)))
    def deltasOf(vs: Seq[Long]): Seq[DataFrame] = vs.flatMap { v =>
        val m = byV(v)
        val parent = parentOf(v).get
        val childPaths = m.files.map(_.path).toSet
        val parentPaths = parent.files.map(_.path).toSet
        m.action match {
          case "compact" | "schema" | "layout" => Nil
          case "append" =>
            val fresh = m.files.filterNot(f =>
              parentPaths.contains(f.path))
            if (fresh.isEmpty) Nil
            else Seq(weighted(
              conform(readFiles(spark, table, fresh), v), 1))
          case "delete-mor" | "merge-mor" =>
            val dropped = parent.files.filterNot(f =>
              childPaths.contains(f.path))
            val newRanges = m.rangeDeletes.filter(_.seq == v)
            val newEqs = m.eqDeletes.filter(_.seq == v)
            val affected = (dropped ++
              newRanges.flatMap(d =>
                keptByRangeRepr(parent.files, d.column, d.lo, d.hi,
                  parent.schemaChanges)) ++
              newEqs.flatMap(d =>
                keyCandidates(parent,
                  readStaged(spark, s"$table/${d.dir}",
                    Seq(s"$table/${d.dir}")).distinct(),
                  d.cols))).distinctBy(_.path)
            val fresh = m.files.filterNot(f =>
              parentPaths.contains(f.path))
            if (newRanges.size + newEqs.size == 1 && affected.forall(
                  f => childPaths.contains(f.path) ||
                    dropped.exists(_.path == f.path))) {
              // ==KILLED-ROWS SHORTCUT== (the common shape: one MoR
              // commit carries exactly ONE new delete entry): for a
              // surviving affected file, child-live = parent-live −
              // rows the new entry matches, so the ± sides cancel on
              // everything EXCEPT the matched rows — emit ONLY those,
              // weighted −1, off one pushdown-filtered read (a range
              // predicate reaches the parquet scan; the old spelling
              // read every affected row TWICE with no filter), plus
              // the fresh files +1. Dropped files' rows all match by
              // the wholesale-drop containment proof, so the filter
              // spelling covers them too.
              val live = readLive(spark, table, parent, affected)
              val killed = newRanges.headOption match {
                case Some(d) =>
                  live.filter(col(d.column) >= reprToLit(d.typ, d.lo) &&
                    col(d.column) <= reprToLit(d.typ, d.hi))
                case None =>
                  val d = newEqs.head
                  live.join(
                    readStaged(spark, s"$table/${d.dir}",
                      Seq(s"$table/${d.dir}"))
                      .select(d.cols.map(col): _*).distinct(),
                    d.cols, "left_semi")
              }
              (if (affected.isEmpty) Nil
               else Seq(weighted(
                 conform(killed, parent.version), -1))) ++
              (if (fresh.isEmpty) Nil
               else Seq(weighted(conform(
                 readLive(spark, table, m, fresh), v), 1)))
            } else {
              // several new entries in one commit (no current writer
              // does this): the general two-sided spelling
              val survivors = affected.filter(f =>
                childPaths.contains(f.path))
              val plusSide = survivors ++ fresh
              (if (affected.isEmpty) Nil
               else Seq(weighted(conform(
                 readLive(spark, table, parent, affected),
                 parent.version), -1))) ++
              (if (plusSide.isEmpty) Nil
               else Seq(weighted(conform(
                 readLive(spark, table, m, plusSide), v), 1)))
            }
          case _ => // delete | merge | overwrite: the swapped files
            val removed = parent.files.filterNot(f =>
              childPaths.contains(f.path))
            val staged = m.files.filterNot(f =>
              parentPaths.contains(f.path))
            (if (removed.isEmpty) Nil
             else Seq(weighted(conform(
               readLive(spark, table, parent, removed),
               parent.version), -1))) ++
            (if (staged.isEmpty) Nil
             else Seq(weighted(conform(
               readLive(spark, table, m, staged), v), 1)))
        }
      }
    // the shared final combine: weighted deltas (or already-netted
    // segment frames — same (__fp, __w, __row) shape) sum to the net
    def combined(ws: Seq[DataFrame]): DataFrame =
      ws.reduce(_ unionByName _)
        .groupBy(col("__fp"))
        .agg(fSum(col("__w")).as("__delta"),
          first(col("__row")).as("__row"))
        .filter(col("__delta") =!= 0L)
    val emptyDiff = after.filter(lit(false))
      .withColumn("_change", fLit("insert"))
    val net =
      if (!chainComplete) {
        // endpoint multiset diff: two full snapshot scans — the
        // honest lower bound when the chain cannot be trusted
        val before = conform(read(spark, table, Some(sinceVersion)),
          sinceVersion)
        combined(Seq(weighted(before, -1), weighted(after, 1)))
      } else if (deltaCommits <= MaxChainDeltas) {
        val ws = deltasOf(versions)
        if (ws.isEmpty) return emptyDiff
        combined(ws)
      } else {
        // ==SEGMENTED chain walk== (a consumer that fell MONTHS
        // behind): past the plan-size cap the window splits into
        // consecutive segments of <= MaxChainDeltas delta commits;
        // each segment's deltas combine and MATERIALIZE
        // (localCheckpoint — the segment net is bounded by the
        // segment's CHANGED rows, and the checkpoint truncates its
        // grouped-union subtree out of the outer plan), then the
        // materialized nets sum exactly like per-commit deltas (the
        // multiset identity telescopes across segments; rows
        // inserted in one segment and deleted in another still
        // cancel in the outer combine). Work stays O(changed rows)
        // for arbitrarily long windows; Catalyst only ever sees
        // MaxChainDeltas grouped subtrees at once. The checkpoint
        // trades re-computability for bounded plans — a lost
        // executor during the diff recomputes the READ (rerun the
        // poll), it never corrupts it.
        val segs = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer.empty[Long])
        var cnt = 0
        versions.foreach { v =>
          val isDelta = !Set("compact", "schema", "layout")
            .contains(byV(v).action)
          if (isDelta && cnt == MaxChainDeltas) {
            segs += scala.collection.mutable.ArrayBuffer.empty[Long]
            cnt = 0
          }
          segs.last += v
          if (isDelta) cnt += 1
        }
        val segNets = segs.toSeq.flatMap { seg =>
          val ws = deltasOf(seg.toSeq)
          if (ws.isEmpty) None
          else Some(ws.reduce(_ unionByName _)
            .groupBy(col("__fp"))
            .agg(fSum(col("__w")).as("__w"),
              first(col("__row")).as("__row"))
            .filter(col("__w") =!= 0L)
            .localCheckpoint())
        }
        if (segNets.isEmpty) return emptyDiff
        combined(segNets)
      }
    // per-row copies via a TWO-LEVEL expansion: a single explode of
    // sequence(1, |delta|) materializes one |delta|-long array in one
    // row — a mass-duplicate fingerprint (millions of identical rows
    // deleted at once) would be an executor memory hazard. Chunking
    // caps any materialized array at `Chunk` elements (the outer
    // level emits |delta|/Chunk chunk indexes, itself array-bounded
    // the same way only above Chunk² ≈ 4.3e9 copies of ONE row).
    val Chunk = 65536L // 2^16: shiftright is the exact integer divide
    net
      .select(col("__row"), col("__delta"),
        explode(sequence(fLit(0L),
          shiftright(abs(col("__delta")) - 1L, 16))).as("__c"))
      .select(col("__row"), col("__delta"),
        explode(sequence(fLit(1L),
          least(fLit(Chunk),
            abs(col("__delta")) - col("__c") * Chunk))).as("__k"))
      .select(cols.map(c => col("__row." + c)) :+
        when(col("__delta") > 0L, fLit("insert"))
          .otherwise(fLit("delete")).as("_change"): _*)
  }

  /** A DURABLE incremental consumer — the polling loop every
    * downstream pipeline writes by hand, done once: reads the
    * consumer's last-processed version from `stateDir`, hands the net
    * changes since then (via [[readChangesBetween]], so rewrites in
    * the window ride the chain-walk diff — a compaction costs the
    * consumer NOTHING — instead of breaking it) to `handler`, and
    * advances the baseline ATOMICALLY
    * (scratch + rename) only after the handler returns. The window's
    * upper bound is pinned BEFORE the handler runs — a commit racing
    * the poll lands in the next window, never half in this one.
    *
    * At-least-once: a crash after the handler but before the baseline
    * write replays the SAME `(since, until]` window next poll — the
    * window bounds are the handler's idempotence key (tag your side
    * effects with them, the [[graft.streaming.CurationStream
    * .landSnapshot]] batch-tag pattern). A first-time consumer
    * (`stateDir` empty) receives the whole current snapshot as
    * inserts. A consumer that fell behind retention (its baseline
    * expired) fails LOUDLY at resolve — re-baseline deliberately,
    * never silently skip.
    *
    * Returns the processed `(since, until]` window, or None when
    * already up to date. */
  def consumeChanges(spark: SparkSession, table: String,
                     stateDir: String)
                    (handler: DataFrame => Unit): Option[(Long, Long)] = {
    import org.apache.spark.sql.functions.{lit => fLit}
    // baseline state goes through Hadoop FS ([[SidecarIo]]): a
    // consumer whose stateDir is hdfs:// or s3a:// must find its
    // baseline there — the java.nio spelling reported it absent and
    // silently re-sent the whole table as inserts every poll
    val statePath = s"$stateDir/baseline.json"
    val since: Long = SidecarIo.readString(spark, statePath)
      .map(s => new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(s).path("version").asLong(0L))
      .getOrElse(0L)
    val cur = currentManifest(spark, table).getOrElse(
      throw new NoSuchElementException(s"no committed snapshot in $table"))
    if (cur.version <= since) return None
    val changes =
      if (since == 0L) read(spark, table, Some(cur.version))
        .withColumn("_change", fLit("insert"))
      else readChangesBetween(spark, table, since, cur.version)
    handler(changes)
    SidecarIo.writeStringAtomic(spark, statePath,
      s"""{"version":${cur.version}}""")
    Some((since, cur.version))
  }

  /** [[readFilesWithPath]] carrying EVERY table column (for predicate
    * scans whose referenced columns aren't statically known). */
  private def readFilesAllWithPath(spark: SparkSession, table: String,
                                   files: Seq[FileEntry]): DataFrame = {
    val byCommit = files.groupBy(f =>
      f.path.split('/').take(2).mkString("/")).toSeq.sortBy(_._1)
    byCommit.map { case (root, fs) =>
      val df = readStaged(spark, s"$table/$root",
        stageDirPath(table, fs))
      df.select(col("_metadata.file_path").as("__file") +:
        df.columns.toSeq.map(col): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  // ---- read paths ------------------------------------------------------

  /** The table at `version` (default: latest committed). The returned
    * frame plans from the manifest's explicit file list — it IS the
    * pinned snapshot; later commits cannot change what it reads. */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val m = manifestAt(spark, table, version)
    if (m.files.isEmpty)
      throw new NoSuchElementException(s"snapshot v${m.version} is empty")
    readLive(spark, table, m, m.files)
  }

  /** A RANGE-SELECTIVE read (`lower ≤ column ≤ upper`, both bounds
    * inclusive) that DATA-SKIPS at the manifest: files whose recorded
    * min/max cannot intersect the range are dropped from the plan
    * before Spark ever lists them — the driver-side pruning that makes
    * a selective read of a 100 TB table cost its selectivity, not its
    * size (on top of it, parquet footer pruning inside the surviving
    * files behaves as usual). Files without stats on `column` are kept
    * (conservative), so the result is EXACT for any stats coverage:
    * the residual `BETWEEN` filter is always applied. Bounds take
    * natural Scala/Java values (numbers; `yyyy-MM-dd` strings or
    * `java.sql.Date`; `java.sql.Timestamp`/`Instant`). */
  def readWhere(spark: SparkSession, table: String, column: String,
                lower: Any, upper: Any,
                version: Option[Long] = None): DataFrame = {
    val m = manifestAt(spark, table, version)
    if (m.files.isEmpty)
      throw new NoSuchElementException(s"snapshot v${m.version} is empty")
    val kept = keptByRange(m.files, column, lower, upper,
      m.schemaChanges)
    val residual: Column =
      col(column) >= lit(lower) && col(column) <= lit(upper)
    if (kept.isEmpty)
      // every file provably out of range: an empty frame with the
      // table schema (Catalyst folds the scan away under filter-false)
      readFiles(spark, table, m.files).filter(lit(false))
    else readLive(spark, table, m, kept).filter(residual)
  }

  /** TIME TRAVEL BY TIMESTAMP: the table as of wall-clock `tsMicros`
    * (epoch micros) — the latest committed version whose commit stamp
    * is ≤ the asked time. Resolution is by MAX VERSION among
    * qualifying manifests, so a clock-skewed later commit (NTP step
    * between writers) is included rather than silently hiding newer
    * data — commit ORDER is the truth, the timestamp is the index.
    * Throws when the asked time predates every retained commit
    * (including pre-timestamp manifests, whose stamp is 0). */
  def readAsOf(spark: SparkSession, table: String,
               tsMicros: Long): DataFrame = {
    val qualifying = mainLineage(spark, table)
      .filter(m => m.atMicros > 0L && m.atMicros <= tsMicros)
    if (qualifying.isEmpty)
      throw new NoSuchElementException(
        s"no snapshot in $table committed at or before $tsMicros " +
          "(expired, never committed, or a pre-timestamp manifest)")
    read(spark, table, Some(qualifying.map(_.version).max))
  }

  /** (files in the snapshot, files a [[readWhere]] with these bounds
    * would plan) — the observable data-skipping contract, for specs
    * and capacity math. */
  def pruneCount(spark: SparkSession, table: String, column: String,
                 lower: Any, upper: Any,
                 version: Option[Long] = None): (Int, Int) = {
    val m = manifestAt(spark, table, version)
    (m.files.size,
      keptByRange(m.files, column, lower, upper, m.schemaChanges).size)
  }

  /** A POINT-lookup read (`column = value`) that prunes at the
    * manifest with BOTH indexes: min/max range admission AND, when
    * the writer recorded one ([[append]] `bloomCols`), the per-file
    * Bloom filter — the index that matters on a table whose file key
    * ranges all overlap (any unclustered append history), where range
    * stats alone keep every file and a needle lookup would open all
    * of them. Exact for any coverage: the residual `=` filter always
    * applies, and a filterless or saturated Bloom only keeps more
    * files, never drops a matching one. */
  def readEquals(spark: SparkSession, table: String, column: String,
                 value: Any, version: Option[Long] = None): DataFrame = {
    val m = manifestAt(spark, table, version)
    if (m.files.isEmpty)
      throw new NoSuchElementException(s"snapshot v${m.version} is empty")
    val kept = keptByEquals(m.files, column, value, m.schemaChanges)
    if (kept.isEmpty)
      readFiles(spark, table, m.files).filter(lit(false))
    else readLive(spark, table, m, kept)
      .filter(col(column) === lit(value))
  }

  /** An IN-LIST read (`column IN (values)`) with the same two-index
    * manifest pruning as [[readEquals]]: a file is planned iff at
    * least ONE value is range-admitted AND bloom-possible — the
    * multi-needle lookup (entity backfills, key audits) that would
    * otherwise open every file of an overlapping-range table. Exact
    * for any coverage: the residual `isin` always applies. */
  def readIn(spark: SparkSession, table: String, column: String,
             values: Seq[Any],
             version: Option[Long] = None): DataFrame = {
    require(values.nonEmpty, "empty IN list")
    val m = manifestAt(spark, table, version)
    if (m.files.isEmpty)
      throw new NoSuchElementException(s"snapshot v${m.version} is empty")
    // Per-value work is hoisted OUT of the per-file loop: reprs and
    // Bloom hashes compute once per stat type (one table shares it),
    // and each file's filter base64-decodes once — the values × files
    // inner loop is comparisons and bit tests, never re-hashing (the
    // keptByKeyBlooms discipline). Past the probe cap the Bloom layer
    // is skipped (range pruning stands — a thousands-strong IN list
    // hits most files anyway and the residual isin is always exact).
    val MaxBloomProbeValues = 10000
    val reprCache =
      scala.collection.mutable.Map.empty[String, Array[String]]
    val hashCache =
      scala.collection.mutable.Map.empty[String, Array[Long]]
    val kept = m.files.filter { f =>
      fileStats(f, column, m.schemaChanges) match {
        case None => true
        case Some(s) =>
          val reprs = reprCache.getOrElseUpdate(s.typ,
            values.map(v => reprOf(s.typ, v)).toArray)
          val admitted = reprs.indices.filter(i =>
            cmp(s.typ, s.max, reprs(i)) >= 0 &&
              cmp(s.typ, s.min, reprs(i)) <= 0)
          if (admitted.isEmpty) false
          else if (s.bloom.isEmpty ||
              values.size > MaxBloomProbeValues) true
          else {
            val hs = hashCache.getOrElseUpdate(s.typ,
              reprs.map(r => FileBloom.hashRepr(s.typ, r)))
            val bloom = java.util.Base64.getDecoder.decode(s.bloom)
            admitted.exists(i => FileBloom.mayContainHash(bloom, hs(i)))
          }
      }
    }
    if (kept.isEmpty)
      readFiles(spark, table, m.files).filter(lit(false))
    else readLive(spark, table, m, kept)
      .filter(col(column).isin(values: _*))
  }

  /** (files in the snapshot, files a [[readEquals]] would open) —
    * the observable point-lookup pruning contract. */
  def equalsPruneCount(spark: SparkSession, table: String,
                       column: String, value: Any,
                       version: Option[Long] = None): (Int, Int) = {
    val m = manifestAt(spark, table, version)
    (m.files.size,
      keptByEquals(m.files, column, value, m.schemaChanges).size)
  }

  /** (files in the snapshot, files a [[deleteKeysMor]] /
    * [[mergeMor]] accounting scan over `keys` would open) — the
    * observable key-list pruning contract (range envelope + Bloom). */
  def keyPruneCount(spark: SparkSession, table: String,
                    keys: DataFrame,
                    version: Option[Long] = None): (Int, Int) = {
    val m = manifestAt(spark, table, version)
    (m.files.size,
      keyCandidates(m, keys.distinct(), keys.columns.toSeq).size)
  }

  /** Files whose stats and Bloom filter both ADMIT equality with
    * `value` (files without stats/filter on the column keep). The
    * value's repr and Bloom hash compute once per stat type — the
    * per-file loop is a comparison plus bit tests. */
  private def keptByEquals(files: Seq[FileEntry], column: String,
                           value: Any, changes: Seq[SchemaChange])
      : Seq[FileEntry] = {
    val reprCache = scala.collection.mutable.Map.empty[String, String]
    val hashCache = scala.collection.mutable.Map.empty[String, Long]
    files.filter { f =>
      fileStats(f, column, changes) match {
        case None => true
        case Some(s) =>
          val r = reprCache.getOrElseUpdate(s.typ, reprOf(s.typ, value))
          cmp(s.typ, s.max, r) >= 0 && cmp(s.typ, s.min, r) <= 0 &&
            (s.bloom.isEmpty || FileBloom.mayContainHash(
              java.util.Base64.getDecoder.decode(s.bloom),
              hashCache.getOrElseUpdate(s.typ,
                FileBloom.hashRepr(s.typ, r))))
      }
    }
  }

  private def manifestAt(spark: SparkSession, table: String,
                         version: Option[Long]): Manifest = version match {
    case Some(v) => readManifest(spark, table, v).getOrElse(
      throw new NoSuchElementException(s"no snapshot v$v in $table " +
        "(expired or never committed)"))
    case None => currentManifest(spark, table).getOrElse(
      throw new NoSuchElementException(s"no committed snapshot in $table"))
  }

  /** The stats of `column` in file `f` — keyed by the name the file
    * was WRITTEN under: a rename committed after the file (`seq`
    * ordering) leaves the file's stats under the old name, so the
    * current name walks the applicable renames BACKWARD to find the
    * stored key. Keeps data skipping alive through a rename without
    * waiting for compaction to rewrite the stats. */
  private def fileStats(f: FileEntry, column: String,
                        changes: Seq[SchemaChange]): Option[ColStats] =
    f.stats.get(writtenName(f, column, changes))

  /** The name file `f` was WRITTEN under for current-schema `column`:
    * applicable renames (seq after the file) walked backward. */
  private def writtenName(f: FileEntry, column: String,
                          changes: Seq[SchemaChange]): String = {
    var name = column
    changes.filter(c => c.kind == "rename" && c.seq > f.seq)
      .sortBy(-_.seq).foreach { c =>
        if (c.to == name) name = c.from
      }
    name
  }

  /** Loud guard for the physical detection scans ([[merge]] stage 2,
    * [[deleteWhere]]'s predicate scan) that read files by CURRENT
    * column names: a pending rename would make an old file's column
    * invisible to them — [[merge]] would fail late with an analysis
    * error, [[deleteWhere]] would SILENTLY null-miss old files'
    * rows. Fold the rename (compact) before these operations. */
  private def requireUnrenamed(base: Manifest, cols: Iterable[String],
                               op: String): Unit = {
    val bad = cols.filter(c => base.files.exists(f =>
      writtenName(f, c, base.schemaChanges) != c)).toSeq.distinct
    require(bad.isEmpty,
      s"$op references ${bad.mkString("[", ", ", "]")}, renamed by a " +
        "pending schema change some files predate — compact to fold " +
        "the rename first")
  }

  /** Files whose stats ADMIT the inclusive range (plus every file
    * without stats on the column — "can't prove absent" keeps).
    * Rename-aware via [[fileStats]]. */
  private def keptByRange(files: Seq[FileEntry], column: String,
                          lower: Any, upper: Any,
                          changes: Seq[SchemaChange] = Nil)
      : Seq[FileEntry] =
    files.filter { f =>
      fileStats(f, column, changes) match {
        case None => true
        case Some(s) =>
          val lo = reprOf(s.typ, lower)
          val hi = reprOf(s.typ, upper)
          cmp(s.typ, s.max, lo) >= 0 && cmp(s.typ, s.min, hi) <= 0
      }
    }

  /** [[keptByRange]] with bounds ALREADY in typed-repr form (the
    * serialization a stored [[RangeDelete]] carries) — the chain-walk
    * differ replays a delete commit's own pruning from its manifest
    * entry. */
  private def keptByRangeRepr(files: Seq[FileEntry], column: String,
                              loRepr: String, hiRepr: String,
                              changes: Seq[SchemaChange])
      : Seq[FileEntry] =
    files.filter { f =>
      fileStats(f, column, changes) match {
        case None => true
        case Some(s) =>
          cmp(s.typ, s.max, loRepr) >= 0 && cmp(s.typ, s.min, hiRepr) <= 0
      }
    }

  /** The files a single-column key-list operation must open: range
    * stats drop files whose [min, max] cannot intersect the keys'
    * envelope, then per-file Bloom filters ([[FileBloom]]) drop
    * range-overlapping files that provably contain NONE of the keys.
    * Multi-column keys (no single envelope) keep everything —
    * conservative. Shared by [[deleteKeysMor]], [[mergeMor]], and
    * [[keyPruneCount]] so the observable prune contract IS the
    * accounting scan's plan. */
  private def keyCandidates(base: Manifest, distinctKeys: DataFrame,
                            cols: Seq[String]): Seq[FileEntry] =
    keyCandidatesIn(base.files, base.schemaChanges, distinctKeys, cols)

  /** [[keyCandidates]] over an explicit file list — also the
    * CONFLICT test of the rewrite-commit retry ([[carriableAppends]]):
    * an interleaved append's files are carriable iff none of them can
    * contain a rewrite-affected key, which is exactly "this prune
    * leaves nothing" (stat-less files keep, i.e. conflict —
    * conservative in both uses). */
  private def keyCandidatesIn(files: Seq[FileEntry],
                              changes: Seq[SchemaChange],
                              distinctKeys: DataFrame,
                              cols: Seq[String]): Seq[FileEntry] =
    if (cols.size == 1 && files.exists(f =>
          fileStats(f, cols.head, changes).nonEmpty)) {
      val c = cols.head
      val hasBloom = files.exists(f =>
        fileStats(f, c, changes).exists(_.bloom.nonEmpty))
      // with Bloom coverage the probe needs the collected key set
      // anyway, so collect FIRST and derive the range envelope from
      // the same sample — one Spark job where the old spelling ran a
      // min/max aggregate AND a collect over the same keys
      val sample =
        if (hasBloom) distinctKeys.limit(MaxProbeKeys + 1).collect()
        else Array.empty[org.apache.spark.sql.Row]
      if (hasBloom && sample.length <= MaxProbeKeys) {
        keyCandidatesVals(files, changes, c,
          sample.map(_.get(0)).filter(_ != null))
      } else {
        // no Bloom coverage (or key set over the probe cap): the
        // envelope prune from one aggregate, exactly as before
        val b = distinctKeys.agg(min(col(c)), max(col(c))).head()
        if (b.isNullAt(0)) Nil
        else keptByRange(files, c, b.get(0), b.get(1), changes)
      }
    } else files

  /** The merge paths' SMALL-SOURCE probe: one bounded collect
    * (`limit(MaxProbeKeys + 1)` — a LIMIT short-circuits, one
    * early-out partition scan even over a huge source) classifies the
    * source. Some(values, nulls included) = the WHOLE key set is in
    * hand, so row count, duplicate check, candidate pruning and
    * conflict tests become driver arithmetic; None = over the cap
    * (fall back to the aggregate spellings) or a key type whose
    * driver equality diverges from SQL's (binary compares by
    * reference, nested types by element identity — the fast path
    * would mis-judge distinctness). */
  private def smallKeySample(srcKeys: DataFrame): Option[Array[Any]] =
    srcKeys.schema.head.dataType match {
      case BinaryType | _: ArrayType | _: MapType | _: StructType =>
        None
      case _ =>
        val rows = srcKeys.limit(MaxProbeKeys + 1).collect()
        if (rows.length <= MaxProbeKeys) Some(rows.map(_.get(0)))
        else None
    }

  /** Driver-side distinct count matching SQL `count_distinct` for the
    * plain scalar key types [[smallKeySample]] admits: float/double
    * negative zeros collapse onto positive zero (SQL equality treats
    * them equal; boxed `equals` does not), and NaN already equals
    * itself under boxing exactly as under SQL aggregation. */
  private def sqlDistinctCount(vals: Array[Any]): Int =
    vals.iterator.map {
      case d: java.lang.Double if d.doubleValue == 0.0 =>
        java.lang.Double.valueOf(0.0): Any
      case f: java.lang.Float if f.floatValue == 0.0f =>
        java.lang.Float.valueOf(0.0f): Any
      case v => v
    }.toSet.size

  /** [[keyCandidatesIn]] over an ALREADY-COLLECTED key set — zero
    * Spark jobs: range-envelope prune under the SAME total order the
    * stats comparator uses (`cmp` over typed reprs — for any key v,
    * lo <= repr(v) <= hi, so the range filter keeps a conservative
    * superset exactly as the aggregate-derived bounds did), then
    * per-file Bloom probes (files without a filter always keep).
    * `vals` must be the key set's NON-NULL values; an empty set
    * candidates nothing (anti-join equality matches no null). */
  private def keyCandidatesVals(files: Seq[FileEntry],
                                changes: Seq[SchemaChange],
                                c: String,
                                vals: Array[Any]): Seq[FileEntry] =
    if (vals.isEmpty) Nil // all-null keys: anti-join matches nothing
    else if (!files.exists(f => fileStats(f, c, changes).nonEmpty)) files
    else {
      val envCache =
        scala.collection.mutable.Map.empty[String, (String, String)]
      def env(typ: String): (String, String) =
        envCache.getOrElseUpdate(typ, {
          val reprs = vals.map(v => reprOf(typ, v))
          (reprs.reduce((a, b) => if (cmp(typ, a, b) <= 0) a else b),
           reprs.reduce((a, b) => if (cmp(typ, a, b) >= 0) a else b))
        })
      val ranged = files.filter { f =>
        fileStats(f, c, changes) match {
          case None => true
          case Some(s) =>
            val (lo, hi) = env(s.typ)
            cmp(s.typ, s.max, lo) >= 0 && cmp(s.typ, s.min, hi) <= 0
        }
      }
      keptByKeyBloomVals(ranged, c, vals, changes)
    }

  /** Bloom-prune `files` against an ALREADY-COLLECTED key set: keep a
    * file iff it might contain AT LEAST ONE key. Probing is
    * driver-side; the caller bounds the set
    * ([[keyCandidatesIn]]'s probe cap). Files without a filter on the
    * column always keep.
    * Hash each key ONCE per stat type (files of one table share it;
    * a rename never changes it) and decode each filter once — the
    * inner loop is keys x files and must stay bit tests, not md5s. */
  private def keptByKeyBloomVals(files: Seq[FileEntry], column: String,
                                 vals: Array[Any],
                                 changes: Seq[SchemaChange])
      : Seq[FileEntry] = {
    val hashCache = scala.collection.mutable.Map.empty[String, Array[Long]]
    files.filter { f =>
      fileStats(f, column, changes) match {
        case Some(s) if s.bloom.nonEmpty =>
          val hs = hashCache.getOrElseUpdate(s.typ,
            vals.map(v => FileBloom.hashRepr(s.typ, reprOf(s.typ, v))))
          val bloom = java.util.Base64.getDecoder.decode(s.bloom)
          hs.exists(h => FileBloom.mayContainHash(bloom, h))
        case _ => true
      }
    }
  }

  /** Plan a frame over an explicit manifest file list. Partitioned
    * layouts ([[appendPartitioned]]) need one `basePath` per COMMIT
    * (Spark's partition discovery refuses multiple roots under a
    * single basePath), so files group by their `data/<uuid>` staging
    * root, each group reads with its own basePath (partition columns
    * parse from the k=v dirs, pruning binds per group), and groups
    * union. Commit-count is bounded by compaction cadence — a
    * compacted snapshot is ONE group.
    *
    * The union allows MISSING columns (ADDITIVE schema evolution: a
    * commit may introduce new columns; rows from earlier commits read
    * them as null — the Iceberg add-column semantic). The one-layout
    * rule (same partition columns on every commit, or none) is
    * enforced LOUDLY at append time, where the writer can fix it —
    * with permissive unions a read-side mismatch would otherwise
    * null-fill silently. */
  /** Driver-side schema cache for IMMUTABLE parquet directories (a
    * commit's `data/<uuid>` staging root and `deletes/<uuid>` key
    * dirs are written ONCE, `errorifexists`, and never change): the
    * first read of a dir infers its schema as usual; every later
    * DataFrame over the same dir passes the cached schema explicitly,
    * which skips Spark's per-`DataFrameReader.parquet` footer
    * schema-inference pass — measurably one small job plus driver
    * time PER READ on the commit-heavy operations (a merge plans the
    * same staging roots four times). Never used for mutable dirs.
    * Bounded: cleared wholesale past 4096 entries (UUID dirs are
    * per-commit; a long session would otherwise grow it forever). */
  private val stagedSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  /** Read immutable staged parquet `paths` under `basePath` with the
    * dir's cached schema (inferred once). */
  private def readStaged(spark: SparkSession, basePath: String,
                         paths: Seq[String]): DataFrame = {
    val cached = stagedSchemaCache.get(basePath)
    val r0 = spark.read.option("basePath", basePath)
    if (cached != null) r0.schema(cached).parquet(paths: _*)
    else {
      val df = r0.parquet(paths: _*)
      if (stagedSchemaCache.size > 4096) stagedSchemaCache.clear()
      stagedSchemaCache.put(basePath, df.schema)
      df
    }
  }

  private def readFiles(spark: SparkSession, table: String,
                        files: Seq[FileEntry]): DataFrame = {
    val byCommit = files.groupBy(f =>
      f.path.split('/').take(2).mkString("/")).toSeq.sortBy(_._1)
    byCommit.map { case (root, fs) =>
      readStaged(spark, s"$table/$root", stageDirPath(table, fs))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The append-time loudness behind [[readFiles]]'s permissive
    * union: a new commit's partition layout must match the table's
    * DECLARED layout ([[repartitionTable]] evolves it; legacy tables
    * derive it from their files). */
  private def requireSameLayout(parent: Manifest,
                                partitionCols: Seq[String]): Unit = {
    if (parent.files.isEmpty && parent.layout.isEmpty) return
    val existing = declaredLayout(parent)
    require(existing == partitionCols,
      s"partition layout mismatch: table is " +
        s"${if (existing.isEmpty) "unpartitioned" else existing.mkString("[", ",", "]")}, " +
        s"append is ${if (partitionCols.isEmpty) "unpartitioned" else partitionCols.mkString("[", ",", "]")} " +
        "— repartitionTable to change the layout")
  }

  /** [[readFiles]] narrowed to `cols` plus the provenance column
    * `__file` (the absolute file path). `_metadata` only resolves on a
    * bare file relation — it must be projected per commit group BEFORE
    * the union, so this cannot be spelled as a select on
    * [[readFiles]]'s result. */
  private def readFilesWithPath(spark: SparkSession, table: String,
                                files: Seq[FileEntry],
                                cols: Seq[String]): DataFrame = {
    val byCommit = files.groupBy(f =>
      f.path.split('/').take(2).mkString("/")).toSeq.sortBy(_._1)
    byCommit.map { case (root, fs) =>
      readStaged(spark, s"$table/$root", stageDirPath(table, fs))
        .select(col("_metadata.file_path").as("__file") +:
          cols.map(col): _*)
    }.reduce(_ unionByName _)
  }

  /** All committed versions, oldest first: (version, action, files,
    * rows, tag). */
  def versions(spark: SparkSession, table: String)
      : Seq[(Long, String, Int, Long, String)] =
    mainLineage(spark, table)
      .map(m => (m.version, m.action, m.files.size, m.rows, m.tag))

  def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val vs = listVersions(spark, table)
    if (vs.isEmpty) None else Some(vs.max)
  }

  // ---- branch refs (write-audit-publish) ---------------------------------
  //
  // NAMED REFS over the manifest chain (the Iceberg branch/tag model):
  // a refs file under `_snapshots/` maps branch names to head VERSIONS.
  // Refs are themselves versioned and CAS-claimed (`refs-vK.json`
  // through the same scratch + atomic-bind as manifests), so branch
  // head movement is serialized exactly like commits. A table with no
  // refs file is in LEGACY mode: its main head IS its latest version
  // and nothing below changes any behavior — refs appear only when
  // [[createBranch]] first runs.
  //
  // The workflow this exists for is WRITE-AUDIT-PUBLISH: a pipeline
  // lands risky data on an `audit` branch (invisible to every main
  // reader), the oracle/quality queries run against [[readBranch]],
  // and [[publish]] fast-forwards main to the audited head — a
  // metadata-only promotion, no data moves. In refs mode, commits
  // claim GLOBALLY unique version numbers (the claim CAS) but
  // serialize per branch on the ref advance: a commit whose branch
  // head moved underneath it deletes its claimed manifest (still
  // invisible — readers resolve through refs) and retries. A crash
  // between claim and ref-advance leaves an unreachable manifest
  // that [[expire]] sweeps past the grace horizon.

  private final case class Refs(v: Long, heads: Map[String, Long])

  private def refsName(k: Long): String = f"refs-v$k%012d.json"

  private def refsPath(table: String,
                       k: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$table/$SnapDir/${refsName(k)}")

  private def listRefVersions(spark: SparkSession,
                              table: String): Seq[Long] = {
    val fs = hadoopFs(spark, table)
    val dir = new org.apache.hadoop.fs.Path(s"$table/$SnapDir")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("refs-v") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("refs-v").stripSuffix(".json").toLong).toOption)
  }

  /** The current refs state, or None for a legacy (never-branched)
    * table. */
  private def refsOf(spark: SparkSession,
                     table: String): Option[Refs] = {
    val ks = listRefVersions(spark, table)
    if (ks.isEmpty) return None
    val k = ks.max
    val fs = hadoopFs(spark, table)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(readFully(fs, refsPath(table, k)), "UTF-8"))
    val b = Map.newBuilder[String, Long]
    root.get("heads").fields().forEachRemaining { e =>
      b += e.getKey -> e.getValue.asLong() }
    Some(Refs(k, b.result()))
  }

  /** CAS-write refs state `expect.v + 1`; false = lost the race
    * (re-read and retry). */
  private def writeRefsCas(spark: SparkSession, table: String,
                           expectV: Long,
                           heads: Map[String, Long]): Boolean = {
    val fs = hadoopFs(spark, table)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$table/$SnapDir"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val h = root.putObject("heads")
    heads.toSeq.sortBy(_._1).foreach { case (n, v) => h.put(n, v) }
    val body = om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes("UTF-8")
    val scratch = new org.apache.hadoop.fs.Path(
      s"$table/$SnapDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(scratch, false)
    try out.write(body) finally out.close()
    val won = atomicBind(fs, scratch, refsPath(table, expectV + 1))
    fs.delete(scratch, false)
    won
  }

  /** Advance `branch` from head `from` to `to`. False = the branch
    * head is no longer `from` (a same-branch commit won — the caller
    * retries its whole commit); bind races against OTHER branches'
    * updates retry internally. */
  private def advanceRef(spark: SparkSession, table: String,
                         branch: String, from: Long,
                         to: Long): Boolean = {
    var attempt = 0
    while (attempt < MaxRetries) {
      refsOf(spark, table) match {
        case None => throw new IllegalStateException(
          s"refs vanished from $table mid-commit — refs files are " +
            "never deleted wholesale; filesystem corruption?")
        case Some(r) =>
          if (!r.heads.get(branch).contains(from)) return false
          if (writeRefsCas(spark, table, r.v,
            r.heads.updated(branch, to))) return true
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"lost the refs race $MaxRetries times on $table — " +
        "pathological contention, back off and retry")
  }

  /** Create branch `name` at `at` (default: the current main head).
    * The table enters REFS MODE on first use: main's head is pinned
    * to its current latest version and every subsequent commit
    * advances its branch's ref.
    *
    * The one-time legacy->refs transition is an ADMIN operation: do
    * not race it with concurrent writers (a commit that claims its
    * manifest in the instant before the refs file first appears can
    * be stranded invisible — its writer re-checks refs after the
    * claim, which closes the window for any commit whose claim lands
    * after the refs write, but not one strictly inside it). Once the
    * table is in refs mode every operation is concurrency-safe; this
    * caveat applies only to the very first createBranch on a table
    * with live writers. */
  def createBranch(spark: SparkSession, table: String, name: String,
                   at: Option[Long] = None): Unit = {
    require(name != "main", "'main' always exists")
    require(name.nonEmpty &&
      name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"branch name must be ref-safe, got '$name'")
    var attempt = 0
    while (attempt < MaxRetries) {
      val cur = refsOf(spark, table)
      val mainHead = cur.flatMap(_.heads.get("main"))
        .orElse(latestVersion(spark, table))
        .getOrElse(throw new IllegalStateException(
          s"no committed snapshot in $table to branch from"))
      val target = at.getOrElse(mainHead)
      require(readManifest(spark, table, target).nonEmpty,
        s"no snapshot v$target in $table to branch from")
      cur match {
        case None =>
          if (writeRefsCas(spark, table, 0L,
            Map("main" -> mainHead, name -> target))) return
        case Some(r) =>
          require(!r.heads.contains(name),
            s"branch '$name' already exists in $table")
          if (writeRefsCas(spark, table, r.v,
            r.heads.updated(name, target))) return
      }
      attempt += 1
    }
    throw new IllegalStateException(s"lost the refs race on $table")
  }

  /** Branch name -> head version (includes `main`); empty for a
    * legacy table (main is implicitly the latest version). */
  def branches(spark: SparkSession,
               table: String): Map[String, Long] =
    refsOf(spark, table).map(_.heads).getOrElse(Map.empty)

  /** Remove branch `name` (its exclusive manifests become orphans
    * that [[expire]] sweeps past the grace horizon). */
  def dropBranch(spark: SparkSession, table: String,
                 name: String): Unit = {
    require(name != "main", "cannot drop 'main'")
    var attempt = 0
    while (attempt < MaxRetries) {
      val r = refsOf(spark, table).getOrElse(
        throw new NoSuchElementException(s"no branches in $table"))
      require(r.heads.contains(name), s"no branch '$name' in $table")
      if (writeRefsCas(spark, table, r.v, r.heads - name)) return
      attempt += 1
    }
    throw new IllegalStateException(s"lost the refs race on $table")
  }

  /** FAST-FORWARD PUBLISH: point main at `branch`'s head — the
    * write-audit-publish promotion, metadata-only (no data file
    * moves; main readers resolve the audited manifests on their next
    * read). Requires main's head to be an ANCESTOR of the branch
    * head (nothing landed on main since the fork); a diverged main
    * aborts loudly — re-branch and re-audit rather than silently
    * dropping main's commits. Drops the branch ref by default (its
    * manifests are now main lineage). Returns the published head. */
  def publish(spark: SparkSession, table: String, branch: String,
              keepBranch: Boolean = false): Long = {
    require(branch != "main", "publish promotes a non-main branch")
    var attempt = 0
    while (attempt < MaxRetries) {
      val r = refsOf(spark, table).getOrElse(
        throw new NoSuchElementException(s"no branches in $table"))
      val bh = r.heads.getOrElse(branch,
        throw new NoSuchElementException(s"no branch '$branch' in " +
          table))
      val mh = r.heads.getOrElse("main",
        throw new IllegalStateException(s"refs without main in $table"))
      // ancestry walk: from the branch head down to main's head
      var c = readManifest(spark, table, bh)
      while (c.exists(m => m.version > mh && m.parent > 0L))
        c = readManifest(spark, table, c.get.parent)
      val ff = bh == mh || c.exists(_.version == mh)
      require(ff, s"main (v$mh) is not an ancestor of '$branch' " +
        s"(v$bh) — main advanced since the fork; re-branch, " +
        "re-audit, and publish again")
      val heads2 = (if (keepBranch) r.heads else r.heads - branch)
        .updated("main", bh)
      if (writeRefsCas(spark, table, r.v, heads2)) return bh
      attempt += 1
    }
    throw new IllegalStateException(s"lost the refs race on $table")
  }

  /** The branch's current table (the audit-side read of
    * write-audit-publish). `read` (no branch) always reads main. */
  def readBranch(spark: SparkSession, table: String,
                 branch: String): DataFrame = {
    val h = headVersionOf(spark, table, branch).getOrElse(
      throw new NoSuchElementException(s"no branch '$branch' in $table"))
    read(spark, table, Some(h))
  }

  /** ROLLBACK: make `branch`'s state equal the snapshot at version
    * `to` again, committed as a NEW version — metadata-only (the
    * restored files are referenced, never copied), and history-
    * preserving (the rolled-past commits stay time-travelable until
    * [[expire]] reclaims them; an audit can still read what the bad
    * commit contained). `to` must be a retained ANCESTOR of the
    * branch head — restoring a version from another lineage would
    * resurrect files with no provenance on this branch; ancestry is
    * re-proven against the fresh head on every commit retry. The
    * restored manifest carries the target's WHOLE state: files with
    * their original `seq`, pending MoR deletes, schema changes, and
    * declared layout (pinned explicitly, so a layout evolved after
    * `to` rolls back with the data), making a read of the new head
    * row-identical to `read(version = to)`. Returns the committed
    * version. */
  def rollback(spark: SparkSession, table: String, to: Long,
               branch: String = "main"): Long = {
    val target = readManifest(spark, table, to).getOrElse(
      throw new NoSuchElementException(
        s"no snapshot v$to in $table (expired or never committed)"))
    commitRetryingOn(spark, table, branch) { (parent, v) =>
      var c: Option[Manifest] = Some(parent)
      while (c.exists(m => m.version > to && m.parent > 0L))
        c = readManifest(spark, table, c.get.parent)
      require(c.exists(_.version == to),
        s"v$to is not an ancestor of '$branch' head " +
          s"v${parent.version} in $table — rollback only walks this " +
          "branch's own lineage")
      Manifest(v, parent.version, "rollback", target.rows,
        target.files,
        rangeDeletes = target.rangeDeletes,
        eqDeletes = target.eqDeletes,
        schemaChanges = target.schemaChanges,
        layout = Some(declaredLayout(target)))
    }.merge
  }

  /** CHERRY-PICK: replay the PURE APPEND committed as `version`
    * (typically sitting on an audit branch that can no longer
    * fast-forward — main advanced since the fork, so [[publish]]
    * refuses) onto branch `onto`. Metadata-only: the picked commit's
    * OWN files (its file list minus its parent's) join the target
    * manifest by reference with `seq` re-stamped to the new version —
    * the rows land AS OF NOW, so MoR deletes and schema changes that
    * committed on the target in the meantime do not retro-apply to
    * them, exactly as if the original append ran today. Refused
    * loudly when:
    *  - `version` is not an append (a rewrite doesn't replay by
    *    reference — rerun the operation against the target branch);
    *  - `version` is already in the target lineage, or any picked
    *    file is already in the target head (double-counting rows);
    *  - the pick's parent-state schema changes or declared layout
    *    differ from the target head's (the staged files' shape would
    *    not match the target's read mapping).
    * Idempotent under replay via the commit tag
    * (`cherrypick-v<version>-<onto>`, scoped to the target branch).
    * Returns the committed version. */
  def cherryPick(spark: SparkSession, table: String, version: Long,
                 onto: String = "main"): Long = {
    val src = readManifest(spark, table, version).getOrElse(
      throw new NoSuchElementException(
        s"no snapshot v$version in $table (expired or never " +
          "committed)"))
    require(src.action == "append",
      s"v$version is a '${src.action}' — only pure appends replay " +
        "by reference; rerun the operation against the target branch")
    val srcParent =
      (if (src.parent == 0L) Some(Manifest(0L, -1L, "init", 0L, Nil))
       else readManifest(spark, table, src.parent)).getOrElse(
        throw new IllegalStateException(
          s"v$version's parent v${src.parent} expired — the picked " +
            "files can no longer be separated from the inherited " +
            "ones"))
    val inherited = srcParent.files.map(_.path).toSet
    val added = src.files.filterNot(f => inherited.contains(f.path))
    val addedRows = src.rows - srcParent.rows
    // the tag is scoped to the TARGET branch: the same source commit
    // may legitimately be picked onto two different branches, and a
    // global tag would short-circuit the second pick with the first
    // branch's version
    val tag = s"cherrypick-v$version-$onto"
    findTag(spark, table, tag) match {
      case Some(v) => return v // already picked
      case None => ()
    }
    commitRetryingOn(spark, table, onto) { (parent, v) =>
      findTag(spark, table, tag).foreach { v =>
        throw new DuplicateTag(v) }
      var c: Option[Manifest] = Some(parent)
      while (c.exists(m => m.version > version && m.parent > 0L))
        c = readManifest(spark, table, c.get.parent)
      require(!c.exists(_.version == version),
        s"v$version is already in '$onto' lineage (head " +
          s"v${parent.version}) — picking it again would double its " +
          "rows")
      val dup = added.map(_.path).toSet
        .intersect(parent.files.map(_.path).toSet)
      require(dup.isEmpty,
        s"picked files already in '$onto' head: " +
          dup.take(3).mkString(", ") + " — already published or " +
          "picked")
      require(srcParent.schemaChanges == parent.schemaChanges,
        s"schema changes diverged between v$version's parent state " +
          s"and '$onto' head — the picked files' shape would not " +
          "match the target's read mapping; rerun the append against " +
          s"'$onto' instead")
      require(declaredLayout(srcParent) == declaredLayout(parent),
        s"partition layout diverged between v$version's parent " +
          s"state and '$onto' head; rerun the append against " +
          s"'$onto' instead")
      Manifest(v, parent.version, "append", parent.rows + addedRows,
        parent.files ++ added.map(_.copy(seq = v)), tag,
        rangeDeletes = parent.rangeDeletes,
        eqDeletes = parent.eqDeletes,
        schemaChanges = parent.schemaChanges)
    } match {
      case Right(v) => v
      case Left(v) => v
    }
  }

  /** `branch`'s head version: through refs when they exist; a legacy
    * table's main head is its latest version. */
  private def headVersionOf(spark: SparkSession, table: String,
                            branch: String): Option[Long] =
    refsOf(spark, table) match {
      case Some(r) => r.heads.get(branch)
      case None =>
        if (branch == "main") latestVersion(spark, table) else None
    }

  /** The MAIN lineage's retained manifests, ascending by version —
    * for a legacy table this is every retained manifest (identical
    * to the pre-refs behavior by construction: a linear chain's
    * lineage walk from its latest version visits every retained
    * version). */
  private def mainLineage(spark: SparkSession,
                          table: String): Seq[Manifest] =
    refsOf(spark, table) match {
      case None => listVersions(spark, table).sorted
        .flatMap(v => readManifest(spark, table, v))
      case Some(r) =>
        r.heads.get("main").toSeq.flatMap(h =>
          lineageManifests(spark, table, h))
    }

  /** Walk parent pointers from `head` down to the oldest retained
    * ancestor; ascending by version. */
  private def lineageManifests(spark: SparkSession, table: String,
                               head: Long): Seq[Manifest] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Manifest]
    var cur = readManifest(spark, table, head)
    while (cur.nonEmpty) {
      buf += cur.get
      cur = if (cur.get.parent <= 0L) None
            else readManifest(spark, table, cur.get.parent)
    }
    buf.reverse.toSeq
  }

  /** Every retained manifest reachable from SOME ref head, newest
    * first (legacy: every retained manifest) — the tag-idempotence
    * search space: an unreachable orphan (crashed mid-commit) must
    * never dedupe a replay. */
  private def reachableManifests(spark: SparkSession,
                                 table: String): Seq[Manifest] =
    refsOf(spark, table) match {
      case None => listVersions(spark, table).sorted.reverse
        .flatMap(v => readManifest(spark, table, v))
      case Some(r) =>
        val seen = scala.collection.mutable.Map.empty[Long, Manifest]
        r.heads.values.toSeq.distinct.foreach { h =>
          var cur = readManifest(spark, table, h)
          while (cur.nonEmpty && !seen.contains(cur.get.version)) {
            seen(cur.get.version) = cur.get
            cur = if (cur.get.parent <= 0L) None
                  else readManifest(spark, table, cur.get.parent)
          }
        }
        seen.values.toSeq.sortBy(-_.version)
    }

  /** Retention: keep the last `keepLast` manifests, delete older ones,
    * then sweep every file under the table not referenced by a
    * SURVIVING manifest — which removes both compacted-away data files
    * and crash orphans (staged-but-never-committed data, unclaimed
    * scratch manifests). Returns (manifests deleted, data files
    * deleted). Pinned reads of expired versions fail loudly at
    * resolve time (the documented retention contract).
    *
    * `graceMicros`: an UNREFERENCED file younger than this horizon is
    * left alone (Iceberg's orphan-file-removal shape). An in-flight
    * commit writes its staged data and `g-*.json` group files BEFORE
    * the manifest CAS binds them; a concurrent expire sweeping those
    * just-written files would leave the winning manifest referencing
    * deleted bytes — a corrupt table. The 10-minute default covers
    * any realistic stage→claim window; pass 0 only when no writer can
    * be concurrent (tests, single-writer maintenance windows). */
  def expire(spark: SparkSession, table: String,
             keepLast: Int = 2,
             graceMicros: Long = 600_000_000L): (Int, Int) = {
    require(keepLast >= 1)
    val sweepBeforeMillis =
      System.currentTimeMillis() - graceMicros / 1000L
    val fs = hadoopFs(spark, table)
    val all = listVersions(spark, table).sorted
    // refs mode: retention is PER LINEAGE — keep the newest
    // `keepLast` manifests of MAIN's lineage plus everything
    // reachable from a non-main ref (branches are short-lived audit
    // lines; publish/dropBranch releases their retention). Reachable-
    // but-old main ancestry drops immediately (as in legacy mode);
    // UNREACHABLE manifests (a crashed commit's claim, a lost ref
    // race not yet self-deleted) sweep only past the grace horizon —
    // an in-flight commit's fresh claim is invisible but not yet
    // orphaned. Legacy tables take the old count-based split exactly.
    val (keep: Seq[Long], dropNow: Seq[Long], dropGated: Seq[Long]) =
      refsOf(spark, table) match {
        case None =>
          val (d, k) = all.splitAt(math.max(0, all.size - keepLast))
          (k, d, Nil)
        case Some(r) =>
          val mainLin = r.heads.get("main").toSeq
            .flatMap(h => lineageManifests(spark, table, h))
            .map(_.version)
          val keepMain = mainLin.takeRight(keepLast)
          val branchLin = (r.heads - "main").values.toSeq.distinct
            .flatMap(h => lineageManifests(spark, table, h))
            .map(_.version)
          val keepSet = (keepMain ++ branchLin).toSet
          val reachable = (mainLin ++ branchLin).toSet
          (all.filter(keepSet),
           all.filter(v => reachable(v) && !keepSet(v)),
           all.filterNot(reachable))
      }
    val drop = dropNow // legacy naming for the returned count
    dropNow.foreach(v => fs.delete(manifestPath(table, v), false))
    var droppedGated = 0
    dropGated.foreach { v =>
      val p = manifestPath(table, v)
      if (fs.exists(p) &&
          fs.getFileStatus(p).getModificationTime < sweepBeforeMillis) {
        if (fs.delete(p, false)) droppedGated += 1
      }
    }
    val keptManifests = keep.flatMap(v => readManifest(spark, table, v))
    val live: Set[String] =
      keptManifests.flatMap(_.files.map(_.path)).toSet
    // equality-delete key directories a retained manifest still
    // applies at read time are metadata-live exactly like data files
    val liveDeleteDirs: Seq[String] =
      keptManifests.flatMap(_.eqDeletes.map(_.dir)).distinct
    // group files referenced by a RETAINED manifest survive the
    // _snapshots sweep (the manifest-list layer's metadata liveness)
    val liveGroups: Set[String] =
      keep.flatMap(v => groupNamesOf(fs, table, v)).toSet
    val liveRefs: Set[String] = listRefVersions(spark, table) match {
      case Nil => Set.empty
      case ks => Set(refsName(ks.max))
    }
    val root = new org.apache.hadoop.fs.Path(table)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    var removed = 0
    val it = fs.listFiles(root, true)
    val doomed = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.Path]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(rootUri)
        .stripPrefix("/")
      val isMeta = f.getPath.getName.startsWith("_") ||
        f.getPath.getName.startsWith(".")
      // inside the grace horizon an unreferenced file may be an
      // in-flight commit's staged data or pre-CAS group file — not
      // yet bound, not yet orphaned; sweeping it would corrupt the
      // commit the moment its manifest claims
      val oldEnough = f.getModificationTime < sweepBeforeMillis
      if (rel.startsWith(SnapDir + "/")) {
        // under _snapshots, retained vN.json names and their group
        // files survive; dropped manifests' groups, orphan groups
        // from lost races, and .tmp-* scratch bodies are swept here
        val isLiveManifest =
          keep.exists(v => rel == s"$SnapDir/${manifestName(v)}")
        val isLiveGroup =
          liveGroups.contains(rel.stripPrefix(SnapDir + "/"))
        // the CURRENT refs file is the table's branch state — always
        // live; superseded refs-v files sweep like lost-race scratch
        val isLiveRefs = liveRefs.contains(
          rel.stripPrefix(SnapDir + "/"))
        if (!isLiveManifest && !isLiveGroup && !isLiveRefs && oldEnough)
          doomed += f.getPath
      } else if (!isMeta && !live.contains(rel) && oldEnough &&
          !liveDeleteDirs.exists(d => rel.startsWith(d + "/"))) {
        // a DATA file no surviving manifest references: compacted-away
        // or a crash orphan (write markers like _SUCCESS are left
        // alone — they are not data and cost nothing)
        doomed += f.getPath
      }
    }
    doomed.foreach { p =>
      if (fs.delete(p, false)) {
        val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        if (!rel.startsWith(SnapDir + "/")) removed += 1
      }
    }
    (drop.size + droppedGated, removed)
  }

  /** Retention by TIME — the production spelling of [[expire]]:
    * drop every manifest committed before `tsMicros` (keeping at
    * least `minKeepLast` newest regardless, so a quiet table never
    * expires itself empty), then sweep unreferenced files as
    * [[expire]] does. Manifests from before the timestamp field
    * (stamp 0) count as older-than-everything. */
  def expireOlderThan(spark: SparkSession, table: String,
                      tsMicros: Long,
                      minKeepLast: Int = 1,
                      graceMicros: Long = 600_000_000L): (Int, Int) = {
    require(minKeepLast >= 1)
    // Select the keep set by STAMP, not by counting recent manifests:
    // under the clock skew readAsOf tolerates (stamps 100, 50, 200
    // with cutoff 90), count-the-newest would expire a manifest
    // stamped at/after the cutoff while a pre-cutoff one survives.
    // Keep every version >= the OLDEST version whose stamp clears the
    // cutoff (versions are the commit order; a skewed early stamp on
    // a later version keeps that version too, which errs retentive —
    // the safe direction).
    val manifests = listVersions(spark, table).sorted
      .flatMap(v => readManifest(spark, table, v))
    val firstRecent = manifests.find(_.atMicros >= tsMicros)
      .map(_.version)
    val keepLast = firstRecent match {
      case Some(v) => manifests.count(_.version >= v)
      case None => 0
    }
    expire(spark, table, keepLast = math.max(minKeepLast, keepLast),
      graceMicros = graceMicros)
  }

  // ---- commit protocol internals ----------------------------------------

  /** Write `df` into a fresh `data/<uuid>/` staging dir (optionally
    * Hive-partitioned inside it); returns the table-relative entries.
    * Staged files are invisible until a manifest referencing them is
    * claimed.
    *
    * `bloomCols` additionally enables PARQUET FOOTER Bloom filters
    * (`parquet.bloom.filter.enabled#<col>`) inside each staged file —
    * the IN-FILE point-pruning layer below the manifest's
    * [[FileBloom]]: the manifest filter refuses files past ~12 K
    * distinct keys ([[FileBloom.fold]]'s saturation cutoff, defending
    * the manifest byte budget), and for exactly those large files the
    * footer filter lets the parquet reader skip ROW GROUPS a probed
    * key provably misses — the same manifest/puffin split Iceberg
    * makes. Footer filters ride the data file (no manifest bytes),
    * are sized by parquet per row group, and parquet's reader applies
    * them automatically under pushed-down equality/IN predicates.
    *
    * FLOAT/DOUBLE columns never get a footer filter: parquet hashes
    * raw IEEE bits with no -0.0/+0.0 normalization, so a file holding
    * -0.0 would bloom-reject a `= 0.0` probe and the reader would
    * silently SKIP matching rows — a false negative, the one failure
    * a Bloom layer must never have. (The manifest's [[FileBloom]]
    * normalizes before hashing, so doubles keep manifest-level
    * pruning; they just don't get the in-file layer.) */
  private def stage(spark: SparkSession, df: DataFrame, table: String,
                    partitionCols: Seq[String] = Nil,
                    bloomCols: Seq[String] = Nil): Seq[FileEntry] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"data/$commitId"
    val dst = s"$table/$rel"
    // FileOutputCommitter v2: task outputs move to the destination at
    // task commit (one rename per file) instead of v1's second
    // job-commit rename pass. v2 trades away job-level atomicity —
    // which THIS writer never relied on: a staging dir is garbage
    // until the manifest CAS publishes it, and a partially-written
    // dir is simply never referenced (the same reasoning Iceberg
    // applies to its own staging writes).
    val writer0 = df.write.mode("errorifexists")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
    val footerSafe = bloomCols.distinct.filter(c =>
      df.schema.find(_.name == c).forall(f => f.dataType match {
        case FloatType | DoubleType => false
        case _ => true
      }))
    val writer = footerSafe.foldLeft(writer0)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(dst)
    val fs = hadoopFs(spark, table)
    val dstUri = new org.apache.hadoop.fs.Path(dst).toUri.getPath
      .stripSuffix("/")
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dst), true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    while (it.hasNext) {
      val f = it.next()
      val sub = f.getPath.toUri.getPath.stripPrefix(dstUri)
        .stripPrefix("/")
      val isData = !sub.split('/').exists(s =>
        s.startsWith("_") || s.startsWith("."))
      if (isData) entries += FileEntry(s"$rel/$sub", f.getLen)
    }
    require(entries.nonEmpty, s"staging wrote no data files under $dst")
    // seed the immutable-dir schema cache with the WRITER's schema:
    // the first read-back of a new staging dir (the stats gather at
    // append time, a rewrite's readLive, the CDC differ) otherwise
    // pays parquet schema inference — one small RDD job PER NEW DIR,
    // the per-append extra job the job census shows. Parquet
    // round-trips Spark's types and required/optional nullability, so
    // the seeded schema is what inference would return. Partitioned
    // dirs are NOT seeded: read-back moves partition columns to the
    // tail and re-infers their types from the k=v paths — only
    // inference knows that shape.
    if (partitionCols.isEmpty) {
      if (stagedSchemaCache.size > 4096) stagedSchemaCache.clear()
      stagedSchemaCache.put(dst, df.schema)
    }
    entries.sortBy(_.path).toSeq
  }

  /** CONFLICT-SCOPED revalidation for rewrite commits ([[compact]],
    * [[merge]], [[mergeMor]], the deletes): when the table advanced
    * from the `base` a rewrite was computed against to `parent`, the
    * rewrite is still COMMITTABLE iff every interleaved commit is a
    * PURE APPEND that (a) left the rewrite's whole basis live and
    * untouched (every base file still in the parent, byte-identical
    * entry), (b) carried no new deletes, schema changes, or layout
    * change, and (c) appended no file the rewrite's row set could
    * OVERLAP — the caller's `conflicts` predicate, proven from
    * manifest stats/Blooms (a compaction overlaps nothing; a merge
    * conflicts with appends that might contain its keys; a range
    * delete with appends inside its range). The Iceberg
    * revalidate-and-retry shape: maintenance no longer starves under
    * a steady append stream (one commit per streaming micro-batch is
    * the normal state of a landed table, not a pathology).
    *
    * Returns the appended entries to CARRY FORWARD into the rewrite's
    * manifest (their `seq` unchanged — they stay newer than every
    * folded delete/schema change, so dropping those entries from a
    * compacted manifest remains sound for them), or None on a genuine
    * conflict (the caller aborts loudly, exactly as before). Walks
    * parent POINTERS, not version arithmetic, so the check stays
    * correct if lineages ever interleave version numbers. */
  private def carriableAppends(spark: SparkSession, table: String,
                               base: Manifest, parent: Manifest,
                               conflicts: Seq[FileEntry] => Boolean)
      : Option[Seq[FileEntry]] = {
    if (parent.version == base.version) return Some(Nil)
    var cur = parent
    while (cur.version > base.version) {
      if (cur.action != "append") return None
      cur = readManifest(spark, table, cur.parent)
        .getOrElse(return None) // chain gap: cannot prove, abort
    }
    if (cur.version != base.version) return None // diverged lineage
    val baseByPath = base.files.map(f => f.path -> f).toMap
    val parentByPath = parent.files.map(f => f.path -> f).toMap
    val basisIntact = baseByPath.forall { case (p, f) =>
      parentByPath.get(p).contains(f) }
    if (!basisIntact) return None
    if (parent.rangeDeletes != base.rangeDeletes ||
        parent.eqDeletes != base.eqDeletes ||
        parent.schemaChanges != base.schemaChanges ||
        declaredLayout(parent) != declaredLayout(base)) return None
    val appended =
      parent.files.filterNot(f => baseByPath.contains(f.path))
    if (conflicts(appended)) None else Some(appended)
  }

  /** [[carriableAppends]] or the loud abort — the shared tail every
    * rewrite commit's build closure calls first. */
  private def carriedOrAbort(spark: SparkSession, table: String,
                             base: Manifest, parent: Manifest, op: String,
                             conflicts: Seq[FileEntry] => Boolean)
      : Seq[FileEntry] =
    carriableAppends(spark, table, base, parent, conflicts).getOrElse(
      throw new IllegalStateException(
        s"table advanced v${base.version} -> v${parent.version} during " +
          s"$op with a CONFLICTING commit (a rewrite/delete/schema " +
          "change, or an append the rewrite's rows could overlap); " +
          s"rerun $op against the new snapshot"))

  /** Test seam: consumed (reset to no-op) and invoked once at the
    * start of a commit's CAS loop — SnapshotSpec injects a mid-flight
    * append here to exercise the conflict-scoped retry
    * deterministically. Never set in production code. */
  private[sources] var onCommitAttempt: () => Unit = () => ()

  /** Optimistic-concurrency commit: build the manifest against the
    * current parent, CAS-claim `v(parent+1)`; on a lost race re-read
    * the parent and retry (bounded). Right(v) = this writer committed
    * v; Left(v) = the builder detected its work already landed as v
    * (the [[DuplicateTag]] idempotence path). */
  private def commitRetrying(spark: SparkSession, table: String)
                            (build: (Manifest, Long) => Manifest)
      : Either[Long, Long] =
    commitRetryingOn(spark, table, "main")(build)

  /** [[commitRetrying]] targeted at a BRANCH: the parent is the
    * branch head, the claimed version number is globally unique
    * (max retained version + 1 — identical to `parent.version + 1`
    * for a legacy table, where main's head IS the latest version),
    * and in refs mode the commit serializes on the REF advance: once
    * version numbers are shared across branches, winning the
    * manifest-name CAS no longer proves this branch's head is
    * unmoved, so a claimed manifest whose branch head advanced
    * underneath it is deleted (unreachable — readers resolve through
    * refs, so no reader ever saw it) and the commit retries against
    * the new head. The builder receives `(parent, v)`: the manifest
    * it returns must carry version `v` and stamp staged files'
    * `seq = v`. */
  private def commitRetryingOn(spark: SparkSession, table: String,
                               branch: String)
                              (build: (Manifest, Long) => Manifest)
      : Either[Long, Long] = {
    val hook = onCommitAttempt
    onCommitAttempt = () => ()
    hook()
    var attempt = 0
    while (attempt < MaxRetries) {
      val refs0 = refsOf(spark, table)
      val parent: Manifest =
        (refs0 match {
          case Some(r) =>
            val h = r.heads.getOrElse(branch,
              throw new NoSuchElementException(
                s"no branch '$branch' in $table (createBranch first)"))
            readManifest(spark, table, h)
          case None =>
            if (branch != "main") throw new NoSuchElementException(
              s"no branch '$branch' in $table (createBranch first)")
            currentManifest(spark, table)
        }).getOrElse(Manifest(0L, -1L, "init", 0L, Nil))
      val nextV = math.max(
        latestVersion(spark, table).getOrElse(0L), parent.version) + 1
      val now = java.time.Instant.now()
      val next =
        try {
          val built = build(parent, nextV)
          built.copy(atMicros =
            now.getEpochSecond * 1000000L + now.getNano / 1000L,
            // the declared layout is table CONFIG: every commit
            // carries it unless the builder set a new one
            // ([[repartitionTable]])
            layout = built.layout.orElse(parent.layout))
        }
        catch { case d: DuplicateTag => return Left(d.version) }
      if (claim(spark, table, next)) {
        // re-check refs AFTER the claim: paired with createBranch's
        // healing pass, this closes the refs-initialization race (a
        // commit that claimed while refs appeared either sees them
        // here and advances its ref, or is seen by the healer)
        refsOf(spark, table) match {
          case None => return Right(next.version) // legacy: done
          case Some(_) =>
            if (advanceRef(spark, table, branch, parent.version,
                next.version))
              return Right(next.version)
            // branch head moved underneath the claim: remove the
            // unreachable manifest and retry against the new head
            hadoopFs(spark, table)
              .delete(manifestPath(table, next.version), false)
        }
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"lost the commit race $MaxRetries times on $table — " +
        "pathological contention, back off and retry")
  }

  /** Write the manifest body to a scratch name, then atomically bind
    * the version name to it: `createLink` on local filesystems (POSIX
    * link(2) fails atomically when the name exists), rename-without-
    * replace elsewhere (the HDFS atomic-rename contract). True iff
    * this writer won the version. */
  private def claim(spark: SparkSession, table: String,
                    m: Manifest): Boolean = {
    val fs = hadoopFs(spark, table)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$table/$SnapDir"))
    // MANIFEST SPLITTING (the Iceberg manifest-list move): the file
    // list lands as content-addressed per-commit GROUP files; the
    // version manifest only lists their names. An append therefore
    // writes O(new files) of metadata — every carried group already
    // exists under its content hash and is reused by name — where the
    // inline spelling rewrote the ENTIRE table list (~80 MB at 800 K
    // files) on every commit. A lost CAS race leaves the same groups
    // on disk for the retry to reuse (content-addressed = idempotent);
    // groups no retained manifest references are swept by [[expire]].
    val groupNames = writeGroups(fs, table, m.files)
    val scratch = new org.apache.hadoop.fs.Path(
      s"$table/$SnapDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(scratch, false)
    try out.write(toJson(m, groupNames).getBytes("UTF-8"))
    finally out.close()
    val won = atomicBind(fs, scratch, manifestPath(table, m.version))
    fs.delete(scratch, false)
    won
  }

  /** Bind `dst` to `scratch`'s content atomically, failing (false) if
    * `dst` already exists: hard-link on local filesystems (POSIX
    * link(2) atomic EEXIST — java renameTo would REPLACE),
    * rename-without-replace under HDFS semantics. */
  private def atomicBind(fs: org.apache.hadoop.fs.FileSystem,
                         scratch: org.apache.hadoop.fs.Path,
                         dst: org.apache.hadoop.fs.Path): Boolean =
    if ("file" == dst.toUri.getScheme ||
        fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      val src = java.nio.file.Paths.get(scratch.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      try { java.nio.file.Files.createLink(d, src); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      !fs.exists(dst) && fs.rename(scratch, dst)
    }

  /** Write (or reuse) one content-addressed group file per commit
    * root, preserving first-appearance order; returns the ordered
    * group names. A group's name is the sha-256 of its canonical
    * content, so identical lists — a carried group, a lost-race retry
    * — resolve to the SAME file and only genuinely new groups write.
    * The write itself goes through scratch + atomic bind: a reader
    * can never observe a torn group body. */
  private def writeGroups(fs: org.apache.hadoop.fs.FileSystem,
                          table: String,
                          files: Seq[FileEntry]): Seq[String] = {
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[FileEntry]]
    files.foreach { f =>
      val root = f.path.split('/').take(2).mkString("/")
      order.getOrElseUpdate(root,
        scala.collection.mutable.ArrayBuffer.empty) += f
    }
    order.values.map { group =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = om.createArrayNode()
      group.foreach(f => fileToJson(arr.addObject(), f))
      val body = om.writerWithDefaultPrettyPrinter()
        .writeValueAsString(arr).getBytes("UTF-8")
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(body).map("%02x".format(_)).mkString.take(32)
      val name = s"g-$sha.json"
      val dst = new org.apache.hadoop.fs.Path(s"$table/$SnapDir/$name")
      if (!fs.exists(dst)) {
        val scratch = new org.apache.hadoop.fs.Path(
          s"$table/$SnapDir/.tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(scratch, false)
        try out.write(body) finally out.close()
        atomicBind(fs, scratch, dst) // loser = identical content, fine
        fs.delete(scratch, false)
      }
      name
    }.toSeq
  }

  // ---- per-file column stats ---------------------------------------------

  /** Gather per-file min/max for `statsCols` over freshly staged
    * entries and attach them. No-op for empty `statsCols`.
    * Unsupported column types are rejected loudly — silent stat-less
    * columns would silently disable skipping. */
  private def withStats(spark: SparkSession, table: String,
                        entries: Seq[FileEntry],
                        statsCols: Seq[String]): Seq[FileEntry] =
    withStatsAndRows(spark, table, entries, statsCols)._1

  /** Attach per-file Bloom filters over `bloomCols` to freshly staged
    * entries — one narrow distributed aggregate per column over ONLY
    * this commit's files (cost scales with the commit, never the
    * table): each value hashes once (Spark's codegen'd `xxhash64`),
    * expands to its K bit positions, and `collect_set` per file
    * returns the bounded position sets the driver folds into
    * size-fitted filters ([[FileBloom.fold]]). Must run AFTER
    * [[withStatsAndRows]] — the filter hangs off the column's
    * [[ColStats]] (its typed repr is the probe's hash input). Files
    * with no stats on the column (all-null slices) get no filter and
    * are never pruned. */
  /** Per-file bytes ceiling for the DRIVER-SIDE bloom build: below
    * it, every staged file's column is read through parquet-hadoop on
    * the driver (the same process that just read the footers) and
    * hashed with the SAME XXH64 kernel Spark's `xxhash64` runs —
    * zero Spark jobs for the micro-batch/fixture-sized commits where
    * the job-launch overhead dwarfs the hashing. Above it (real
    * at-scale files) the distributed aggregate below runs unchanged.
    * `private[sources]` so the parity spec can force the Spark path
    * and compare filters byte-for-byte. */
  private[sources] var bloomDriverMaxBytes: Long = 8L << 20

  private def withBlooms(spark: SparkSession, table: String,
                         entries: Seq[FileEntry],
                         bloomCols: Seq[String]): Seq[FileEntry] = {
    if (bloomCols.isEmpty || entries.isEmpty) return entries
    import org.apache.spark.sql.functions.{array, collect_set, explode,
      xxhash64}
    var out = entries
    bloomCols.distinct.foreach { c =>
      val typ = out.flatMap(_.stats.get(c)).headOption.map(_.typ)
      typ.foreach { t =>
        // driver path first: small files, non-partition column, and
        // every value type decodable — falls back to the distributed
        // aggregate on any surprise, never silently drops a filter
        val driverBuilt: Option[Seq[(String, Seq[Int])]] =
          if (out.forall(e => e.bytes < bloomDriverMaxBytes &&
                partitionPathValue(e.path, c).isEmpty))
            driverBloomPositions(spark, table, out, c, t)
          else None
        val byFile: Seq[(String, Seq[Int])] =
          driverBuilt.getOrElse(
          readFilesWithPath(spark, table, out, Seq(c))
            .filter(col(c).isNotNull)
            .select(col("__file"),
              explode(array(FileBloom.positionExprs(xxhash64(
                FileBloom.canonExpr(col(c), t))): _*)).as("__pos"))
            .groupBy(col("__file"))
            .agg(collect_set(col("__pos")).as("ps"))
            .collect().toSeq
            .map(r => r.getString(0) -> r.getSeq[Int](1)))
        out = out.map { e =>
          e.stats.get(c) match {
            case Some(st) =>
              byFile.find(_._1.endsWith("/" + e.path))
                .flatMap { case (_, ps) => FileBloom.fold(ps) } match {
                case Some(b) => e.copy(stats = e.stats
                  .updated(c, st.copy(bloom = b)))
                case None => e // saturated: no filter beats a useless one
              }
            case None => e
          }
        }
      }
    }
    out
  }

  /** DRIVER-SIDE build of the per-file Bloom position sets: read the
    * single column through parquet-hadoop (projection pushdown via
    * the requested read schema) and hash each value with the same
    * XXH64 kernel (`catalyst.expressions.XXH64`, seed 42) Spark's
    * `xxhash64(canonExpr)` executes — bit-identical filters, zero
    * Spark jobs (spec-pinned byte parity against the distributed
    * path). Returns None when any value shape is out of contract
    * (unexpected physical type, timestamp unit) so the caller falls
    * back to the distributed aggregate rather than mis-hash. */
  private def driverBloomPositions(spark: SparkSession, table: String,
                                   entries: Seq[FileEntry], c: String,
                                   typ: String)
      : Option[Seq[(String, Seq[Int])]] = try {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val conf = spark.sparkContext.hadoopConfiguration
    Some(entries.flatMap { e =>
      if (e.stats.get(c).isEmpty) Nil
      else {
        val abs = s"$table/${e.path}"
        val p = new org.apache.hadoop.fs.Path(abs)
        val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(p, conf))
        val schema =
          try footer.getFooter.getFileMetaData.getSchema
          finally footer.close()
        if (!schema.containsField(c)) Nil
        else {
          val field = schema
            .getType(schema.getFieldIndex(c)).asPrimitiveType()
          val unit = field.getLogicalTypeAnnotation match {
            case ts: LogicalTypeAnnotation
                .TimestampLogicalTypeAnnotation => Some(ts.getUnit)
            case _ => None
          }
          val hashOf: org.apache.parquet.example.data.Group => Long =
            (field.getPrimitiveTypeName, typ) match {
              case (INT64, "long") =>
                g => XXH64.hashLong(g.getLong(0, 0), Seed)
              case (INT32, "long") =>
                g => XXH64.hashLong(g.getInteger(0, 0).toLong, Seed)
              case (BINARY, "string") =>
                g => XXH64.hashUTF8String(
                  org.apache.spark.unsafe.types.UTF8String.fromBytes(
                    g.getBinary(0, 0).getBytes), Seed)
              case (INT32, "date") =>
                g => XXH64.hashInt(g.getInteger(0, 0), Seed)
              case (INT64, "timestamp")
                  if unit.contains(
                    LogicalTypeAnnotation.TimeUnit.MICROS) =>
                g => XXH64.hashLong(g.getLong(0, 0), Seed)
              case (INT64, "timestamp")
                  if unit.contains(
                    LogicalTypeAnnotation.TimeUnit.MILLIS) =>
                g => XXH64.hashLong(g.getLong(0, 0) * 1000L, Seed)
              case (DOUBLE, "double") =>
                g => {
                  var d = g.getDouble(0, 0)
                  if (d == -0.0d) d = 0.0d
                  XXH64.hashLong(
                    java.lang.Double.doubleToLongBits(d), Seed)
                }
              case (FLOAT, "double") =>
                g => {
                  var d = g.getFloat(0, 0).toDouble
                  if (d == -0.0d) d = 0.0d
                  XXH64.hashLong(
                    java.lang.Double.doubleToLongBits(d), Seed)
                }
              case other =>
                throw new IllegalStateException(
                  s"bloom driver path: unhandled shape $other")
            }
          val readConf = new org.apache.hadoop.conf.Configuration(conf)
          readConf.set(
            org.apache.parquet.hadoop.api.ReadSupport
              .PARQUET_READ_SCHEMA,
            new org.apache.parquet.schema.MessageType(
              "graftBloomProj", field).toString)
          val reader = org.apache.parquet.hadoop.ParquetReader
            .builder(
              new org.apache.parquet.hadoop.example.GroupReadSupport(),
              p)
            .withConf(readConf).build()
          val positions = new java.util.HashSet[Integer]()
          try {
            var g = reader.read()
            while (g != null) {
              if (g.getFieldRepetitionCount(0) > 0) {
                val ps = FileBloom.positions(hashOf(g), FileBloom.MaxBits)
                var i = 0
                while (i < ps.length) { positions.add(ps(i)); i += 1 }
              }
              g = reader.read()
            }
          } finally reader.close()
          if (positions.isEmpty) Nil
          else {
            import scala.jdk.CollectionConverters._
            Seq(abs -> positions.asScala.toSeq.map(_.intValue))
          }
        }
      }
    })
  } catch { case _: Throwable => None }

  /** The Bloom coverage of an existing snapshot under the current
    * schema — the columns a rewrite ([[compact]], [[merge]]) must
    * re-filter, exactly as [[currentStatsColsOf]] is the stats
    * coverage. */
  private def currentBloomColsOf(m: Manifest): Seq[String] = {
    val changes = m.schemaChanges.sortBy(_.seq)
    m.files.flatMap { f =>
      f.stats.collect { case (k0, st) if st.bloom.nonEmpty => k0 }
        .flatMap(k0 => currentName(f, k0, changes))
    }.distinct.sorted
  }

  /** Stats AND the staged row count, both read off the PARQUET
    * FOOTERS of the freshly staged files — no Spark job at all (the
    * Iceberg approach): the writer already computed per-row-group
    * min/max/null-count/row-count; a commit just collects them. Cost
    * is one driver-side footer read per staged file, O(files in THIS
    * commit).
    *
    * Footer stats are BOUNDS, not necessarily exact values (parquet
    * may truncate long binary stats — the truncated min is still a
    * lower bound, the increment-truncated max an upper bound), and
    * every consumer here only needs bounds: [[readWhere]] keeps a
    * superset and re-filters, [[merge]] over-candidates then key-scans,
    * and [[deleteRange]]'s wholesale drop demands containment, which
    * wider bounds can only make harder. Absent footer stats (NaN
    * floats, too-large binaries, INT96 timestamps, all-null chunks)
    * leave the column stat-less — conservative, never wrong.
    * Partition columns never appear in the file body; their stats are
    * the constant `k=v` value from the staging path. */
  private def withStatsAndRows(spark: SparkSession, table: String,
                               entries: Seq[FileEntry],
                               statsCols: Seq[String])
      : (Seq[FileEntry], Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val typed: Seq[(String, String)] =
      if (statsCols.isEmpty) Nil
      else {
        val schema = readFiles(spark, table, entries).schema // footers
        statsCols.map { c =>
          val field = schema.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"stats column '$c' not in table schema " +
                schema.fieldNames.mkString("[", ", ", "]")))
          val typ = statTyp(field.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"stats unsupported for '$c': " +
                s"${field.dataType.simpleString} (supported: integral, " +
                "float/double, string, date, timestamp)"))
          (c, typ)
        }
      }
    var totalRows = 0L
    val out = entries.map { e =>
      val p = new org.apache.hadoop.fs.Path(s"$table/${e.path}")
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var rows = 0L
        val it = blocks.iterator()
        while (it.hasNext) rows += it.next().getRowCount
        totalRows += rows
        if (typed.isEmpty || rows == 0L) e.copy(rows = rows)
        else {
          val stats = typed.flatMap { case (c, t) =>
            partitionPathValue(e.path, c) match {
              case Some(v) =>
                pathStat(v, t, rows).map(s => c -> s)
              case None =>
                footerColStats(blocks, c, t).map(s => c -> s)
            }
          }.toMap
          e.copy(stats = stats, rows = rows)
        }
      } finally reader.close()
    }
    (out, totalRows)
  }

  /** Exact LIVE row count of `files` from manifest metadata alone,
    * when provable: every file carries a footer row count
    * ([[FileEntry.rows]]) and no pending range/equality delete
    * APPLIES to it (`d.seq > f.seq` — the sequence rule; an
    * applicable delete makes live ≠ raw). None → the caller pays the
    * scan it always paid. Guide §1.2: don't run a job whose answer
    * the commit already wrote down. */
  private def liveRowsFromMeta(m: Manifest,
                               files: Seq[FileEntry]): Option[Long] = {
    val delSeqs = m.rangeDeletes.map(_.seq) ++ m.eqDeletes.map(_.seq)
    var tot = 0L
    files.foreach { f =>
      if (f.rows < 0L || delSeqs.exists(_ > f.seq)) return None
      tot += f.rows
    }
    Some(tot)
  }

  /** Total footer row count of every parquet data file under `dir` —
    * a driver-side metadata read (the [[withStatsAndRows]] footer
    * walk), replacing a whole Spark COUNT job over files this writer
    * just wrote. */
  private def footerRowsUnder(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    var rows = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf))
        try {
          val bit = reader.getFooter.getBlocks.iterator()
          while (bit.hasNext) rows += bit.next().getRowCount
        } finally reader.close()
      }
    }
    rows
  }

  /** The `k=v` value a staging path carries for a partition column
    * (`data/<uuid>/k=v/.../file`), if any. */
  private def partitionPathValue(path: String,
                                 c: String): Option[String] =
    path.split('/').drop(2).dropRight(1)
      .find(_.startsWith(c + "="))
      .map(seg => unescapePathName(seg.substring(c.length + 1)))

  /** Invert Spark/Hive partition-path escaping (`%XX` hex for chars
    * like `:` `=` `/` `%`). Without this a string partition value
    * `a:b` lands in stats as `a%3Ab`, and readWhere comparing against
    * the RAW bound can prune a file that contains matching rows —
    * silent row loss; deleteRange misclassifies the same way. A `%`
    * not followed by two hex digits passes through literally, which
    * is also what Hive's unescape does. */
  private def unescapePathName(v: String): String = {
    if (v.indexOf('%') < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val ch = v.charAt(i)
      if (ch == '%' && i + 2 < v.length) {
        val hex = v.substring(i + 1, i + 3)
        val code = try Integer.parseInt(hex, 16) catch {
          case _: NumberFormatException => -1
        }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(ch); i += 1 }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Constant stats for a partition column: min = max = the directory
    * value, zero nulls (a Hive null partition spells
    * `__HIVE_DEFAULT_PARTITION__`, which returns absent instead). */
  private def pathStat(v: String, typ: String,
                       rows: Long): Option[ColStats] = {
    if (v == "__HIVE_DEFAULT_PARTITION__") return None
    val repr = typ match {
      case "long" => scala.util.Try(v.toLong.toString).toOption
      case "double" => scala.util.Try(v.toDouble.toString).toOption
      case "string" | "date" => Some(v)
      case _ => None // timestamp partition dirs: not worth the parse
    }
    repr.map(r => ColStats(r, r, typ, 0L))
  }

  /** Merge a column's statistics across a file's row groups into one
    * ColStats, or None when any chunk lacks usable values (absent
    * stats, unexpected physical type) — conservative. */
  private def footerColStats(
      blocks: java.util.List[
        org.apache.parquet.hadoop.metadata.BlockMetaData],
      c: String, typ: String): Option[ColStats] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    var mn: String = null
    var mx: String = null
    var nulls = 0L
    var nullsKnown = true
    val bit = blocks.iterator()
    while (bit.hasNext) {
      val block = bit.next()
      val chunk = {
        var found: org.apache.parquet.hadoop.metadata
          .ColumnChunkMetaData = null
        val cit = block.getColumns.iterator()
        while (found == null && cit.hasNext) {
          val cc = cit.next()
          if (cc.getPath.toDotString == c) found = cc
        }
        found
      }
      if (chunk == null) return None // column absent from the file
      val st = chunk.getStatistics
      if (st == null || st.isEmpty) return None // writer omitted stats
      if (st.getNumNulls < 0) nullsKnown = false
      else nulls += st.getNumNulls
      if (st.hasNonNullValue) {
        val pt = chunk.getPrimitiveType
        val reprs: Option[(String, String)] =
          (pt.getPrimitiveTypeName, typ) match {
            case (INT32, "long") | (INT64, "long") =>
              Some((st.genericGetMin.toString, st.genericGetMax.toString))
            case (INT32, "date") =>
              def d(x: Any) = java.time.LocalDate
                .ofEpochDay(x.asInstanceOf[Number].longValue).toString
              Some((d(st.genericGetMin), d(st.genericGetMax)))
            case (INT64, "timestamp") =>
              val unit = pt.getLogicalTypeAnnotation match {
                case ts: LogicalTypeAnnotation
                    .TimestampLogicalTypeAnnotation => Some(ts.getUnit)
                case _ => None
              }
              def micros(x: Any): Option[String] = {
                val v = x.asInstanceOf[Number].longValue
                unit match {
                  case Some(LogicalTypeAnnotation.TimeUnit.MICROS) =>
                    Some(v.toString)
                  case Some(LogicalTypeAnnotation.TimeUnit.MILLIS) =>
                    Some((v * 1000L).toString)
                  case _ => None // NANOS would overflow; INT96 never here
                }
              }
              for (a <- micros(st.genericGetMin);
                   b <- micros(st.genericGetMax)) yield (a, b)
            case (FLOAT, "double") | (DOUBLE, "double") =>
              val a = st.genericGetMin.asInstanceOf[Number].doubleValue
              val b = st.genericGetMax.asInstanceOf[Number].doubleValue
              if (a.isNaN || b.isNaN) None // NaN poisons float stats
              else Some((a.toString, b.toString))
            case (BINARY, "string") =>
              Some((st.genericGetMin
                  .asInstanceOf[org.apache.parquet.io.api.Binary]
                  .toStringUsingUTF8,
                st.genericGetMax
                  .asInstanceOf[org.apache.parquet.io.api.Binary]
                  .toStringUsingUTF8))
            case _ => None // INT96 timestamps, mismatched physicals
          }
        reprs match {
          case None => return None
          case Some((a, b)) =>
            if (mn == null || cmp(typ, a, mn) < 0) mn = a
            if (mx == null || cmp(typ, b, mx) > 0) mx = b
        }
      }
    }
    if (mn == null || mx == null) None // every chunk all-null
    else Some(ColStats(mn, mx, typ, if (nullsKnown) nulls else -1L))
  }

  /** The stats coverage of an existing snapshot — the columns a
    * rewrite ([[compact]], [[merge]]) must keep tracking. */
  private def statsColsOf(files: Seq[FileEntry]): Seq[String] =
    files.flatMap(_.stats.keys).distinct.sorted

  /** The tracked stats columns of a manifest under the CURRENT
    * schema: each file's stat keys walked through the schema changes
    * that apply to it (renames follow, dropped columns leave the
    * tracked set) — what a rewrite under the current schema must
    * re-gather. */
  private def currentStatsColsOf(m: Manifest): Seq[String] = {
    val changes = m.schemaChanges.sortBy(_.seq)
    m.files.flatMap { f =>
      f.stats.keys.flatMap(k0 => currentName(f, k0, changes))
    }.distinct.sorted
  }

  /** The CURRENT-schema name of file `f`'s written column `k0`:
    * schema changes staged after the file walked FORWARD (renames
    * follow; a drop ends the column's life — None). The inverse
    * direction of [[writtenName]]. `changes` must be seq-sorted. */
  private def currentName(f: FileEntry, k0: String,
                          changes: Seq[SchemaChange]): Option[String] =
    changes.foldLeft(Option(k0)) { (acc, c) =>
      acc.flatMap { name =>
        if (c.seq <= f.seq) Some(name)
        else c.kind match {
          case "rename" => Some(if (name == c.from) c.to else name)
          case "drop" => if (name == c.from) None else Some(name)
          case _ => Some(name)
        }
      }
    }

  /** Serialized-stat type tag for a column, or None if unsupported. */
  private def statTyp(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case FloatType | DoubleType => Some("double")
    case StringType => Some("string")
    case DateType => Some("date")
    case TimestampType => Some("timestamp")
    case _ => None
  }

  /** A query bound in the same serialized form as the stored stats. */
  private def reprOf(typ: String, v: Any): String = (typ, v) match {
    case (_, null) => throw new IllegalArgumentException(
      s"null bound for a $typ stats comparison")
    case ("long", n: Number) => n.longValue.toString
    case ("double", n: Number) =>
      val d = n.doubleValue
      require(!d.isNaN, "NaN is not an orderable stats bound — " +
        "NaN rows match no range; filter them explicitly")
      d.toString
    case ("string", s: String) => s
    case ("date", s: String) => s
    case ("date", d: java.sql.Date) => d.toString
    case ("date", d: java.time.LocalDate) => d.toString
    case ("timestamp", t: java.sql.Timestamp) =>
      (t.getTime * 1000L + (t.getNanos % 1000000) / 1000L).toString
    case ("timestamp", i: java.time.Instant) =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case (t, other) => throw new IllegalArgumentException(
      s"unsupported bound ${other.getClass.getSimpleName} for $t stats")
  }

  /** Exact typed comparison of two serialized stat values. Strings
    * compare in UNSIGNED UTF-8 BYTE order — the order parquet's UTF8
    * statistics are computed under (also code-point order), which
    * `String.compareTo`'s UTF-16 order is NOT for supplementary
    * characters; the comparator must match the stats writer or
    * pruning bounds silently invert on astral-plane text. */
  private def cmp(typ: String, a: String, b: String): Int = typ match {
    case "long" | "timestamp" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" =>
      // `+ 0.0` canonicalizes -0.0 to 0.0 before the compare:
      // Double.compare's total order puts -0.0 < 0.0, but the SQL
      // residual filters these bounds stand in for equate them, so a
      // footer max of -0.0 must NOT prune a [0.0, x] readWhere (the
      // Iceberg zero-bound adjustment, done here at the comparator
      // instead of per stored bound).
      java.lang.Double.compare(a.toDouble + 0.0d, b.toDouble + 0.0d)
    case "date" => a.compareTo(b) // yyyy-MM-dd: lexicographic = time
    case _ =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  // ---- manifest io -------------------------------------------------------

  private def manifestName(v: Long): String = f"v$v%012d.json"

  private def manifestPath(table: String,
                           v: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$table/$SnapDir/${manifestName(v)}")

  private def listVersions(spark: SparkSession,
                           table: String): Seq[Long] = {
    val fs = hadoopFs(spark, table)
    val dir = new org.apache.hadoop.fs.Path(s"$table/$SnapDir")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("v").stripSuffix(".json").toLong).toOption)
  }

  /** The MAIN head's manifest: through refs when the table has
    * branches, else the latest version (legacy — identical). Branch
    * commits are invisible here by construction. */
  private def currentManifest(spark: SparkSession,
                              table: String): Option[Manifest] =
    headManifest(spark, table, "main")

  private def headManifest(spark: SparkSession, table: String,
                           branch: String): Option[Manifest] =
    headVersionOf(spark, table, branch).flatMap(v =>
      readManifest(spark, table, v))

  /** The committed manifest at `v`, if retained — the user-facing
    * metadata surface (file accounting, stats inspection, wholesale-
    * delete proofs). File lists resolve through the manifest's group
    * references ([[writeGroups]]); legacy inline-`files` manifests
    * still load. */
  def readManifest(spark: SparkSession, table: String,
                   v: Long): Option[Manifest] = {
    val fs = hadoopFs(spark, table)
    val p = manifestPath(table, v)
    if (!fs.exists(p)) return None
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(readFully(fs, p), "UTF-8"))
    val files: Seq[FileEntry] =
      if (root.has("files")) filesFromJson(root.get("files")) // legacy
      else {
        val b = Seq.newBuilder[FileEntry]
        root.get("groups").elements().forEachRemaining { g =>
          b ++= readGroup(fs, table, g.asText())
        }
        b.result()
      }
    val rds = Seq.newBuilder[RangeDelete]
    if (root.has("rangeDeletes"))
      root.get("rangeDeletes").elements().forEachRemaining { d =>
        rds += RangeDelete(d.get("column").asText(), d.get("lo").asText(),
          d.get("hi").asText(), d.get("typ").asText(),
          d.get("seq").asLong())
      }
    val eds = Seq.newBuilder[EqDelete]
    if (root.has("eqDeletes"))
      root.get("eqDeletes").elements().forEachRemaining { d =>
        val cols = Seq.newBuilder[String]
        d.get("cols").elements().forEachRemaining(c => cols += c.asText())
        eds += EqDelete(d.get("dir").asText(), d.get("bytes").asLong(),
          d.get("rows").asLong(), cols.result(), d.get("seq").asLong())
      }
    val scs = Seq.newBuilder[SchemaChange]
    if (root.has("schemaChanges"))
      root.get("schemaChanges").elements().forEachRemaining { c =>
        scs += SchemaChange(c.get("kind").asText(), c.get("from").asText(),
          c.get("to").asText(), c.get("typ").asText(),
          c.get("seq").asLong())
      }
    val layout: Option[Seq[String]] =
      if (!root.has("layout")) None
      else {
        val b = Seq.newBuilder[String]
        root.get("layout").elements()
          .forEachRemaining(c => b += c.asText())
        Some(b.result())
      }
    Some(Manifest(root.get("version").asLong(),
      root.get("parent").asLong(),
      root.get("action").asText(), root.get("rows").asLong(),
      files,
      Option(root.get("tag")).map(_.asText()).getOrElse(""),
      Option(root.get("atMicros")).map(_.asLong()).getOrElse(0L),
      rds.result(), eds.result(), scs.result(), layout))
  }

  /** The group names a retained manifest references (the [[expire]]
    * survival set); empty for legacy inline manifests. */
  private def groupNamesOf(
      fs: org.apache.hadoop.fs.FileSystem, table: String,
      v: Long): Seq[String] = {
    val p = manifestPath(table, v)
    if (!fs.exists(p)) return Nil
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(readFully(fs, p), "UTF-8"))
    if (!root.has("groups")) return Nil
    val b = Seq.newBuilder[String]
    root.get("groups").elements().forEachRemaining(g => b += g.asText())
    b.result()
  }

  /** Bounded per-JVM cache of group files: groups are IMMUTABLE and
    * content-addressed, so a cached parse can never be stale — and
    * the manifest-chain walks ([[findTag]], [[readAsOf]], versions)
    * would otherwise re-read every group per manifest. */
  private val groupCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Seq[FileEntry]](64, 0.75f,
        true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Seq[FileEntry]]): Boolean =
          size() > 1024
      })

  private def readGroup(fs: org.apache.hadoop.fs.FileSystem,
                        table: String, name: String): Seq[FileEntry] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/$SnapDir/$name")
    val key = p.toUri.toString
    val cached = groupCache.get(key)
    if (cached != null) return cached
    val arr = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(readFully(fs, p), "UTF-8"))
    val files = filesFromJson(arr)
    groupCache.put(key, files)
    files
  }

  private def readFully(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** Manifest JSON (Jackson on Spark's own classpath — real escaping,
    * no hand-rolled concat): header fields + the ordered group-name
    * list; the file lists themselves live in the group files. */
  private def toJson(m: Manifest, groupNames: Seq[String]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("parent", m.parent)
    root.put("action", m.action)
    root.put("rows", m.rows)
    root.put("tag", m.tag)
    root.put("atMicros", m.atMicros)
    m.layout.foreach { cols =>
      val la = root.putArray("layout")
      cols.foreach(la.add)
    }
    val arr = root.putArray("groups")
    groupNames.foreach(arr.add)
    if (m.rangeDeletes.nonEmpty) {
      val da = root.putArray("rangeDeletes")
      m.rangeDeletes.foreach { d =>
        val o = da.addObject()
        o.put("column", d.column); o.put("lo", d.lo); o.put("hi", d.hi)
        o.put("typ", d.typ); o.put("seq", d.seq)
      }
    }
    if (m.eqDeletes.nonEmpty) {
      val da = root.putArray("eqDeletes")
      m.eqDeletes.foreach { d =>
        val o = da.addObject()
        o.put("dir", d.dir); o.put("bytes", d.bytes)
        o.put("rows", d.rows); o.put("seq", d.seq)
        val ca = o.putArray("cols")
        d.cols.foreach(ca.add)
      }
    }
    if (m.schemaChanges.nonEmpty) {
      val sa = root.putArray("schemaChanges")
      m.schemaChanges.foreach { c =>
        val o = sa.addObject()
        o.put("kind", c.kind); o.put("from", c.from); o.put("to", c.to)
        o.put("typ", c.typ); o.put("seq", c.seq)
      }
    }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def fileToJson(
      o: com.fasterxml.jackson.databind.node.ObjectNode,
      f: FileEntry): Unit = {
    o.put("path", f.path)
    o.put("bytes", f.bytes)
    if (f.seq != 0L) o.put("seq", f.seq)
    if (f.rows >= 0L) o.put("rows", f.rows)
    if (f.stats.nonEmpty) {
      val st = o.putObject("stats")
      f.stats.toSeq.sortBy(_._1).foreach { case (c, s) =>
        val so = st.putObject(c)
        so.put("min", s.min)
        so.put("max", s.max)
        so.put("typ", s.typ)
        so.put("nulls", s.nulls)
        if (s.bloom.nonEmpty) so.put("bloom", s.bloom)
      }
    }
  }

  private def filesFromJson(
      node: com.fasterxml.jackson.databind.JsonNode): Seq[FileEntry] = {
    val files = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    val it = node.elements()
    while (it.hasNext) {
      val o = it.next()
      val stats = Option(o.get("stats")).map { st =>
        val b = Map.newBuilder[String, ColStats]
        val names = st.fieldNames()
        while (names.hasNext) {
          val c = names.next()
          val so = st.get(c)
          b += c -> ColStats(so.get("min").asText(),
            so.get("max").asText(), so.get("typ").asText(),
            Option(so.get("nulls")).map(_.asLong()).getOrElse(-1L),
            Option(so.get("bloom")).map(_.asText()).getOrElse(""))
        }
        b.result()
      }.getOrElse(Map.empty[String, ColStats])
      files += FileEntry(o.get("path").asText(), o.get("bytes").asLong(),
        stats, Option(o.get("seq")).map(_.asLong()).getOrElse(0L),
        Option(o.get("rows")).map(_.asLong()).getOrElse(-1L))
    }
    files.toSeq
  }

  private def stageDirPath(table: String,
                           files: Seq[FileEntry]): Seq[String] =
    files.map(f => s"$table/${f.path}")

  /** Partition columns of a (consistently laid-out) snapshot, read
    * off the manifest's own `k=v` path segments:
    * `data/<uuid>/k1=v1/.../file`. Empty for flat tables. */
  private def partitionColsOf(files: Seq[FileEntry]): Seq[String] =
    files.headOption.map { f =>
      f.path.split('/').drop(2).dropRight(1)
        .filter(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq
    }.getOrElse(Nil)

  /** The table's EFFECTIVE partition layout: the declared one when a
    * [[repartitionTable]] ever set it, else derived from the files
    * (legacy/never-evolved tables — old behavior exactly). This is
    * what appends validate against and rewrites re-stage under. */
  private def declaredLayout(m: Manifest): Seq[String] =
    m.layout.getOrElse(partitionColsOf(m.files))

  /** Is `c` a directory-encoded column anywhere the manifest can see —
    * the current declared layout OR any retained file's own `k=v`
    * path segments (old-layout files keep their directory scheme
    * until compaction folds them)? Schema changes must refuse such
    * columns: their name/value is baked into paths. */
  private def isPartitionColumn(m: Manifest, c: String): Boolean =
    declaredLayout(m).contains(c) ||
      m.files.exists(f => f.path.split('/').drop(2).dropRight(1)
        .exists(_.startsWith(c + "=")))

  private def hadoopFs(spark: SparkSession,
                       path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
