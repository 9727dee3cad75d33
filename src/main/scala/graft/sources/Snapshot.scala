package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** One data file of a snapshot; `path` is table-root-relative (the
    * table directory is relocatable as a unit). */
  final case class FileEntry(path: String, bytes: Long)

  /** One committed version: `files` IS the table at `version`.
    * `tag` is the writer's idempotence token (empty when unused): a
    * replayed commit carrying a tag some committed manifest already
    * holds is a DUPLICATE and must be skipped — the foreachBatch
    * at-least-once contract ([[append]] with `tag = Some(batchId)`). */
  final case class Manifest(version: Long, parent: Long, action: String,
                            rows: Long, files: Seq[FileEntry],
                            tag: String = "")

  private val SnapDir = "_snapshots"
  private val MaxRetries = 20

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
    * so two replayers of the same batch cannot both land). */
  def append(df: DataFrame, table: String,
             tag: Option[String] = None): Long = {
    val spark = df.sparkSession
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v // replayed batch: already committed
      case None => ()
    }
    val staged = stage(spark, df, table)
    val stagedRows = spark.read.parquet(stageDirPath(table, staged): _*)
      .count()
    commitRetrying(spark, table) { parent =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) } // raced replayer landed it first
      Manifest(parent.version + 1, parent.version, "append",
        parent.rows + stagedRows, parent.files ++ staged,
        tag.getOrElse(""))
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
                        tag: Option[String] = None): Long = {
    require(partitionCols.nonEmpty, "use append for unpartitioned data")
    val spark = df.sparkSession
    tag.flatMap(t => findTag(spark, table, t)) match {
      case Some(v) => return v
      case None => ()
    }
    val staged = stage(spark, df, table, partitionCols)
    val stagedRows = readFiles(spark, table, staged).count()
    commitRetrying(spark, table) { parent =>
      tag.flatMap(t => findTag(spark, table, t)).foreach { v =>
        throw new DuplicateTag(v) }
      Manifest(parent.version + 1, parent.version, "append",
        parent.rows + stagedRows, parent.files ++ staged,
        tag.getOrElse(""))
    } match {
      case Right(v) => v
      case Left(v) => v
    }
  }

  /** Committed version carrying `tag`, if any (scans the retained
    * manifest chain — O(versions), driver-side, tiny files). */
  private def findTag(spark: SparkSession, table: String,
                      t: String): Option[Long] =
    listVersions(spark, table).sorted.reverseIterator
      .flatMap(v => readManifest(spark, table, v))
      .collectFirst { case m if m.tag == t => m.version }

  private final class DuplicateTag(val version: Long)
      extends RuntimeException

  /** Replace the table contents with `df` (a new snapshot whose file
    * list is only the staged files — prior versions stay readable
    * until [[expire]]). */
  def overwrite(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val staged = stage(spark, df, table)
    val stagedRows = spark.read.parquet(stageDirPath(table, staged): _*)
      .count()
    commitRetrying(spark, table) { parent =>
      Manifest(parent.version + 1, parent.version, "overwrite",
        stagedRows, staged)
    }.merge
  }

  /** Compact the CURRENT snapshot to `ceil(bytes/targetFileBytes)`
    * files — committed as a new version, row-verified against the
    * snapshot it rewrites; a reader pinned on any version ≤ current
    * is untouched (its files are not deleted). Returns the committed
    * version. If another writer commits between the rewrite and the
    * claim, the compaction RETRIES ONLY ITS MANIFEST when the parent
    * is unchanged in content; against a changed parent it aborts
    * (the rewrite no longer represents the table) — rerun it. */
  def compact(spark: SparkSession, table: String,
              targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0)
    val base = currentManifest(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(base.files.nonEmpty, s"empty table $table")
    val totalBytes = base.files.map(_.bytes).sum
    val nf = math.max(1L, (totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt
    // a partitioned table's rewrite preserves its layout: partition
    // columns are recovered from the manifest's own k=v path segments
    // (coalesce bounds files per WRITE, so each partition dir gets at
    // most nf files — the writePartitionedCompact shape)
    val pCols = partitionColsOf(base.files)
    val src = readFiles(spark, table, base.files)
    val staged = stage(spark, src.coalesce(nf), table, pCols)
    val rewrittenRows = readFiles(spark, table, staged).count()
    require(rewrittenRows == base.rows,
      s"compact row mismatch: snapshot=${base.rows} " +
        s"rewritten=$rewrittenRows — nothing committed")
    commitRetrying(spark, table) { parent =>
      require(parent.version == base.version,
        s"table advanced v${base.version} -> v${parent.version} during " +
          "compaction; rerun compact against the new snapshot")
      Manifest(parent.version + 1, parent.version, "compact",
        base.rows, staged)
    }.merge
  }

  // ---- read paths ------------------------------------------------------

  /** The table at `version` (default: latest committed). The returned
    * frame plans from the manifest's explicit file list — it IS the
    * pinned snapshot; later commits cannot change what it reads. */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val m = version match {
      case Some(v) => readManifest(spark, table, v).getOrElse(
        throw new NoSuchElementException(s"no snapshot v$v in $table " +
          "(expired or never committed)"))
      case None => currentManifest(spark, table).getOrElse(
        throw new NoSuchElementException(s"no committed snapshot in $table"))
    }
    if (m.files.isEmpty)
      throw new NoSuchElementException(s"snapshot v${m.version} is empty")
    readFiles(spark, table, m.files)
  }

  /** Plan a frame over an explicit manifest file list. Partitioned
    * layouts ([[appendPartitioned]]) need one `basePath` per COMMIT
    * (Spark's partition discovery refuses multiple roots under a
    * single basePath), so files group by their `data/<uuid>` staging
    * root, each group reads with its own basePath (partition columns
    * parse from the k=v dirs, pruning binds per group), and groups
    * union. Commit-count is bounded by compaction cadence — a
    * compacted snapshot is ONE group. Keep ONE layout per table (all
    * commits partitioned by the same columns, or none) — Spark
    * rejects mixed specs at union time, loudly. */
  private def readFiles(spark: SparkSession, table: String,
                        files: Seq[FileEntry]): DataFrame = {
    val byCommit = files.groupBy(f =>
      f.path.split('/').take(2).mkString("/")).toSeq.sortBy(_._1)
    byCommit.map { case (root, fs) =>
      spark.read.option("basePath", s"$table/$root")
        .parquet(stageDirPath(table, fs): _*)
    }.reduce(_ unionByName _)
  }

  /** All committed versions, oldest first: (version, action, files,
    * rows, tag). */
  def versions(spark: SparkSession, table: String)
      : Seq[(Long, String, Int, Long, String)] =
    listVersions(spark, table).sorted.flatMap(v =>
      readManifest(spark, table, v))
      .map(m => (m.version, m.action, m.files.size, m.rows, m.tag))

  def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val vs = listVersions(spark, table)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Retention: keep the last `keepLast` manifests, delete older ones,
    * then sweep every file under the table not referenced by a
    * SURVIVING manifest — which removes both compacted-away data files
    * and crash orphans (staged-but-never-committed data, unclaimed
    * scratch manifests). Returns (manifests deleted, data files
    * deleted). Pinned reads of expired versions fail loudly at
    * resolve time (the documented retention contract). */
  def expire(spark: SparkSession, table: String,
             keepLast: Int = 2): (Int, Int) = {
    require(keepLast >= 1)
    val fs = hadoopFs(spark, table)
    val all = listVersions(spark, table).sorted
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    drop.foreach(v => fs.delete(manifestPath(table, v), false))
    val live: Set[String] = keep.flatMap(v =>
      readManifest(spark, table, v)).flatMap(_.files.map(_.path)).toSet
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
      if (rel.startsWith(SnapDir + "/")) {
        // under _snapshots only retained vN.json names survive; a
        // .tmp-* scratch body from a crashed claim is swept here
        val isLiveManifest =
          keep.exists(v => rel == s"$SnapDir/${manifestName(v)}")
        if (!isLiveManifest) doomed += f.getPath
      } else if (!isMeta && !live.contains(rel)) {
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
    (drop.size, removed)
  }

  // ---- commit protocol internals ----------------------------------------

  /** Write `df` into a fresh `data/<uuid>/` staging dir (optionally
    * Hive-partitioned inside it); returns the table-relative entries.
    * Staged files are invisible until a manifest referencing them is
    * claimed. */
  private def stage(spark: SparkSession, df: DataFrame, table: String,
                    partitionCols: Seq[String] = Nil): Seq[FileEntry] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"data/$commitId"
    val dst = s"$table/$rel"
    val writer = df.write.mode("errorifexists")
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
    entries.sortBy(_.path).toSeq
  }

  /** Optimistic-concurrency commit: build the manifest against the
    * current parent, CAS-claim `v(parent+1)`; on a lost race re-read
    * the parent and retry (bounded). Right(v) = this writer committed
    * v; Left(v) = the builder detected its work already landed as v
    * (the [[DuplicateTag]] idempotence path). */
  private def commitRetrying(spark: SparkSession, table: String)
                            (build: Manifest => Manifest)
      : Either[Long, Long] = {
    var attempt = 0
    while (attempt < MaxRetries) {
      val parent = currentManifest(spark, table)
        .getOrElse(Manifest(0L, -1L, "init", 0L, Nil))
      val next =
        try build(parent)
        catch { case d: DuplicateTag => return Left(d.version) }
      if (claim(spark, table, next)) return Right(next.version)
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
    val scratch = new org.apache.hadoop.fs.Path(
      s"$table/$SnapDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(scratch, false)
    try out.write(toJson(m).getBytes("UTF-8")) finally out.close()
    val dst = manifestPath(table, m.version)
    val won =
      if ("file" == dst.toUri.getScheme ||
          fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
          fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
        // local FS: java renameTo REPLACES an existing destination, so
        // rename cannot be the CAS — hard-link is (atomic EEXIST)
        val src = java.nio.file.Paths.get(scratch.toUri.getPath)
        val d = java.nio.file.Paths.get(dst.toUri.getPath)
        try { java.nio.file.Files.createLink(d, src); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        !fs.exists(dst) && fs.rename(scratch, dst)
      }
    fs.delete(scratch, false)
    won
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

  private def currentManifest(spark: SparkSession,
                              table: String): Option[Manifest] =
    latestVersion(spark, table).flatMap(v =>
      readManifest(spark, table, v))

  private[sources] def readManifest(spark: SparkSession, table: String,
                                    v: Long): Option[Manifest] = {
    val fs = hadoopFs(spark, table)
    val p = manifestPath(table, v)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
    Some(fromJson(new String(bytes, "UTF-8")))
  }

  /** Manifest JSON via the Jackson on Spark's own classpath — no new
    * dependency, real escaping (no hand-rolled string concat). */
  private def toJson(m: Manifest): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("parent", m.parent)
    root.put("action", m.action)
    root.put("rows", m.rows)
    root.put("tag", m.tag)
    val arr = root.putArray("files")
    m.files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path)
      o.put("bytes", f.bytes)
    }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def fromJson(s: String): Manifest = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(s)
    val files = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    val it = root.get("files").elements()
    while (it.hasNext) {
      val o = it.next()
      files += FileEntry(o.get("path").asText(), o.get("bytes").asLong())
    }
    Manifest(root.get("version").asLong(), root.get("parent").asLong(),
      root.get("action").asText(), root.get("rows").asLong(),
      files.toSeq,
      Option(root.get("tag")).map(_.asText()).getOrElse(""))
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

  private def hadoopFs(spark: SparkSession,
                       path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
