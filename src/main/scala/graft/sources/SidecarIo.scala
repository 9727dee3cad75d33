package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Small JSON/text SIDECAR files (index layout pins, consumer
  * baselines) read and written through Hadoop's `FileSystem` API, so
  * they live wherever the data lives — local, HDFS, S3A. The
  * `java.nio` spelling these replace silently "misses" a sidecar on
  * any non-local scheme (`Files.exists` = false for `hdfs://...`),
  * which loses a word-bucketed index's partition pruning or
  * re-baselines a durable consumer with no signal.
  *
  * Writes are ATOMIC REPLACEMENTS **on rename-capable filesystems**
  * (local POSIX, HDFS): the body lands under a scratch name in the
  * destination directory, then `FileContext.rename` with
  * `Options.Rename.OVERWRITE` binds the real name — a concurrent
  * reader observes the old complete body or the new complete body,
  * never a torn one and never a missing file. On OBJECT STORES the
  * same call degrades to the store's rename (s3a: copy+delete — a
  * reader may briefly see the name absent between the delete and the
  * copy's visibility; never a torn body, since the copy is only
  * listed complete). Schemes whose `AbstractFileSystem` binding is
  * absent (FileContext unresolvable) fall back to delete +
  * `FileSystem.rename` — the weakest contract, same
  * complete-body-or-absent guarantee. Sidecars here are REBUILDABLE
  * pins and baselines, so a transient absence re-derives or replays;
  * nothing here may be used as a commit CAS (that is
  * [[Snapshot]]'s `atomicBind`, which never replaces).
  */
object SidecarIo {

  private def conf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf(spark)).exists(p)
  }

  /** The sidecar's UTF-8 content, or None when absent. */
  def readString(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf(spark))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** Write (or atomically REPLACE) the sidecar at `path`. */
  def writeStringAtomic(spark: SparkSession, path: String,
                        content: String): Unit = {
    val c = conf(spark)
    val dst = new Path(path)
    val fs = dst.getFileSystem(c)
    val qDst = fs.makeQualified(dst)
    fs.mkdirs(qDst.getParent)
    val scratch = new Path(qDst.getParent,
      s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(scratch, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = FileContext.getFileContext(qDst.toUri, c)
      fc.rename(fs.makeQualified(scratch), qDst,
        Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding for this scheme (some object
        // stores ship only the FileSystem API): replace through
        // delete + rename — not atomic, but the body was written
        // COMPLETE under the scratch name, so a racing reader sees
        // the old body, the new body, or (briefly) no file; sidecars
        // are rebuildable, so absence re-derives, never corrupts
        fs.delete(qDst, false)
        if (!fs.rename(fs.makeQualified(scratch), qDst))
          throw new java.io.IOException(
            s"sidecar replace failed for $qDst")
    }
  }
}
