package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COMPOSED RIGHT-TO-ERASURE — one operation spanning the snapshot
  * table AND every derived index. The pieces all exist separately
  * ([[graft.sources.Snapshot.deleteKeysMor]],
  * [[graft.similarity.LexicalIndex.gc]],
  * [[graft.dedup.DedupIndex.gc]],
  * [[graft.similarity.Pq.gcPqIndex]]), but a real erasure request
  * must call all of them with the same key set, in an order that a
  * crash mid-way leaves RECOVERABLE — that composition, done once,
  * is this module. Reference: the curation pipeline's landed corpus
  * plus its retrieval/dedup/ANN indexes (the shape
  * `pipelines/Curation.scala` → `landSnapshot` produces).
  *
  * ==Ordering and crash windows==
  * The erased ids are resolved against the TABLE first (text is
  * needed for the dedup index's content-hash removal, and must be
  * read before the rows die), then every index gc runs, then the
  * table delete commits LAST. A crash anywhere before the table
  * commit leaves the ids still resolvable — rerunning `erase` with
  * the same ids redoes the index work (each index gc is an anti-join
  * rewrite, inherently idempotent for already-absent ids; the
  * lexical index's N-accounting is protected by its own semi-join
  * against the stored doclen, so already-gc'd docs are skipped, not
  * double-subtracted). After the table commit a rerun resolves zero
  * ids and no-ops — the whole composition is safely re-runnable.
  * (One documented sliver: a NULL-TEXT doc whose index gc succeeded
  * but whose table delete crashed re-subtracts from the lexical N on
  * the rerun — null-text docs have no doclen row to skip by. Erasure
  * batches are small and null-text docs rare; an exactness-critical
  * deployment rebuilds the lexical index at maintenance cadence.)
  *
  * ==Index swaps==
  * Each gc rewrites its index to a fresh sibling directory and then
  * SWAPS it into place (rename old → trash, rename new → old path,
  * delete trash). The swap is not atomic for concurrent probes —
  * this is a MAINTENANCE operation, run it from the maintenance
  * schedule like compact (the existing DedupIndex/LexicalIndex swap
  * contract, composed). */
object Retention {

  /** What one [[erase]] pass did: `requested` distinct ids asked,
    * `erased` found live in the table and removed everywhere,
    * `skipped` not present (already erased or never landed — loud in
    * the report, not an exception, so at-least-once erasure queues
    * can re-deliver safely), and the table version the delete
    * committed (None when nothing was live). */
  final case class ErasureReport(requested: Long, erased: Long,
                                 skipped: Long,
                                 tableVersion: Option[Long])

  /** Erase `ids` (one column of doc ids) from the snapshot `table`
    * and from every index whose path is given. Returns the
    * [[ErasureReport]]; after it, no read / BM25 / hybrid search /
    * incremental-dedup probe / PQ search can surface an erased doc,
    * and the lexical index's BM25 statistics (N, avgdl, idf) equal a
    * from-scratch rebuild over the survivors (spec-pinned). */
  def erase(spark: SparkSession, ids: DataFrame, table: String,
            lexicalIndex: Option[String] = None,
            dedupIndex: Option[String] = None,
            pqIndex: Option[String] = None,
            idCol: String = "doc_id",
            textCol: String = "text",
            pqIdCol: String = "vec_id"): ErasureReport = {
    import graft.sources.Snapshot
    val wanted = ids.select(col(ids.columns.head).as(idCol)).distinct()
    val requested = wanted.count()
    val tbl = Snapshot.read(spark, table)
    require(dedupIndex.isEmpty || tbl.columns.contains(textCol),
      s"dedup-index erasure needs the doomed docs' '$textCol' (its " +
        "content hashes must drop too) and the table does not carry it")
    // resolve against the live table FIRST: presence defines "landed"
    // (the pipeline contract lands table and indexes together), and
    // the dedup index needs the doomed TEXT before the rows die.
    // localCheckpoint pins the resolution — the table delete below
    // must not change what the index gcs see.
    val doomed = tbl
      .join(wanted, Seq(idCol), "left_semi")
      .select(col(idCol),
        (if (tbl.columns.contains(textCol)) col(textCol)
         else lit(null).cast("string").as(textCol)))
      .localCheckpoint()
    val present = doomed.select(col(idCol)).distinct()
    val erased = present.count()
    if (erased > 0L) {
      // ---- indexes first (rerun-safe), table last ----
      lexicalIndex.foreach { path =>
        // skip ids the index no longer holds (a crashed earlier pass
        // already gc'd them): the doclen semi-join keeps N exact;
        // null-text docs have no doclen row and pass through on the
        // table's evidence (they ARE counted in the stored N)
        val doclenIds = spark.read.parquet(s"$path/doclen")
          .select(col("doc_id").as(idCol))
        val lexIds = present.join(doclenIds, Seq(idCol), "left_semi")
          .unionByName(doomed.filter(col(textCol).isNull)
            .select(col(idCol)))
          .distinct()
        if (lexIds.limit(1).count() > 0L)
          swapped(spark, path)(dst =>
            graft.similarity.LexicalIndex.gc(lexIds, path, dst))
      }
      dedupIndex.foreach { path =>
        swapped(spark, path)(dst =>
          graft.dedup.DedupIndex.gc(doomed, path, dst,
            textCol = textCol, idCol = idCol))
      }
      pqIndex.foreach { path =>
        swapped(spark, path)(dst =>
          graft.similarity.Pq.gcPqIndex(spark,
            present.withColumnRenamed(idCol, pqIdCol), path, dst,
            idCol = pqIdCol))
      }
    }
    val version =
      if (erased == 0L) None
      else Some(Snapshot.deleteKeysMor(present, table))
    ErasureReport(requested, erased, requested - erased, version)
  }

  /** Run an index rewrite into a fresh sibling dir, then swap it into
    * place (the gc/compact `dst != path` contract, executed). */
  private def swapped(spark: SparkSession, path: String)
                     (rewrite: String => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dst = new org.apache.hadoop.fs.Path(
      p.getParent, s"${p.getName}.gc-$nonce")
    rewrite(dst.toString)
    val trash = new org.apache.hadoop.fs.Path(
      p.getParent, s"${p.getName}.trash-$nonce")
    if (!fs.rename(p, trash))
      throw new java.io.IOException(s"swap failed: $p -> $trash")
    if (!fs.rename(dst, p)) {
      fs.rename(trash, p) // restore — the rewrite dir stays for debug
      throw new java.io.IOException(s"swap failed: $dst -> $p")
    }
    fs.delete(trash, true)
  }
}
