package graft.streaming

import graft.similarity.LexicalIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming landing for a SEARCHABLE corpus — the retrieval face of
  * the ingest loop ([[IndexedIngest]] is the dedup face): every
  * curated micro-batch (1) commits to the landed snapshot table and
  * (2) appends its postings to the persistent BM25 index
  * ([[LexicalIndex]]) under the batch's tag, so the corpus is
  * full-text searchable the moment a batch lands — no nightly
  * re-index of a 100 TB corpus, the index grows with the table and a
  * probe never touches corpus text.
  *
  * ==Exactly-once by idempotence (the IndexedIngest contract)==
  * `foreachBatch` is at-least-once: a crash-replayed batch re-runs
  * under the SAME id. Both landings are scoped to it — the snapshot
  * commit carries `tag = "lex-<id>"` (a replay finds the tag and
  * commits nothing), and [[LexicalIndex.append]] writes
  * `postings/batch=s<id>/` with per-directory overwrite (a replay
  * replaces its own files byte-for-byte, batches < id are immutable).
  * Either half can crash mid-write and the replay converges — the
  * spec replays a processed batch against BOTH halves to prove the
  * search results stay byte-identical to a one-shot batch build.
  *
  * ==Scale shape==
  * Per batch: one tokenize of the batch (postings + doclen + meta
  * writes are O(batch)), one manifest commit. The index accumulates
  * one batch directory per micro-batch — run
  * [[LexicalIndex.compact]] on the maintenance cadence exactly like
  * snapshot compaction (probes stay byte-identical across the fold,
  * LexicalIndexSpec). Build the index BEFORE streaming (possibly
  * from an empty frame) so the word-bucket layout is pinned —
  * appends follow `layout.json`.
  */
object LexicalIngest {

  /** One micro-batch: snapshot-commit the batch, then append its
    * postings under the batch tag. Exposed for direct testing and
    * historical backfill (replaying old batches through the same
    * path). The batch is localCheckpoint'd once — it feeds two write
    * actions that would each recompute it. */
  def processBatch(batch: DataFrame, batchId: Long, table: String,
                   indexPath: String, textCol: String = "text",
                   idCol: String = "doc_id",
                   statsCols: Seq[String] = Nil): Unit = {
    if (batch.isEmpty) return
    val pinned = batch.localCheckpoint(false)
    graft.sources.Snapshot.append(pinned, table,
      tag = Some(s"lex-$batchId"), statsCols = statsCols): Unit
    LexicalIndex.append(pinned, indexPath, batchTag = s"s$batchId",
      textCol = textCol, idCol = idCol)
  }

  /** Start the loop over a curated document stream (the output of
    * [[CurationStream.ingest]], or any stream carrying `idCol` +
    * `textCol`). Document ids must be unique across batches — the
    * [[LexicalIndex]] contract; route streams through a dedup gate
    * ([[IndexedIngest]] / CurationStream) first. Callers own the
    * returned query's lifecycle; the checkpoint carries source
    * offsets so a restart resumes from the next unprocessed batch. */
  def start(stream: DataFrame, table: String, indexPath: String,
            checkpoint: String, textCol: String = "text",
            idCol: String = "doc_id",
            statsCols: Seq[String] = Nil): StreamingQuery =
    stream
      .select(col(idCol) +: col(textCol) +:
        stream.columns.filterNot(c => c == idCol || c == textCol)
          .map(col).toSeq: _*)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, table, indexPath, textCol, idCol,
          statsCols)
      }
      .start()
}
