package graft.streaming

import graft.dedup.{Dedup, DedupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** The COMPLETE production ingest loop for a continuously-growing
  * deduplicated corpus: every arriving micro-batch is (1) deduped
  * within itself, (2) deduped against everything ever landed — served
  * entirely from the persistent [[DedupIndex]], the landed corpus is
  * never rescanned — then (3) landed and (4) appended to the index so
  * the NEXT batch sees it. Cross-batch duplicates are caught with no
  * time bound, which the watermark-scoped
  * [[CurationStream.acceptedDocs]] dedup cannot do: a copy arriving a
  * month after the original still hits the index's hash set.
  *
  * ==Exactly-once by idempotence==
  * `foreachBatch` is at-least-once: a crashed attempt is re-run with
  * the SAME batch id. Every write here is scoped to that id and
  * overwrite-mode — the landed parquet lands in `batch=b<id>/`, and
  * [[DedupIndex.append]] writes `postings/batch=i<id>/` — so a retry
  * replaces its own partial files instead of double-landing. The
  * subtle retry case: if the previous attempt already appended batch
  * N to the index, a naive retry would see batch N's own hashes,
  * drop every doc, and overwrite the landing with NOTHING — so the
  * dedup query explicitly EXCLUDES the batch's own index partitions
  * (`excludeBatchTag`). With that, the retry sees exactly the index
  * state the first attempt saw (batches < N are immutable), recomputes
  * the same survivors, and overwrites both directories with identical
  * content.
  *
  * ==Scale notes==
  * Per batch: one scan of the batch (hash + shingles), one narrow
  * recount over the index postings, one shingle-keyed candidate join —
  * work is O(batch + index), never O(landed corpus). Survivors are
  * localCheckpoint'd once: they feed two write actions (land + index
  * append) and each would otherwise re-run the whole dedup. */
object IndexedIngest {

  /** One micro-batch of the loop, exposed for direct testing and for
    * backfill (replaying historical batches through the same code
    * path). Returns the number of landed docs. */
  def processBatch(batch: DataFrame, batchId: Long,
                   indexPath: String, landPath: String,
                   textCol: String = "text", idCol: String = "doc_id",
                   minJaccard: Double = 0.5): Long = {
    val withinDeduped = Dedup.dropExactDuplicates(batch, textCol, idCol)
    val survivors = DedupIndex
      .dropDuplicatesAgainstIndex(withinDeduped, indexPath, textCol,
                                  idCol, minJaccard,
                                  excludeBatchTag = Some(s"i$batchId"))
      .localCheckpoint(false)
    // the landed-doc count OBSERVES the land write (CollectMetrics on
    // the checkpointed survivors) instead of running its own job —
    // one fewer job per micro-batch, same number
    val obs = new org.apache.spark.sql.Observation()
    survivors.observe(obs, count(lit(1)).as("landed"))
      .write.mode("overwrite")
      .parquet(s"$landPath/batch=b$batchId")
    DedupIndex.append(survivors, indexPath, batchTag = s"i$batchId",
                      textCol = textCol, idCol = idCol)
    // checkpointed survivors can't collapse to an empty LocalRelation
    // (LogicalRDD), but keep the LexicalIndex.append fallback shape:
    // an eliminated metrics node degrades to the old count, never
    // a hang or a miscount
    try obs.get("landed").asInstanceOf[Long]
    catch { case _: NoSuchElementException => survivors.count() }
  }

  /** Start the loop over a streaming DataFrame of documents. The index
    * must already exist — [[DedupIndex.build]] it from the initial
    * corpus (an empty DataFrame with the right schema for a cold
    * start). Callers own the returned query's lifecycle; the
    * checkpoint carries source offsets, so a restart resumes from the
    * next unprocessed batch without replaying landed ones. */
  def start(stream: DataFrame, indexPath: String, landPath: String,
            checkpoint: String, textCol: String = "text",
            idCol: String = "doc_id",
            minJaccard: Double = 0.5): StreamingQuery =
    stream
      .select(col(idCol), col(textCol))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, indexPath, landPath, textCol, idCol,
                     minJaccard): Unit
      }
      .start()
}
