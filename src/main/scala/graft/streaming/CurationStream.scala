package graft.streaming

import graft.pipelines.Curation
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the curation funnel's ingest half — the shape a
  * continuously-crawled corpus runs 24/7, with the batch pipeline
  * ([[graft.pipelines.Curation.curate]]) reserved for compaction.
  *
  * Stage mapping:
  *  - langID + quality + content filters (funnel stages 1–3) are
  *    STATELESS map-shaped kernels, so they lift to a stream verbatim
  *    — same columns, same codegen'd pass, applied per micro-batch;
  *  - exact dedup (stage 4) becomes `dropDuplicatesWithinWatermark`
  *    on the content hash — state holds one entry per distinct
  *    surviving hash inside the watermark horizon, evicted as the
  *    watermark passes (bounded by horizon cardinality, not stream
  *    length). Same sha2-256 key as the batch
  *    `Dedup.dropExactDuplicates`, so landed output dedups
  *    consistently with a later batch pass;
  *  - near-dup dedup + mixture (stages 5–6) need a GLOBAL pair graph /
  *    stratum counts — they stay batch, run over the landed files at
  *    compaction (lambda split: cheap exactness online, expensive
  *    exactness offline).
  *
  * Input stream needs `doc_id`, `text`, and an `event_time`
  * TimestampType column (arrival/crawl time) for the watermark.
  */
object CurationStream {

  /** Filter + dedup a document stream; output rows carry `detected`
    * (language) and `quality` like the batch curate. Honors the same
    * config as `Curation.curate`: PII redaction rewrites `text`
    * BEFORE scoring/hashing (all stateless — lifts to the stream
    * verbatim), and a supplied quality model gates on `ml_quality`
    * (model scoring is a deterministic map projection, so it streams
    * too). Dual-mode: on a batch DataFrame
    * (`dropDuplicatesWithinWatermark` is streaming-only) the dedup
    * degrades to plain exact dedup on the same hash — the spec's
    * batch twin pins its survivor count to the funnel report's
    * independently-computed `exact_dedup` stage. */
  def ingest(stream: DataFrame, cfg: Curation.Config = Curation.Config(),
             watermark: String = "1 hour",
             model: Option[graft.ml.QualityModel.Fitted] = None,
             keepHash: Boolean = false)
      : DataFrame = {
    val redacted =
      if (cfg.redactPii)
        stream.withColumn("text", Text.redactPii(col("text")))
      else stream
    // C4 line cleaning + page policy (round 13): pure per-row Column
    // work — lifts to the stream verbatim, same placement as the
    // batch curate (BEFORE scoring: downstream must see cleaned text)
    val input = cfg.c4 match {
      case Some(c4cfg) =>
        val c4 = graft.text.C4
        c4.pageVerdict(c4.cleanLines(redacted, c4cfg), c4cfg)
          .filter(col("keep") === 1L)
          .drop("raw_text", "n_lines", "n_kept", "n_sentences",
            "pass_sentences", "pass_badwords", "pass_lorem_ipsum",
            "pass_brace", "keep", "drop_reason")
      case None => redacted
    }
    // langModel opt-in (the curate wiring): model scoring is a map
    // projection (HashingTF + one broadcast weight matrix), so it
    // lifts to the stream verbatim
    val scored0 = input
      .withColumn("toks", Text.tokenize(col("text")))
      .withColumn("quality",
        Text.qualityScoreFromTokens(col("toks"), col("text")))
    val scored = cfg.langModel match {
      case Some(lm) =>
        lm.score(scored0, cfg.langModelMinConf)
          .withColumn("detected", col("lang_pred"))
          .drop("lang_pred", "lang_conf", "toks")
      case None => scored0
        .withColumn("detected",
          Text.langIdFromTokens(col("toks"), col("text")))
        .drop("toks")
    }
    val heurFiltered = scored
      .filter(col("detected").isin(cfg.langs.toSeq: _*))
      .filter(col("quality") >= lit(cfg.minQuality))
      .filter(Text.urlCount(col("text")) <= lit(cfg.maxUrls))
    // repetition gate (stateless — lifts to the stream verbatim; the
    // cheap lines-only slice, not the full six-signal kernel)
    val repFiltered =
      if (cfg.maxDupLineFrac < 1.0)
        heurFiltered.filter(
          Text.dupLineFrac(col("text")) <= lit(cfg.maxDupLineFrac))
      else heurFiltered
    // Gopher rule filter (round 13): per-row signals + flags, no
    // state — the batch stage verbatim, same placement
    val filtered = cfg.gopher match {
      case Some(gcfg) =>
        graft.text.Gopher.filterDocs(repFiltered, gcfg)
      case None => repFiltered
    }
    val gated = model match {
      case Some(m) =>
        m.score(filtered).filter(col("ml_quality") >= lit(cfg.minMlQuality))
      case None => filtered
    }
    val hashed = gated.withColumn("content_hash", sha2(col("text"), 256))
    val deduped =
      if (stream.isStreaming)
        hashed.withWatermark("event_time", watermark)
          .dropDuplicatesWithinWatermark(Seq("content_hash"))
      else hashed.dropDuplicates(Seq("content_hash"))
    // keepHash: retain the dedup's content hash so downstream
    // monitoring ([[noveltyStats]] hashCol) and the landed corpus's
    // reference column reuse it instead of re-hashing every text
    if (keepHash) deduped else deduped.drop("content_hash")
  }

  /** Land the accepted stream as facet-partitioned parquet — the file
    * half of the lambda split ([[ingest]] scaladoc): the file sink's
    * transaction log gives exactly-once file visibility across
    * restarts (a batch re-attempt never double-lands), partitioning by
    * detected language keeps later batch compaction/near-dedup scans
    * partition-pruned per language, and the checkpoint carries the
    * dedup watermark state so a restart resumes, not replays. Returns
    * the started query; callers own its lifecycle. */
  def land(accepted: DataFrame, path: String, checkpoint: String,
           partitionCols: Seq[String] = Seq("detected"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    accepted.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append")
      .start()

  /** Land the accepted stream as SNAPSHOT COMMITS
    * ([[graft.sources.Snapshot]]) — the landing that closes the file
    * sink's operational gap at 100 TB: every micro-batch is one
    * atomic manifest commit, so a reader resolving the table mid-write
    * sees a complete version (never a half-landed batch), compaction
    * of the landed table runs UNDER live readers
    * (`Snapshot.compact` = another commit, the reader's pinned
    * manifest untouched), and retention is `Snapshot.expire` instead
    * of directory surgery.
    *
    * Exactly-once: `foreachBatch` is at-least-once, so each commit
    * carries `tag = "batch-<id>"` — a crash-replayed batch finds its
    * tag already committed and lands NOTHING (SnapshotStreamSpec
    * replays a batch to prove it). The checkpoint still owns the
    * dedup watermark state; the tag owns commit idempotence. */
  def landSnapshot(accepted: DataFrame, table: String,
                   checkpoint: String,
                   statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    accepted.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          // statsCols flow through so the landed table carries the
          // manifest stats index from birth (readWhere/merge/delete
          // prune without a backfill pass)
          graft.sources.Snapshot.append(batch, table,
            tag = Some(s"batch-$batchId"), statsCols = statsCols): Unit
      }
      .outputMode("append")
      .start()

  /** Per-window NOVELTY of the accepted stream against the LANDED
    * corpus — the streaming face of [[graft.ops.Drift.noveltyRate]]
    * (round-13's batch monitoring family wired into the 24/7 ingest,
    * VERDICT r13 #7): per tumbling window, accepted rows, how many
    * carry a content hash unseen in `refHashes`, and the novelty
    * fraction. A crawl whose per-window novelty collapses is
    * re-fetching the same web live, not at the next compaction.
    *
    * `refHashes` is a STATIC one-column frame of the landed corpus's
    * sha2-256 hex hashes — at scale the ALREADY-STORED hash column of
    * the landing, never a text rescan; the stream-static left join
    * re-reads it per micro-batch, so keep it a compact parquet/Delta
    * column. `accepted` is [[ingest]]'s output (already exact-deduped
    * within the watermark horizon, so window counts are DISTINCT
    * contents — the same distinctness [[graft.ops.Drift.noveltyRate]]
    * computes; CurationStreamSpec pins stream ≡ batch on identical
    * data). The novelty division is the same single IEEE division as
    * the batch operator.
    *
    * No `withWatermark` here ON PURPOSE: [[ingest]]'s output already
    * carries the dedup watermark, and redefining a watermark
    * downstream of a stateful operator is disallowed — the window
    * aggregation rides the inherited one. */
  def noveltyStats(accepted: DataFrame, refHashes: DataFrame,
                   width: String = "1 hour",
                   hashCol: Option[String] = None): DataFrame = {
    require(refHashes.columns.length == 1,
      s"refHashes must be one hash column, got " +
        refHashes.columns.mkString(", "))
    val ref = refHashes
      .select(col(refHashes.columns.head).as("__ref_h")).distinct()
    // hashCol: reuse the content hash ingest(keepHash = true) already
    // computed for dedup instead of re-hashing every text per
    // micro-batch; the fallback recompute is the identical sha2-256
    accepted
      .withColumn("__h", hashCol.fold(sha2(col("text"), 256))(col))
      .join(ref, col("__h") === col("__ref_h"), "left_outer")
      .groupBy(window(col("event_time"), width))
      .agg(count(lit(1)).as("n_cur"),
           sum(when(col("__ref_h").isNull, 1L).otherwise(0L))
             .as("n_novel"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("n_cur"), col("n_novel"),
              when(col("n_cur") === 0L, lit(0.0))
                .otherwise(col("n_novel").cast("double") /
                  col("n_cur").cast("double")).as("novelty"))
  }

  /** PSI snapshot at COMPACTION — the other half of the monitoring
    * wiring: compaction is batch (the lambda split), so the landed
    * files run the batch [[graft.ops.Drift.psiBins]] verbatim against
    * the reference snapshot's signal column. Thin by design: the
    * value IS that stream-landed data and batch data flow through the
    * SAME PSI kernel (one implementation, one oracle —
    * `q_drift_psi`). */
  def compactionPsi(ref: DataFrame, landed: DataFrame, valueCol: String,
                    nBins: Int = 10): DataFrame =
    graft.ops.Drift.psiBins(ref, landed, valueCol, nBins)

  /** Ingest-health counters over the accepted stream: per tumbling
    * window, accepted docs and mean quality by detected language —
    * the dashboard aggregation downstream of [[ingest]]. */
  def ingestStats(accepted: DataFrame, width: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame =
    accepted
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), width), col("detected"))
      .agg(count(lit(1)).as("n_docs"),
           avg(col("quality")).as("mean_quality"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("detected"), col("n_docs"), col("mean_quality"))
}
