package graft.streaming

import graft.multimodal.Sniff
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MULTIMODAL ingest — the binary-asset twin of
  * [[CurationStream]]: assets arrive as (id, bytes) with no trusted
  * labels, every micro-batch is sniffed from its magic bytes
  * ([[Sniff.route]] — stateless expressions, so the batch dispatch
  * lifts verbatim), and survivors land route-partitioned so each
  * downstream decoder job (image/audio/video) scans ONLY its own
  * directory — the same partition-pruning contract as
  * [[CurationStream.land]]'s language dirs. Undecodable bytes are not
  * dropped: they land under `route=quarantine` with everything else
  * (corrupt-capture, the [[graft.sources.Jsonl]] posture for bytes).
  *
  * Content-hash dedup on ingest composes in front exactly as in
  * [[CurationStream.ingest]] (`sha2(content, 256)` works on binary);
  * it is left to the caller because multimodal dedup usually wants
  * the PERCEPTUAL pass ([[graft.dedup.Dedup.phashNearDuplicates]]) in
  * the batch layer instead, where exact-byte dedup would miss
  * transcodes.
  *
  * Scale: sniffing is a map over the scan (no shuffle, no state); the
  * file sink's transaction log gives exactly-once file visibility
  * across restarts. One stream feeds four directories — no
  * per-modality topic plumbing. */
object MultimodalIngest {

  /** Sniff + dispatch a streaming (or batch) asset frame: adds
    * `detected` and `route`. */
  def ingest(assets: DataFrame, contentCol: String = "content"): DataFrame =
    Sniff.route(assets, contentCol)

  /** Land the routed stream as `path/route=K/` parquet via the file
    * sink's transaction log. Returns the started query; callers own
    * its lifecycle. */
  def land(routed: DataFrame, path: String,
           checkpoint: String): StreamingQuery =
    routed.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("route")
      .outputMode("append")
      .start()

  /** Ingest-health counters: per micro-batch-window route counts and
    * byte volume — the dashboard aggregation downstream of [[ingest]].
    * Requires an `event_time` timestamp column on the stream. */
  def ingestStats(routed: DataFrame, contentCol: String = "content",
                  width: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame =
    routed
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), width), col("route"))
      .agg(count(lit(1)).as("n_assets"),
           sum(length(col(contentCol))).as("n_bytes"))
      .select(unix_timestamp(col("window.start")).as("bucket_start_s"),
              col("route"), col("n_assets"), col("n_bytes"))
}
