package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.{HtmlText, MainContent, Robots}

/** Streaming CRAWL ingest (the WARC twin of [[MultimodalIngest]]):
  * crawl shards arrive as `(shard_id, content)` binary rows — the
  * shape a fetcher fleet hands off — and every micro-batch walks the
  * container, extracts the page, and applies the FULL politeness
  * policy before anything lands:
  *
  *  - container walk: [[graft.sources.Warc.recordsOf]] per shard
  *    (stateless flatMap — lifts to streams verbatim, malformed
  *    records arrive as `invalid` rows instead of killing the query);
  *  - extraction: `html_text` / `html_title` / `html_meta_robots`
  *    (codegen'd kernels, map over the batch);
  *  - policy: robots.txt verdicts via the COMPILED-rules spelling
  *    ([[Robots.compileRules]] → [[Robots.allowedColumn]]) — a
  *    stateless broadcast-map predicate, because append-mode streams
  *    cannot take the batch join + per-doc aggregate spelling; plus
  *    the in-page `noindex` directive.
  *
  * Nothing is dropped: every record lands under its `disposition`
  * partition — `kept` (the corpus feed), `robots_blocked`,
  * `noindex`, `skipped` (non-response / non-200 / non-HTML /
  * malformed) — so the downstream corpus job scans ONLY
  * `disposition=kept` (partition pruning), while blocked volumes
  * stay auditable ([[MultimodalIngest]]'s quarantine posture).
  *
  * Scale: one flatMap + codegen'd maps, NO shuffle, no state store;
  * the file sink's transaction log gives exactly-once landing across
  * restarts. The rules map is crawl-frontier-sized (bounded,
  * guarded at compile time); a robots set too large to broadcast
  * belongs to the batch join spelling in a downstream re-audit. */
object CrawlIngest {

  /** Walk + extract + policy-stamp a streaming (or batch) shard
    * frame: one row per WARC record with
    * `(shard_id, target_uri, http_status, title, meta_robots, text,
    * disposition)`. `mainContentOnly` swaps the text stage to the
    * block-level boilerplate classifier ([[MainContent]]) — still a
    * codegen'd map, so the stream plan shape is unchanged and the
    * batch spelling (`WebCuration.fromWarc(mainContentOnly = true)`)
    * stays the parity twin. */
  def ingest(shards: DataFrame, rules: Map[String, Seq[Robots.Rule]],
             idCol: String = "shard_id",
             contentCol: String = "content",
             mainContentOnly: Boolean = false): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val records = shards
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (sid, raw) =>
        graft.sources.Warc.recordsOf(raw).map(r =>
          (sid, r.warcType, r.targetUri, r.httpStatus, r.contentType,
           r.body))
      }
      .toDF("shard_id", "warc_type", "target_uri", "http_status",
            "content_type", "body")
    // charset-aware byte→text boundary — same cascade as the batch
    // twin (WebCuration.fromWarc), still a codegen'd map, so the
    // stream plan shape and the stream≡batch parity both hold
    val html = graft.text.CharsetSniff
      .decodePayload(col("body"), col("content_type"))
    val isPage = col("warc_type") === "response" &&
      col("http_status") === 200 &&
      coalesce(col("content_type").contains("text/html"), lit(false))
    val host = lower(parse_url(col("target_uri"), lit("HOST")))
    val path = coalesce(parse_url(col("target_uri"), lit("PATH")), lit(""))
    val query = parse_url(col("target_uri"), lit("QUERY"))
    val pathq = concat(
      when(length(path) === 0, lit("/")).otherwise(path),
      when(query.isNotNull, concat(lit("?"), query)).otherwise(lit("")))
    records
      .withColumn("title", when(isPage, HtmlText.htmlTitle(html)))
      .withColumn("meta_robots", when(isPage, HtmlText.htmlMetaRobots(html)))
      .withColumn("text", when(isPage,
        if (mainContentOnly) MainContent.htmlMainContent(html)
        else HtmlText.htmlText(html)))
      .withColumn("robots_ok", Robots.allowedColumn(host, pathq, rules))
      .withColumn("noindex",
        coalesce(lower(col("meta_robots")).contains("noindex"), lit(false)))
      .withColumn("disposition",
        when(!isPage, lit("skipped"))
          .when(!col("robots_ok"), lit("robots_blocked"))
          .when(col("noindex"), lit("noindex"))
          .otherwise(lit("kept")))
      .select(col("shard_id"), col("target_uri"), col("http_status"),
              col("title"), col("meta_robots"), col("text"),
              col("disposition"))
  }

  /** Land the stamped stream as `path/disposition=K/` parquet via the
    * file sink's transaction log. Returns the started query; callers
    * own its lifecycle. */
  def land(stamped: DataFrame, path: String,
           checkpoint: String): StreamingQuery =
    stamped.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("disposition")
      .outputMode("append")
      .start()
}
