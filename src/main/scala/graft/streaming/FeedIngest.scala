package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.{Robots, UrlOps}

/** Streaming FEED ingest — the freshness discovery channel
  * ([[graft.sources.Feed]]) in its natural shape: feeds are POLLED,
  * so new entries arrive continuously and a frontier that only sees
  * them at the next batch recrawl forfeits the channel's whole
  * point (minutes-fresh URLs). Feed files arrive as
  * `(feed_id, content)` binary rows — the poller fleet's hand-off —
  * and every micro-batch parses, canonicalizes, and
  * politeness-stamps the entries into frontier candidates:
  *
  *  - parse: [[graft.sources.Feed.entriesOf]] per file (stateless
  *    flatMap — RSS/Atom/gzip handled, malformed input arrives as
  *    `invalid` rows instead of killing the query);
  *  - canonicalize: [[UrlOps.canonicalizeUrl]] so parameter order
  *    can't re-nominate a URL (the [[graft.pipelines.Frontier
  *    .expand]] contract);
  *  - policy: robots.txt verdicts via the COMPILED-rules spelling
  *    ([[Robots.compileRules]] → [[Robots.allowedColumn]]) — the
  *    stateless broadcast-map predicate, same reasoning as
  *    [[CrawlIngest]]: append-mode streams can't take the batch
  *    join + aggregate spelling.
  *
  * Nothing is dropped: entries land under `disposition` partitions —
  * `kept` (frontier candidates), `robots_blocked`, `invalid`
  * (parse/canonicalization quarantine) — so the frontier job scans
  * ONLY `disposition=kept` while blocked volumes stay auditable.
  * Candidate DEDUP against the seen set is deliberately NOT here:
  * it is [[graft.pipelines.Frontier.expand]]'s anti-join downstream
  * (batch) or the watermark-bounded streaming dedup (ST5) — this
  * stage stays stateless so the plan is one flatMap + codegen'd
  * maps, no shuffle, no state store, exactly-once landing via the
  * file sink's transaction log. */
object FeedIngest {

  /** Parse + stamp a streaming (or batch) feed-file frame: one row
    * per entry with `(feed_id, format, link, candidate_url, host,
    * title, published, disposition)`. */
  def ingest(feeds: DataFrame, rules: Map[String, Seq[Robots.Rule]],
             idCol: String = "feed_id",
             contentCol: String = "content"): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    val entries = feeds
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, raw) =>
        graft.sources.Feed.entriesOf(raw).map(e =>
          (fid, e.format, e.link, e.title, e.published))
      }
      .toDF("feed_id", "format", "link", "title", "published")
    val candidate = UrlOps.canonicalizeUrl(col("link"))
    val host = lower(parse_url(col("link"), lit("HOST")))
    val path = coalesce(parse_url(col("link"), lit("PATH")), lit(""))
    val query = parse_url(col("link"), lit("QUERY"))
    val pathq = concat(
      when(length(path) === 0, lit("/")).otherwise(path),
      when(query.isNotNull, concat(lit("?"), query)).otherwise(lit("")))
    entries
      .withColumn("candidate_url", candidate)
      .withColumn("host", host)
      .withColumn("robots_ok", Robots.allowedColumn(host, pathq, rules))
      .withColumn("disposition",
        when(col("format") === "invalid" ||
             col("candidate_url").isNull, lit("invalid"))
          .when(!col("robots_ok"), lit("robots_blocked"))
          .otherwise(lit("kept")))
      .select(col("feed_id"), col("format"), col("link"),
              col("candidate_url"), col("host"), col("title"),
              col("published"), col("disposition"))
  }

  /** Land the stamped stream as `path/disposition=K/` parquet via
    * the file sink's transaction log. Returns the started query;
    * callers own its lifecycle. */
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
