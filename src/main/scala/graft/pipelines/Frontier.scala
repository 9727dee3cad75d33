package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Robots

/** Crawl-frontier scheduling — where the politeness pieces compose
  * into a fetch PLAN: sitemap entries say where the site wants the
  * crawler ([[graft.sources.Sitemap]]), robots.txt says where it may
  * not go and how fast it may come ([[Robots]], incl. `Crawl-delay`),
  * and the scheduler turns the survivors into per-host fetch slots:
  *
  *  - drop robots-disallowed locs ([[Robots.verdicts]] — the batch
  *    join spelling; the frontier is a batch artifact);
  *  - rank each host's surviving locs by declared `priority`
  *    (protocol default 0.5) descending, loc ascending for a
  *    deterministic tie-break;
  *  - `fetch_slot` = that rank; `fetch_offset_ms` = (slot − 1) ×
  *    the host's crawl-delay (declared, else `defaultDelayMs`) — the
  *    earliest polite fetch time relative to the host's first fetch.
  *
  * ==Scale shape==
  * One host-keyed window over the frontier (per-host partitions —
  * the natural parallelism of a crawl; no global sort, no single
  * partition), one equi-join for the robots verdict, and a per-host
  * delay map joined broadcast (it is one row per host). A frontier
  * of billions of locs schedules in one pass. */
object Frontier {

  /** `changefreq` → recrawl interval in hours (sitemap protocol
    * vocabulary); `never` maps to null (the archival marker — those
    * entries sort LAST) and anything absent/unrecognized to the
    * weekly default a polite crawler assumes. */
  private def freqHours(cf: Column): Column = {
    val f = lower(cf)
    when(f === "always", lit(0L))
      .when(f === "hourly", lit(1L))
      .when(f === "daily", lit(24L))
      .when(f === "weekly", lit(168L))
      .when(f === "monthly", lit(720L))
      .when(f === "yearly", lit(8760L))
      .when(f === "never", lit(null).cast("long"))
      .otherwise(lit(168L))
  }

  /** Staleness sentinels: unknown-lastmod entries crawl FIRST among
    * priority ties (nothing is known about them), `never` entries
    * crawl LAST. Real staleness values are hour-scale and nowhere
    * near these bounds. */
  private[pipelines] val UnknownStalenessH = 1000000L
  private[pipelines] val NeverStalenessH = -1000000L

  /** Sitemap-entry frame `(loc [, priority] [, lastmod, changefreq])`
    * + robots table → `(host, loc, staleness_h, fetch_slot,
    * fetch_offset_ms)` for allowed locs.
    *
    * When `asOf` is given (ISO date/datetime, the plan's "now") and
    * the entries carry a `lastmodCol`, the sitemap's SCHEDULING half
    * is wired in: each entry's staleness (hours past `lastmod` +
    * its `changefreq` interval) breaks priority ties STALE-FIRST —
    * the recrawl order the protocol's lastmod/changefreq fields
    * exist to request. Without `asOf` the order is the declared
    * priority alone (the discovery-crawl spelling), `staleness_h`
    * is null, and the output shape is unchanged. */
  def plan(entries: DataFrame, robots: DataFrame, agent: String,
           defaultDelayMs: Long = 1000L,
           locCol: String = "loc",
           priorityCol: String = "priority",
           asOf: String = null,
           lastmodCol: String = "lastmod",
           changefreqCol: String = "changefreq"): DataFrame = {
    val spark = entries.sparkSession
    import spark.implicits._
    val recrawl = asOf != null && entries.columns.contains(lastmodCol)
    val withPrio0 =
      if (entries.columns.contains(priorityCol)) entries
      else entries.withColumn(priorityCol, lit(null).cast("string"))
    val withPrio = {
      val cf =
        if (withPrio0.columns.contains(changefreqCol))
          col(changefreqCol)
        else lit(null).cast("string")
      if (!recrawl)
        withPrio0.withColumn("staleness_h", lit(null).cast("long"))
      else {
        val fh = freqHours(cf)
        // try_: a malformed lastmod on a billion-loc frontier must
        // degrade to the unknown-first sentinel, not kill the task
        // (ANSI cast throws)
        val lmH = floor(
          unix_timestamp(try_to_timestamp(col(lastmodCol))) / 3600L)
          .cast("long")
        val asOfH = floor(
          unix_timestamp(lit(asOf).cast("timestamp")) / 3600L)
          .cast("long")
        withPrio0.withColumn("staleness_h",
          when(fh.isNull, lit(NeverStalenessH))
            .when(lmH.isNull, lit(UnknownStalenessH))
            .otherwise(asOfH - lmH - fh))
      }
    }
    val allowed = Robots
      .verdicts(withPrio, robots, agent, urlCol = locCol, idCol = locCol)
      .filter(col("robots_allowed"))
      .withColumn("host", lower(parse_url(col(locCol), lit("HOST"))))
      .filter(col("host").isNotNull)
    // per-host politeness interval: declared crawl-delay, else default
    val delays = robots
      .select(col("host").cast("string"), col("robots_txt").cast("string"))
      .as[(String, String)]
      .flatMap { case (h, b) =>
        if (h == null) None
        else Robots.crawlDelay(b, agent).map(d =>
          (h.toLowerCase(java.util.Locale.ROOT), (d * 1000).toLong))
      }
      .toDF("host", "delay_ms")
    val w = Window.partitionBy(col("host"))
      .orderBy(coalesce(col(priorityCol).cast("double"), lit(0.5)).desc,
               coalesce(col("staleness_h"), lit(0L)).desc,
               col(locCol).asc)
    allowed
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("fetch_slot", row_number().over(w))
      .withColumn("fetch_offset_ms",
        (col("fetch_slot") - 1).cast("long") *
          coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .select(col("host"), col(locCol).as("loc"), col("staleness_h"),
              col("fetch_slot"), col("fetch_offset_ms"))
  }

  /** Frontier EXPANSION — the discovery half of the crawl loop that
    * [[plan]]'s sitemap half cannot see: links extracted from
    * fetched pages ([[LinkGraph.pageLinks]] rows) become the next
    * round's fetch candidates. Per candidate URL (canonical form —
    * discovery must not re-queue `?b=2&a=1` next to `?a=1&b=2`):
    *
    *  - `nofollow` links don't nominate (the rel token is exactly
    *    the publisher saying "don't treat this as an endorsement or
    *    a crawl lead"), and candidates already in `seen` (prior
    *    frontier + fetched set, canonical) anti-join away;
    *  - `n_discoveries` = link count, `n_src_hosts` = DISTINCT
    *    nominating hosts — the standard frontier-priority signal
    *    (many independent hosts pointing at a URL outranks one host
    *    linking it many times), ready to feed [[plan]]'s priority
    *    column.
    *
    * ==Scale shape==
    * One aggregate on the canonical URL (map-side combined; the
    * distinct-host count is exact via the two-level groupBy) and one
    * anti-join against `seen` — shuffle-partitioned on the same key,
    * no window, no driver state. A billion-page round expands in two
    * exchanges. */
  def expand(links: DataFrame, seen: DataFrame,
             seenUrlCol: String = "url"): DataFrame = {
    val candidates = links
      .filter(col("link_url").isNotNull && !col("nofollow"))
      .select(graft.text.UrlOps.canonicalizeUrl(col("link_url"))
                .as("url"),
              col("src_host"))
      .filter(col("url").isNotNull)
    val seenCanon = seen.select(
      graft.text.UrlOps.canonicalizeUrl(col(seenUrlCol)).as("url"))
      .filter(col("url").isNotNull)
    candidates
      .join(seenCanon, Seq("url"), "left_anti")
      .groupBy(col("url"), col("src_host"))
      .agg(count(lit(1)).as("n_from_host"))
      .groupBy(col("url"))
      .agg(sum(col("n_from_host")).as("n_discoveries"),
           count(lit(1)).as("n_src_hosts"))
      .withColumn("host", lower(parse_url(col("url"), lit("HOST"))))
      .select(col("url"), col("host"),
              col("n_discoveries"), col("n_src_hosts"))
  }

  /** Per-URL change-rate estimation — the EVIDENCE-driven recrawl
    * signal ([[plan]]'s `changefreq` staleness uses what the site
    * DECLARES; this uses what the crawler OBSERVED): from a fetch
    * history `(url, fetch_t, digest)` (fetch_t in hours — the CDX
    * surface provides all three), count digest transitions between
    * consecutive fetches and estimate the revisit interval as the
    * mean time between OBSERVED changes — the first-order version of
    * the Cho–Garcia-Molina Poisson change-rate estimator, kept
    * integer-exact (floor-div) so the schedule replays bit-for-bit
    * across engines:
    *
    *  - `interval_h` = span ÷ changes (floored, min 1) when changes
    *    were observed;
    *  - = the full observed span when the URL NEVER changed (its
    *    stability horizon — the crawler has no evidence it needs to
    *    come back sooner);
    *  - = null on a single fetch (no evidence at all; callers fall
    *    back to the declared changefreq or the weekly default).
    *
    * One url-partitioned window (consecutive-fetch digest compare) +
    * one aggregate — both keyed on url, the crawl's natural
    * parallelism; no global sort, nothing on the driver. */
  def changeRate(history: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url")).orderBy(col("fetch_t"))
    history
      .withColumn("__prev", lag(col("digest"), 1).over(w))
      .withColumn("__changed",
        (col("__prev").isNotNull &&
         col("__prev") =!= col("digest")).cast("long"))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_fetches"),
           sum(col("__changed")).as("n_changes"),
           (max(col("fetch_t")) - min(col("fetch_t"))).as("span_h"))
      .withColumn("interval_h",
        when(col("n_fetches") === 1, lit(null))
          .when(col("n_changes") === 0, col("span_h"))
          .otherwise(greatest(lit(1L),
            expr("span_h div n_changes"))))
  }

  /** Conditional-revisit plan — the bandwidth half of recrawl
    * politeness: a recrawl that re-downloads unchanged bodies wastes
    * the site's egress and the crawl's ingest; HTTP's validators
    * (RFC 9110 §13.1) let a conditional GET come back `304 Not
    * Modified` instead. For each candidate URL, carry forward the
    * PRIOR crawl's validators: `if_none_match` from its `ETag`,
    * `if_modified_since` from its `Last-Modified`; `revisit_mode` =
    * `conditional` when either exists (servers must prefer
    * If-None-Match when both ship — send both), else `full` (first
    * contact or a validator-less server).
    *
    * One left equi-join of the candidate list against the prior
    * crawl's (url → validators) projection — the prior frame carries
    * two short strings per URL, never bodies; bucketed or
    * co-partitioned crawl snapshots join exchange-free.
    *
    * @param candidates frame with a `url` column (a [[plan]] or
    *                   [[expand]] output slice)
    * @param prior      prior-crawl frame with `url` and an
    *                   `http_headers` map column (the
    *                   [[graft.sources.Warc.readWarc]] surface);
    *                   duplicate prior fetches of a URL collapse to
    *                   the max validator pair (deterministic, and
    *                   lexicographically-later Last-Modified strings
    *                   from the same server are later instants in
    *                   the fixed-width IMF-fixdate format only —
    *                   callers with mixed formats should pre-dedup
    *                   by fetch time). */
  def revisitPlan(candidates: DataFrame, prior: DataFrame): DataFrame = {
    val validators = prior
      .select(col("url"),
              col("http_headers").getItem("etag").as("etag"),
              col("http_headers").getItem("last-modified")
                .as("last_modified"))
      .filter(col("etag").isNotNull || col("last_modified").isNotNull)
      .groupBy(col("url"))
      .agg(max(col("etag")).as("if_none_match"),
           max(col("last_modified")).as("if_modified_since"))
    candidates
      .join(validators, Seq("url"), "left")
      .select(col("url"), col("if_none_match"),
              col("if_modified_since"),
              when(col("if_none_match").isNotNull ||
                   col("if_modified_since").isNotNull,
                   lit("conditional")).otherwise(lit("full"))
                .as("revisit_mode"))
  }
}
