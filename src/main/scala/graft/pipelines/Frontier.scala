package graft.pipelines

import org.apache.spark.sql.DataFrame
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

  /** Sitemap-entry frame `(loc [, priority])` + robots table →
    * `(host, loc, fetch_slot, fetch_offset_ms)` for allowed locs. */
  def plan(entries: DataFrame, robots: DataFrame, agent: String,
           defaultDelayMs: Long = 1000L,
           locCol: String = "loc",
           priorityCol: String = "priority"): DataFrame = {
    val spark = entries.sparkSession
    import spark.implicits._
    val withPrio =
      if (entries.columns.contains(priorityCol)) entries
      else entries.withColumn(priorityCol, lit(null).cast("string"))
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
               col(locCol).asc)
    allowed
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("fetch_slot", row_number().over(w))
      .withColumn("fetch_offset_ms",
        (col("fetch_slot") - 1).cast("long") *
          coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .select(col("host"), col(locCol).as("loc"), col("fetch_slot"),
              col("fetch_offset_ms"))
  }
}
