package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{Links, UrlOps}

/** The link side of a crawled corpus — three surfaces built from
  * [[graft.text.Links]] extraction:
  *
  *  - [[pageLinks]]: one row per `<a href>` with its RESOLVED
  *    absolute target (base-href-aware, RFC 3986), anchor text, and
  *    nofollow flag — the raw material;
  *  - [[hostGraph]]: host-level edge list with link counts — the
  *    input the existing graph operators (PageRank `ops/Graph`,
  *    centrality-as-quality-prior weighting) consume;
  *  - [[anchorText]]: aggregated anchor terms per TARGET url — the
  *    search-era relevance signal (what the web calls a page).
  *
  * ==Scale shape==
  * [[pageLinks]] is pure map work over the corpus scan (extract →
  * posexplode → two resolution kernels — all codegen'd, no shuffle).
  * [[hostGraph]]/[[anchorText]] each take exactly one hash-aggregate
  * shuffle on their group keys with map-side partial aggregation;
  * web link-graphs are host-skewed, but the host-PAIR key of
  * [[hostGraph]] spreads a hub host across as many partitions as it
  * has distinct neighbor hosts, so the skew a single-host key would
  * concentrate stays spread. */
object LinkGraph {

  /** Per-link rows of a page frame: `(src_url, src_host, link_idx,
    * href, link_url, anchor, nofollow)`. `link_url` is the resolved
    * absolute target — relative hrefs resolve against the page's
    * `<base href>` when present (itself resolved against the page
    * URL: relative bases are legal), else the page URL; unresolvable
    * hrefs keep a null `link_url` (quarantine rows — callers filter,
    * nothing throws). `httpOnly` keeps only http(s) targets, the
    * fetch-candidate set (mailto:/javascript:/data: links carry no
    * crawl value). */
  def pageLinks(docs: DataFrame,
                urlCol: String = "url",
                htmlCol: String = "raw_html",
                httpOnly: Boolean = true): DataFrame = {
    val effBase = coalesce(
      Links.resolveUrl(col(urlCol), Links.htmlBaseHref(col(htmlCol))),
      col(urlCol))
    val exploded = docs
      .select(col(urlCol).as("src_url"),
              UrlOps.canonicalHost(col(urlCol)).as("src_host"),
              effBase.as("eff_base"),
              posexplode(Links.htmlLinks(col(htmlCol)))
                .as(Seq("link_idx", "l")))
      .select(col("src_url"), col("src_host"), col("link_idx"),
              col("l.href").as("href"),
              Links.resolveUrl(col("eff_base"), col("href")).as("link_url"),
              col("l.anchor").as("anchor"),
              col("l.nofollow").as("nofollow"))
    if (httpOnly)
      exploded.filter(col("link_url").isNull ||
                      col("link_url").rlike("^https?://"))
    else exploded
  }

  /** Host-level edge list: `(src_host, dst_host, n_links,
    * n_nofollow)`. Self-loops (intra-host navigation) are kept —
    * graph consumers decide; one aggregate, map-side combined. */
  def hostGraph(links: DataFrame): DataFrame =
    links
      .filter(col("link_url").isNotNull)
      .select(col("src_host"),
              UrlOps.canonicalHost(col("link_url")).as("dst_host"),
              col("nofollow"))
      .filter(col("dst_host").isNotNull)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
           sum(col("nofollow").cast("long")).as("n_nofollow"))

  /** Aggregated anchor text per TARGET: `(link_url, anchor, n)` —
    * how the linking web describes each page. Empty anchors drop
    * (image links, icon links); one aggregate. */
  def anchorText(links: DataFrame): DataFrame =
    links
      .filter(col("link_url").isNotNull && length(col("anchor")) > 0)
      .groupBy(col("link_url"), col("anchor"))
      .agg(count(lit(1)).as("n"))
}
