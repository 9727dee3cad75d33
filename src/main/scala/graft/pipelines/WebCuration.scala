package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.UrlOps

/** Domain-level web curation — the URL-keyed stage every web-scale
  * training corpus runs BEFORE content filters (C4's blocklist,
  * RefinedWeb's URL filtering + per-domain balance, Dolma's domain
  * caps): attach canonical URL + registrable domain, drop blocklisted
  * domains, and cap each domain's contribution so a single crawl-happy
  * site cannot dominate the mixture.
  *
  * ==Scale notes==
  *  - [[withUrlColumns]] is pure map (Column expressions over the
  *    scan — [[UrlOps]]).
  *  - [[dropBlockedDomains]] broadcasts the blocklist as a literal
  *    set when small (the common case: thousands of domains) — a
  *    map-only filter, no join, no shuffle. Past
  *    `broadcastThreshold` it becomes a broadcast anti-join —
  *    still no wide exchange of the corpus.
  *  - [[capPerDomain]] is the one wide stage: a row_number window
  *    keyed on domain. Web corpora are domain-skewed by nature
  *    (that is WHY the cap exists), so the hot domain's partition
  *    carries its full row set; the cap itself then discards all
  *    but `maxDocs` of them. For 100-TB corpora with mega-domains,
  *    pre-aggregate with [[domainStats]] and cap only domains over
  *    budget — the filter-then-window spelling keeps the window's
  *    input bounded. The skew posture mirrors
  *    `Splitting.mixToBudget`'s documented hazard + approx path. */
object WebCuration {

  /** Crawl shards → curation-ready corpus frame, the composition a
    * from-the-crawl deployment starts with: WARC records
    * ([[graft.sources.Warc.readWarc]]) → 200 `text/html` responses →
    * HTML text + title ([[graft.text.HtmlText]]) → canonical URL +
    * registrable domain ([[withUrlColumns]]). Output carries
    * `(url, canonical_url, host, domain, title, text, n_chars)` —
    * exactly the columns the blocklist/cap/dedup/quality stages key
    * on. Everything here is per-record map work over the shard scan;
    * the first shuffle belongs to whatever curation stage follows.
    *
    * `mainContentOnly = true` swaps the text stage from plain tag
    * stripping ([[graft.text.HtmlText]], the C4-`clean` tier) to the
    * block-level boilerplate classifier ([[graft.text.MainContent]],
    * the jusText tier) — nav/footer/sidebar text never enters the
    * corpus. Same per-record map shape either way. */
  def fromWarc(spark: org.apache.spark.sql.SparkSession,
               path: String,
               mainContentOnly: Boolean = false): DataFrame = {
    import graft.text.{CharsetSniff, HtmlText, MainContent}
    // charset-aware byte→text boundary (NOT cast-as-UTF-8): the BOM →
    // HTTP header → meta prescan → validation cascade of
    // [[graft.text.CharsetSniff]]. A double-digit fraction of the
    // real web is windows-1252/legacy-labeled; blind UTF-8 turns
    // those pages into U+FFFD soup that poisons langID, quality,
    // and dedup downstream. `charset` lands as a corpus provenance
    // column (encoding mix is a standard crawl-health metric).
    val html = graft.sources.Warc.readWarc(spark, path)
      .filter(col("warc_type") === "response" &&
              col("http_status") === 200 &&
              col("content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
              CharsetSniff.sniffCharset(col("body"), col("content_type"))
                .as("charset"),
              CharsetSniff.decodePayload(col("body"), col("content_type"))
                .as("raw_html"))
    val textCol =
      if (mainContentOnly) MainContent.htmlMainContent(col("raw_html"))
      else HtmlText.htmlText(col("raw_html"))
    withUrlColumns(html)
      .withColumn("title", HtmlText.htmlTitle(col("raw_html")))
      .withColumn("text", textCol)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("raw_html")
  }

  /** Attach `canonical_url`, `host`, `domain` (map-only). */
  def withUrlColumns(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val host = UrlOps.canonicalHost(col(urlCol))
    docs
      .withColumn("canonical_url", UrlOps.canonicalizeUrl(col(urlCol)))
      .withColumn("host", host)
      .withColumn("domain", UrlOps.registrableDomain(host))
  }

  /** Drop docs whose registrable domain is blocklisted. Small lists
    * (≤ `broadcastThreshold`) compile to a literal IN set — map-only;
    * larger lists broadcast anti-join. */
  def dropBlockedDomains(docs: DataFrame, blocklist: Seq[String],
                         domainCol: String = "domain",
                         broadcastThreshold: Int = 10000): DataFrame =
    if (blocklist.isEmpty) docs
    else if (blocklist.size <= broadcastThreshold)
      docs.filter(!col(domainCol).isInCollection(blocklist))
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      docs.join(broadcast(blocklist.toDF(domainCol)),
                Seq(domainCol), "left_anti")
    }

  /** Keep at most `maxDocs` docs per domain, best-first by
    * `qualityCol` (ties broken by `idCol` for determinism). Adds
    * `domain_rank` (1-based) to the survivors. */
  def capPerDomain(docs: DataFrame, maxDocs: Int,
                   qualityCol: String = "n_chars",
                   idCol: String = "doc_id",
                   domainCol: String = "domain"): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxDocs)
  }

  /** The skew-safe spelling of [[capPerDomain]] for crawls with
    * mega-domains — now the DEFAULT recommendation for raw web
    * corpora: find the over-budget domains with the
    * [[graft.ops.Frequent]] sketch-then-confirm pass (exact set, one
    * scan + one candidate-bounded scan, no full-width shuffle), then
    * run the row_number window ONLY over their rows; under-budget
    * domains pass through the plan as a map-side anti-filter with
    * every doc kept. The window's input is bounded by
    * |heavy domains| · their row mass — the exact rows the cap
    * exists to discard — instead of the whole corpus.
    *
    * Survivor SET is identical to [[capPerDomain]] (spec-pinned);
    * the difference is `domain_rank` is only materialized for
    * heavy-domain survivors (null for pass-through rows — their
    * rank can never reach the cap, so nothing downstream keys on
    * it; callers needing every rank pay [[capPerDomain]]'s full
    * window knowingly). */
  def capPerDomainSkewed(docs: DataFrame, maxDocs: Int,
                         qualityCol: String = "n_chars",
                         idCol: String = "doc_id",
                         domainCol: String = "domain",
                         sketchSize: Int = 4096): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    graft.ops.Frequent
      .heavyHittersOption(docs, domainCol, minCount = maxDocs + 1L,
                          sketchSize) match {
      case None =>
        // cap below the sketch's guarantee line (a tiny cap over a
        // huge corpus: "heavy" would be most domains, so the window's
        // input is most rows anyway) — the full window IS the plan
        capPerDomain(docs, maxDocs, qualityCol, idCol, domainCol)
      case Some(hh) =>
        val heavy = hh.select(col(domainCol)).collect()
          .map(_.getString(0)).toSeq
        // NULL domains (hostless/malformed URLs — common on real
        // crawls) are invisible to the sketch (Misra–Gries never
        // surfaces a null key) yet form one window partition that
        // [[capPerDomain]] caps like any other domain — so they must
        // ride the capped side unconditionally or the spec-pinned
        // survivor-set parity breaks whenever null rows exceed the cap.
        val isHeavy =
          if (heavy.isEmpty) col(domainCol).isNull
          else col(domainCol).isNull ||
            col(domainCol).cast("string").isInCollection(heavy)
        val light = docs.filter(!isHeavy)
          .withColumn("domain_rank", lit(null).cast("int"))
        val capped = capPerDomain(docs.filter(isHeavy),
          maxDocs, qualityCol, idCol, domainCol)
        light.unionByName(capped)
    }
  }

  /** Per-domain doc count + token mass — the rollup that feeds
    * domain quality priors and the filter-then-cap spelling above. */
  def domainStats(docs: DataFrame, tokensCol: String = "n_chars",
                  domainCol: String = "domain"): DataFrame =
    docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
           sum(col(tokensCol)).as("tokens"))

  /** URL-level dedup: keep ONE doc per canonical URL (recrawls,
    * mirror spellings, tracking-param variants), best-first by
    * `qualityCol` with `idCol` tie-break — the most common web dedup
    * stage, run BEFORE content dedup because it needs no text at
    * all. Docs with a null canonical URL (malformed input) are KEPT:
    * they carry no URL identity to collide on, and dropping them is
    * the quarantine policy's call, not dedup's. One hash-partitioned
    * window on the canonical URL — at 100 TB the key space is
    * near-unique, so partitions stay balanced (unlike the domain
    * cap, where skew is the point). The null rows DO ride the window
    * as one partition (single-scan spelling); if malformed URLs are
    * non-rare in a crawl, quarantine them before this call. */
  def dedupByCanonicalUrl(docs: DataFrame,
                          urlCol: String = "canonical_url",
                          qualityCol: String = "n_chars",
                          idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs
      .withColumn("url_rank",
        when(col(urlCol).isNull, lit(1)).otherwise(row_number().over(w)))
      .filter(col("url_rank") === 1)
      .drop("url_rank")
  }

  /** PAGE-IDENTITY resolution — the capstone composition of the
    * crawl's three identity signals, each individually one edge
    * kind:
    *
    *  1. the page's OWN declaration: `<link rel=canonical>` resolved
    *     against the page URL ([[graft.text.Links.htmlCanonical]]);
    *  2. the SERVER's declaration: a 3xx `Location` resolved against
    *     the request URI (the `http_location` column);
    *  3. the CONTENT's evidence: byte-identical bodies (sha-256
    *     groups, each collapsed to a min-url star — |group| edges,
    *     never pairs²).
    *
    * The union of the three edge sets is an undirected identity
    * graph; its connected components ([[graft.dedup.Dedup
    * .connectedComponents]], min-label) assign every URL ONE
    * `identity_url` — so a print view that canonicalizes to a page
    * that 301s to a page whose body equals a fourth page's all
    * collapse together, which no single signal sees. Runs on the
    * [[graft.sources.Warc.readWarc]] frame directly.
    *
    * ==Scale shape==
    * Three map-shaped edge extractions (the digest one is one
    * groupBy on the 32-byte hash, min-star edges out), then CC over
    * an edge set that is a sliver of the corpus (only pages WITH a
    * signal produce edges). Identity-less pages self-identify
    * without ever entering the graph. */
  def resolvePageIdentity(crawl: DataFrame): DataFrame = {
    import graft.text.Links
    val responses = crawl
      .filter(col("warc_type") === "response")
      .select(col("target_uri").as("url"),
              col("http_status"), col("http_location"),
              col("body").cast("string").as("body_text"))
    val canonicalEdges = responses
      .filter(col("http_status") === 200)
      .select(col("url").as("id_a"),
              Links.resolveUrl(col("url"),
                Links.htmlCanonical(col("body_text"))).as("id_b"))
      .filter(col("id_b").isNotNull && col("id_a") =!= col("id_b"))
    val redirectEdges = responses
      .filter(col("http_status") >= 300 && col("http_status") < 400)
      .select(col("url").as("id_a"),
              Links.resolveUrl(col("url"), col("http_location"))
                .as("id_b"))
      .filter(col("id_b").isNotNull && col("id_a") =!= col("id_b"))
    // digest groups → min-url star (|group| − 1 edges per group)
    val digestEdges = responses
      .filter(col("http_status") === 200 && length(col("body_text")) > 0)
      .select(sha2(col("body_text"), 256).as("digest"), col("url"))
      .withColumn("id_b", min(col("url")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))))
      .filter(col("url") =!= col("id_b"))
      .select(col("url").as("id_a"), col("id_b"))
    val edges = canonicalEdges.union(redirectEdges).union(digestEdges)
    val components = graft.dedup.Dedup.connectedComponents(edges)
      .withColumnRenamed("id", "url")
      .withColumnRenamed("component", "identity_url")
    responses.select(col("url")).distinct()
      .join(components, Seq("url"), "left")
      .select(col("url"),
              coalesce(col("identity_url"), col("url"))
                .as("identity_url"))
  }
}
