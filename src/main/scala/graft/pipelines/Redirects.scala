package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the crawl-graph step after
  * [[graft.ops.Corpus.redirectMap]]'s per-response redirect surface:
  * a moved page often sits behind a CHAIN of 3xx hops (http→https,
  * apex→www, path migration, CDN cutover stacked over years), and
  * the frontier wants the chain's LANDING URL — one fetch, not one
  * per hop — plus the hop count (a ranking/abuse signal) and a loud
  * flag for cycles and over-long chains (both crawl reality;
  * browsers cap around 20 hops and so do we, configurably).
  *
  * ==Algorithm: pointer doubling==
  * The naive spelling follows one hop per join — `maxHops` shuffle
  * rounds. This is the textbook pointer-jumping case (same family
  * as [[graft.dedup.Dedup.connectedComponents]]'s label
  * propagation): keep per-source state `(cur, hops)` and compose the
  * partial function with ITSELF each sweep, so covered chain length
  * DOUBLES — `ceil(log2(maxHops))` self-joins resolve every chain up
  * to `maxHops` (16 hops = 4 sweeps). Each sweep is one equi-join of
  * the |redirects|-sized state frame against itself on the jump key
  * (never the corpus), `localCheckpoint`'d so the plan stays O(1)
  * deep. A row whose `cur` is terminal (no outgoing redirect) left-
  * joins null and stops accumulating, so finished chains carry EXACT
  * hop counts. A cycle never reaches a terminal: after the fixed
  * sweeps its `cur` still has an outgoing edge, and the final flag
  * join marks it `resolved = false` (final URL and hops null — a
  * cycle has no landing URL; reporting the stuck pointer would be
  * noise pretending to be data).
  *
  * ==Scale==
  * State frame = one row per redirect SOURCE — a sliver of the
  * corpus (single-digit % of responses on real crawls). O(log
  * maxHops) shuffle rounds, all keyed on the url; no driver
  * collection, no per-hop iteration, cycles flagged without being
  * walked. At 100 TB the redirect frame is millions of rows — the 4
  * sweeps are seconds.
  *
  * Reference: redirect semantics per RFC 9110 §15.4 (the reference
  * engine's crawl fixtures stop at single-hop Location parsing). */
object Redirects {

  /** Resolve redirect chains.
    *
    * @param redirects one row per redirect edge: `src_url` (the
    *                  fetched URL) → `dst_url` (its resolved
    *                  `Location`). A source with CONFLICTING targets
    *                  (re-fetches disagreeing over time) collapses
    *                  deterministically to the minimum target —
    *                  document-order arbitrary would make the output
    *                  nondeterministic under shuffle.
    * @param maxHops   chains longer than this (and all cycles) come
    *                  back `resolved = false`.
    * @return `(url, final_url, n_hops, resolved)` — one row per
    *         distinct redirect source; `final_url`/`n_hops` null
    *         when unresolved. */
  def resolveChains(redirects: DataFrame, maxHops: Int = 16)
      : DataFrame = {
    require(maxHops >= 1 && maxHops <= 1024,
      s"maxHops must be in [1, 1024], got $maxHops")
    val edges = redirects
      .groupBy(col("src_url").as("url"))
      .agg(min(col("dst_url")).as("cur"))
      .localCheckpoint()

    // jump table = the state itself; each sweep composes state∘state
    val sweeps = 32 - Integer.numberOfLeadingZeros(
      math.max(1, maxHops - 1)) // ceil(log2(maxHops))
    var state = edges.select(col("url"), col("cur"),
                             lit(1L).as("hops"))
    var s = 0
    while (s < sweeps) {
      val jump = state.select(col("url").as("j_url"),
                              col("cur").as("j_cur"),
                              col("hops").as("j_hops"))
      state = state.join(jump, col("cur") === col("j_url"), "left")
        .select(col("url"),
                coalesce(col("j_cur"), col("cur")).as("cur"),
                (col("hops") + coalesce(col("j_hops"), lit(0L)))
                  .as("hops"))
        .localCheckpoint()
      s += 1
    }

    // terminal test: cur has no outgoing redirect. Cycle members and
    // over-maxHops chains still point at a source here.
    val srcs = edges.select(col("url").as("t_url"))
    val open = col("t_url").isNotNull || col("hops") > maxHops
    state.join(srcs, col("cur") === col("t_url"), "left")
      .select(col("url"),
              when(open, lit(null)).otherwise(col("cur"))
                .as("final_url"),
              when(open, lit(null)).otherwise(col("hops"))
                .cast("long").as("n_hops"),
              (!open).cast("long").as("resolved"))
  }

  /** The `redirects` input shaped from a crawl frame carrying
    * `target_uri` / `redirect_target` / `is_redirect` columns (the
    * [[graft.ops.Corpus.redirectMap]] surface): keeps resolvable 3xx
    * rows only. */
  def edgesFromCrawl(crawl: DataFrame): DataFrame =
    crawl.filter(col("is_redirect") === 1L &&
                 col("redirect_target").isNotNull)
      .select(col("target_uri").as("src_url"),
              col("redirect_target").as("dst_url"))
}
