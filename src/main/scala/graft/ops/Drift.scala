package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between corpus snapshots — the
  * Population Stability Index, the industry-standard "has the shape
  * of what we ingest changed" alarm a continuously-crawled corpus
  * runs per snapshot over its quality signals (length, quality score,
  * LM likelihood, …). PSI = Σᵢ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over bins defined
  * by the REFERENCE snapshot's quantiles; the usual reading: <0.1
  * stable, 0.1–0.25 moderate shift, >0.25 investigate.
  *
  * ==Determinism==
  * Shares are Laplace-smoothed — (count+1)/(n+nBins) — so no bin is
  * ever empty and no ln(0) epsilon hack is needed; each bin's
  * contribution is quantized to a 2^20 integer grid (the
  * [[graft.pipelines.NgramLm]] posture: ln's last-ulp is libm
  * business, the grid makes the emitted value engine-portable), and
  * the total is an integer sum — order-free.
  *
  * ==100-TB shape==
  * One percentile aggregate over the reference (swap
  * `approx_percentile` in at scale, the [[graft.pipelines.Splitting
  * .selectTopFractionApprox]] move), then each snapshot is ONE
  * map-side-combined histogram aggregate against the broadcast
  * one-row edge array. Nothing shuffles but nBins rows.
  */
object Drift {

  val Scale: Long = 1L << 20

  /** Per-bin PSI table between `ref` and `cur` over `valueCol`:
    * `(bin, c_ref, c_cur, psi_q)` — bin 1..nBins by the reference's
    * inner quantile edges (x ≤ edge₁ → bin 1, …, x > edge_{n-1} →
    * bin n), counts, and the quantized contribution. Total PSI =
    * Σ psi_q / 2^20 ([[psiTotal]]). */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
              nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"PSI needs at least 2 bins: $nBins")
    val v = col(valueCol).cast("double")
    // one-row edge frame, materialized once — it feeds BOTH snapshot
    // histograms, and without the checkpoint each crossJoin would
    // re-run the reference percentile scan
    val edges = ref.agg(array((1 until nBins).map(i =>
      percentile(v, lit(i.toDouble / nBins))): _*).as("__edges"))
      .localCheckpoint(false)
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(v.as("__v")).crossJoin(edges)
        .select((size(filter(col("__edges"), e => col("__v") > e)) + 1)
          .cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    val allBins = cur.sparkSession.range(1, nBins + 1)
      .select(col("id").as("bin"))
    val r = binned(ref, "c_ref")
    val c = binned(cur, "c_cur")
    // totals derive from the bin counts (every row lands in a bin) —
    // no extra snapshot scans
    val counts = allBins
      .join(r, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = counts.agg(sum(col("c_ref")).as("__nr"),
      sum(col("c_cur")).as("__nc"))
    counts.crossJoin(tot)
      .withColumn("__p", (col("c_ref") + 1L).cast("double") /
        (col("__nr") + nBins).cast("double"))
      .withColumn("__q", (col("c_cur") + 1L).cast("double") /
        (col("__nc") + nBins).cast("double"))
      .select(col("bin"), col("c_ref"), col("c_cur"),
        round((col("__p") - col("__q")) * log(col("__p") / col("__q"))
          * lit(Scale.toDouble)).cast("long").as("psi_q"))
  }

  /** One-row total: `(psi_q, psi)` — the integer-grid sum and its
    * float reading. */
  def psiTotal(bins: DataFrame): DataFrame =
    bins.agg(coalesce(sum(col("psi_q")), lit(0L)).as("psi_q"))
      .select(col("psi_q"),
        (col("psi_q").cast("double") / lit(Scale.toDouble)).as("psi"))

  /** Snapshot NOVELTY — drift's companion question: not "did the
    * shape change" but "how much of what arrived is actually new
    * content". One row: current-snapshot distinct content hashes,
    * how many are unseen in the reference, and the novelty fraction.
    * A crawl whose novelty rate collapses is re-fetching the same
    * web; one whose rate spikes found (or got spammed by) a new
    * content region.
    *
    * Plan: two distinct-hash aggregates + one left-anti join on the
    * 32-byte key — each side map-side-combines to its distinct set
    * before anything shuffles; at 100 TB the reference side is the
    * landed corpus's ALREADY-STORED hash column, not a rescan. */
  def noveltyRate(ref: DataFrame, cur: DataFrame,
                  textCol: String = "text"): DataFrame = {
    def hashes(df: DataFrame) =
      df.select(sha2(col(textCol), 256).as("__h")).distinct()
    val r = hashes(ref)
    val c = hashes(cur)
    val novel = c.join(r, Seq("__h"), "left_anti")
    c.agg(count(lit(1)).as("n_cur")).crossJoin(
        novel.agg(count(lit(1)).as("n_novel")))
      .select(col("n_cur"), col("n_novel"),
        when(col("n_cur") === 0L, lit(0.0))
          .otherwise(col("n_novel").cast("double") /
            col("n_cur").cast("double")).as("novelty"))
  }
}
