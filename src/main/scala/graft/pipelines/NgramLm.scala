package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring for corpus quality filtering — the
  * CCNet signal (Wenzek et al. 2020): fit a small LM on a trusted
  * target corpus (CCNet uses Wikipedia), score every raw document by
  * its per-token log-likelihood, and filter/tier on the score (low
  * likelihood ⇒ far from the trusted distribution ⇒ head/middle/tail
  * quality tiers).
  *
  * Model: add-1-smoothed bigram conditionals over space-split tokens,
  *   logp(b | a) = ln( (c(ab) + 1) / (c(a) + V) )
  * with c(·) counts in the TARGET corpus and V = |target unigram
  * vocabulary| + 1 (the +1 holds an OOV slot so unseen contexts get a
  * proper 1/V mass). Unseen bigrams and unseen contexts fall out of
  * the same formula via the left joins (counts coalesce to 0) — no
  * special cases.
  *
  * ==Determinism (the DSIR integer-grid trick, [[Dsir]])==
  * The log-conditional is computed ONCE per distinct query bigram and
  * quantized to a long on a 2^20 grid; per-doc scores are exact
  * integer sums — aggregation-order-free and engine-portable, so the
  * declared query (`q_lm_score`) carries a full DuckDB oracle.
  *
  * ==100-TB shape==
  * Both count tables are bounded by the TARGET corpus (trusted sets
  * are small by definition — CCNet's Wikipedia LM vs a Common-Crawl
  * raw side), so the joins broadcast; the raw corpus streams through
  * one bigram explosion + one doc-keyed integer sum. The distinct
  * bigram-type table is vocab-bound, not corpus-bound.
  */
object NgramLm {

  val Scale: Long = 1L << 20

  /** Per-doc bigram stream (id, a, ab): one `zip_with` over two
    * slices of the pre-materialized token array (see
    * [[Dsir.features]] on HOF re-evaluation). Sub-2-token docs
    * contribute nothing. */
  def bigramStream(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val pairs = when(n >= 2,
      zip_with(slice(toks, lit(1), n - lit(1)),
               slice(toks, lit(2), n - lit(1)),
               (a, b) => struct(a.as("a"), concat(a, lit(" "), b).as("ab"))))
      .otherwise(array().cast("array<struct<a:string,ab:string>>"))
    docs.select(col(idCol).as("id"), explode(pairs).as("p"))
      .select(col("id"), col("p.a").as("a"), col("p.ab").as("ab"))
  }

  /** Per-doc LM score against a target corpus:
    * (idCol, n_bigrams, ll_q) where ll_q = Σ quantized
    * ln p(b|a) over the doc's bigram stream (a long; divide by
    * `n_bigrams · 2^20` for the mean log-likelihood, exponentiate for
    * perplexity). Higher ll_q/n ⇒ more target-like. */
  def score(raw: DataFrame, target: DataFrame,
            textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    // n-gram keys ride as xxhash64 longs from the stream on: they are
    // join keys only (the conditional depends on counts, not text), so
    // every exchange carries 8 bytes instead of bigram strings; V stays
    // |distinct unigram| up to 64-bit collisions (oracle-gate-guarded).
    // The keys come straight out of the NgramHashes kernel — no "a b"
    // concat string is ever built (the zip_with lambda was interpreted)
    def pairs(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        explode(graft.functions.NgramHashes
          .bigramKeyPairs(split(col(textCol), " "))).as("p"))
      .select(col("id"), col("p.a").as("a"), col("p.ab").as("ab"))
    val tBg = pairs(target)
      .groupBy(col("ab")).agg(count(lit(1)).as("cab"))
    val tUg = target
      .select(explode(split(col(textCol), " ")).as("a"))
      .groupBy(xxhash64(col("a")).as("a")).agg(count(lit(1)).as("ca"))
    // V = |target unigram vocab| + 1 (OOV slot) — a one-row crossJoin,
    // never the driver
    val v = tUg.agg((count(lit(1)) + 1L).as("v"))
    // quantize per OCCURRENCE: the weight is a deterministic scalar of
    // the (bounded, broadcast) target counts, so every occurrence of a
    // bigram type lands on the same long and the doc sum stays exact
    // and order-free — while the plan never materializes a
    // corpus-bound distinct-type table (that extra shuffle grows with
    // the RAW corpus; these joins grow only with the target)
    pairs(raw)
      .join(tBg, Seq("ab"), "left")
      .join(tUg, Seq("a"), "left")
      .crossJoin(v)
      .select(col("id"),
        round((log(coalesce(col("cab"), lit(0L)) + lit(1.0)) -
               log(coalesce(col("ca"), lit(0L)) + col("v")))
          .multiply(lit(Scale.toDouble))).cast("long").as("w"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("ll_q"))
  }

  /** CCNet's head/middle/tail quality tiers (Wenzek et al. 2020 §4.3):
    * tercile the corpus by mean log-likelihood under the target LM —
    * `head` = most target-like third, `tail` = least. Returns
    * (idCol, mean_ll, tier).
    *
    * The cutoffs are TWO exact distributed percentiles in one
    * aggregate + a one-row crossJoin tag pass — no global sort, no
    * single-partition window; at 100 TB swap `percentile` for
    * `approx_percentile` exactly as [[Splitting
    * .selectTopFractionApprox]] does (same ulp-at-the-boundary caveat
    * as the Splitting scaladoc; the oracle hash gate verifies the
    * clean-threshold case every round). */
  def tiers(raw: DataFrame, target: DataFrame,
            textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    // scores feed the threshold aggregate AND the tag pass — own the
    // LM scoring once (narrow rows, |docs|-bounded)
    val scored = score(raw, target, textCol, idCol)
      .select(col(idCol),
        (col("ll_q").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_ll"))
      .localCheckpoint(false)
    val thr = scored.agg(
      percentile(col("mean_ll"), lit(2.0 / 3.0)).as("__thi"),
      percentile(col("mean_ll"), lit(1.0 / 3.0)).as("__tlo"))
    scored.crossJoin(thr)
      .select(col(idCol), col("mean_ll"),
        when(col("mean_ll") >= col("__thi"), "head")
          .when(col("mean_ll") >= col("__tlo"), "middle")
          .otherwise("tail").as("tier"))
  }

  /** PER-GROUP CCNet tiers — the form the published pipeline actually
    * runs (Wenzek et al. 2020 bucket per LANGUAGE, not globally:
    * perplexity scales differ across languages, so a global tercile
    * would tier by language instead of by quality). `groups` maps
    * `idCol` → `groupCol` (typically the detected language from
    * [[graft.text.Text.langId]] — the round-14 multilingual langID is
    * what makes this runnable on a real crawl). Same determinism
    * posture as [[tiers]]: quantized integer LM sums, exact-percentile
    * cutoffs (interpolation is cross-engine safe), tag compare on the
    * unrounded mean.
    *
    * Scale: one LM-scoring pass, one |groups|-row percentile
    * aggregate (two percentiles per group in a single groupBy — no
    * global sort, no per-group window), one broadcast join back. At
    * 100 TB swap `percentile` for `approx_percentile` (the [[tiers]]
    * note). */
  def tiersByGroup(raw: DataFrame, target: DataFrame, groups: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   groupCol: String = "lang"): DataFrame = {
    val scored = score(raw, target, textCol, idCol)
      .select(col(idCol),
        (col("ll_q").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_ll"))
      .join(groups.select(col(idCol), col(groupCol)), idCol)
      .localCheckpoint(false)
    val thr = scored.groupBy(col(groupCol)).agg(
      percentile(col("mean_ll"), lit(2.0 / 3.0)).as("__thi"),
      percentile(col("mean_ll"), lit(1.0 / 3.0)).as("__tlo"))
    scored.join(broadcast(thr), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("mean_ll"),
        when(col("mean_ll") >= col("__thi"), "head")
          .when(col("mean_ll") >= col("__tlo"), "middle")
          .otherwise("tail").as("tier"))
  }
}
