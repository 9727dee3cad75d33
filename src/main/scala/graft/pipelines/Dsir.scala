package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for training-data selection —
  * "Data Selection for Language Models via Importance Resampling"
  * (Xie et al., 2023): score every raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (a trusted/high-quality corpus) than under the RAW distribution,
  * then resample the raw corpus proportionally.
  *
  * Two variants share the fit/score math:
  *  - [[scoreExact]] keys the feature distributions by the raw n-gram
  *    STRING — exactly reproducible in SQL, so the declared query
  *    (`q_dsir_weights`) carries a full DuckDB oracle. Weight-table
  *    size is |vocabulary|, fine while vocab fits a shuffle.
  *  - [[scoreHashed]] is the paper's (and the 100-TB) form: features
  *    hash into `numBuckets` buckets, so the weight table is BOUNDED
  *    at numBuckets rows no matter the corpus — it broadcasts, and
  *    scoring is one map-side join + one doc-keyed aggregate
  *    regardless of scale. Golden + property-spec pinned (the bucket
  *    hash has no cross-engine twin).
  *
  * ==Determinism (the integer-grid trick)==
  * A per-doc Σ of double log-ratios would depend on aggregation order
  * (shuffle nondeterminism) and on last-ulp `ln` disagreements between
  * engines. Instead the per-FEATURE log-ratio is computed once
  * (deterministic: one value per feature) and quantized to a long on a
  * 2^20 grid; per-doc scores are exact integer sums — order-free,
  * engine-portable, and stable run to run. Scores stay far below 2^53
  * (|w| ≤ ~16M·2^20 overflows nothing at any realistic doc length).
  *
  * ==Fit math==
  * With raw feature counts cr(f) (total Tr), target counts ct(f)
  * (total Tt), and V = |distinct raw features| as the add-1 smoothing
  * vocabulary:
  *   w(f) = round( ( ln(ct(f)+1) − ln(Tt+V)
  *                 − ln(cr(f)+1) + ln(Tr+V) ) · 2^20 )
  * i.e. the quantized log of the smoothed target/raw likelihood
  * ratio. Features never seen in raw are never queried (docs being
  * scored ARE the raw corpus), so the weight table is left-anchored
  * on raw.
  */
object Dsir {

  val Scale: Long = 1L << 20

  /** Per-doc unigram + bigram multiset as a flat (id, f) stream.
    * Bigrams via one `zip_with` over two slices — a single pass over
    * the pre-materialized token array (the HOF-chain alternative
    * re-evaluates upstream per window; see Shingles scaladoc). Docs
    * with fewer than 2 tokens contribute unigrams only. Tokens are
    * plain space-splits, mirrored verbatim by `string_split` in the
    * SQL twin. */
  def features(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val bigrams = when(n >= 2,
      zip_with(slice(toks, lit(1), n - lit(1)),
               slice(toks, lit(2), n - lit(1)),
               (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("id"),
                explode(concat(toks, bigrams)).as("f"))
  }

  /** Quantized per-feature log importance weights (f, w: long), fit
    * from the raw corpus and a target corpus. The three fit scalars
    * (Tr, Tt, V) ride a one-row crossJoin — never the driver. */
  def fitLogWeights(raw: DataFrame, target: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id")
      : DataFrame =
    fitFromCounts(
      features(raw, textCol, idCol)
        .groupBy(col("f")).agg(count(lit(1)).as("cr")),
      features(target, textCol, idCol)
        .groupBy(col("f")).agg(count(lit(1)).as("ct")))

  /** Exact-feature DSIR scores: (idCol, dsir_score: long) for every
    * raw doc — higher means more target-like. One shuffle to count
    * each distribution, one feature-keyed join (AQE broadcasts the
    * weight table while vocab is small), one doc-keyed sum.
    *
    * Two plan economies over the textbook spelling (round 10): the
    * raw feature stream is OWNED ONCE (a lazy localCheckpoint feeds
    * both the raw count table and the scoring join — without it the
    * corpus tokenizes and explodes twice), and features ride as
    * xxhash64 longs from the explode on — the feature string is
    * internal (w depends only on counts), so every exchange and join
    * carries 8 bytes instead of the n-gram text. "Exact" still means
    * exact-STRING distributions up to 64-bit collisions (the oracle
    * hash gate would surface one). */
  def scoreExact(raw: DataFrame, target: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val fr = featuresHashed(raw, textCol, idCol)
      .localCheckpoint(false)
    val ft = featuresHashed(target, textCol, idCol)
    val cr = fr.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val ct = ft.groupBy(col("f")).agg(count(lit(1)).as("ct"))
    fr.join(fitFromCounts(cr, ct), Seq("f"))
      .groupBy(col("id").as(idCol))
      .agg(sum(col("w")).as("dsir_score"))
  }

  /** [[features]] with the key ALREADY hashed inside the
    * [[graft.functions.NgramHashes]] kernel — no per-feature string
    * build, no HOF; key-equal to `xxhash64` over [[features]]'s
    * strings (unigrams can never collide with space-carrying bigram
    * strings, and 64-bit collisions are oracle-gate-guarded). */
  private def featuresHashed(docs: DataFrame, textCol: String,
                             idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.NgramHashes
        .featureHashes(split(col(textCol), " "))).as("f"))

  /** The fit math shared by [[fitLogWeights]] and [[scoreExact]]:
    * (f, w) from the two count tables, any key type. */
  private def fitFromCounts(cr: DataFrame, ct: DataFrame): DataFrame = {
    val tot = cr.agg(sum(col("cr")).as("tr"),
                     count(lit(1)).as("v"))
      .crossJoin(ct.agg(coalesce(sum(col("ct")), lit(0L)).as("tt")))
    cr.join(ct, Seq("f"), "left")
      .crossJoin(tot)
      .select(col("f"),
        (log(coalesce(col("ct"), lit(0L)) + lit(1.0)) -
         log(col("tt") + col("v")) -
         log(col("cr") + lit(1.0)) +
         log(col("tr") + col("v")))
          .multiply(lit(Scale.toDouble)).as("wd"))
      .select(col("f"), round(col("wd")).cast("long").as("w"))
  }

  /** Hashed-bucket DSIR — the scale path: features collapse to
    * `pmod(xxhash64(f), numBuckets)`, so the weight table is bounded
    * at numBuckets rows (broadcast-sized by construction) and the fit
    * shuffles longs, not strings. Same integer-grid scoring. */
  def scoreHashed(raw: DataFrame, target: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id",
                  numBuckets: Int = 1 << 18): DataFrame = {
    def bucketed(df: DataFrame): DataFrame =
      features(df, textCol, idCol)
        .select(col("id"), pmod(xxhash64(col("f")), lit(numBuckets.toLong))
                  .as("f"))
    val cr = bucketed(raw).groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val ct = bucketed(target).groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val tot = cr.agg(sum(col("cr")).as("tr"), count(lit(1)).as("v"))
      .crossJoin(ct.agg(coalesce(sum(col("ct")), lit(0L)).as("tt")))
    val w = cr.join(ct, Seq("f"), "left")
      .crossJoin(tot)
      .select(col("f"),
        round((log(coalesce(col("ct"), lit(0L)) + lit(1.0)) -
               log(col("tt") + col("v")) -
               log(col("cr") + lit(1.0)) +
               log(col("tr") + col("v")))
          .multiply(lit(Scale.toDouble))).cast("long").as("w"))
    bucketed(raw)
      .join(broadcast(w), Seq("f"))
      .groupBy(col("id").as(idCol))
      .agg(sum(col("w")).as("dsir_score"))
  }

  /** Deterministic seeded Gumbel-top-k resampling over the scores —
    * the paper samples without replacement ∝ importance weight; adding
    * standard Gumbel noise to each log-weight and taking the top k is
    * exactly that (the Gumbel-top-k trick). Noise is keyed
    * xxhash64(id, seed) → uniform → Gumbel, so the sample is
    * reproducible and shuffle-order-free. Global top-k plans as
    * TakeOrderedAndProject — no full sort. */
  def resample(scored: DataFrame, k: Int, seed: Long = 42L,
               idCol: String = "doc_id"): DataFrame = {
    val big = 1L << 40
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(big))
      .cast("double") + lit(0.5)) / lit(big.toDouble)
    scored
      .withColumn("__key",
        col("dsir_score").cast("double") / lit(Scale.toDouble) -
          log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }
}
