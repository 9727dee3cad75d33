package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/validation/test splitting with cold-start mitigation — the
  * semantics of the reference's splitting_data.py:
  *
  *  1. drop rows with nulls in (userId, movieId, rating)        [:16]
  *  2. keep only movies with ≥ `minRatings` ratings             [:19-21]
  *  3. 80/10/10 row-level randomSplit, fixed seed               [:24]
  *  4. per split, 40% of its distinct movieIds (randomSplit,
  *     same seed) fold back into train; the 60% remainder is
  *     the final validation/test                                 [:27-39]
  *
  * Deviations from the reference (idiomatic, same semantics):
  *  - the "join a distinct key list to filter" steps use `left_semi`
  *    joins — the key lists' columns are never needed, so the right side
  *    never shuffles its payload (SURVEY §2.3 J2);
  *  - no `coalesce(1)` on write — an anti-pattern at scale
  *    (splitting_data.py:48-50); callers choose their own layout.
  *
  * randomSplit is per-partition Bernoulli sampling: deterministic for a
  * fixed seed AND fixed input partitioning (property-tested, never
  * oracle-hashed — SURVEY §7.7.5).
  */
object Splitting {

  final case class Splits(train: DataFrame, validation: DataFrame,
                          test: DataFrame)

  def split(ratings: DataFrame, seed: Long = 42L,
            minRatings: Long = 5L): Splits = {
    val cleaned = ratings.na.drop(Seq("userId", "movieId", "rating"))

    val popular = cleaned.groupBy(col("movieId"))
      .agg(count(col("rating")).as("rating_count"))
      .filter(col("rating_count") >= lit(minRatings))
      .select(col("movieId"))
    val filtered = cleaned.join(popular, Seq("movieId"), "left_semi")

    val Array(train0, val0, test0) =
      filtered.randomSplit(Array(0.8, 0.1, 0.1), seed)

    // The kept 60% is "everything not folded back" — expressed as an
    // ANTI join against the fold-back keys: one broadcast of the key
    // list serves both sides, instead of materializing the second
    // randomSplit branch (the reference re-joins both branches,
    // splitting_data.py:33-39; semi+anti over one branch is equivalent
    // because the branches partition the key set — property-tested).
    def foldBack(split: DataFrame): (DataFrame, DataFrame) = {
      val ids = split.select(col("movieId")).distinct()
      val Array(back, _) = ids.randomSplit(Array(0.4, 0.6), seed)
      (split.join(back, Seq("movieId"), "left_semi"),
       split.join(back, Seq("movieId"), "left_anti"))
    }
    val (valBack, valKeep)   = foldBack(val0)
    val (testBack, testKeep) = foldBack(test0)

    Splits(train0.union(valBack).union(testBack), valKeep, testKeep)
  }

  /** Stratified (per-stratum-rate) sample — the data-MIXTURE primitive
    * of a training pipeline: "keep 100% of lang=de, 30% of lang=en".
    * `DataFrameStatFunctions.sampleBy` under the hood: per-partition
    * Bernoulli with a per-stratum threshold — no shuffle, no count
    * pass, deterministic for a fixed seed AND input partitioning (the
    * same caveat as randomSplit; property-tested, never oracle-hashed).
    * Strata absent from `fractions` are dropped (rate 0). */
  def stratifiedSample[T](df: DataFrame, stratumCol: String,
                          fractions: Map[T, Double],
                          seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** EXACT-count stratified sample: exactly min(k, |stratum|) rows per
    * stratum, chosen by a deterministic hash order — the companion to
    * [[stratifiedSample]] when the contract is a COUNT ("1M docs per
    * language for the eval set"), not a rate. Ordering by
    * (md5(idCol), idCol) is a seedless uniform permutation, identical
    * on any engine and partitioning — so unlike the Bernoulli path
    * this one IS oracle-hashable. One shuffle on the stratum key; the
    * per-stratum sort is bounded by the largest stratum, and Spark
    * plans a WindowGroupLimit (rank ≤ k pushes into a per-partition
    * top-k before the exchange), so skewed strata don't sort globally.
    * `idCol` must be unique — it both drives and tie-breaks the
    * permutation. */
  def stratifiedExactK(df: DataFrame, stratumCol: String, k: Int,
                       idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")),
               col(idCol))
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= lit(k))
      .drop("__r")
  }

  /** Keep the rows whose `scoreCol` lands in the top `frac` of the
    * distribution — the quality-selection step of FineWeb/DCLM-style
    * pipelines ("train on the best X% by classifier/LM score").
    *
    * Exact form: ONE distributed `percentile` aggregate finds the
    * (1−frac) threshold (linear interpolation, same estimator as the
    * DuckDB twin's quantile_cont), then a broadcast scalar filter —
    * no global-sort window, no single-partition stage. Ties AT the
    * threshold are kept (`>=`), so the kept fraction can slightly
    * exceed `frac` on discrete scores — deterministic either way.
    * At 100 TB swap in [[selectTopFractionApprox]]: approx_percentile
    * is a one-pass mergeable sketch with bounded error where the exact
    * aggregate must see every value. */
  def selectTopFraction(df: DataFrame, scoreCol: String,
                        frac: Double): DataFrame =
    selectByThreshold(df, scoreCol,
      percentile(col(scoreCol), lit(1.0 - frac)), frac)

  /** [[selectTopFraction]] with a sketch threshold (approx_percentile,
    * `accuracy` trades error for memory) — the 100-TB spelling. */
  def selectTopFractionApprox(df: DataFrame, scoreCol: String,
                              frac: Double,
                              accuracy: Int = 10000): DataFrame =
    selectByThreshold(df, scoreCol,
      approx_percentile(col(scoreCol), lit(1.0 - frac), lit(accuracy)),
      frac)

  // dunder temp name so a caller column named "t" can't collide (the
  // repo-wide convention: __h, __k, __cnt); thresholds are built with
  // the Column API (functions.percentile/approx_percentile), never
  // string-interpolated SQL — exotic column names (backticks included)
  // resolve like everywhere else in the library (ADVICE r7).
  // NULL-threshold contract: percentile over an EMPTY or all-null
  // score column is NULL, and `score >= NULL` is never true, so the
  // output is empty — "the top frac of nothing is nothing", not an
  // error. Callers that must distinguish empty-in from filtered-out
  // count upstream.
  private def selectByThreshold(df: DataFrame, scoreCol: String,
                                thrExpr: Column, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1]: $frac")
    val thr = df.agg(thrExpr.as("__thr"))
    df.crossJoin(thr).filter(col(scoreCol) >= col("__thr")).drop("__thr")
  }

  /** Temperature-flattened mixture: keep-rate per stratum ∝ n^(α−1),
    * normalized so the smallest stratum keeps `maxRate` — expected
    * kept counts ∝ n^α, the standard multilingual-corpus flattening
    * dial (α = 1 keeps the natural distribution untouched; α → 0
    * equalizes expected per-stratum counts). One tiny count aggregate
    * reaches the driver (|strata| rows — the mixture TABLE, not data);
    * the sample itself is per-partition Bernoulli, no shuffle. */
  def temperatureMixture(df: DataFrame, stratumCol: String,
                         alpha: Double, maxRate: Double = 1.0,
                         seed: Long = 42L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    // keys stay the RAW stratum values — sampleBy compares typed values,
    // so toString keys would silently match nothing on non-string
    // strata and drop every row (ADVICE r3)
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1))
    if (counts.isEmpty) return df // empty input: nothing to flatten
    val raw = counts.map { case (k, n) =>
      k -> math.pow(n.toDouble, alpha - 1.0) }
    val top = raw.map(_._2).max
    val fractions = raw.map { case (k, v) =>
      k -> math.min(1.0, v / top * maxRate) }.toMap
    stratifiedSample(df, stratumCol, fractions, seed)
  }
}
