package graft.ml

import graft.text.Text
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the model-based companion to the
  * heuristic [[graft.text.Text.qualityScore]], in the lineage of the
  * GPT-3 / CCNet pretraining filters: logistic regression trained to
  * separate a trusted reference corpus (positives — curated text the
  * pipeline wants more of) from raw crawl (negatives), then applied to
  * every candidate document as a keep-probability.
  *
  * Features are this library's own codegen'd text kernels (length,
  * punctuation, diversity, stopword, repetition, URL/email signals) —
  * one map pass, no vocabulary state, so featurization runs where the
  * data lives and the only driver-side object is the fitted weight
  * vector (9 doubles). Scoring is `model.transform` — map-shaped,
  * shuffle-free, exactly what a 100-TB keep/drop pass needs.
  *
  * The heavier public variant hashes token n-grams into a wide sparse
  * vector (fastText-style); that drops in by swapping the assembler
  * input for a HashingTF column — the plumbing here stays the same.
  */
object QualityModel {

  /** Flat numeric feature columns appended by [[featurize]]. */
  val FeatureCols: Seq[String] = Seq(
    "f_n_chars", "f_n_tokens", "f_avg_token_len", "f_punct_ratio",
    "f_distinct_ratio", "f_stopword_ratio", "f_bigram_ratio",
    "f_url_count", "f_email_count")

  private val TempCols: Seq[String] =
    Seq("__q_toks", "__q_features", "__q_prob", "__q_pred", "__q_raw")

  // featurize/score overwrite then DROP these names wholesale — a
  // caller column that happens to collide would be silently destroyed,
  // so refuse loudly instead (`extra` adds score's `ml_quality`).
  private def requireNoReserved(docs: DataFrame,
                                extra: Seq[String] = Nil): Unit = {
    val clash = docs.columns.toSeq.intersect(FeatureCols ++ TempCols ++ extra)
    require(clash.isEmpty,
      s"QualityModel reserves column name(s) ${clash.mkString(", ")} — " +
        "rename them on the input; featurize/score overwrite and drop " +
        "these names")
  }

  /** One codegen'd pass: tokens materialized once, every feature
    * derived from them (same HOF-re-evaluation discipline as the
    * curation funnel — see Text.langId scaladoc). */
  def featurize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    requireNoReserved(docs)
    val toks = col("__q_toks")
    val f = Text.qualityFeaturesFromTokens(toks, col(textCol))
    docs
      .withColumn("__q_toks", Text.tokenize(col(textCol)))
      .withColumn("f_n_chars", f.getField("n_chars").cast("double"))
      .withColumn("f_n_tokens", f.getField("n_tokens").cast("double"))
      .withColumn("f_avg_token_len", f.getField("avg_token_len"))
      .withColumn("f_punct_ratio", f.getField("punct_ratio"))
      .withColumn("f_distinct_ratio", f.getField("distinct_ratio"))
      .withColumn("f_stopword_ratio", f.getField("stopword_ratio"))
      .withColumn("f_bigram_ratio", Text.distinctBigramRatio(toks))
      .withColumn("f_url_count", Text.urlCount(col(textCol)).cast("double"))
      .withColumn("f_email_count",
        Text.emailCount(col(textCol)).cast("double"))
      .drop("__q_toks")
  }

  /** A fitted filter: [[score]] appends `ml_quality` — P(document
    * belongs to the trusted corpus) in [0,1]. Threshold downstream
    * (or importance-sample on it, the CCNet move). The model's output
    * columns are fixed once at [[fit]] time, so `score` never mutates
    * shared state and a single Fitted is safe to use from concurrent
    * queries/streams. */
  final case class Fitted(model: LogisticRegressionModel,
                          textCol: String) {
    def score(docs: DataFrame): DataFrame = {
      requireNoReserved(docs, extra = Seq("ml_quality"))
      val assembled = assembler.transform(featurize(docs, textCol))
      val p1: Column = vector_to_array(col("__q_prob")).getItem(1)
      model.transform(assembled)
        .withColumn("ml_quality", p1)
        .drop(FeatureCols: _*)
        .drop("__q_features", "__q_prob", "__q_pred", "__q_raw")
    }
  }

  private def assembler = new VectorAssembler()
    .setInputCols(FeatureCols.toArray).setOutputCol("__q_features")
    .setHandleInvalid("keep")

  private def vector_to_array(c: Column): Column =
    org.apache.spark.ml.functions.vector_to_array(c)

  /** Fit on a trusted corpus vs a raw one. Deterministic for fixed
    * inputs and partitioning (L-BFGS over a fixed treeAggregate
    * topology); no sampling is done here — balance the two frames
    * upstream if they are wildly skewed. */
  def fit(trusted: DataFrame, raw: DataFrame, textCol: String = "text",
          maxIter: Int = 50, regParam: Double = 0.01): Fitted = {
    val train = featurize(
      trusted.select(col(textCol)).withColumn("label", lit(1.0))
        .unionByName(raw.select(col(textCol)).withColumn("label", lit(0.0))),
      textCol)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("__q_features").setLabelCol("label")
    val fitted = lr.fit(assembler.transform(train))
      .setProbabilityCol("__q_prob")
      .setPredictionCol("__q_pred")
      .setRawPredictionCol("__q_raw")
    // the summary holds the training frame + SparkSession; score()'s
    // transform closes over the model, so keeping it would serialize
    // a session into every task closure (and throw outright once
    // anything in the session used Dataset.observe) — see SummaryBridge
    Fitted(org.apache.spark.ml.graft.SummaryBridge.dropSummary(fitted),
      textCol)
  }

  // ---- hashed-n-gram (fastText-style) variant ------------------------

  /** The heavier public filter shape the scaladoc above names: token
    * uni+bigrams hashed into a `numFeatures`-wide sparse vector
    * (HashingTF — the fastText trick: no vocabulary state, the model
    * is ONE weight vector), logistic regression on top. Catches
    * lexical signal the 9 flat features cannot (which WORDS mark
    * trusted text), at the cost of a `numFeatures`-sized broadcast at
    * scoring time. Scoring stays one map pass — featurize + dot —
    * exactly the 100-TB keep/drop shape. */
  final case class FittedHashed(model: LogisticRegressionModel,
                                textCol: String, numFeatures: Int) {
    def score(docs: DataFrame): DataFrame = {
      requireNoReserved(docs, extra = Seq("ml_quality"))
      val p1: Column = vector_to_array(col("__q_prob")).getItem(1)
      model.transform(hashedFeatures(docs, textCol, numFeatures))
        .withColumn("ml_quality", p1)
        .drop("__q_features", "__q_prob", "__q_pred", "__q_raw")
    }
  }

  /** Uni+bigram hashed term-frequency features: one tokenize, one
    * bigram zip, one HashingTF — all map work. */
  private def hashedFeatures(docs: DataFrame, textCol: String,
                             numFeatures: Int): DataFrame = {
    requireNoReserved(docs)
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.sql.functions.{concat_ws => cws}
    val toks = col("__q_toks")
    // bigrams via two aligned slices (NOT zip_with over the raw token
    // array — its null padding would duplicate the last unigram)
    val nb = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), nb),
      slice(toks, lit(2), nb), (a, b) => cws(" ", a, b))
    val withGrams = docs
      .withColumn("__q_toks", Text.tokenize(col(textCol)))
      .withColumn("__q_grams", concat(toks, bigrams))
      .drop("__q_toks")
    new HashingTF().setInputCol("__q_grams")
      .setOutputCol("__q_features").setNumFeatures(numFeatures)
      .transform(withGrams)
      .drop("__q_grams")
  }

  /** [[fit]]'s hashed-feature sibling. Same determinism posture
    * (fixed inputs + partitioning → one L-BFGS trajectory); the
    * default width keeps the broadcast model at 2^18 doubles
    * (~2 MB). */
  def fitHashed(trusted: DataFrame, raw: DataFrame,
                textCol: String = "text", numFeatures: Int = 1 << 18,
                maxIter: Int = 50, regParam: Double = 0.01)
      : FittedHashed = {
    val train = hashedFeatures(
      trusted.select(col(textCol)).withColumn("label", lit(1.0))
        .unionByName(raw.select(col(textCol))
          .withColumn("label", lit(0.0))),
      textCol, numFeatures)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("__q_features").setLabelCol("label")
    val fitted = lr.fit(train)
      .setProbabilityCol("__q_prob")
      .setPredictionCol("__q_pred")
      .setRawPredictionCol("__q_raw")
    FittedHashed(
      org.apache.spark.ml.graft.SummaryBridge.dropSummary(fitted),
      textCol, numFeatures)
  }
}
