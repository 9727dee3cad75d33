package graft.pipelines

import graft.ml.RankingMetricsDF
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ALS collaborative filtering + ranking evaluation — the semantics of the
  * reference's als_recommendation.py.
  *
  * Deviations from the reference (idiomatic, same results):
  *  - `rank()` over predictions keeps ties beyond k, as the reference does
  *    (als_recommendation.py:21-23 — W2, not row_number);
  *  - the RDD groupByKey / join / collect / parallelize round-trip
  *    (als_recommendation.py:26-34) is deleted: lists are built with
  *    collect_list over structs sorted in-array, the pred⋈truth join is a
  *    DataFrame join, and nothing visits the driver (SURVEY §2.8 X5);
  *  - a fixed seed makes runs reproducible.
  */
object AlsRec {

  def fitModel(train: DataFrame, rank: Int, regParam: Double,
               maxIter: Int = 10, seed: Long = 42L) = {
    new ALS()
      .setUserCol("userId").setItemCol("movieId").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setColdStartStrategy("drop")
      .setSeed(seed)
      .fit(train)
  }

  /** Top-k (ties kept) per-user recommendation lists from model
    * predictions over the test pairs (als_recommendation.py:19-26). */
  def predictedItems(model: org.apache.spark.ml.recommendation.ALSModel,
                     test: DataFrame, k: Int): DataFrame = {
    val preds = model.transform(test)
    val w = Window.partitionBy(col("userId"))
      .orderBy(col("prediction").desc)
    preds.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= lit(k))
      .groupBy(col("userId"))
      .agg(transform(
             array_sort(collect_list(struct(col("rnk").as("r"),
                                            col("movieId").as("x")))),
             e => e.getField("x")).as("predicted_items"))
  }

  /** The idiomatic ALS top-k: `recommendForAllUsers` scores against the
    * FULL item catalog via blocked factor-matrix products (the reference
    * instead window-ranks predictions over the test pairs only —
    * als_recommendation.py:21-24; different semantics, both exposed).
    * Output: (userId, recommendations: array<struct<movieId, rating>>).
    */
  def recommendAll(model: org.apache.spark.ml.recommendation.ALSModel,
                   k: Int): DataFrame =
    model.recommendForAllUsers(k)

  /** Ground truth: test movies rated above the user's mean
    * (als_recommendation.py:28-31) — same construction as the popularity
    * pipeline. */
  def groundTruth(test: DataFrame): DataFrame =
    Popularity.groundTruth(test)

  def trainTest(train: DataFrame, test: DataFrame, rank: Int,
                regParam: Double, maxIter: Int = 10, k: Int = 100,
                seed: Long = 42L): RankingMetricsDF.Scores = {
    val model = fitModel(train, rank, regParam, maxIter, seed)
    val joined = predictedItems(model, test, k)
      .join(groundTruth(test), Seq("userId"), "inner")
    RankingMetricsDF.scores(joined, "predicted_items", "actual_items", k)
  }

  final case class GridResult(rank: Int, regParam: Double,
                              scores: RankingMetricsDF.Scores)

  /** rank × regParam grid on validation, argmax by NDCG@k
    * (als_recommendation.py:47-67). */
  def gridSearch(train: DataFrame, validation: DataFrame,
                 ranks: Seq[Int] = Seq(10, 100, 150),
                 regParams: Seq[Double] = Seq(0.01, 0.05, 0.1),
                 maxIter: Int = 10, k: Int = 100,
                 seed: Long = 42L): (GridResult, Seq[GridResult]) = {
    val all = for (r <- ranks; reg <- regParams)
      yield GridResult(r, reg,
        trainTest(train, validation, r, reg, maxIter, k, seed))
    (all.maxBy(_.scores.ndcg), all)
  }
}
