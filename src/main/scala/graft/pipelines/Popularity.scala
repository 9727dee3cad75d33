package graft.pipelines

import graft.ml.RankingMetricsDF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Damped-popularity baseline recommender + ranking evaluation — the
  * semantics of the reference's popularity_model.py.
  *
  * score(movie) = avg_rating · n / (n + β)                      [:35-38]
  *
  * Deviations from the reference (documented, SURVEY §3.2):
  *  - the reference computes a row_number window `rank` and never filters
  *    on it, relying on the window sort surviving into collect_list —
  *    which Spark does NOT guarantee. The rebuild collects
  *    (rank, movieId) structs and sorts inside the array, which is
  *    guaranteed and shuffles the same amount of data.
  *  - window order gets a movieId tiebreaker (row_number under ties is
  *    otherwise nondeterministic).
  *  - metrics are DataFrame-native (graft.ml.RankingMetricsDF), not an
  *    RDD bridge.
  */
object Popularity {

  /** Per-movie damped popularity scores (popularity_model.py:28-38). */
  def movieScores(train: DataFrame, damping: Double): DataFrame =
    train.groupBy(col("movieId"))
      .agg(avg(col("rating")).as("avg_rating"),
           count(col("rating")).as("rating_count"))
      .withColumn("popularity_score",
        col("avg_rating") * col("rating_count") /
          (col("rating_count") + lit(damping)))

  /** Per-user ranked recommendation lists over the test set
    * (popularity_model.py:42-48). With `cutoff = None` the list is every
    * test movie for the user, ordered by predicted score desc — the
    * reference's quirk of not cutting at k. With `cutoff = Some(k)` the
    * rank filter runs BEFORE collect_list: identical metrics@k (they
    * truncate at k anyway) but the shuffled lists are k-bounded instead
    * of |user's test movies| — the difference between O(k·|users|) and
    * O(|test|) list state at 100× scale. */
  def predictedItems(train: DataFrame, test: DataFrame, damping: Double,
                     cutoff: Option[Int] = None): DataFrame = {
    val scores = movieScores(train, damping)
    val w = Window.partitionBy(col("userId"))
      .orderBy(col("predicted_rating").desc, col("movieId"))
    val ranked = test.join(scores, Seq("movieId"), "left")
      .withColumn("predicted_rating", col("popularity_score"))
      .withColumn("rank", row_number().over(w))
    val cut = cutoff.fold(ranked)(k => ranked.filter(col("rank") <= lit(k)))
    cut.groupBy(col("userId"))
      .agg(sortedListByRank(col("rank"), col("movieId"))
             .as("predicted_items"))
  }

  /** Ground truth: per user, the test movies rated above that user's mean,
    * best-rated first (popularity_model.py:52-56). */
  def groundTruth(test: DataFrame): DataFrame = {
    val means = test.groupBy(col("userId"))
      .agg(avg(col("rating")).as("mean_rating"))
    val w = Window.partitionBy(col("userId"))
      .orderBy(col("rating").desc, col("movieId"))
    test.join(means, Seq("userId"), "inner")
      .filter(col("rating") > col("mean_rating"))
      .withColumn("rank", row_number().over(w))
      .groupBy(col("userId"))
      .agg(sortedListByRank(col("rank"), col("movieId")).as("actual_items"))
  }

  /** collect_list of (rank, item) sorted inside the array — the
    * shuffle-safe replacement for "orderBy before groupBy". */
  private def sortedListByRank(rank: org.apache.spark.sql.Column,
                               item: org.apache.spark.sql.Column) =
    transform(array_sort(collect_list(struct(rank.as("r"), item.as("x")))),
              e => e.getField("x"))

  /** Train on `train`, evaluate ranking metrics @k on `test`
    * (popularity_model.py train_test). */
  def trainTest(train: DataFrame, test: DataFrame, damping: Double,
                k: Int = 100): RankingMetricsDF.Scores = {
    val joined = predictedItems(train, test, damping, cutoff = Some(k))
      .join(groundTruth(test), Seq("userId"), "inner")
    RankingMetricsDF.scores(joined, "predicted_items", "actual_items", k)
  }

  final case class GridResult(damping: Double,
                              scores: RankingMetricsDF.Scores)

  /** Damping grid search on validation, argmax by NDCG@k
    * (popularity_model.py:73-92). */
  def gridSearch(train: DataFrame, validation: DataFrame,
                 dampings: Seq[Double] = Seq(10, 100, 1000, 10000),
                 k: Int = 100): (GridResult, Seq[GridResult]) = {
    val all = dampings.map(d => GridResult(d, trainTest(train, validation, d, k)))
    (all.maxBy(_.scores.ndcg), all)
  }
}
