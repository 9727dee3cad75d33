package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PopularitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val ratings = Ratings.fromTestdata(spark, TestSpark.sf0001).cache()
  lazy val splits = Splitting.split(ratings, seed = 42L)

  test("damped score -> avg rating as damping -> 0, -> 0 as damping -> inf") {
    val tiny = Popularity.movieScores(splits.train, damping = 1e-9)
      .select(abs(col("popularity_score") - col("avg_rating")).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(tiny < 1e-6, s"beta->0 deviation $tiny")
    val huge = Popularity.movieScores(splits.train, damping = 1e12)
      .agg(max(col("popularity_score"))).head().getDouble(0)
    assert(huge < 1e-6, s"beta->inf max score $huge")
  }

  test("train_test produces metrics in [0,1], recall high for full lists") {
    val s = Popularity.trainTest(splits.train, splits.test,
      damping = 1000.0, k = 100)
    for (m <- Seq(s.precision, s.recall, s.map, s.ndcg))
      assert(m >= 0.0 && m <= 1.0, s"out of range: $s")
    // predicted lists contain every test movie of the user (reference
    // quirk preserved), so at k=100 >= list sizes recall must be 1.
    assert(s.recall > 0.99, s"recall ${s.recall}")
  }

  test("grid search picks argmax NDCG and evaluates all dampings") {
    val (best, all) = Popularity.gridSearch(splits.train, splits.validation,
      dampings = Seq(10, 1000), k = 50)
    assert(all.size == 2)
    assert(best.scores.ndcg == all.map(_.scores.ndcg).max)
  }
}
