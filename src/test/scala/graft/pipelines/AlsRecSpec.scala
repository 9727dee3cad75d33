package graft.pipelines

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AlsRecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val ratings = Ratings.fromTestdata(spark, TestSpark.sf0001).cache()
  lazy val splits = Splitting.split(ratings, seed = 42L)

  test("ALS train_test yields metrics in [0,1]") {
    val s = AlsRec.trainTest(splits.train, splits.test, rank = 8,
      regParam = 0.1, maxIter = 5, k = 50)
    for (m <- Seq(s.precision, s.recall, s.map, s.ndcg))
      assert(m >= 0.0 && m <= 1.0, s"out of range: $s")
  }

  test("grid search returns the argmax-by-NDCG cell and one result per cell") {
    val (best, all) = AlsRec.gridSearch(splits.train, splits.validation,
      ranks = Seq(2, 4), regParams = Seq(0.05, 0.1), maxIter = 2, k = 20)
    assert(all.size == 4)
    assert(all.map(r => (r.rank, r.regParam)).distinct.size == 4)
    assert(best.scores.ndcg == all.map(_.scores.ndcg).max)
    all.foreach(r => assert(r.scores.ndcg >= 0.0 && r.scores.ndcg <= 1.0))
  }

  test("recommendForAllUsers: k structs per user, scores descending") {
    import org.apache.spark.sql.functions._
    val model = AlsRec.fitModel(splits.train, rank = 4, regParam = 0.1,
      maxIter = 3)
    val recs = AlsRec.recommendAll(model, k = 5).cache()
    assert(recs.count() > 0)
    assert(recs.filter(size(col("recommendations")) =!= 5).count() == 0)
    val scoresOk = recs.select(col("userId"),
        col("recommendations.rating").as("rs")).collect().forall { r =>
      val rs = r.getSeq[Float](1)
      rs == rs.sorted.reverse
    }
    assert(scoresOk, "recommendation scores must be descending")
  }

  test("seeded ALS is reproducible") {
    val a = AlsRec.trainTest(splits.train, splits.test, rank = 4,
      regParam = 0.1, maxIter = 3, k = 20, seed = 7L)
    val b = AlsRec.trainTest(splits.train, splits.test, rank = 4,
      regParam = 0.1, maxIter = 3, k = 20, seed = 7L)
    assert(math.abs(a.ndcg - b.ndcg) < 1e-9, s"$a vs $b")
    assert(math.abs(a.map - b.map) < 1e-9)
  }
}
