package graft.ml

import graft.TestSpark
import org.apache.spark.mllib.evaluation.RankingMetrics
import org.scalatest.funsuite.AnyFunSuite

/** RankingMetricsDF must match org.apache.spark.mllib.evaluation
  * .RankingMetrics (the class the reference uses via its RDD bridge,
  * popularity_model.py:61-67) to 1e-12 on identical inputs. */
class RankingMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def crossCheck(data: Seq[(Array[Int], Array[Int])], k: Int): Unit = {
    import spark.implicits._
    val df = data.toDF("pred", "actual")
    val got = RankingMetricsDF.scores(df, "pred", "actual", k)
    val want = new RankingMetrics(
      spark.sparkContext.parallelize(data.map { case (p, a) => (p, a) }))
    assert(math.abs(got.precision - want.precisionAt(k)) < 1e-12,
      s"precision@$k: got ${got.precision} want ${want.precisionAt(k)}")
    assert(math.abs(got.recall - want.recallAt(k)) < 1e-12,
      s"recall@$k: got ${got.recall} want ${want.recallAt(k)}")
    assert(math.abs(got.map - want.meanAveragePrecisionAt(k)) < 1e-12,
      s"map@$k: got ${got.map} want ${want.meanAveragePrecisionAt(k)}")
    assert(math.abs(got.ndcg - want.ndcgAt(k)) < 1e-12,
      s"ndcg@$k: got ${got.ndcg} want ${want.ndcgAt(k)}")
  }

  test("hand fixture: partial overlap, k boundary") {
    crossCheck(Seq(
      (Array(1, 2, 3, 4, 5), Array(2, 4, 6)),
      (Array(9, 8, 7), Array(7, 8, 9, 10)),
      (Array(1, 2), Array(3, 4))), k = 3)
  }

  test("edge: empty label set contributes zeros") {
    crossCheck(Seq(
      (Array(1, 2, 3), Array.empty[Int]),
      (Array(1, 2, 3), Array(1))), k = 5)
  }

  test("edge: predictions shorter than k, duplicates in predictions") {
    crossCheck(Seq(
      (Array(1, 1, 2), Array(1, 2, 3, 4, 5, 6)),
      (Array.empty[Int], Array(1, 2))), k = 10)
  }

  test("randomized cross-check, several k") {
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(60) {
      val pred = Array.fill(rnd.nextInt(30))(rnd.nextInt(40))
      val actual = Array.fill(rnd.nextInt(20))(rnd.nextInt(40))
      (pred, actual)
    }.filter(_._2.nonEmpty) // mllib logs-and-zeros empties; covered above
    for (k <- Seq(1, 5, 17, 50)) crossCheck(data, k)
  }
}
