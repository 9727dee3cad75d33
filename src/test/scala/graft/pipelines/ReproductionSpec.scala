package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's published RELATIONSHIPS (BASELINE.md, PDF pp.3-5),
  * asserted end-to-end on the MovieLens-shaped synthetic at spec
  * scale — the same composition `graft.Reproduction` runs at ~1M
  * ratings for the committed REPRODUCTION.md table:
  * split proportions, flat popularity damping grid, ALS ≫ popularity
  * NDCG, tiny precision@100 + near-1 recall@100, and LSH twins
  * (Jaccard-1.0 pairs exist; twins out-correlate random pairs). */
class ReproductionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val ratings =
    SyntheticRatings.generate(spark, nUsers = 800, nMovies = 400,
      minHeavy = 30, maxHeavy = 120).cache()
  lazy val splits = Splitting.split(ratings)
  lazy val counts = (splits.train.cache().count(),
                     splits.validation.cache().count(),
                     splits.test.cache().count())

  test("generator: MovieLens-shaped, deterministic, half-star grid") {
    assert(ratings.count() > 20000)
    val again = SyntheticRatings.generate(spark, 800, 400,
      minHeavy = 30, maxHeavy = 120)
    assert(ratings.exceptAll(again).count() == 0, "generator must be seeded")
    val bad = ratings.filter(col("rating") < 0.5 || col("rating") > 5.0 ||
      (col("rating") * 2) % 1 =!= 0).count()
    assert(bad == 0, "ratings must sit on the 0.5..5.0 half-star grid")
    assert(ratings.groupBy("userId", "movieId").count()
      .filter(col("count") > 1).count() == 0, "one rating per (user,movie)")
  }

  test("split proportions match the reference shape (~88/6/6 after fold-back)") {
    val (tr, va, te) = counts
    val tot = (tr + va + te).toDouble
    assert(tr / tot > 0.85 && tr / tot < 0.91,
      s"train frac ${tr / tot} outside the reference ~0.879 band")
    assert(va / tot > 0.04 && va / tot < 0.08, s"val frac ${va / tot}")
    assert(te / tot > 0.04 && te / tot < 0.08, s"test frac ${te / tot}")
  }

  test("popularity grid is damping-flat; ALS beats popularity by a wide NDCG margin") {
    val (bestPop, popGrid) =
      Popularity.gridSearch(splits.train, splits.validation)
    val ndcgs = popGrid.map(_.scores.ndcg)
    // reference spread is 0.0004 on 33M ratings (PDF p.9); damping
    // matters more at ~30k spec-scale counts — "flat" here means no
    // damping choice changes the story (the 1M Reproduction run pins
    // a tighter spread)
    assert(ndcgs.max - ndcgs.min < 0.06,
      s"grid spread ${ndcgs.max - ndcgs.min} — damping should not dominate")
    val popTest =
      Popularity.trainTest(splits.train, splits.test, bestPop.damping)
    assert(popTest.ndcg > 0.5,
      s"popularity must have real signal (movie bias): ${popTest.ndcg}")

    val alsTest = AlsRec.trainTest(splits.train, splits.test,
      rank = 16, regParam = 0.05, maxIter = 5)
    assert(alsTest.ndcg > popTest.ndcg + 0.03,
      s"reference: ALS 0.972 ≫ popularity 0.788; got ALS ${alsTest.ndcg} " +
      s"vs popularity ${popTest.ndcg}")
    // k=100 ≫ per-user holdout: precision tiny, recall near 1 (both
    // pipelines; reference: p@100 ≈ 0.06, r@100 ≈ 0.999)
    for (s <- Seq(popTest, alsTest)) {
      assert(s.precision < 0.2, s"p@100 should be small: ${s.precision}")
      assert(s.recall > 0.85, s"r@100 should be near 1: ${s.recall}")
    }
  }

  test("LSH twins: Jaccard-1.0 pairs exist; twins out-correlate random pairs") {
    val twins = Segmentation.movieTwins(ratings).cache()
    assert(twins.count() > 0, "casual same-cluster users must surface as twins")
    assert(twins.filter(col("similarity") >= 0.9999).count() > 0,
      "identical 8-movie casual sets must yield Jaccard-1.0 twins " +
      "(the reference's top-100 were all 1.0)")
    val twinCorr = Segmentation.averagePairwiseCorrelation(
      twins.select("userA", "userB"), ratings)
    val randCorr = Segmentation.averagePairwiseCorrelation(
      Segmentation.randomPairs(ratings).select("userA", "userB"), ratings)
    assert(!twinCorr.isNaN && !randCorr.isNaN)
    assert(twinCorr > randCorr,
      s"reference: twins 0.1041 > random 0.0409; got $twinCorr vs $randCorr")
  }
}
