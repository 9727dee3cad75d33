package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SegmentationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val ratings = Ratings.fromTestdata(spark, TestSpark.sf0001).cache()

  test("movie twins: similarity in (0.5, 1], userA < userB, exact Jaccard matches") {
    val twins = Segmentation.movieTwins(ratings, threshold = 0.5,
      numHashTables = 5, topK = 100, minMovies = 5, seed = 42L).cache()
    val rows = twins.collect()
    assert(rows.nonEmpty, "no twin pairs found")
    assert(rows.forall(r => r.getString(0) < r.getString(1)), "pair dedup")
    assert(rows.forall { r =>
      val s = r.getDouble(2); s > 0.5 - 1e-12 && s <= 1.0 + 1e-12
    }, "similarity bounds")

    // recompute exact Jaccard from the raw movie sets
    val sets = Segmentation.userMovieSets(ratings)
      .select(col("userId"), array_distinct(col("movies")).as("set"))
    val exact = twins
      .join(sets.withColumnRenamed("userId", "userA")
                .withColumnRenamed("set", "setA"), Seq("userA"))
      .join(sets.withColumnRenamed("userId", "userB")
                .withColumnRenamed("set", "setB"), Seq("userB"))
      .select(col("similarity"),
        (size(array_intersect(col("setA"), col("setB"))).cast("double") /
         size(array_union(col("setA"), col("setB"))).cast("double"))
          .as("exact_jaccard"))
      .collect()
    exact.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"approx join distance must be exact Jaccard: $r")
    }
  }

  test("twin validation: twins correlate at least as well as random pairs") {
    val twins = Segmentation.movieTwins(ratings, topK = 50, seed = 42L)
    val v = Segmentation.validateTwins(ratings, twins,
      numRandomPairs = 50, seed = 42L)
    assert(!v.twinAvgCorrelation.isNaN)
    assert(!v.randomAvgCorrelation.isNaN)
    assert(v.twinAvgCorrelation >= -1.0 && v.twinAvgCorrelation <= 1.0)
  }

  test("random pairs: distinct users, requested count, deterministic") {
    val p1 = Segmentation.randomPairs(ratings, numPairs = 20, seed = 9L)
    val rows = p1.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.get(0) != r.get(1)))
    val p2 = Segmentation.randomPairs(ratings, numPairs = 20, seed = 9L)
    assert(p1.exceptAll(p2).count() == 0)
  }
}
