package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SegmentationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Testdata ratings with PLANTED twins: on the raw synthetic ratings no
    * user pair reaches Jaccard ≥ 0.5 (sf0.001 has 150 users over ~200
    * parts), so the LSH join correctly finds nothing — the fixture, not
    * the operator, decides whether anything is found. We union in
    *  - exact clones (userId+1000000, identical movie set → Jaccard 1.0)
    *  - near clones (userId+2000000, one movie dropped → Jaccard
    *    (n−1)/n ∈ (0.5, 1))
    * so the expected pair set is known a priori. */
  lazy val ratings = {
    import org.apache.spark.sql.expressions.Window
    val base = Ratings.fromTestdata(spark, TestSpark.sf0001)
    val w = Window.partitionBy(col("userId")).orderBy(col("movieId"))
    val idx = base
      .withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("userId"))))
      .filter(col("n") >= 6)
    val cols = base.columns.map(col)
    val exactClones = idx.filter(col("userId") % 15 === 0)
      .withColumn("userId", col("userId") + 1000000)
      .select(cols: _*)
    val nearClones = idx.filter(col("userId") % 15 === 1 && col("i") > 1)
      .withColumn("userId", col("userId") + 2000000)
      .select(cols: _*)
    base.union(exactClones).union(nearClones).cache()
  }

  test("movie twins: similarity in (0.5, 1], userA < userB, exact Jaccard matches") {
    val twins = Segmentation.movieTwins(ratings, threshold = 0.5,
      numHashTables = 5, topK = 100, minMovies = 5, seed = 42L).cache()
    val rows = twins.collect()
    assert(rows.nonEmpty, "no twin pairs found")
    // every planted exact clone must be recovered at similarity 1.0
    val bySim = rows.map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val plantedExact = ratings.filter(col("userId") > 1000000 && col("userId") < 2000000)
      .select(col("userId")).distinct().collect().map(_.getLong(0))
    assert(plantedExact.nonEmpty, "fixture must plant exact clones")
    plantedExact.foreach { cu =>
      val orig = (cu - 1000000).toString
      val pair = if (orig < cu.toString) (orig, cu.toString) else (cu.toString, orig)
      assert(math.abs(bySim.getOrElse(pair, 0.0) - 1.0) < 1e-12,
        s"planted exact clone pair $pair not recovered at similarity 1.0")
    }
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

  test("scalable twins (HashingTF) recover the planted exact clones too") {
    val twins = Segmentation.movieTwinsScalable(ratings, threshold = 0.5,
      topK = 100, seed = 42L).cache()
    val found = twins.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val plantedExact = ratings
      .filter(col("userId") > 1000000 && col("userId") < 2000000)
      .select(col("userId")).distinct().collect().map(_.getLong(0))
    plantedExact.foreach { cu =>
      val orig = (cu - 1000000).toString
      val pair = if (orig < cu.toString) (orig, cu.toString)
                 else (cu.toString, orig)
      assert(found.contains(pair), s"planted pair $pair not recovered")
    }
    // similarity still in (0.5, 1] and pairs deduped
    twins.collect().foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val s = r.getDouble(2)
      assert(s > 0.5 - 1e-12 && s <= 1.0 + 1e-12)
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
