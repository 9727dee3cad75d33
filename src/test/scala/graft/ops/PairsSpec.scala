package graft.ops

import graft.{Tables, TestSpark}
import graft.pipelines.{Ratings, Segmentation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedSelfPairs output is identical to the naive self-join") {
    val ue = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type")).distinct().cache()
    val naive = ue.as("a")
      .join(ue.as("b"), col("a.event_type") === col("b.event_type") &&
                        col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("id_a"), col("b.user_id").as("id_b"),
              col("a.event_type").as("key"))
    val salted = Pairs.saltedSelfPairs(ue, "event_type", "user_id")
      .select(col("id_a"), col("id_b"), col("key"))
    assert(salted.count() == naive.count())
    assert(salted.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(salted).count() == 0)
  }

  test("saltedSelfPairs carries payload columns per side") {
    val df = spark.createDataFrame(Seq(
      (1L, "k", 10.0), (2L, "k", 20.0), (3L, "k", 30.0),
      (4L, "other", 40.0))).toDF("id", "key", "v")
    val rows = Pairs.saltedSelfPairs(df, "key", "id", payload = Seq("v"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
                 (r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rows((1L, 2L)) == ((10.0, 20.0)))
    assert(rows((2L, 3L)) == ((20.0, 30.0)))
  }

  test("compactSelfPairs matches the naive theta join") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq("a", "b")), (2L, Seq("b", "c")), (3L, Seq("c")),
      (4L, Seq.empty[String]))).toDF("id", "ks")
    val rows = Pairs.compactSelfPairs(df, "id")
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                       (3L, 4L)))
  }

  test("compact corr/overlap queries match the join-aggregate forms") {
    val dir = TestSpark.sf0001
    val ue = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct().cache()
    // n_common via the compact plan vs the naive join + count
    val naiveCommon = ue.as("a")
      .join(ue.as("b"), col("a.event_type") === col("b.event_type") &&
                        col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 2)
    val compact = graft.ops.Relational.selfJoinPairs(spark, dir)
    assert(compact.exceptAll(naiveCommon).count() == 0)
    assert(naiveCommon.exceptAll(compact).count() == 0)
    // corr via the compact fold vs Spark's corr aggregate on the same pairs
    val uv = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(avg(col("value")).as("v")).cache()
    val naiveCorr = uv.as("a")
      .join(uv.as("b"), col("a.event_type") === col("b.event_type") &&
                        col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"))
      .agg(corr(col("a.v"), col("b.v")).as("corr_raw"))
      .filter(col("corr_raw").isNotNull)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val mine = Stats.corrPerPair(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(mine.keySet == naiveCorr.keySet)
    // corr_v is round(x+1e-9, 4) of a value within ~1e-13 of the
    // co-moment aggregate — so it can sit at most half a grid step away
    mine.foreach { case (k, v) =>
      assert(math.abs(v - naiveCorr(k)) <= 5.1e-5, s"pair $k: $v vs ${naiveCorr(k)}")
    }
  }

  test("minhash candidate pairs are far fewer than all pairs") {
    val ratings = Ratings.fromTestdata(spark, TestSpark.sf0001)
    val sets = ratings
      .select(col("userId").cast("string").as("userId"),
              col("movieId").cast("string").as("movieId"))
      .groupBy(col("userId"))
      .agg(collect_set(col("movieId")).as("items"))
      .cache()
    val n = sets.count()
    val allPairs = n * (n - 1) / 2
    val cand = Pairs.minhashCandidatePairs(sets, "userId", "items",
      minJaccard = 0.5).count()
    assert(cand < allPairs / 10,
      s"candidates $cand not << C($n,2) = $allPairs")
  }

  test("bucketed pair correlation = exact corr on the candidate pairs") {
    // plant a twin so at least one candidate survives banding
    val base = Ratings.fromTestdata(spark, TestSpark.sf0001)
    val clone = base.filter(col("userId") === 1)
      .withColumn("userId", col("userId") + 5000)
    val ratings = base.union(clone).cache()
    val bucketed = Segmentation.pairCorrelationsBucketed(ratings,
      minJaccard = 0.5).cache()
    assert(bucketed.count() >= 1)
    val allPairs = bucketed
      .select(col("userA"), col("userB")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // re-verify each bucketed corr against a direct computation
    val direct = Segmentation.pairCorrelations(
      spark.createDataFrame(allPairs.toSeq).toDF("userA", "userB"),
      ratings.select(col("userId").cast("string").as("userId"),
                     col("movieId"), col("rating")))
    val a = bucketed.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val b = direct.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }
}
