package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplittingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val ratings = Ratings.fromTestdata(spark, TestSpark.sf0001).cache()
  lazy val splits = Splitting.split(ratings, seed = 42L)

  test("splits are disjoint and exhaustive over the filtered input") {
    val filtered = {
      val keep = ratings.groupBy(col("movieId"))
        .agg(count(col("rating")).as("c")).filter(col("c") >= 5)
        .select(col("movieId"))
      ratings.join(keep, Seq("movieId"), "left_semi")
    }
    val total = filtered.count()
    val t = splits.train.count(); val v = splits.validation.count()
    val s = splits.test.count()
    assert(t + v + s == total, s"$t+$v+$s != $total")
    // pairwise disjoint on the (userId, movieId) key
    assert(splits.train.join(splits.validation,
      Seq("userId", "movieId"), "inner").count() == 0)
    assert(splits.train.join(splits.test,
      Seq("userId", "movieId"), "inner").count() == 0)
    assert(splits.validation.join(splits.test,
      Seq("userId", "movieId"), "inner").count() == 0)
  }

  test("every movie in the result has >= 5 ratings in the input") {
    val counts = ratings.groupBy(col("movieId")).count()
    val bad = splits.train.select("movieId").distinct()
      .join(counts, Seq("movieId")).filter(col("count") < 5)
    assert(bad.count() == 0)
  }

  test("train is the large split (fold-back makes it > 80%)") {
    val t = splits.train.count().toDouble
    val total = t + splits.validation.count() + splits.test.count()
    assert(t / total > 0.8, s"train share ${t / total}")
  }

  test("stratified sample: per-stratum rates, subset, seed-stable") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001).cache()
    val fractions = Map("en" -> 0.3, "de" -> 1.0)
    val sampled = Splitting.stratifiedSample(docs, "lang", fractions).cache()
    // subset of the input; strata without a rate are dropped
    assert(sampled.exceptAll(docs).count() == 0)
    assert(sampled.filter(!col("lang").isin("en", "de")).count() == 0)
    // kept-rate per stratum tracks the requested fraction
    val in = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = sampled.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("de") == in("de"), "rate 1.0 keeps the whole stratum")
    val enRate = out("en").toDouble / in("en")
    assert(enRate > 0.15 && enRate < 0.45, s"en rate $enRate far from 0.3")
    // deterministic for fixed seed + partitioning
    val again = Splitting.stratifiedSample(docs, "lang", fractions)
    assert(sampled.exceptAll(again).count() == 0)
    assert(again.exceptAll(sampled).count() == 0)
  }

  test("temperature mixture: alpha=1 keeps all, alpha=0 equalizes strata") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001).cache()
    val natural = Splitting.temperatureMixture(docs, "lang", alpha = 1.0)
    assert(natural.count() == docs.count(), "alpha=1 must keep everything")
    val flat = Splitting.temperatureMixture(docs, "lang", alpha = 0.0)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = docs.groupBy(col("lang")).count().collect()
      .map(_.getLong(1)).min
    // expected kept count per stratum ≈ the smallest stratum's size
    flat.foreach { case (lang, n) =>
      assert(math.abs(n - smallest).toDouble / smallest < 0.5,
        s"$lang kept $n, expected ≈ $smallest")
    }
  }

  test("temperature mixture: empty input returns empty, does not throw") {
    // regression for ADVICE r3: `raw.map(_._2).max` threw on zero strata
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
    val empty = docs.filter(lit(false))
    val out = Splitting.temperatureMixture(empty, "lang", alpha = 0.5)
    assert(out.count() == 0)
    assert(out.schema == docs.schema)
  }

  test("non-string strata: typed keys keep rows (no toString mismatch)") {
    // regression for ADVICE r3: keying sampleBy fractions by
    // `r.get(0).toString` silently matched nothing on non-string strata
    // (sampleBy compares TYPED values) and dropped every row
    val events = graft.Tables.events(spark, TestSpark.sf0001)
    // user_id is a LONG column — the failing case
    val natural = Splitting.temperatureMixture(events, "user_id", alpha = 1.0)
    assert(natural.count() == events.count(),
      "alpha=1 over integer strata must keep everything")
    // and stratifiedSample itself accepts typed (Long) keys
    val ids = events.select(col("user_id")).distinct().limit(2).collect()
      .map(_.getLong(0))
    val kept = Splitting.stratifiedSample(
      events, "user_id", ids.map(_ -> 1.0).toMap)
    val expect = events.filter(col("user_id").isin(ids.map(Long.box): _*))
    assert(kept.count() == expect.count())
  }

  test("selectTopFraction: exact percentile threshold keeps the top " +
       "frac; approx variant agrees closely; frac=1 keeps all") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble))
      .toDF("id", "score")
    // percentile(0.75) over 1..100 interpolates to 75.25 → keep 76..100
    val kept = Splitting.selectTopFraction(df, "score", 0.25)
    assert(kept.count() == 25)
    assert(kept.agg(min(col("score"))).head().getDouble(0) == 76.0)
    val approx = Splitting.selectTopFractionApprox(df, "score", 0.25)
    assert(math.abs(approx.count() - 25L) <= 2,
      s"approx kept ${approx.count()}")
    assert(Splitting.selectTopFraction(df, "score", 1.0).count() == 100)
    // repartitioning must not change the exact result (the aggregate
    // is distributed, not a single-partition window)
    val shuffled = Splitting.selectTopFraction(
      df.repartition(7, col("id")), "score", 0.25)
    assert(shuffled.count() == 25)
    // a caller column literally named "t" must neither collide with
    // the threshold temp nor get dropped (dunder temp-name regression)
    val witht = df.withColumn("t", col("id") * 2)
    val keptT = Splitting.selectTopFraction(witht, "score", 0.25)
    assert(keptT.columns.contains("t") && keptT.count() == 25)
  }

  test("same seed + same partitioning => identical split") {
    val again = Splitting.split(ratings, seed = 42L)
    assert(again.train.exceptAll(splits.train).count() == 0)
    assert(splits.train.exceptAll(again.train).count() == 0)
  }

  test("stratifiedExactK: exactly min(k, |stratum|) per stratum, " +
       "subset of input, partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 3}")).toDF(
      "id", "stratum")
      .union(Seq((9999L, "rare")).toDF("id", "stratum"))
    val out = Splitting.stratifiedExactK(df, "stratum", k = 20,
      idCol = "id").cache()
    val counts = out.groupBy(col("stratum")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 20L, "s1" -> 20L, "s2" -> 20L,
                         "rare" -> 1L))
    assert(out.exceptAll(df.join(out, Seq("id", "stratum"), "left_semi"))
      .count() == 0)
    // the md5 permutation is partitioning-independent: a different
    // physical layout selects the SAME rows (what makes it
    // oracle-hashable, unlike the Bernoulli sampler)
    val re = Splitting.stratifiedExactK(df.repartition(13, col("id")),
      "stratum", k = 20, idCol = "id")
    assert(re.exceptAll(out).count() == 0 &&
           out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  test("splitByComponent never separates a near-dup cluster and is " +
       "partitioning-invariant") {
    import spark.implicits._
    // 300 singleton clusters + 3 multi-doc clusters (ids share a
    // component label) — enough singletons that every split index
    // appears with 80/10/10 thresholds
    val rows =
      (1L to 300L).map(i => (i, i)) ++
        Seq((1001L, 7L), (1002L, 7L), (1003L, 7L),
            (1004L, 13L), (1005L, 13L), (1006L, 42L))
    val marked = rows.toDF("doc_id", "component")
    val out = Splitting.splitByComponent(marked, Seq(0.8, 0.1, 0.1))
      .cache()
    // whole-cluster assignment: one distinct split per component
    val perComp = out.groupBy(col("component"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1)
    assert(perComp.count() == 0)
    // every split occupied, roughly 8:1:1 over the 303 clusters
    val counts = out.select(col("component"), col("split")).distinct()
      .groupBy(col("split")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2), s"splits seen: $counts")
    assert(counts(0) > counts(1) && counts(0) > counts(2),
      s"train should dominate: $counts")
    // partitioning-invariant (the md5 cut is a pure row function)
    val re = Splitting.splitByComponent(
      marked.repartition(13, col("doc_id")), Seq(0.8, 0.1, 0.1))
    assert(re.exceptAll(out).count() == 0 &&
           out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  test("splitLeakage: zero off-diagonal under the component split, " +
       "nonzero under the naive doc split on the same pairs") {
    import spark.implicits._
    // 60 near-dup pairs (i, i+10000), each its own component
    val pairs = (1L to 60L).map(i => (i, i + 10000L))
      .toDF("id_a", "id_b")
    val docs = ((1L to 60L) ++ (10001L to 10060L)).toDF("doc_id")
    val marked = docs.withColumn("component",
      when(col("doc_id") > 10000L, col("doc_id") - 10000L)
        .otherwise(col("doc_id")))
    val safe = Splitting.splitLeakage(pairs,
      Splitting.splitByComponent(marked, Seq(0.8, 0.1, 0.1)))
    assert(safe.filter(col("leaks")).count() == 0)
    val naive = Splitting.splitLeakage(pairs,
      Splitting.splitByComponent(docs, Seq(0.8, 0.1, 0.1),
        componentCol = "doc_id"))
    val leaked = naive.filter(col("leaks"))
      .agg(sum(col("n_pairs"))).as[Long].head()
    assert(leaked > 0, "naive doc-level split should leak on 60 pairs")
    // conservation: both matrices count every pair exactly once
    assert(safe.agg(sum(col("n_pairs"))).as[Long].head() == 60L)
    assert(naive.agg(sum(col("n_pairs"))).as[Long].head() == 60L)
  }

  test("temperatureWeights: alpha=1 natural, lower alpha boosts the " +
      "low-mass source, bad inputs refuse") {
    val masses = Map("big" -> 9000000L, "small" -> 10000L)
    def share(alpha: Double): Double = {
      val w = Splitting.temperatureWeights(masses, alpha)
      w("small") / (w("small") + w("big"))
    }
    // α=1 reproduces the natural proportion exactly
    assert(math.abs(share(1.0) - 10000.0 / 9010000.0) < 1e-15)
    // flattening is monotone: smaller α → bigger low-resource share
    assert(share(0.7) > share(1.0) && share(0.3) > share(0.7))
    // α=0.5 is sqrt: hand-check
    val w = Splitting.temperatureWeights(masses, 0.5)
    assert(w("big") == 3000.0 && w("small") == 100.0)
    intercept[IllegalArgumentException] {
      Splitting.temperatureWeights(masses, 0.0)
    }
    intercept[IllegalArgumentException] {
      Splitting.temperatureWeights(Map("z" -> 0L), 0.5)
    }
  }

  test("mixToBudgetTemperature: per-source token mass within budget, " +
      "low-mass sources oversampled vs natural share") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val out = Splitting.mixToBudgetTemperature(
      docs, "source", "n_chars", "doc_id",
      alpha = 0.5, totalBudget = 5000L).cache()
    // each source's kept token mass fits its sqrt-share budget
    val masses = docs.groupBy("source").agg(sum("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    val wsum = masses.keys.toSeq.sorted
      .map(s => math.sqrt(masses(s).toDouble)).sum
    val kept = out.groupBy("source").agg(sum("n_chars").as("k"))
      .as[(String, Long)].collect().toMap
    kept.foreach { case (s, k) =>
      val budget = math.floor(math.sqrt(masses(s).toDouble)
        / wsum * 5000L).toLong
      assert(k <= budget, s"$s kept $k > budget $budget")
    }
    // determinism: the kept doc set is stable across runs
    val again = Splitting.mixToBudgetTemperature(
      docs, "source", "n_chars", "doc_id", 0.5, 5000L)
      .select("doc_id").as[Long].collect().toSet
    assert(again ==
      out.select("doc_id").as[Long].collect().toSet)
    out.unpersist()
  }
}
