package graft.ml

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Trusted corpus: the testdata documents. Raw/low-quality corpus:
    * the same documents degraded in-engine (first token repeated into
    * the text + punctuation junk appended) — low distinct/bigram
    * ratios, high punct ratio, same length scale, so the classifier
    * must use shape features, not length. */
  lazy val trusted: DataFrame = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("text")).cache()
  lazy val degraded: DataFrame = trusted
    .select(col("doc_id"),
      concat(
        concat_ws(" ", array_repeat(element_at(split(col("text"), " "), 1), 40)),
        lit(" !!! ??? *** !!! ??? *** !!! ??? *** !!!")).as("text"))
    .cache()

  test("featurize appends exactly the declared numeric feature columns") {
    val f = QualityModel.featurize(trusted)
    assert(f.columns.toSeq
      == trusted.columns.toSeq ++ QualityModel.FeatureCols)
    assert(QualityModel.FeatureCols.forall(c =>
      f.schema(c).dataType.typeName == "double"))
    // no NaN/null features on real text
    val bad = QualityModel.FeatureCols
      .map(c => sum(when(col(c).isNull || isnan(col(c)), 1).otherwise(0)))
    assert(f.agg(bad.head, bad.tail: _*).head().toSeq.forall(_ == 0L))
  }

  test("fit/score separates held-out trusted from degraded documents") {
    val trainT = trusted.filter(col("doc_id") % 5 =!= 0)
    val trainD = degraded.filter(col("doc_id") % 5 =!= 0)
    val heldT = trusted.filter(col("doc_id") % 5 === 0)
    val heldD = degraded.filter(col("doc_id") % 5 === 0)
    val model = QualityModel.fit(trainT, trainD)
    val sT = model.score(heldT).cache()
    val sD = model.score(heldD).cache()
    // schema contract: input columns + ml_quality, nothing else
    assert(sT.columns.toSeq == heldT.columns.toSeq :+ "ml_quality")
    val accT = sT.filter(col("ml_quality") > 0.5).count().toDouble /
      heldT.count()
    val accD = sD.filter(col("ml_quality") < 0.5).count().toDouble /
      heldD.count()
    assert(accT >= 0.9, s"held-out trusted accuracy $accT < 0.9")
    assert(accD >= 0.9, s"held-out degraded accuracy $accD < 0.9")
    // scores are probabilities
    assert(sT.filter(col("ml_quality") < 0 || col("ml_quality") > 1)
      .count() == 0)
  }

  test("scoring is deterministic for a fixed fitted model") {
    val model = QualityModel.fit(trusted, degraded)
    def snap() = model.score(trusted.limit(50)).orderBy(col("doc_id"))
      .select(col("doc_id"), round(col("ml_quality"), 12).as("q"))
      .collect().map(_.toString).toSeq
    assert(snap() == snap())
  }

  // r6-fix regression: featurize/score overwrite-then-drop the reserved
  // names wholesale, so a colliding caller column must refuse loudly
  // instead of being silently destroyed (pre-r6 it was).
  test("reserved-column collisions refuse loudly") {
    val withFeature = trusted.withColumn("f_n_chars", lit(7.0))
    val exF = intercept[IllegalArgumentException] {
      QualityModel.featurize(withFeature)
    }
    assert(exF.getMessage.contains("f_n_chars") &&
           exF.getMessage.contains("reserves"))
    val withTemp = trusted.withColumn("__q_toks", lit("x"))
    assert(intercept[IllegalArgumentException] {
      QualityModel.featurize(withTemp)
    }.getMessage.contains("__q_toks"))
    // score additionally reserves its output column
    val model = QualityModel.fit(trusted.limit(40), degraded.limit(40))
    val withOut = trusted.withColumn("ml_quality", lit(0.5))
    assert(intercept[IllegalArgumentException] {
      model.score(withOut)
    }.getMessage.contains("ml_quality"))
  }

  test("hashed-n-gram variant: lexical signal the flat features miss") {
    import spark.implicits._
    // two classes with IDENTICAL shape features (length, diversity,
    // punctuation) but disjoint VOCABULARY — only a lexical model can
    // separate them
    def corpus(prefix: String) = (1 to 120).map { i =>
      (i.toLong, (0 until 12).map(j =>
        s"$prefix${(i * 7 + j * 13) % 40}").mkString(" "))
    }.toDF("doc_id", "text")
    val good = corpus("fine")
    val bad = corpus("junk")
    val m = QualityModel.fitHashed(good.limit(80), bad.limit(80),
      numFeatures = 1 << 14, maxIter = 30)
    val heldGood = m.score(good.filter(col("doc_id") > 80))
      .agg(min("ml_quality")).head().getDouble(0)
    val heldBad = m.score(bad.filter(col("doc_id") > 80))
      .agg(max("ml_quality")).head().getDouble(0)
    assert(heldGood > 0.8 && heldBad < 0.2,
      s"hashed model failed to separate: good>=$heldGood bad<=$heldBad")
    // output schema: input + ml_quality, no leaked temp columns
    val cols = m.score(good.limit(2)).columns.toSet
    assert(cols == Set("doc_id", "text", "ml_quality"))
    // deterministic for a fixed model
    val a = m.score(good).select("doc_id", "ml_quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = m.score(good).select("doc_id", "ml_quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}
