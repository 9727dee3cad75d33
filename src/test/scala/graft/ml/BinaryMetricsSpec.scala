package graft.ml

import graft.TestSpark
import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics
import org.scalatest.funsuite.AnyFunSuite

class BinaryMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aucROC: hand-computed fixtures incl. ties") {
    // perfect separation → 1.0; inverted → 0.0
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))
      .toDF("score", "label")
    assert(BinaryMetricsDF.aucROC(perfect, "score", "label")
      .head().getDouble(0) == 1.0)
    val inverted = Seq((0.9, 0), (0.8, 0), (0.1, 1), (0.2, 1))
      .toDF("score", "label")
    assert(BinaryMetricsDF.aucROC(inverted, "score", "label")
      .head().getDouble(0) == 0.0)
    // all-tied scores → midranks → exactly 0.5
    val tied = Seq((0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1))
      .toDF("score", "label")
    assert(BinaryMetricsDF.aucROC(tied, "score", "label")
      .head().getDouble(0) == 0.5)
    // mixed with a tie: scores (1,2,2,3), labels (0,0,1,1):
    // doubled midranks 2,5,5,8 → U = (5+8)/2 − 2·3/2 = 3.5 → 3.5/4
    val mixed = Seq((1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
      .toDF("score", "label")
    val r = BinaryMetricsDF.aucROC(mixed, "score", "label").head()
    assert(r.getDouble(0) == 3.5 / 4)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("aucROC: null scores excluded, single-class input raises") {
    // a null-scored row must not be ranked below everything silently
    val withNull = Seq((Some(1.0), 0), (Some(2.0), 1), (None, 1))
      .toDF("score", "label")
    val clean = Seq((1.0, 0), (2.0, 1)).toDF("score", "label")
    assert(BinaryMetricsDF.aucROC(withNull, "score", "label").head() ==
           BinaryMetricsDF.aucROC(clean, "score", "label").head())
    // pos=0 or neg=0: a named error, not a null auc NPE downstream
    val oneClass = Seq((0.3, 1), (0.7, 1)).toDF("score", "label")
    val e = intercept[Exception] {
      BinaryMetricsDF.aucROC(oneClass, "score", "label").head()
    }
    assert(e.getMessage.contains("both classes"),
      s"wrong error: ${e.getMessage}")
  }

  test("aucROC matches mllib BinaryClassificationMetrics on random data") {
    val rnd = new scala.util.Random(77)
    // discretized scores so tie handling is genuinely exercised
    val data = Seq.fill(2000)(
      (math.floor(rnd.nextDouble() * 50) / 50.0,
       if (rnd.nextDouble() < 0.4) 1 else 0))
    val df = data.toDF("score", "label")
    val ours = BinaryMetricsDF.aucROC(df, "score", "label")
      .head().getDouble(0)
    val mllib = new BinaryClassificationMetrics(
      spark.sparkContext.parallelize(
        data.map { case (s, l) => (s, l.toDouble) }))
      .areaUnderROC()
    assert(math.abs(ours - mllib) < 1e-9,
      s"rank-sum $ours != mllib trapezoid $mllib")
  }
}
