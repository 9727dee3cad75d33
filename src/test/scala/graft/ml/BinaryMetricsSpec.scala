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

  test("calibrationBins: hand-computed bins, edge scores, exclusions") {
    val df = Seq(
      (0.05, 1L), (0.08, 0L),            // bin 0: n=2, pos=1
      (0.55, 1L), (0.58, 1L), (0.50, 0L),// bin 5: n=3, pos=2
      (1.00, 1L),                        // score 1.0 → top bin 9
      (-0.1, 1L), (1.5, 0L),             // out of range: excluded
      (Double.NaN, 1L)                   // NaN is not in [0,1]: excluded
    ).toDF("score", "label")
    val bins = BinaryMetricsDF.calibrationBins(df, "score", "label", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(bins.keySet == Set(0L, 5L, 9L))
    assert(bins(0L)._1 == 2L && bins(0L)._2 == 1L)
    assert(math.abs(bins(0L)._3 - 0.065) < 1e-12)
    assert(bins(0L)._4 == 0.5)
    assert(bins(5L)._1 == 3L && bins(5L)._2 == 2L)
    assert(math.abs(bins(5L)._3 - (0.55 + 0.58 + 0.50) / 3) < 1e-12)
    assert(math.abs(bins(5L)._4 - 2.0 / 3.0) < 1e-12)
    assert(bins(9L) == ((1L, 1L, 1.0, 1.0)))
  }

  test("thresholdSweep: hand-computed operating points, one pass") {
    val df = Seq(
      (0.9, 1L), (0.8, 1L), (0.7, 0L), (0.4, 1L), (0.2, 0L))
      .toDF("score", "label")
    val pts = BinaryMetricsDF
      .thresholdSweep(df, "score", "label", Seq(0.0, 0.5, 0.95))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // t=0: keep all 5, tp=3 → precision .6, recall 1, keep 1
    assert(pts(0.0) == ((5L, 3L, 0.6, 1.0, 1.0)))
    // t=0.5: keep 3 (.9,.8,.7), tp=2 → p=2/3, r=2/3, keep .6
    assert(pts(0.5)._1 == 3L && pts(0.5)._2 == 2L)
    assert(math.abs(pts(0.5)._3 - 2.0 / 3) < 1e-12)
    assert(math.abs(pts(0.5)._4 - 2.0 / 3) < 1e-12)
    // t=0.95: keeps nothing → precision defined as 0.0
    assert(pts(0.95) == ((0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("eceFromBins: perfectly calibrated → 0; known gap weighted") {
    import org.apache.spark.sql.functions._
    // two bins: (n=3, rate 1/3 vs mean .25) and (n=1, rate 1 vs .75)
    val df = Seq(
      (0.25, 1L), (0.25, 0L), (0.25, 0L),
      (0.75, 1L)).toDF("score", "label")
    val e = BinaryMetricsDF.eceFromBins(
      BinaryMetricsDF.calibrationBins(df, "score", "label", 4))
      .select("ece", "n_total").as[(Double, Long)].head()
    val want = (3.0 * math.abs(1.0 / 3 - 0.25) +
      1.0 * math.abs(1.0 - 0.75)) / 4.0
    assert(math.abs(e._1 - want) < 1e-12 && e._2 == 4L)
    // perfectly calibrated synthetic: rate == mean score in every bin
    val perfect = Seq((0.5, 1L), (0.5, 0L)).toDF("score", "label")
    val e2 = BinaryMetricsDF.eceFromBins(
      BinaryMetricsDF.calibrationBins(perfect, "score", "label", 2))
      .select("ece").as[Double].head()
    assert(e2 == 0.0)
  }
}
