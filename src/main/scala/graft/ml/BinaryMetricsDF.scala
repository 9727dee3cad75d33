package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-native binary-classification metrics — the evaluation
  * side of quality-classifier filtering ([[QualityModel]]), computed
  * without collecting scores to the driver.
  *
  * AUC-ROC via the Mann-Whitney rank-sum with midranks for ties:
  *   AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)
  * which equals the trapezoidal area under the tie-grouped ROC curve
  * (mllib's BinaryClassificationMetrics definition — cross-checked in
  * the spec).
  *
  * ==Determinism==
  * Doubled ranks are INTEGERS (midrank of a tie group = before +
  * (m+1)/2, so 2·rank = 2·before + m + 1), so every aggregate here
  * sums longs — order-free and engine-exact; the only float op is the
  * final division. The declared query's DuckDB twin replays the same
  * integer arithmetic.
  *
  * ==Scale==
  * One groupBy(score) then a window over DISTINCT scores. The ordered
  * window runs on one partition of |distinct scores| rows — metrics
  * run on eval sets, and score cardinality is bounded by binning in
  * any case (pre-round scores if a raw classifier emits continuous
  * values at corpus scale). Never a window over raw rows.
  */
object BinaryMetricsDF {

  /** One-row (auc, pos, neg) for a frame carrying a numeric score and
    * a 0/1 label. NULL scores are EXCLUDED — a null has no rank, and
    * silently ordering it below every real score would skew the
    * statistic (mllib's metrics cannot even represent the case).
    * Single-class input (pos or neg = 0) raises at execution time
    * instead of emitting a null auc that callers would NPE on. */
  def aucROC(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val g = df
      .select(col(scoreCol).cast("double").as("s"),
              col(labelCol).cast("long").as("l"))
      .filter(col("s").isNotNull)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("m"), sum(col("l")).as("p"))
    val before = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spr2 = g
      .withColumn("before", coalesce(sum(col("m")).over(before), lit(0L)))
      .agg(sum(col("p") * (lit(2L) * col("before") + col("m") + 1L))
             .as("spr2"),
           sum(col("p")).as("pos"),
           sum(col("m") - col("p")).as("neg"))
    spr2.select(
      when(col("pos") > 0L && col("neg") > 0L,
        (col("spr2") - col("pos") * (col("pos") + 1L)).cast("double") /
          (lit(2L) * col("pos") * col("neg")).cast("double"))
        .otherwise(raise_error(concat(
          lit("aucROC needs both classes present, got pos="), col("pos"),
          lit(" neg="), col("neg")))
          .cast("double"))
        .as("auc"),
      col("pos"), col("neg"))
  }
}
