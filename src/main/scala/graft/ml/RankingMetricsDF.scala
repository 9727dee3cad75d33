package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native ranking metrics: Precision@k, Recall@k, MAP@k, NDCG@k.
  *
  * Replaces the reference's RDD bridge to mllib.RankingMetrics
  * (popularity_model.py:60-67, als_recommendation.py:26-42) — the reference
  * maps DataFrames to RDDs of Python tuples, which at scale costs an extra
  * serialization pass and (in als_recommendation.py:33-34) a driver
  * collect/parallelize round-trip. Here each user's metrics are computed in
  * a single pass over its (prediction, label) arrays with higher-order
  * array expressions — no shuffle beyond the final global mean, no RDDs,
  * nothing on the driver. Semantics match
  * org.apache.spark.mllib.evaluation.RankingMetrics exactly (binary
  * relevance; verified by cross-check tests):
  *   - labels deduped to a set; duplicate predictions count repeatedly
  *   - precision@k divides by k; recall by |labels|
  *   - MAP@k normalizes by min(|labels|, k)
  *   - NDCG@k: binary gains 1/ln(i+2), ideal DCG from min(|labels|, k)
  *   - users with empty label sets contribute 0.0 to every mean
  */
object RankingMetricsDF {

  /** Per-user metric columns. `pred`/`actual` are array columns (any
    * element type with equality). Output: struct(precision, recall, map,
    * ndcg). */
  def perUserMetrics(pred: Column, actual: Column, k: Int): Column = {
    val labSet  = array_distinct(actual)
    val labSize = size(labSet)
    val predK   = slice(pred, 1, k)

    val hits = size(filter(predK, x => array_contains(labSet, x)))

    val precision = when(labSize > 0,
      hits.cast("double") / lit(k.toDouble)).otherwise(lit(0.0))

    val recall = when(labSize > 0,
      hits.cast("double") / labSize.cast("double")).otherwise(lit(0.0))

    // MAP@k: single fold tracking (position, hit-count, precision-sum).
    val mapAgg = aggregate(
      predK,
      struct(lit(0).as("i"), lit(0).as("cnt"), lit(0.0).as("s")),
      (acc, x) => {
        val i = acc.getField("i"); val cnt = acc.getField("cnt")
        val s = acc.getField("s")
        val hit = array_contains(labSet, x)
        struct(
          (i + 1).as("i"),
          when(hit, cnt + 1).otherwise(cnt).as("cnt"),
          when(hit, s + (cnt + 1).cast("double") / (i + 1).cast("double"))
            .otherwise(s).as("s"))
      },
      acc => acc.getField("s") / least(labSize, lit(k)).cast("double"))
    val mapK = when(labSize > 0, mapAgg).otherwise(lit(0.0))

    // NDCG@k, binary relevance: dcg over hit positions; ideal dcg is the
    // first min(|labels|, k) discount terms.
    val dcg = aggregate(
      predK,
      struct(lit(0).as("i"), lit(0.0).as("s")),
      (acc, x) => {
        val i = acc.getField("i"); val s = acc.getField("s")
        struct(
          (i + 1).as("i"),
          when(array_contains(labSet, x),
               s + lit(1.0) / log((i + 2).cast("double")))
            .otherwise(s).as("s"))
      },
      acc => acc.getField("s"))
    val maxDcg = aggregate(
      sequence(lit(2), least(labSize, lit(k)) + 1),
      lit(0.0),
      (acc, j) => acc + lit(1.0) / log(j.cast("double")))
    val ndcg = when(labSize > 0, dcg / maxDcg).otherwise(lit(0.0))

    struct(precision.as("precision"), recall.as("recall"),
           mapK.as("map"), ndcg.as("ndcg"))
  }

  /** Mean metrics over all users: one row with
    * (precision_at_k, recall_at_k, map_at_k, ndcg_at_k). */
  def evaluate(df: DataFrame, predCol: String, actualCol: String,
               k: Int): DataFrame = {
    df.select(perUserMetrics(col(predCol), col(actualCol), k).as("m"))
      .agg(avg(col("m.precision")).as("precision_at_k"),
           avg(col("m.recall")).as("recall_at_k"),
           avg(col("m.map")).as("map_at_k"),
           avg(col("m.ndcg")).as("ndcg_at_k"))
  }

  /** Convenience: evaluate and pull the four numbers to the driver. */
  case class Scores(precision: Double, recall: Double, map: Double,
                    ndcg: Double)

  def scores(df: DataFrame, predCol: String, actualCol: String,
             k: Int): Scores = {
    val r = evaluate(df, predCol, actualCol, k).head()
    Scores(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }
}
