package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.5 W1–W2 + F6).
  * One shuffle on the partition key + per-partition sort → WindowExec. */
object Windows {

  /** W1 — row_number per group by measure desc (popularity_model.py:46).
    * row_number is nondeterministic under ties, so the window order carries
    * a unique tiebreaker (o_orderkey) — SURVEY §7.7 rule 2. */
  def rowNumberPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** W2+F6 — rank ≤ k per group, keeping ties (als_recommendation.py:21-23).
    * Deliberately `rank` (not row_number) over the raw measure: ties share a
    * rank and all survive the cutoff — the reference's semantics. The output
    * set is deterministic even with ties; the final ORDER BY adds the unique
    * key for row-order determinism. */
  def rankTopKPerGroup(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= lit(k))
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }
}
