package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed tables — Spark's co-located join mechanism, and the
  * third leg of the engine's write-side layout story:
  * [[Layout]] partitions BY VALUE (directory pruning for
  * low-cardinality facets), [[Clustering]] z-orders WITHIN files
  * (min/max pruning for numeric ranges), bucketing hashes BY JOIN
  * KEY — so two tables bucketed the same way join with NO exchange
  * on either side. At 100 TB the fact-to-fact join (orders ⋈
  * lineitem, corpus ⋈ index) is THE shuffle that dominates a
  * pipeline; landing both sides bucketed by the join key once turns
  * every subsequent join into a zip of co-numbered buckets
  * (`SortMergeJoin` over pre-hashed scans). The price, declared: a
  * fixed bucket count (re-bucketing is a rewrite), catalog-managed
  * tables (bucket metadata lives in the table definition, not the
  * files), and one hash-shuffle at WRITE time instead of at every
  * read.
  *
  * Bucket-pruning composes: an equality predicate on the bucket
  * column scans 1/n of the files even without the join.
  */
object Bucketing {

  /** Land `df` as a bucketed, sorted parquet TABLE (catalog entry
    * `table`, files under `path`). Sorting within buckets lets the
    * join skip its sort phase entirely when both sides declare it. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"bad bucket count $nBuckets")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** True iff `df`'s physical plan contains no shuffle exchange —
    * the proof a bucketed join is actually co-located (tests/audits;
    * the same check LayoutSpec-style proofs use for pruning).
    * AQE-aware: descends into adaptive wrappers and query stages,
    * whose inner plans a plain `collect` never visits. */
  def isExchangeFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def hasExchange(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        true
      case a: AdaptiveSparkPlanExec => hasExchange(a.executedPlan)
      case q: QueryStageExec => hasExchange(q.plan)
      case other => other.children.exists(hasExchange)
    }
    !hasExchange(df.queryExecution.executedPlan)
  }
}
