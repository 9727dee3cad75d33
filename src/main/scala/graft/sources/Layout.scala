package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the write-side half of 100-TB query
  * performance. A corpus laid out as
  * `path/lang=en/source=src1/part-*.parquet` turns every
  * facet-filtered scan into a PARTITION-PRUNED scan: Spark resolves
  * `WHERE lang = 'en'` against directory names and never opens the
  * other 96% of files. The read-side predicate pushdown the declared
  * queries rely on composes with this — pruning removes files,
  * pushdown then skips row groups inside the survivors.
  */
object Layout {

  /** Hive-style partitioned parquet write. Keep partition columns at
    * directory-count sanity: |distinct(cols)| directories are created,
    * each holding every task's output for that key — pick columns with
    * hundreds-to-thousands of values (lang, source, date), never
    * high-cardinality ids. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Partitioned write with per-key file-count control: repartition by
    * the partition columns first so each directory gets at most
    * `filesPerPartition` files instead of one file per task per key —
    * the small-files problem is the other way partitioned layouts die
    * at scale. */
  def writePartitionedCompact(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              filesPerPartition: Int = 1): Unit = {
    val keys = partitionCols.map(col)
    val salted = keys :+ (pmod(spark_partition_id(),
      lit(filesPerPartition))).as("__file_salt")
    df.repartition(salted: _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True iff `df`'s physical scan prunes partitions with a non-empty
    * partition filter (use in tests/audits to prove a layout pays
    * off). */
  def isPartitionPruned(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty)
  }
}
