package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables ([[Bucketing]]): the co-located join is EXCHANGE-
  * FREE where the plain-parquet join shuffles both sides, rows are
  * preserved exactly, and bucket pruning binds on equality probes. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val tables: (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-bucketing-spec").toString
    Bucketing.writeBucketed(Tables.orders(spark, TestSpark.sf0001),
      "spec_orders_b", s"$base/o", "o_orderkey", 4)
    Bucketing.writeBucketed(Tables.lineitem(spark, TestSpark.sf0001),
      "spec_lineitem_b", s"$base/l", "l_orderkey", 4)
    ("spec_orders_b", "spec_lineitem_b")
  }

  test("bucketed write preserves rows exactly") {
    val (to, tl) = tables
    assert(spark.table(to).count()
      == Tables.orders(spark, TestSpark.sf0001).count())
    val rawKeys = Tables.lineitem(spark, TestSpark.sf0001)
      .agg(sum(col("l_orderkey")), count(lit(1))).head()
    val bKeys = spark.table(tl)
      .agg(sum(col("l_orderkey")), count(lit(1))).head()
    assert(rawKeys == bKeys)
  }

  test("bucketed-to-bucketed join plans NO shuffle exchange; the raw " +
       "join shuffles") {
    val (to, tl) = tables
    // force the sort-merge path so co-location (not broadcast) is
    // what's being proven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table(to)
        .join(spark.table(tl),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"))
      assert(Bucketing.isExchangeFree(bucketed),
        bucketed.queryExecution.executedPlan.toString.take(2000))
      val raw = Tables.orders(spark, TestSpark.sf0001)
        .join(Tables.lineitem(spark, TestSpark.sf0001),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"))
      assert(!Bucketing.isExchangeFree(raw))
      // and the co-located join returns the same rows
      assert(bucketed.count() == raw.count())
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("equality probe on the bucket column prunes to 1/n of buckets") {
    val (to, _) = tables
    val probe = spark.table(to).filter(col("o_orderkey") === 42L)
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // optionalBucketSet bound = bucket pruning engaged
    assert(scans.forall(_.optionalBucketSet.isDefined))
  }
}
