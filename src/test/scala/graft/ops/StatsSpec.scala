package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_percentile tracks the exact percentile (the scale path)") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val both = o.groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("exact"),
           approx_percentile(col("o_totalprice"), lit(0.5), lit(10000))
             .as("approx"),
           count(lit(1)).as("n"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getDouble(1)
      val approx = r.getDouble(2)
      // accuracy 10000 with n in the hundreds → the sketch is exact up
      // to interpolation (approx returns an actual data value; exact
      // interpolates between two) — allow one inter-value gap
      assert(math.abs(approx - exact) / math.max(exact, 1.0) < 0.05,
        s"approx $approx vs exact $exact for ${r.getString(0)}")
    }
  }

  test("HLL cardinality profile tracks exact distinct counts") {
    val approx = Stats.cardinalityProfile(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.15,
        s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("rollup emits detail, subtotal, and grand-total levels") {
    val r = Stats.rollupFacets(spark, TestSpark.sf0001).cache()
    val gids = r.select(col("gid")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 3L))
    val grand = r.filter(col("gid") === 3)
    assert(grand.count() == 1)
    val total = Tables.orders(spark, TestSpark.sf0001).count()
    assert(grand.head().getAs[Long]("cnt") == total)
    // subtotals sum to the grand total
    val sub = r.filter(col("gid") === 1)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(sub == total)
  }

  test("pivot: per-user wide counts reconcile with the long form") {
    val p = Stats.pivotEventCounts(spark, TestSpark.sf0001).cache()
    val ev = Tables.events(spark, TestSpark.sf0001)
    // row count = distinct users; cell sum = event count; no nulls
    assert(p.count() == ev.select(col("user_id")).distinct().count())
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = p.agg(sum(types.map(col).reduce(_ + _))).head().getLong(0)
    assert(wide == ev.count())
    types.foreach(t => assert(p.filter(col(t).isNull).count() == 0))
    p.unpersist()
  }

  test("deciles: equal-count buckets (remainder low), cover all docs") {
    val d = Stats.charDeciles(spark, TestSpark.sf0001).cache()
    val n = Tables.documents(spark, TestSpark.sf0001).count()
    val sizes = d.orderBy(col("decile")).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(sizes.map(_._2).sum == n)
    assert(sizes.map(_._1).toSeq == (1 to 10))
    // SQL-standard ntile: sizes differ by at most 1, big buckets first
    val szs = sizes.map(_._2)
    assert(szs.max - szs.min <= 1)
    assert(szs.sorted.reverse.toSeq == szs.toSeq)
    // buckets are range-contiguous: max of decile k <= min of k+1
    val rng = d.orderBy(col("decile")).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    rng.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2)
    }
    d.unpersist()
  }
}
