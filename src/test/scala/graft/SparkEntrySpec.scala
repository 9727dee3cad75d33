package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract itself: the flagship entry returns rows
  * (the driver's smoke check), every declared query name is unique and
  * resolvable, and every oracle key has a matching query. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every declared query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}
