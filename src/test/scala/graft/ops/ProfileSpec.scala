package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column profiling ([[Profile]]): known stats on a fixture with
  * nulls, the approx spelling agreeing on everything but `distinct`
  * (where it must stay within HLL error), and the single-aggregate
  * plan shape. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq[(java.lang.Long, String)](
    (1L, "aa"), (2L, null), (2L, "bbb"), (null, "aa"), (5L, ""))
    .toDF("x", "s")

  private def cell(p: Map[(String, String), Any], c: String, m: String) =
    p((c, m))

  test("exact profile: every metric on the known fixture") {
    val p = Profile.profile(df, Seq("x"), Seq("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(cell(p, "x", "n") == 4L)        // one null
    assert(cell(p, "x", "nulls") == 1L)
    assert(cell(p, "x", "distinct") == 3L) // 1, 2, 5
    assert(cell(p, "x", "min") == 1L)
    assert(cell(p, "x", "max") == 5L)
    assert(cell(p, "x", "sum") == 10L)
    assert(cell(p, "s", "n") == 4L)
    assert(cell(p, "s", "nulls") == 1L)
    assert(cell(p, "s", "distinct") == 3L) // "aa", "bbb", ""
    assert(cell(p, "s", "min_len") == 0L)
    assert(cell(p, "s", "max_len") == 3L)
    assert(cell(p, "s", "sum_len") == 7L)  // 2+3+2+0
  }

  test("empty input: counts 0, extremes null") {
    val p = Profile.profile(df.filter(lit(false)), Seq("x"), Seq("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(cell(p, "x", "n") == 0L)
    assert(cell(p, "x", "nulls") == 0L)
    assert(cell(p, "x", "distinct") == 0L)
    assert(cell(p, "x", "min") == null)
    assert(cell(p, "s", "sum_len") == null)
  }

  test("approx profile agrees exactly off-distinct, closely on it") {
    val big = spark.range(10000).select(col("id").as("x"),
      concat(lit("v"), pmod(col("id"), lit(997))).as("s"))
    val exact = Profile.profile(big, Seq("x"), Seq("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = Profile.profileApprox(big, Seq("x"), Seq("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (k <- exact.keys if k._2 != "distinct")
      assert(exact(k) == approx(k), s"cell $k")
    // HLL++ default rsd 5%
    assert(math.abs(approx(("x", "distinct")) - 10000L) < 800)
    assert(math.abs(approx(("s", "distinct")) - 997L) < 90)
  }

  test("one scan: the plan contains a single file/relation read") {
    val p = Profile.profile(df, Seq("x"), Seq("s"))
    val scans = p.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l
    }
    assert(scans.size == 1, s"expected one leaf, got ${scans.size}")
  }
}
