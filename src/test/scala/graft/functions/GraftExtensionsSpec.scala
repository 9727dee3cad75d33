package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SQL callers can use simhash64 and shingles after registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .createOrReplaceTempView("graft_ext_t")
    val row = spark.sql(
      "SELECT simhash64(toks) AS sig, shingles(toks, 2) AS sh FROM graft_ext_t")
      .head()
    val direct = Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .select(SimHash64.simhash64($"toks"), Shingles.shingles($"toks", 2))
      .head()
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getSeq[String](1) == direct.getSeq[String](1))
    assert(row.getSeq[String](1) == Seq("a b", "b c", "c d"))
  }

  test("SQL callers can use dot_product and pearson_maps") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                pearson_maps(map('a', 1.0D, 'b', 2.0D, 'c', 3.0D),
                             map('a', 2.0D, 'b', 4.0D, 'c', 6.0D)) AS r""")
      .head()
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12,
      "perfectly linear profiles must correlate at 1")
  }

  test("shingles rejects a non-literal k") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, Seq("a"))).toDF("k", "toks").createOrReplaceTempView("graft_ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT shingles(toks, k) FROM graft_ext_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
           e.getMessage.toLowerCase.contains("shingles"))
  }
}
