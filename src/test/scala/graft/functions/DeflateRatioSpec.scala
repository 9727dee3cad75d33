package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compression-ratio quality signal ([[DeflateRatio]]). Golden-pinned
  * at corpus scale (q_deflate_ratio); these cases pin the signal's
  * SHAPE — repetition compresses, randomness doesn't — plus the
  * null/empty posture and codegen/SQL parity. */
class DeflateRatioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratio(s: String): Any = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(DeflateRatio.deflateRatio(col("t"))).head()
    if (r.isNullAt(0)) null else r.getLong(0)
  }

  test("repetition compresses far below prose; high-entropy barely at all") {
    val repeated = ratio("spam " * 2000).asInstanceOf[Long]
    val prose = ratio(
      ("The quick brown fox jumps over the lazy dog while seventeen " +
       "sailors argue about navigation, weather, cargo manifests and " +
       "the relative merits of coffee versus tea on long voyages. ") * 50)
      .asInstanceOf[Long]
    // md5 hex chains ≈ high-entropy printable junk
    val junk = ratio((0 until 500).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"x$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString)
      .asInstanceOf[Long]
    assert(repeated < prose, s"repeated=$repeated prose=$prose")
    assert(prose < junk, s"prose=$prose junk=$junk")
    assert(repeated < (1L << 20) / 20, s"boilerplate should crush: $repeated")
    assert(junk > (1L << 20) / 2, s"entropy should resist: $junk")
  }

  test("empty and null text yield null (no evidence, quarantine posture)") {
    assert(ratio("") == null)
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(DeflateRatio.deflateRatio(col("t"))).head()
    assert(r.isNullAt(0))
  }

  test("deterministic across calls and rows (thread-local reuse is reset)") {
    val df = spark.range(200).select(
      concat(lit("body text number "), col("id")).as("t"))
    val a = df.select(DeflateRatio.deflateRatio(col("t")))
      .collect().map(_.getLong(0)).toSeq
    val b = df.repartition(13).select(DeflateRatio.deflateRatio(col("t")))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(a.sorted == b)
    assert(ratio("abc abc abc") == ratio("abc abc abc"))
  }

  test("SQL registration and codegen parity with the interpreted path") {
    graft.functions.GraftExtensions.register(spark)
    Seq(Tuple1("hello hello hello world")).toDF("t")
      .createOrReplaceTempView("dr_t")
    val sql = spark.sql("SELECT deflate_ratio(t) FROM dr_t")
      .head().getLong(0)
    assert(sql == ratio("hello hello hello world"))
    // interpreted (no-codegen) path agrees
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(ratio("hello hello hello world") == sql)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
