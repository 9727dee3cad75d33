package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against testdata schema drift (FIXTURES.md §B) — every
  * declared query's column references assume these exact shapes. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, d, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: ts is normalized to epoch-nanos long") {
    // the on-disk physical type has varied across driver rounds
    // (TIMESTAMP(NANOS) vs TIMESTAMP micros); the loader contract is
    // that `Tables.events` always yields int64 epoch-nanos
    val f = Tables.events(spark, d).schema.fields
      .map(x => x.name -> x.dataType).toMap
    assert(f("ts") == LongType,
      "events.ts must be normalized to LongType ns — see Tables scaladoc")
    assert(f("user_id") == LongType && f("event_type") == StringType &&
           f("value") == DoubleType && f("props") == StringType)
  }

  test("normalizeEventTs: timestamp input converts exactly, long passes through") {
    import org.apache.spark.sql.functions.{col, expr}
    val withTs = spark.range(3)
      .withColumn("ts", expr("timestamp_micros(1700000000000000 + id)"))
    val norm = Tables.normalizeEventTs(withTs)
    assert(norm.schema("ts").dataType == LongType)
    val got = norm.orderBy(col("id")).collect().map(_.getLong(1))
    assert(got.sameElements(Array(1700000000000000000L,
      1700000000000001000L, 1700000000000002000L)))
    // already-long frames are untouched (same plan, no extra projection)
    val asLong = spark.range(3).withColumn("ts", col("id") * 1000L)
    assert(Tables.normalizeEventTs(asLong) eq asLong)
  }

  test("documents and embeddings: extension-table shapes") {
    val doc = fields("documents")
    assert(doc("doc_id") == LongType && doc("text") == StringType &&
           doc("lang") == StringType && doc("source") == StringType &&
           doc("n_chars") == LongType)
    val emb = fields("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") == ArrayType(FloatType, true) ||
           emb("embedding") == ArrayType(FloatType, false))
  }

  // r6-fix regression: memo keys are normalized paths, so alternate
  // spellings of one directory share an entry, invalidate() hits them
  // regardless of spelling, and a sibling sharing a string prefix
  // (sf1 vs sf10) is NOT over-evicted.
  test("memo normalization: spellings share an entry, invalidate is " +
       "spelling-proof and prefix-safe") {
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files
      .createTempDirectory("graft-tables-spec").toString
    for (sf <- Seq("sf1", "sf10"))
      spark.range(3).withColumn("v", lit(sf))
        .write.parquet(s"$base/$sf/t.parquet")

    val sf1 = Tables.table(spark, s"$base/sf1", "t")
    // trailing slash and a ./.. detour resolve to the SAME memo entry
    assert(Tables.table(spark, s"$base/sf1/", "t") eq sf1)
    assert(Tables.table(spark, s"$base/sf10/../sf1", "t") eq sf1)
    val sf10 = Tables.table(spark, s"$base/sf10", "t")
    assert(!(sf10 eq sf1))

    // invalidate via an alternate spelling must evict sf1 …
    Tables.invalidate(s"$base/sf10/../sf1/")
    assert(!(Tables.table(spark, s"$base/sf1", "t") eq sf1),
      "invalidate must hit every spelling of the directory")
    // … and must NOT evict the string-prefix sibling sf10
    assert(Tables.table(spark, s"$base/sf10", "t") eq sf10,
      "invalidating sf1 must spare sibling sf10")
  }

  test("fact tables: keys and measures used by the declared queries") {
    val li = fields("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType &&
           li("l_extendedprice") == DoubleType &&
           li("l_quantity") == DoubleType)
    val o = fields("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
           o("o_totalprice") == DoubleType)
  }
}
