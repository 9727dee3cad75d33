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

  test("events: ts arrives as epoch-nanos long (nanosAsLong)") {
    val f = fields("events")
    assert(f("ts") == LongType,
      "TIMESTAMP(NANOS) must be read as LongType — see Tables scaladoc")
    assert(f("user_id") == LongType && f("event_type") == StringType &&
           f("value") == DoubleType && f("props") == StringType)
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
