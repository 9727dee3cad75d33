package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class OrcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("orc round-trip: schema and rows survive exactly") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    val docs = Tables.documents(spark, TestSpark.sf0001)
    Orc.write(docs, dir)
    val back = Orc.read(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("partitioned orc: facet filter partition-prunes, predicates " +
       "push to the stripe reader") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/part"
    val docs = Tables.documents(spark, TestSpark.sf0001)
    Orc.writePartitioned(docs, dir, Seq("lang"))
    val back = Orc.read(spark, dir)
    assert(back.count() == docs.count())
    val filtered = back.filter(col("lang") === "en")
    assert(Layout.isPartitionPruned(filtered),
      "lang filter must resolve against partition directories")
    assert(filtered.count() == docs.filter(col("lang") === "en").count())
    // a data-column predicate reaches the ORC scan as a pushed filter
    val pushed = back.filter(col("doc_id") > 100)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(pushed.nonEmpty &&
      pushed.forall(_.metadata.get("PushedFilters")
        .exists(_.contains("GreaterThan(doc_id,100)"))),
      "doc_id predicate must push down to the ORC reader")
  }
}
