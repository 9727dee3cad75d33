package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff ([[Diff]]): status assignment on a constructed
  * epoch pair, NULL-vs-sentinel fingerprint discrimination, and the
  * payload-free join shape. */
class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val before = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("id", "t", "v")
  private lazy val after = Seq(
    (1L, "a", 10L),      // unchanged
    (2L, "B", 20L),      // changed
    (4L, "d", 41L),      // changed (numeric col)
    (9L, "z", 90L))      // added; 3 removed
    .toDF("id", "t", "v")

  test("statuses on the constructed epoch pair") {
    val m = Diff.diff(before, after, "id", Seq("t", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "unchanged", 2L -> "changed",
                    3L -> "removed", 4L -> "changed", 9L -> "added"))
  }

  test("summary counts the four classes") {
    val s = Diff.diffSummary(before, after, "id", Seq("t", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("unchanged" -> 1L, "changed" -> 2L,
                    "removed" -> 1L, "added" -> 1L))
  }

  test("fingerprint: NULL is not the string 'null', not the sentinel, " +
       "and column boundaries don't slide") {
    val rows = Seq(
      ("n", null.asInstanceOf[String], "x"),   // (NULL, "x")
      ("s", "null", "x"),                      // ("null", "x")
      ("b", "\u0002", "x"),                    // sentinel collision probe
      ("j1", "ab", "c"),                       // boundary probe:
      ("j2", "a", "bc"))                       //  "ab"+"c" vs "a"+"bc"
      .toDF("k", "c1", "c2")
    val fps = rows.select(col("k"),
        Diff.rowFingerprint(Seq("c1", "c2")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("n") != fps("s"))
    // the declared limitation: a literal U+0002 column value equals
    // the NULL sentinel — document-level contract, testdata-free
    assert(fps("b") == fps("n"))
    assert(fps("j1") != fps("j2"))
  }

  test("diff of identical snapshots is all-unchanged; keys survive") {
    val d = Diff.diff(before, before, "id", Seq("t", "v"))
    assert(d.filter(col("status") =!= "unchanged").count() == 0)
    assert(d.count() == 4)
  }

  test("join carries only key+fingerprint, never the payload") {
    val d = Diff.diff(before, after, "id", Seq("t", "v"))
    val joins = d.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1)
    // each join side projects exactly (key, fingerprint)
    joins.head.children.foreach { side =>
      assert(side.output.size == 2,
        s"join side carries ${side.output.map(_.name)}") }
  }
}
