package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the validity of the sf0.1→sf1 probe corpus: the scaled
  * documents must preserve per-doc TOKEN MULTISETS (language-ID and
  * quality kernels are multiset functions, so per-doc scores carry
  * over) while de-correlating word ORDER across replicas (so the
  * shingle-based near-dup workload grows linearly — the first,
  * word-keyed scramble violated this and inflated the pair workload
  * ~100×; see SCALING.md). */
class ScaleProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleprobe")
      .toString
    ScaleProbe.generateIfAbsent(spark, TestSpark.sf0001, d, replicas = 2)
    d
  }

  test("scaled corpus: row counts multiply, ids stay disjoint") {
    val src = Tables.documents(spark, TestSpark.sf0001)
    val out = Tables.documents(spark, dir)
    assert(out.count() == 2 * src.count())
    assert(out.select(col("doc_id")).distinct().count() == out.count())
    val ev = Tables.events(spark, dir)
    assert(ev.count() == 2 * Tables.events(spark, TestSpark.sf0001).count())
  }

  test("replica text is a permutation: token multiset preserved") {
    val src = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), sort_array(split(col("text"), " ")).as("m"))
    val rep = Tables.documents(spark, dir)
      .filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"),
              sort_array(split(col("text"), " ")).as("m"))
    val mismatches = src.as("s").join(rep.as("r"), Seq("doc_id"))
      .filter(col("s.m") =!= col("r.m")).count()
    assert(mismatches == 0, "scramble must permute, not alter, tokens")
  }

  test("replica order is de-correlated: cross-replica shingle overlap ~0") {
    // same doc, different replica: high token overlap but (for docs
    // long enough to have many 5-shingles) near-zero shingle overlap
    val sh = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      graft.text.Text.wordShingles(col("text"), 5).as("sh"))
    val base = sh(Tables.documents(spark, dir)
      .filter(col("doc_id") < 10000000L))
    val rep = sh(Tables.documents(spark, dir)
      .filter(col("doc_id") >= 10000000L))
      .select((col("doc_id") - 10000000L).as("doc_id"), col("sh").as("sh2"))
    val overlap = base.join(rep, Seq("doc_id"))
      .filter(size(col("sh")) >= 20)
      .select((size(array_intersect(col("sh"), col("sh2"))).cast("double") /
               size(col("sh")).cast("double")).as("frac"))
      .agg(avg(col("frac"))).head().getDouble(0)
    assert(overlap < 0.05,
      f"cross-replica shingle overlap $overlap%.3f — scramble too weak")
  }

  test("per-doc language ID survives the scramble (multiset function)") {
    val lang = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      graft.text.Text.langId(col("text")).as("l"))
    val base = lang(Tables.documents(spark, dir)
      .filter(col("doc_id") < 10000000L))
    val rep = lang(Tables.documents(spark, dir)
      .filter(col("doc_id") >= 10000000L))
      .select((col("doc_id") - 10000000L).as("doc_id"), col("l").as("l2"))
    val diff = base.join(rep, Seq("doc_id"))
      .filter(col("l") =!= col("l2")).count()
    assert(diff == 0, "language ID must be invariant under permutation")
  }
}
