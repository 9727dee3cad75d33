package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitters ([[Frequent]]) and the skew-safe domain
  * cap wired on top of it ([[graft.pipelines.WebCuration
  * .capPerDomainSkewed]]). */
class FrequentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted skew: two mega keys, one mid key, a 40-key tail. */
  private def skewed() = {
    val rows =
      Seq.fill(600)("mega-a") ++ Seq.fill(250)("mega-b") ++
        Seq.fill(120)("mid-c") ++
        (0 until 40).flatMap(i => Seq.fill(5 + i % 4)(s"tail-$i"))
    rows.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "domain")
  }

  test("sketch-then-confirm equals the exact groupBy-HAVING answer") {
    val df = skewed()
    val exact = df.groupBy("domain").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sketchSize 64 ≪ distinct keys: the MG trim path really runs
    val got = Frequent.heavyHitters(df, "domain", minCount = 100,
        sketchSize = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact &&
           got.keySet == Set("mega-a", "mega-b", "mid-c"))
  }

  test("result is partitioning-invariant (merge correctness)") {
    val df = skewed()
    val a = Frequent.heavyHitters(df.repartition(1), "domain", 100, 64)
      .collect().map(_.getString(0)).sorted.toSeq
    val b = Frequent.heavyHitters(df.repartition(13), "domain", 100, 64)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b && a == Seq("mega-a", "mega-b", "mid-c"))
  }

  test("a threshold under the guarantee line throws; Option reports None") {
    val df = skewed() // n ≈ 1100; k = 8 → line ≈ 122
    intercept[IllegalArgumentException] {
      Frequent.heavyHitters(df, "domain", minCount = 50, sketchSize = 8)
    }
    assert(Frequent.heavyHittersOption(df, "domain", 50, 8).isEmpty)
    // same threshold with a big enough sketch is fine
    assert(Frequent.heavyHittersOption(df, "domain", 50, 64).nonEmpty)
  }

  test("capPerDomainSkewed keeps exactly capPerDomain's survivor set") {
    val df = skewed().withColumn("n_chars", col("doc_id") % 37)
    val full = graft.pipelines.WebCuration
      .capPerDomain(df, maxDocs = 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val skewedCap = graft.pipelines.WebCuration
      .capPerDomainSkewed(df, maxDocs = 100, sketchSize = 64)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(skewedCap == full)
    // heavy survivors carry their rank; pass-through rows carry null
    val ranks = graft.pipelines.WebCuration
      .capPerDomainSkewed(df, maxDocs = 100, sketchSize = 64)
      .groupBy(col("domain_rank").isNull.as("pass"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(ranks(false) == 300L) // 100 from each over-cap domain
  }

  test("a cap under the guarantee line degrades to the full window") {
    val df = skewed().withColumn("n_chars", col("doc_id") % 37)
    // maxDocs 2 → minCount 3 ≤ n/(k+1) for k = 8: sketch refuses,
    // the full-window fallback still answers correctly
    val got = graft.pipelines.WebCuration
      .capPerDomainSkewed(df, maxDocs = 2, sketchSize = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val full = graft.pipelines.WebCuration.capPerDomain(df, maxDocs = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == full)
  }

  test("over-cap NULL-domain mass is capped identically to the full window") {
    // the sketch can never surface a null key, so the skewed spelling
    // must route null-domain rows (hostless/malformed URLs) through
    // the capped side unconditionally — 150 nulls > maxDocs = 100
    val rows = Seq.fill(600)(Some("mega-a")) ++
      Seq.fill(150)(Option.empty[String]) ++
      (0 until 40).flatMap(i => Seq.fill(6)(Some(s"tail-$i")))
    val df = rows.zipWithIndex
      .map { case (d, i) => (i.toLong, d.orNull) }
      .toDF("doc_id", "domain")
      .withColumn("n_chars", col("doc_id") % 37)
    val full = graft.pipelines.WebCuration
      .capPerDomain(df, maxDocs = 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val skewedCap = graft.pipelines.WebCuration
      .capPerDomainSkewed(df, maxDocs = 100, sketchSize = 64)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(skewedCap == full)
    assert(skewedCap.size == 100 + 100 + 240) // both heavy sides capped
  }

  test("null keys count toward n but never surface as heavy") {
    val df = (Seq.fill(50)(Some("big")) ++ Seq.fill(30)(None))
      .zipWithIndex.map { case (d, i) => (i.toLong, d.orNull) }
      .toDF("doc_id", "domain")
    val got = Frequent.heavyHitters(df, "domain", minCount = 40,
      sketchSize = 16).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("big"))
  }
}
