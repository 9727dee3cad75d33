package graft.pipelines

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = NgramLm.Scale.toDouble

  test("score: hand-computed add-1 bigram conditionals") {
    // target "a b a b": c(a b)=2, c(b a)=1; unigrams a:2 b:2 → V=2+1=3
    val target = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "a b"),   // seen bigram, seen context: ln(3/5)
      (2L, "z q"),   // unseen everything: ln(1/3)
      (3L, "a z"),   // unseen bigram, seen context: ln(1/5)
      (4L, "solo")   // <2 tokens → no bigrams → absent from output
    ).toDF("doc_id", "text")
    val got = NgramLm.score(raw, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def q(x: Double): Long = math.round(math.log(x) * Scale)
    assert(got(1L) == ((1L, q(3.0 / 5))))
    assert(got(2L) == ((1L, q(1.0 / 3))))
    assert(got(3L) == ((1L, q(1.0 / 5))))
    assert(!got.contains(4L))
    // multi-bigram doc: exact integer sum of per-type weights
    val multi = Seq((5L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.score(multi, target).head()
    assert(m.getLong(1) == 3L)
    assert(m.getLong(2) == 2 * q(3.0 / 5) + q((1 + 1.0) / (2 + 3)))
  }

  test("score: degenerate inputs — empty target, empty raw") {
    val raw = Seq((1L, "a b c")).toDF("doc_id", "text")
    val empty = raw.filter(col("doc_id") < 0)
    // empty target: V = 0 + 1, every bigram scores ln((0+1)/(0+1)) = 0
    val vsEmpty = NgramLm.score(raw, empty).collect()
    assert(vsEmpty.length == 1)
    assert(vsEmpty.head.getLong(1) == 2L && vsEmpty.head.getLong(2) == 0L)
    // empty raw: empty output, no crash
    assert(NgramLm.score(empty, raw).count() == 0)
  }

  test("score separates target-like docs from junk on the real corpus") {
    val d = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val junk = spark.range(1, 21)
      .select((col("id") + 900000).as("doc_id"),
        concat_ws(" ", (1 to 12).map(i =>
          concat(lit(s"junk$i"), col("id"))): _*).as("text"))
    val scored = NgramLm
      .score(d.union(junk), d.filter(col("doc_id") % 4 === 0))
      .withColumn("mean_ll",
        col("ll_q").cast("double") / col("n_bigrams").cast("double"))
      .cache()
    val corpusMean = scored.filter(col("doc_id") < 900000)
      .agg(avg(col("mean_ll"))).head().getDouble(0)
    val junkMax = scored.filter(col("doc_id") >= 900000)
      .agg(max(col("mean_ll"))).head().getDouble(0)
    assert(junkMax < corpusMean,
      s"junk docs must score below the corpus mean ($junkMax >= $corpusMean)")
    scored.unpersist()
  }

  test("tiers: terciles partition the corpus; head outranks tail") {
    val d = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val t = NgramLm.tiers(d, d.filter(col("doc_id") % 4 === 0)).cache()
    val n = t.count()
    val byTier = t.groupBy("tier").count()
      .as[(String, Long)].collect().toMap
    assert(byTier.keySet == Set("head", "middle", "tail"))
    // percentile cutoffs: each tier within ±2 of n/3 on distinct scores
    byTier.values.foreach(c => assert(math.abs(c - n / 3.0) <= 2.0,
      s"tier sizes $byTier for n=$n"))
    val minHead = t.filter(col("tier") === "head")
      .agg(min("mean_ll")).head().getDouble(0)
    val maxTail = t.filter(col("tier") === "tail")
      .agg(max("mean_ll")).head().getDouble(0)
    assert(minHead > maxTail)
    t.unpersist()
  }

  test("tiers: planted junk never reaches the head tier") {
    // note: add-1 smoothing without backoff gives fully-OOV junk
    // exactly -ln(V) per bigram, which can BEAT a real doc whose
    // contexts are frequent but bigrams unseen (ln 1/(ca+V)) — the
    // known add-one artifact — so junk lands in middle-or-tail, and
    // the head tier (docs with actually-seen target bigrams) stays
    // clean of it.
    val d = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val junk = spark.range(900000, 900008).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 30).map(i =>
        concat(lit(s"zz$i"), col("id"))): _*).as("text"))
    val t = NgramLm.tiers(d.union(junk),
      d.filter(col("doc_id") % 4 === 0))
    val junkTiers = t.filter(col("doc_id") >= 900000)
      .select("tier").as[String].collect().toSet
    assert(!junkTiers.contains("head"), s"junk in head: $junkTiers")
  }

  test("tiersByGroup: each group terciles on ITS OWN scale") {
    // two 'languages' whose score distributions don't overlap: a
    // GLOBAL tercile would put every x-doc above every y-doc (tiering
    // by language); the per-group form must give each language its
    // own head/middle/tail — the published CCNet per-language rule
    val d = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(90)
    val groups = d.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, "x").otherwise("y").as("lang"))
    // shift group y's scores by repeating target-unseen junk words —
    // simpler: verify structural properties on the organic corpus
    val t = NgramLm.tiersByGroup(d, d.filter(col("doc_id") % 4 === 0),
      groups).cache()
    // every group has all three tiers and terciles within ±2 of n/3
    val sizes = t.groupBy("lang", "tier").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(r => r._2 -> r._3).toMap }
    sizes.foreach { case (g, byTier) =>
      assert(byTier.keySet == Set("head", "middle", "tail"),
        s"group $g tiers: $byTier")
      val n = byTier.values.sum
      byTier.values.foreach(c => assert(math.abs(c - n / 3.0) <= 2.0,
        s"group $g sizes $byTier"))
    }
    // within each group, head outranks tail (never across groups)
    sizes.keys.foreach { g =>
      val minHead = t.filter(col("lang") === g && col("tier") === "head")
        .agg(min("mean_ll")).head().getDouble(0)
      val maxTail = t.filter(col("lang") === g && col("tier") === "tail")
        .agg(max("mean_ll")).head().getDouble(0)
      assert(minHead > maxTail, s"group $g head/tail inverted")
    }
    t.unpersist()
  }
}
