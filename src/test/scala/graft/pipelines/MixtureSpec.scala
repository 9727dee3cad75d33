package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget mixture composition ([[Splitting.mixToBudget]] /
  * [[Splitting.mixToBudgetApprox]], SP6). The synthetic frame is
  * built in-test (two sources, fixed token sizes) so every budget
  * boundary is hand-checkable; the testdata path is hash-gated by
  * `q_mix_budget`. */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2000 docs/source, tokens cycle 50..149 → per-source mass 199_000
  private lazy val corpus = {
    val rows = for {
      s <- Seq("a", "b")
      i <- 0 until 2000
    } yield (s match { case "a" => i.toLong; case _ => 10000L + i },
             s, 50L + i % 100)
    rows.toDF("doc_id", "source", "tokens").cache()
  }

  private val weights = Map("a" -> 3.0, "b" -> 1.0)

  test("exact: per-source token mass fits the budget and the next doc would not") {
    val budget = 40000L // budgets: a=30000, b=10000
    val kept = Splitting.mixToBudget(corpus, "source", "tokens", "doc_id",
      weights, budget)
    val mass = kept.groupBy(col("source")).agg(sum(col("tokens")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("a") <= 30000L && mass("b") <= 10000L, s"over budget: $mass")
    // maximality: the kept set is the LONGEST md5-permutation prefix
    // that fits — appending the first dropped doc must overshoot
    val keyed = corpus
      .withColumn("__k", md5(col("doc_id").cast("string").cast("binary")))
      .orderBy(col("__k"), col("doc_id"))
      .select(col("source"), col("tokens"), col("doc_id"))
      .collect()
    val keptIds = kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    Seq(("a", 30000L), ("b", 10000L)).foreach { case (src, b) =>
      val inOrder = keyed.filter(_.getString(0) == src)
      val firstDropped = inOrder.find(r => !keptIds.contains(r.getLong(2)))
      firstDropped.foreach { r =>
        assert(mass(src) + r.getLong(1) > b,
          s"$src: dropped doc ${r.getLong(2)} would still have fit")
      }
    }
  }

  test("exact: kept set is a prefix of the md5 permutation per source") {
    val kept = Splitting.mixToBudget(corpus, "source", "tokens", "doc_id",
      weights, 40000L)
    val keptIds = kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val keyed = corpus
      .withColumn("__k", md5(col("doc_id").cast("string").cast("binary")))
      .orderBy(col("__k"), col("doc_id"))
      .select(col("source"), col("doc_id")).collect()
    Seq("a", "b").foreach { src =>
      val flags = keyed.filter(_.getString(0) == src)
        .map(r => keptIds.contains(r.getLong(1)))
      val firstDrop = flags.indexOf(false)
      if (firstDrop >= 0)
        assert(!flags.drop(firstDrop).contains(true),
          s"$src: kept doc after the first dropped one — not a prefix")
    }
  }

  test("sources absent from the weights are dropped") {
    val kept = Splitting.mixToBudget(corpus, "source", "tokens", "doc_id",
      Map("a" -> 1.0), 40000L)
    assert(kept.filter(col("source") === "b").count() == 0)
  }

  test("a source whose first doc overshoots its budget contributes nothing") {
    val tiny = Seq((1L, "a", 500L), (2L, "a", 500L), (3L, "b", 90L))
      .toDF("doc_id", "source", "tokens")
    // budgets: a=300, b=100 — a's cheapest doc is 500 > 300
    val kept = Splitting.mixToBudget(tiny, "source", "tokens", "doc_id",
      Map("a" -> 3.0, "b" -> 1.0), 400L)
    assert(kept.filter(col("source") === "a").count() == 0)
    assert(kept.filter(col("source") === "b").count() == 1)
  }

  test("approx: one cut is a subset of the other and mass lands near budget") {
    val budget = 40000L
    val exact = Splitting.mixToBudget(corpus, "source", "tokens", "doc_id",
      weights, budget)
    val approx = Splitting.mixToBudgetApprox(corpus, "source", "tokens",
      "doc_id", weights, budget)
    // nesting holds PER SOURCE (each source cuts its own permutation
    // at its own boundary — one source can cut deeper while the other
    // cuts shallower, so the pooled sets need not nest)
    Seq("a", "b").foreach { src =>
      val e = exact.filter(col("source") === src)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val a = approx.filter(col("source") === src)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(e.subsetOf(a) || a.subsetOf(e),
        s"$src cuts must nest: |e\\a|=${(e -- a).size} |a\\e|=${(a -- e).size}")
    }
    val mass = approx.groupBy(col("source")).agg(sum(col("tokens")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 keys are uniform: with ~300/100 docs kept the relative error
    // concentrates well under 20% (deterministic given the fixed ids)
    assert(math.abs(mass("a") - 30000L) < 6000L, s"a mass ${mass("a")}")
    assert(math.abs(mass("b") - 10000L) < 2000L, s"b mass ${mass("b")}")
  }

  test("partitioning invariance: same kept set at 1 and 13 partitions") {
    val one = Splitting.mixToBudget(corpus.repartition(1), "source",
      "tokens", "doc_id", weights, 40000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val many = Splitting.mixToBudget(corpus.repartition(13), "source",
      "tokens", "doc_id", weights, 40000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(one == many)
  }

  test("epochs: over-budget source repeats, remainder is the prefix cut") {
    // source "a": mass 199_000, budget 450_000 → 2 full epochs +
    // remainder 52_000; source "b": mass 199_000, budget 150_000 →
    // 0 full epochs, remainder = plain mixToBudget
    val kept = Splitting.mixToBudgetEpochs(corpus, "source", "tokens",
      "doc_id", Map("a" -> 3.0, "b" -> 1.0), 600000L)
    val aFull = kept.filter(col("source") === "a" && col("epoch") < 2)
    assert(aFull.count() == 2 * 2000, "2 full epochs of all 2000 docs")
    assert(kept.filter(col("source") === "a")
      .groupBy(col("epoch")).count().count() == 3)
    // the remainder epoch equals the plain budget cut at budget % mass
    val aRem = kept.filter(col("source") === "a" && col("epoch") === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val aCut = Splitting.mixToBudget(
        corpus.filter(col("source") === "a"), "source", "tokens",
        "doc_id", Map("a" -> 1.0), 52000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(aRem == aCut)
    // an under-budget source degenerates to mixToBudget at epoch 0
    val b = kept.filter(col("source") === "b")
    assert(b.groupBy(col("epoch")).count().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    val bIds = b.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bCut = Splitting.mixToBudget(
        corpus.filter(col("source") === "b"), "source", "tokens",
        "doc_id", Map("b" -> 1.0), 150000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(bIds == bCut)
    // total token mass within one doc of each source budget
    val mass = kept.groupBy(col("source")).agg(sum(col("tokens")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("a") <= 450000L && mass("a") > 450000L - 150L)
    assert(mass("b") <= 150000L && mass("b") > 150000L - 150L)
  }

  test("skew posture: exact path plans a per-source window, approx " +
       "path plans no exchange at all; dominated-source tripwire fires") {
    // the structural fact behind the SCALING.md skew rows: the exact
    // cut's cost concentrates one window partition per source (a
    // corpus-dominating source sorts in ONE task), while the approx
    // cut is a map-only filter — nothing to tilt, whatever the skew
    val exactPlan = Splitting.mixToBudget(corpus, "source", "tokens",
        "doc_id", weights, 40000L)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Window"),
      "exact path must carry the per-source window")
    val approxPlan = Splitting.mixToBudgetApprox(corpus, "source",
        "tokens", "doc_id", weights, 40000L)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Exchange") &&
           !approxPlan.contains("Window"),
      s"approx path must be shuffle-free, got:\n$approxPlan")
    // tripwire: fires only past the partition-mass bound, names the
    // largest offender
    assert(Splitting.dominatedSource(
      Map("a" -> 1000L, "b" -> 2000L)).isEmpty)
    assert(Splitting.dominatedSource(
      Map("a" -> 1000L, "b" -> 2000L), bound = 1500L)
      == Some("b" -> 2000L))
  }

  test("budget floors: integer shares of the total, never rounded up") {
    val b = Splitting.sourceBudgets(Map("x" -> 1.0, "y" -> 2.0), 100L)
    assert(b == Map("x" -> 33L, "y" -> 66L))
    assertThrows[IllegalArgumentException] {
      Splitting.sourceBudgets(Map.empty, 100L)
    }
    assertThrows[IllegalArgumentException] {
      Splitting.sourceBudgets(Map("x" -> -1.0), 100L)
    }
    assertThrows[IllegalArgumentException] {
      Splitting.sourceBudgets(Map("x" -> 1.0), 0L)
    }
  }
}
