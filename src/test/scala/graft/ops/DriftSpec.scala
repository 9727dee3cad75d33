package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PSI distribution drift ([[Drift]]): bin assignment by reference
  * deciles, Laplace shares, quantized contributions. */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical snapshots score exactly zero") {
    val snap = (1 to 200).map(_.toDouble).toDF("v")
    val bins = Drift.psiBins(snap, snap, "v", 10)
    assert(bins.count() == 10)
    assert(bins.filter(col("psi_q") =!= 0L).count() == 0)
    val total = Drift.psiTotal(bins)
      .select("psi").as[Double].head()
    assert(total == 0.0)
  }

  test("a shifted snapshot scores positive, monotone with shift size") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    def shifted(by: Int) =
      (1 to 1000).map(i => (i + by).toDouble).toDF("v")
    def psi(by: Int): Double = Drift.psiTotal(
      Drift.psiBins(ref, shifted(by), "v", 10))
      .select("psi").as[Double].head()
    val (small, big) = (psi(100), psi(400))
    assert(small > 0.0 && big > small,
      s"psi(100)=$small psi(400)=$big")
    // the standard reading: a 40% range shift is 'investigate'
    assert(big > 0.25)
  }

  test("hand-computed two-bin PSI") {
    // ref: 10 ones, 10 twos → median edge between them; cur: all twos
    val ref = (Seq.fill(10)(1.0) ++ Seq.fill(10)(2.0)).toDF("v")
    val cur = Seq.fill(20)(2.0).toDF("v")
    val bins = Drift.psiBins(ref, cur, "v", 2)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // edge = median of ref = 1.5; bin1 = v ≤ 1.5, bin2 = v > 1.5
    assert(bins.map(b => (b._1, b._2, b._3)).toSeq ==
      Seq((1L, 10L, 0L), (2L, 10L, 20L)))
    val p1 = 11.0 / 22; val q1 = 1.0 / 22
    val p2 = 11.0 / 22; val q2 = 21.0 / 22
    val want1 = math.round((p1 - q1) * math.log(p1 / q1) * (1L << 20))
    val want2 = math.round((p2 - q2) * math.log(p2 / q2) * (1L << 20))
    assert(bins(0)._4 == want1 && bins(1)._4 == want2)
  }

  test("noveltyRate: hand-computed blend, identical and disjoint edges") {
    val ref = Seq("a text", "b text", "c text").toDF("text")
    // current: a re-fetch of 'a text', a dup pair of new content, one
    // more new doc → 3 distinct, 2 novel
    val cur = Seq("a text", "new one", "new one", "new two").toDF("text")
    val r = Drift.noveltyRate(ref, cur)
      .select("n_cur", "n_novel", "novelty")
      .as[(Long, Long, Double)].head()
    assert(r == ((3L, 2L, 2.0 / 3.0)))
    // identical snapshot → zero novelty
    val same = Drift.noveltyRate(ref, ref)
      .select("novelty").as[Double].head()
    assert(same == 0.0)
    // fully disjoint → 1.0
    val disj = Drift.noveltyRate(ref, Seq("x", "y").toDF("text"))
      .select("novelty").as[Double].head()
    assert(disj == 1.0)
  }

  test("every row lands in exactly one bin (counts conserve)") {
    val ref = (1 to 357).map(i => (i * 13 % 101).toDouble).toDF("v")
    val cur = (1 to 222).map(i => (i * 7 % 97).toDouble).toDF("v")
    val bins = Drift.psiBins(ref, cur, "v", 7)
    val (nr, nc) = bins.agg(sum("c_ref"), sum("c_cur"))
      .as[(Long, Long)].head()
    assert(nr == 357L && nc == 222L)
    assert(bins.count() == 7)
  }
}
