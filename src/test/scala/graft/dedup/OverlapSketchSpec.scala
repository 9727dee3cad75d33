package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bottom-k overlap sketches ([[OverlapSketch]]): aggregator vs
  * declarative pin, estimator accuracy vs exact Jaccard, merge
  * order-freeness, KMV union identity. */
class OverlapSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashRows(rows: Seq[(String, String)]) =
    rows.toDF("src", "h")

  test("aggregator sketch equals the declarative bottom-k spelling") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("source"), col("text"))
    val hs = OverlapSketch.shingleHashes(docs, "source")
    val fast = OverlapSketch.sketchByKey(hs, "source", "h", 16)
      .select(col("source"), col("sketch"))
      .as[(String, Seq[String])].collect().toMap
    val slow = OverlapSketch
      .sketchByKeyDeclarative(hs, "source", "h", 16)
      .select(col("source"), col("sketch"))
      .as[(String, Seq[String])].collect().toMap
    assert(fast == slow)
    assert(fast.values.forall(s => s.size <= 16 && s == s.sorted))
  }

  test("duplicates never inflate a sketch") {
    val rows = hashRows(Seq.fill(50)("a" -> "h1") ++
      Seq("a" -> "h2", "a" -> "h0"))
    val sk = OverlapSketch.sketchByKey(rows, "src", "h", 8)
      .select("sketch").as[Seq[String]].head()
    assert(sk == Seq("h0", "h1", "h2"))
  }

  test("reduce keeps only the k smallest distinct hashes") {
    val agg = new OverlapSketch.BottomK(3)
    val s = ('a' to 'z').map(_.toString).reverse
      .foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    assert(s.hashes == Seq("a", "b", "c"))
  }

  test("merge is order-free and respects k") {
    val agg = new OverlapSketch.BottomK(4)
    val a = OverlapSketch.Sketch(Vector("a", "c", "e"))
    val b = OverlapSketch.Sketch(Vector("b", "c", "d", "f"))
    val m1 = agg.merge(a, b)
    val m2 = agg.merge(b, a)
    assert(m1 == m2 && m1.hashes == Seq("a", "b", "c", "d"))
  }

  test("KMV union identity: bottomK(A∪B) from the two sketches") {
    // ground truth: bottom-4 of the union of the RAW sets equals the
    // bottom-4 of the union of the two bottom-4 sketches
    val rawA = Seq("03", "10", "22", "31", "44", "57")
    val rawB = Seq("01", "10", "25", "31", "48", "66")
    val agg = new OverlapSketch.BottomK(4)
    def sk(xs: Seq[String]) =
      xs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val fromSketches = agg.merge(sk(rawA), sk(rawB)).hashes
    val exact = (rawA ++ rawB).distinct.sorted.take(4)
    assert(fromSketches == exact)
  }

  test("estimates converge to the exact Jaccard on block overlap") {
    // two sources sharing half their shingle space; k large relative
    // to the universe makes the estimate near-exact
    def doc(src: String, i: Int, shared: Boolean) = {
      val words =
        if (shared) (0 to 8).map(j => s"common${(i + j) % 40}")
        else (0 to 8).map(j => s"$src${(i + j) % 40}")
      (src, words.mkString(" "))
    }
    val docs = ((1 to 40).map(i => doc("a", i, shared = i % 2 == 0)) ++
      (1 to 40).map(i => doc("b", i, shared = i % 2 == 0)))
      .toDF("source", "text")
    val est = OverlapSketch.sourceOverlap(docs, k = 512)
      .select("j_est").as[Double].head()
    // exact: shared shingles identical, own shingles disjoint
    val sh = docs.select(col("source"),
      explode(graft.text.Text.wordShingles(col("text"), 3)).as("s"))
      .distinct().as[(String, String)].collect()
    val (sa, sb) = (sh.filter(_._1 == "a").map(_._2).toSet,
      sh.filter(_._1 == "b").map(_._2).toSet)
    val exact = (sa & sb).size.toDouble / (sa | sb).size
    assert(math.abs(est - exact) < 0.05, s"est=$est exact=$exact")
  }

  test("containment is asymmetric: a subset source scores c_ab 1.0") {
    val small = (1 to 6).map(i =>
      ("a", s"shared alpha beta gamma token$i tail words here"))
    val big = (1 to 6).map(i =>
      ("b", s"shared alpha beta gamma token$i tail words here")) ++
      (1 to 20).map(i => ("b", s"extra b${i} filler b${i + 1} soup " +
        s"b${i + 2} only b${i + 3} words b${i + 4} here"))
    val out = OverlapSketch
      .sourceOverlap((small ++ big).toDF("source", "text"), k = 1024)
      .select("c_ab", "c_ba").as[(Double, Double)].head()
    // every a-shingle is in b (c_ab = 1.0); b has many extras
    assert(out._1 == 1.0 && out._2 < 1.0)
  }

  test("persisted registry: save, load, estimate against — no rescan") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("source"), col("text"))
    val k = 32
    val sk = OverlapSketch.sketchByKey(
      OverlapSketch.shingleHashes(docs, "source"), "source", "h", k)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sketchreg").toString + "/reg"
    OverlapSketch.saveSketches(sk, path, k)
    // wrong-k load refuses loudly
    intercept[IllegalArgumentException] {
      OverlapSketch.loadSketches(spark, path, 64)
    }
    // a NEW source that is a copy of src0's docs must show high
    // containment against stored src0 and appear only in new-vs-stored
    // pairs
    val incoming = docs.filter(col("source") === "src0")
      .select(lit("newsrc").as("source"), col("text"))
    val est = OverlapSketch.overlapAgainst(incoming, path, k).cache()
    val keys = est.select("key_a", "key_b")
      .as[(String, String)].collect()
    assert(keys.forall(p => p._1 == "newsrc" || p._2 == "newsrc"))
    assert(keys.length == 20) // one pair per stored source
    val vsSrc0 = est.filter(col("key_a") === "newsrc" &&
      col("key_b") === "src0").select("j_est").as[Double].head()
    assert(vsSrc0 == 1.0, s"identical content must estimate J=1: $vsSrc0")
    // key collision with the registry refuses loudly
    intercept[IllegalArgumentException] {
      OverlapSketch.overlapAgainst(
        docs.filter(col("source") === "src1"), path, k)
    }
    est.unpersist()
  }

  test("disjoint sources estimate zero overlap") {
    val docs = Seq(
      ("a", "one two three four five six seven eight"),
      ("b", "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("source", "text")
    val r = OverlapSketch.sourceOverlap(docs, k = 64)
      .select("n_common", "j_est").as[(Long, Double)].head()
    assert(r == ((0L, 0.0)))
  }
}
