package graft.text

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sennrich: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnFromDict reproduces the classic Sennrich merges with " +
       "lexicographic tie-breaks") {
    val model = Bpe.learnFromDict(sennrich, numMerges = 3,
                                  minPairCount = 2L)
    // pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie → lexicographic
    // smallest ("e","s") wins; then (es,t)=9; then (est,</w>)=9
    assert(model.merges == Vector(("e", "s"), ("es", "t"),
                                  ("est", Bpe.EndOfWord)))
  }

  test("minPairCount stops learning; numMerges caps it") {
    val m = Bpe.learnFromDict(sennrich, numMerges = 1000,
                              minPairCount = 4L)
    // every surviving merge occurred ≥ 4 times in the weighted dict
    assert(m.merges.nonEmpty && m.merges.size < 1000)
    val capped = Bpe.learnFromDict(sennrich, numMerges = 2,
                                   minPairCount = 2L)
    assert(capped.merges.size == 2)
  }

  test("encodeWord: tokens concatenate back to the word + end marker, " +
       "unseen characters survive as singletons") {
    val model = Bpe.learnFromDict(sennrich, numMerges = 10,
                                  minPairCount = 2L)
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "zzz")) {
      val toks = Bpe.encodeWord(w, model.ranks)
      assert(toks.mkString == w + Bpe.EndOfWord,
        s"$w round-trip failed: ${toks.toSeq}")
    }
    // "lowest": "est</w>" learned from newest/widest applies to an
    // UNSEEN word — the whole point of subword units
    val toks = Bpe.encodeWord("lowest", model.ranks)
    assert(toks.contains("est" + Bpe.EndOfWord) ||
           toks.mkString.endsWith("est" + Bpe.EndOfWord))
  }

  test("more merges never increase the token count; zero merges = " +
       "character count + one end marker per word") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(100).cache()
    val wc = Bpe.wordCounts(docs)
    val m0 = Bpe.BpeModel(Vector.empty)
    val m50 = Bpe.learnBpe(wc, numMerges = 50)
    val m200 = Bpe.learnBpe(wc, numMerges = 200)
    val counted = docs.select(
      Bpe.bpeTokenCount(col("text"), m0).as("c0"),
      Bpe.bpeTokenCount(col("text"), m50).as("c50"),
      Bpe.bpeTokenCount(col("text"), m200).as("c200"),
      Text.tokenCount(col("text")).as("words")).cache()
    assert(counted.filter(col("c50") > col("c0")).count() == 0)
    assert(counted.filter(col("c200") > col("c50")).count() == 0)
    assert(counted.filter(col("c200") < col("words")).count() == 0,
      "BPE can never produce fewer tokens than whole words")
    // and the no-merge model is exactly chars-per-word + one marker
    val chk = docs.select(
      Bpe.bpeTokenCount(col("text"), m0).as("c0"),
      aggregate(Text.tokenize(col("text")), lit(0),
        (acc, w) => acc + length(w) + 1).as("chars"))
    assert(chk.filter(col("c0") =!= col("chars")).count() == 0)
  }

  test("distributed wordCounts matches training semantics: encode of " +
       "every dictionary word round-trips") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("text")).limit(50)
    val wc = Bpe.wordCounts(docs)
    val model = Bpe.learnBpe(wc, numMerges = 100)
    val words = wc.select(col("word")).collect().map(_.getString(0))
    words.foreach { w =>
      assert(Bpe.encodeWord(w, model.ranks).mkString ==
        w + Bpe.EndOfWord)
    }
  }

  test("driverWordLimit guards the collect") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("text"))
    val wc = Bpe.wordCounts(docs)
    val e = intercept[IllegalArgumentException] {
      Bpe.learnBpe(wc, numMerges = 5, driverWordLimit = 3L)
    }
    assert(e.getMessage.contains("driverWordLimit"))
  }
}
