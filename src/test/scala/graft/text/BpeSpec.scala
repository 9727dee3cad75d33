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
       "unseen characters survive as singletons (no alphabet) or byte " +
       "pieces (model alphabet)") {
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
    // with the model's alphabet, out-of-alphabet characters become
    // byte pieces ('z' never occurs in the Sennrich dict) — and the
    // decode inverse recovers the word exactly
    val fb = Bpe.encodeWord("oz", model.ranks, model.alphabet)
    assert(fb.toSeq == Seq("o", "<0x7A>", Bpe.EndOfWord))
    assert(ByteFallback.decode(fb.toSeq) == "oz" + Bpe.EndOfWord)
  }

  test("byte fallback: arbitrary unicode (incl. astral plane) " +
       "round-trips, every output symbol is in-vocabulary") {
    val model = Bpe.learnFromDict(sennrich, numMerges = 10,
                                  minPairCount = 2L)
    val vocab: Set[String] = model.alphabet ++
      ByteFallback.Inventory ++ Seq(Bpe.EndOfWord) ++
      model.merges.map { case (a, b) => a + b }
    val rnd = new scala.util.Random(20260815)
    def randWord(): String = (0 until 1 + rnd.nextInt(12)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar.toString
        case 1 => "äöüßéñ漢字한".charAt(rnd.nextInt(9)).toString
        case 2 => new String(Character.toChars(0x1F600 + rnd.nextInt(80)))
        case _ => new String(Character.toChars(0x0915 + rnd.nextInt(32)))
      }
    }.mkString
    (0 until 300).foreach { _ =>
      val w = randWord()
      val toks = Bpe.encodeWord(w, model.ranks, model.alphabet)
      toks.foreach(t => assert(vocab.contains(t),
        s"out-of-vocabulary symbol '$t' for word '$w'"))
      assert(ByteFallback.decode(toks.toSeq) == w + Bpe.EndOfWord,
        s"round-trip failed for '$w': ${toks.toSeq}")
    }
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
