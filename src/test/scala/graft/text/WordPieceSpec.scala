package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece: likelihood-driven merge selection, greedy
  * longest-match encode, byte fallback, round trips. */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("likelihood beats raw frequency: the exclusive pair merges " +
    "before the frequent-but-promiscuous one") {
    // pair (a,##b) occurs 100x but a and ##b each occur 100x
    // -> score 100/(100*100) = 0.01; pair (x,##y) occurs only 5x but
    // exclusively -> 5/(5*5) = 0.2. WordPiece must merge xy first
    // (frequency-scored BPE would pick ab).
    val dict = Array(("ab", 100L), ("xy", 5L))
    val m = WordPiece.learnFromDict(dict, vocabSize = 100,
      minPairCount = 2L)
    assert(m.merges.take(2) == Vector("xy", "ab"),
      s"merge order was ${m.merges}")
    val bpe = Bpe.learnFromDict(dict, numMerges = 1, minPairCount = 2L)
    assert(bpe.merges.head == (("a", "b</w>")) ||
      bpe.merges.head._1 == "a", "control: BPE picks the frequent pair")
  }

  test("greedy longest-match-first with ## continuation") {
    val vocab = Set("un", "##able", "u", "n", "##n", "a", "##a",
      "##b", "##l", "##e", "unab")
    val m = WordPiece.WordPieceModel(vocab, Vector.empty,
      alphabet = Set("u", "n", "a", "b", "l", "e"))
    // longest word-initial match is "unab" (4 chars) over "un" (2)
    assert(WordPiece.encodeWord("unable", m).toSeq ==
      Seq("unab", "##l", "##e"))
    // without "unab": "un" + "##able"
    val m2 = m.copy(vocab = vocab - "unab")
    assert(WordPiece.encodeWord("unable", m2).toSeq ==
      Seq("un", "##able"))
  }

  test("byte fallback: out-of-alphabet and over-length words encode " +
    "as byte pieces and round-trip exactly") {
    val dict = Array(("hello", 10L), ("world", 5L))
    val m = WordPiece.learnFromDict(dict, vocabSize = 50,
      minPairCount = 1L)
    // in-alphabet word encodes to real pieces that decode back
    val he = WordPiece.encodeWord("hello", m)
    assert(he.nonEmpty && WordPiece.decodeWord(he.toSeq) == "hello")
    // out-of-alphabet (astral plane) -> byte pieces, exact round trip
    val astral = "h😀llo" // 😀
    val fb = WordPiece.encodeWord(astral, m)
    assert(fb.forall(ByteFallback.isBytePiece))
    assert(WordPiece.decodeWord(fb.toSeq) == astral)
    // over-length word -> byte pieces
    val long = "a" * 101
    val lb = WordPiece.encodeWord(long, m.copy(maxInputChars = 100))
    assert(lb.forall(ByteFallback.isBytePiece))
    assert(WordPiece.decodeWord(lb.toSeq) == long)
  }

  test("column encode: counts are stable and every piece is " +
    "in-vocabulary or a byte piece") {
    val docs = Seq(
      (1L, "the merge table scans fast"),
      (2L, "the fast table merge"),
      (3L, "unseen zebras graze 😀")).toDF("doc_id", "text")
    val m = WordPiece.learn(Bpe.wordCounts(docs), vocabSize = 60,
      minPairCount = 1L)
    val toks = docs.select(WordPiece.wordpieceTokens(
        org.apache.spark.sql.functions.col("text"), m).as("t"))
      .collect().flatMap(_.getSeq[String](0))
    assert(toks.forall(t =>
      m.vocab.contains(t) || ByteFallback.isBytePiece(t)),
      s"out-of-vocab piece in ${toks.mkString(",")}")
    val counts = docs.select(WordPiece.wordpieceTokenCount(
        org.apache.spark.sql.functions.col("text"), m).as("n"))
      .collect().map(_.getInt(0))
    assert(counts.forall(_ > 0))
    // determinism: learning again from the same dict yields the model
    val m2 = WordPiece.learn(Bpe.wordCounts(docs), vocabSize = 60,
      minPairCount = 1L)
    assert(m2.vocab == m.vocab && m2.merges == m.merges)
  }

  test("vocabSize bounds the vocabulary; learning stops at the cap") {
    val dict = Array(("aaaa", 50L), ("aaab", 30L), ("aabb", 20L))
    val cap = 6
    val m = WordPiece.learnFromDict(dict, vocabSize = cap,
      minPairCount = 1L)
    assert(m.vocab.size <= cap, s"${m.vocab.size} pieces > cap $cap")
  }
}
