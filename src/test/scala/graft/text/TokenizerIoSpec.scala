package graft.text

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer save/load: exact model round trips (incl. bit-identical
  * unigram log-probs), deterministic files, family mismatch refusal. */
class TokenizerIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dict() = Bpe.wordCounts(
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick dog naps"),
        (3L, "brown foxes jump quickly"))
      .toDF("doc_id", "text"))

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-tokio").toString + s"/$name.json"

  test("BPE model round-trips exactly; encodes identically") {
    val m = Bpe.learnBpe(dict(), numMerges = 20, minPairCount = 1L)
    val p = tmp("bpe")
    TokenizerIo.saveBpe(m, p)
    val loaded = TokenizerIo.loadBpe(p)
    assert(loaded == m)
    assert(Bpe.encodeWord("quickly", loaded.ranks, loaded.alphabet)
      .toSeq == Bpe.encodeWord("quickly", m.ranks, m.alphabet).toSeq)
  }

  test("unigram model round-trips with BIT-identical log-probs") {
    val m = Unigram.learn(dict(), vocabSize = 60)
    val p = tmp("uni")
    TokenizerIo.saveUnigram(m, p)
    val loaded = TokenizerIo.loadUnigram(p)
    assert(loaded.logp.keySet == m.logp.keySet)
    m.logp.foreach { case (piece, lp) =>
      assert(java.lang.Double.doubleToLongBits(loaded.logp(piece)) ==
        java.lang.Double.doubleToLongBits(lp),
        s"log-prob of '$piece' drifted through JSON")
    }
  }

  test("WordPiece model round-trips exactly") {
    val m = WordPiece.learnFromDict(
      Array(("hug", 10L), ("pug", 5L), ("hugs", 5L)),
      vocabSize = 30, minPairCount = 1L)
    val p = tmp("wp")
    TokenizerIo.saveWordPiece(m, p)
    assert(TokenizerIo.loadWordPiece(p) == m)
  }

  test("saving the same model twice yields byte-identical files; " +
    "family mismatch refuses loudly") {
    val m = Bpe.learnBpe(dict(), numMerges = 10, minPairCount = 1L)
    val (p1, p2) = (tmp("a"), tmp("b"))
    TokenizerIo.saveBpe(m, p1)
    TokenizerIo.saveBpe(m, p2)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Paths.get(p1)),
      Files.readAllBytes(java.nio.file.Paths.get(p2))))
    intercept[IllegalArgumentException] { TokenizerIo.loadUnigram(p1) }
  }
}
