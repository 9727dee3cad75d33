package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer ([[Unigram]]): Viterbi closed forms,
  * tie-break ladder, unknown-character fallback, encodability
  * invariant, determinism, and the Spark encode surface. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lp(pairs: (String, Double)*): Map[String, Double] =
    pairs.toMap.map { case (k, v) => k -> StrictMath.log(v) }

  test("viterbi: one likely piece beats its char decomposition") {
    val m = lp("ab" -> 0.25, "a" -> 0.25, "b" -> 0.25, "c" -> 0.25)
    assert(Unigram.viterbi("ab", m, 2) == List("ab"))
    assert(Unigram.viterbi("cab", m, 2) == List("c", "ab"))
  }

  test("viterbi: char path wins when the long piece is rare enough") {
    // p(ab) < p(a)*p(b) → decompose
    val m = lp("ab" -> 0.01, "a" -> 0.5, "b" -> 0.45)
    assert(Unigram.viterbi("ab", m, 2) == List("a", "b"))
  }

  test("viterbi: equal likelihood prefers fewer pieces") {
    // p(ab) == p(a)*p(b) exactly on the 0.5/0.5 grid? use powers of 2:
    // p(ab)=1/4, p(a)=p(b)=1/2 → log(1/4) == log(1/2)+log(1/2) exactly
    val m = lp("ab" -> 0.25, "a" -> 0.5, "b" -> 0.5)
    assert(Unigram.viterbi("ab", m, 2) == List("ab"))
  }

  test("viterbi: unknown single characters fall back, never fail") {
    val m = lp("a" -> 1.0)
    assert(Unigram.viterbi("axa", m, 1) == List("a", "x", "a"))
    assert(Unigram.viterbi("", m, 1) == Nil)
  }

  test("learn: every dictionary word round-trips; training is " +
       "deterministic") {
    val dict = Array(("hello", 50L), ("help", 30L), ("world", 20L),
      ("word", 10L), ("held", 5L))
    val m1 = Unigram.learnFromDict(dict, vocabSize = 20,
      maxPieceLen = 4, emRounds = 2, seedSize = 200)
    val m2 = Unigram.learnFromDict(dict, vocabSize = 20,
      maxPieceLen = 4, emRounds = 2, seedSize = 200)
    assert(m1.logp == m2.logp)
    val maxLen = m1.logp.keysIterator.map(_.length).max
    dict.foreach { case (w, _) =>
      val pieces = Unigram.viterbi(w, m1.logp, maxLen)
      assert(pieces.mkString == w, s"round-trip broke on $w: $pieces")
    }
    // single characters always survive pruning
    assert("helowrd".forall(c => m1.logp.contains(c.toString)))
  }

  test("byte fallback: arbitrary unicode (incl. astral plane) " +
       "round-trips through the spark surface, every piece " +
       "in-vocabulary") {
    import spark.implicits._
    val dict = Array(("hello", 50L), ("help", 30L), ("world", 20L))
    val model = Unigram.learnFromDict(dict, vocabSize = 20,
      maxPieceLen = 4, emRounds = 2, seedSize = 200)
    val rnd = new scala.util.Random(20260815)
    def randText(): String = (0 until 1 + rnd.nextInt(4)).map { _ =>
      (0 until 1 + rnd.nextInt(8)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => "äöüßéñ漢字한".charAt(rnd.nextInt(9)).toString
          case 2 => new String(Character.toChars(0x1F600 + rnd.nextInt(80)))
          case _ => new String(Character.toChars(0x0915 + rnd.nextInt(32)))
        }
      }.mkString
    }.mkString(" ")
    val texts = Seq.fill(150)(randText()) :+ "hello 😀😀 world"
    val got = texts.toDF("text")
      .select(col("text"),
        Unigram.unigramTokens(col("text"), model).as("pieces"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (text, pieces) =>
      pieces.foreach(p => assert(
        model.logp.contains(p) || ByteFallback.isBytePiece(p),
        s"out-of-vocabulary piece '$p' for '$text'"))
      // decode inverse: pieces reassemble the tokenized text exactly
      val expected = Bpe.tokenizeString(text).mkString
      assert(ByteFallback.decode(pieces) == expected,
        s"round-trip failed for '$text': $pieces")
    }
  }

  test("spark surface: piece counts bounded by chars and words") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(60)
    val model = Unigram.learn(Bpe.wordCounts(docs), vocabSize = 150)
    val rows = docs.select(
        size(Text.tokenize(col("text"))).as("words"),
        Unigram.unigramTokenCount(col("text"), model).as("pieces"),
        length(regexp_replace(col("text"), "\\s", "")).as("chars"))
      .as[(Int, Int, Int)].collect()
    rows.foreach { case (words, pieces, chars) =>
      assert(pieces >= words, s"fewer pieces than words: $pieces < $words")
      assert(pieces <= chars, s"more pieces than chars: $pieces > $chars")
    }
    // the learned model actually compresses: strictly fewer pieces
    // than characters in aggregate
    val (w, p, c) = rows.foldLeft((0L, 0L, 0L)) { case ((a, b, d), r) =>
      (a + r._1, b + r._2, d + r._3) }
    assert(p < c, s"no compression at all: pieces=$p chars=$c")
  }
}
