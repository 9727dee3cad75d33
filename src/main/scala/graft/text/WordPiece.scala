package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** WordPiece — the third production tokenizer family (BERT's;
  * Schuster & Nakajima, "Japanese and Korean Voice Search", ICASSP
  * 2012), completing the trio next to [[Bpe]] (GPT lineage) and
  * [[Unigram]] (SentencePiece lineage). Training is BPE-shaped merge
  * learning, but pairs are chosen by LIKELIHOOD gain
  * `count(ab) / (count(a)·count(b))` rather than raw frequency — the
  * merge that most increases corpus likelihood under a unigram piece
  * model. Encoding is greedy longest-match-first with the `##`
  * continuation prefix.
  *
  * ==The 100-TB shape==
  * Identical to [[Bpe]]: the distributed stage is ONE corpus-scale
  * `groupBy(word).count` ([[Bpe.wordCounts]] is shared verbatim);
  * merge learning runs on the driver-sized word dictionary behind the
  * same `driverWordLimit` guard; encoding ships the piece vocabulary
  * (KBs) in the closure and every text encodes independently with the
  * per-task word→pieces memo.
  *
  * ==Determinism==
  * No seed, no float: likelihood scores are compared as exact
  * cross-multiplied BigInt fractions; ties break on higher pair
  * count, then the lexicographically smallest pair. Same dictionary ⇒
  * same vocabulary on any engine — golden-pinnable like the other two
  * tokenizers (no SQL oracle can express the merge recursion).
  *
  * ==Byte fallback (total encodability)==
  * Where BERT emits `[UNK]` — a word with an out-of-alphabet
  * character, or longer than `maxInputChars` — this encoder emits the
  * word's [[ByteFallback]] UTF-8 byte pieces instead, keeping the
  * round-14/15 contract that no text ever collapses to UNK mass
  * (token budgets stay honest for rare scripts). The whole word falls
  * back, mirroring BERT's whole-word `[UNK]` granularity.
  */
object WordPiece {

  /** Continuation prefix for non-initial pieces (the BERT `##`). */
  val Continuation = "##"

  /** `vocab` = every piece the greedy matcher may emit (alphabet
    * pieces + learned merges); `merges` records learned pieces in
    * learning order (inspection/spec surface, not used to encode);
    * `alphabet` = the training dictionary's code-point inventory
    * (chars outside it trigger the byte fallback). */
  final case class WordPieceModel(vocab: Set[String],
                                  merges: Vector[String],
                                  alphabet: Set[String],
                                  maxInputChars: Int = 100)

  /** Learn a WordPiece vocabulary of (at most) `vocabSize` pieces from
    * a (word, n) dictionary frame ([[Bpe.wordCounts]] output). The
    * count includes the alphabet pieces — the standard accounting, so
    * `vocabSize` is the size of the token→id map a consumer builds.
    * Stops early when the best pair's count falls below
    * `minPairCount`. */
  def learn(wordCounts: DataFrame, vocabSize: Int,
            minPairCount: Long = 2L,
            driverWordLimit: Long = 2000000L): WordPieceModel = {
    val n = wordCounts.count()
    require(n <= driverWordLimit,
      s"dictionary has $n distinct words > driverWordLimit " +
        s"$driverWordLimit; cap it by frequency upstream")
    val dict = wordCounts
      .select(col("word").cast("string"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, vocabSize, minPairCount)
  }

  /** Pure driver-side likelihood-merge loop — split out for direct
    * spec coverage. */
  private[text] def learnFromDict(dict: Array[(String, Long)],
                                  vocabSize: Int,
                                  minPairCount: Long): WordPieceModel = {
    val words = dict.map { case (w, c) => (wpSyms(w), c) }
    val alphabet = dict.iterator.flatMap(w =>
      Bpe.codePointSyms(w._1)).toSet
    // base pieces: every initial/continuation symbol of the dictionary
    val basePieces = words.iterator.flatMap(_._1).toSet
    val vocab = mutable.LinkedHashSet.empty[String]
    basePieces.toSeq.sorted.foreach(vocab += _)
    val merges = Vector.newBuilder[String]
    var done = vocab.size >= vocabSize
    while (!done) {
      // one pass: adjacent-pair counts AND current unigram piece
      // counts (the likelihood denominator), both weighted by word
      // frequency under the CURRENT segmentation
      val pairCnt = mutable.HashMap.empty[(String, String), Long]
      val symCnt = mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCnt.update(p, pairCnt.getOrElse(p, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        // argmax of count(ab)/(count(a)*count(b)) — exact fraction
        // compare via BigInt cross-multiplication (no float anywhere);
        // ties: higher raw count, then lexicographically smallest pair
        var best: (String, String) = null
        var bestCnt = 0L
        pairCnt.foreach { case (p, c) =>
          val better =
            if (best == null) true
            else {
              val l = BigInt(c) * BigInt(symCnt(best._1)) *
                BigInt(symCnt(best._2))
              val r = BigInt(bestCnt) * BigInt(symCnt(p._1)) *
                BigInt(symCnt(p._2))
              if (l != r) l > r
              else if (c != bestCnt) c > bestCnt
              else if (p._1 != best._1) p._1 < best._1
              else p._2 < best._2
            }
          if (better) { best = p; bestCnt = c }
        }
        if (bestCnt < minPairCount) done = true
        else {
          val merged = best._1 + best._2.stripPrefix(Continuation)
          vocab += merged
          merges += merged
          var wi = 0
          while (wi < words.length) {
            words(wi) = (mergeWpPair(words(wi)._1, best, merged),
              words(wi)._2)
            wi += 1
          }
          if (vocab.size >= vocabSize) done = true
        }
      }
    }
    WordPieceModel(vocab.toSet, merges.result(), alphabet)
  }

  /** WordPiece symbol sequence of a word: first code point bare, the
    * rest `##`-prefixed (surrogate-pair safe via
    * [[Bpe.codePointSyms]]). */
  private[text] def wpSyms(w: String): Array[String] = {
    val cps = Bpe.codePointSyms(w)
    cps.zipWithIndex.map { case (s, i) =>
      if (i == 0) s else Continuation + s }
  }

  private def mergeWpPair(syms: Array[String], pair: (String, String),
                          merged: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 &&
          syms(i + 1) == pair._2) {
        out += merged
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Greedy longest-match-first encode of one word (the BERT
    * WordPiece matcher): at each position take the LONGEST vocab
    * piece (`##`-prefixed when not word-initial). Out-of-alphabet
    * characters or over-length words fall back to byte pieces for
    * the WHOLE word (where BERT would emit `[UNK]`). */
  private[text] def encodeWord(word: String,
                               model: WordPieceModel): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.codePointCount(0, word.length) > model.maxInputChars)
      return ByteFallback.pieces(word)
    val out = mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val cand =
          if (start == 0) word.substring(start, end)
          else Continuation + word.substring(start, end)
        if (model.vocab.contains(cand)) found = cand
        else {
          // step back one CODE POINT, not one char
          end -= Character.charCount(word.codePointBefore(end))
        }
      }
      if (found == null) return ByteFallback.pieces(word)
      out += found
      start = end
    }
    out.toArray
  }

  /** Inverse of [[encodeWord]] for one word's pieces: byte-piece runs
    * UTF-8-decode, `##` prefixes strip, pieces concatenate. */
  def decodeWord(tokens: Seq[String]): String =
    ByteFallback.decode(tokens.map(t =>
      if (t.startsWith(Continuation) && !ByteFallback.isBytePiece(t))
        t.substring(Continuation.length)
      else t))

  /** WordPiece token array of a text column — same justified-UDF
    * shape as [[Bpe.bpeTokens]] (data-dependent longest-match loop;
    * vocabulary rides the closure; per-task word→pieces memo
    * collapses the Zipfian distribution). */
  def wordpieceTokens(text: Column, model: WordPieceModel): Column = {
    val f = udf(new MemoizedEncoder(model))
    f(text)
  }

  /** Learned-WordPiece token count per text. */
  def wordpieceTokenCount(text: Column, model: WordPieceModel): Column =
    size(wordpieceTokens(text, model))

  /** Per-task-memoized encode closure (the [[Bpe]] MemoizedEncoder
    * contract: `@transient lazy` memo = fresh per deserialization,
    * bounded at 100k entries). */
  private final class MemoizedEncoder(model: WordPieceModel)
      extends (String => Array[String]) with Serializable {
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[String]]()
    def apply(s: String): Array[String] =
      if (s == null) null
      else Bpe.tokenizeString(s).flatMap { w =>
        var v = memo.get(w)
        if (v == null) {
          v = encodeWord(w, model)
          if (memo.size < 100000) memo.put(w, v)
        }
        v
      }
  }
}
