package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-language-model subword tokenizer (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece `unigram` model):
  * the OTHER half of the production tokenizer space beside [[Bpe]].
  * Where BPE composes greedily from learned merges, the unigram model
  * holds a PROBABILITY per piece and segments each word as the
  * max-likelihood piece sequence (Viterbi over the word lattice).
  *
  * ==The 100-TB shape (the [[Bpe]] contract)==
  * Training never iterates over the corpus: the distributed stage is
  * the same ONE corpus-scale aggregation ([[Bpe.wordCounts]] —
  * groupBy(word).count), and seeding/EM/pruning run on the compact
  * word-frequency dictionary behind the same explicit
  * `driverWordLimit` guard. Encoding is embarrassingly parallel: the
  * piece table (a few thousand (piece, logp) entries) ships to
  * executors once; each text encodes independently with the same
  * per-task memo as BPE.
  *
  * ==Deviations from the published trainer (documented)==
  *  - HARD EM: the E-step counts pieces along each word's single
  *    Viterbi path instead of full-lattice expected counts — the
  *    standard practical simplification; with exact long word counts
  *    it is fully deterministic.
  *  - Usage pruning: after each EM round the vocabulary keeps the
  *    `vocabSize` most-used pieces (single characters always survive,
  *    so every word stays encodable) instead of the published
  *    loss-delta ranking. Ties break lexicographically.
  *  - Probabilities use `StrictMath.log` (bit-deterministic across
  *    JVMs) over exact long counts; Viterbi prefers HIGHER logp, then
  *    FEWER pieces, then the lexicographically smaller piece — no
  *    float tie ever decides alone, so the committed golden is
  *    engine-stable. No SQL form exists for the lattice recursion →
  *    rows-only driver check + sf0.01 golden (the [[Bpe]] posture).
  */
object Unigram {

  /** Learned model: piece → log probability. */
  final case class UnigramModel(logp: Map[String, Double]) {
    require(logp.nonEmpty, "empty unigram vocabulary")
  }

  /** Train from a `(word, n)` dictionary frame (driver-bounded, the
    * [[Bpe.learnBpe]] contract). */
  def learn(wordCounts: DataFrame, vocabSize: Int,
            maxPieceLen: Int = 6, emRounds: Int = 2,
            seedSize: Int = 20000,
            driverWordLimit: Long = 2000000L): UnigramModel = {
    val n = wordCounts.count()
    require(n <= driverWordLimit,
      s"dictionary has $n distinct words > driverWordLimit " +
        s"$driverWordLimit; cap it by frequency upstream")
    val dict = wordCounts
      .select(col("word").cast("string"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, vocabSize, maxPieceLen, emRounds, seedSize)
  }

  /** Pure driver-side seeding + hard-EM + pruning over an in-memory
    * dictionary — split out for direct spec coverage. */
  private[text] def learnFromDict(dict: Array[(String, Long)],
                                  vocabSize: Int, maxPieceLen: Int,
                                  emRounds: Int, seedSize: Int)
      : UnigramModel = {
    require(vocabSize > 0 && maxPieceLen > 0 && seedSize > 0)
    // ---- seed: all substrings up to maxPieceLen by corpus count;
    // single characters always in (encodability invariant)
    val subCounts = mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          // code-point safety: never split a surrogate pair
          if (!Character.isLowSurrogate(w.charAt(i)) &&
              (i + l >= w.length || !Character.isLowSurrogate(w.charAt(i + l)))) {
            val s = w.substring(i, i + l)
            subCounts(s) = subCounts.getOrElse(s, 0L) + c
          }
          l += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(s =>
      s.codePointCount(0, s.length) == 1).toSet
    val seeded: Map[String, Long] =
      if (subCounts.size <= seedSize) subCounts.toMap
      else {
        val top = subCounts.toSeq
          .sortBy { case (s, c) => (-c, s) }.take(seedSize).toMap
        top ++ chars.map(c => c -> subCounts(c))
      }
    // ---- hard EM rounds: Viterbi count → re-estimate → prune.
    // `emRounds` is the EXACT number of Viterbi-count/prune passes
    // (the first pass runs against the raw seed model).
    var counts: Map[String, Long] = seeded
    var round = 0
    while (round < emRounds) {
      val model = toModel(counts)
      val used = mutable.HashMap.empty[String, Long]
      dict.foreach { case (w, c) =>
        viterbi(w, model.logp, maxPieceLen).foreach { p =>
          used(p) = used.getOrElse(p, 0L) + c
        }
      }
      // pieces never used on any Viterbi path die (unless single-char);
      // then keep the vocabSize most-used + all single chars
      val survivors = used.toSeq.sortBy { case (s, c) => (-c, s) }
        .take(vocabSize).map(_._1).toSet ++ chars
      counts = survivors.iterator
        .map(s => s -> math.max(used.getOrElse(s, 0L), 1L)).toMap
      round += 1
    }
    toModel(counts)
  }

  private def toModel(counts: Map[String, Long]): UnigramModel = {
    val total = counts.valuesIterator.sum.toDouble
    UnigramModel(counts.map { case (s, c) =>
      s -> StrictMath.log(c.toDouble / total)
    })
  }

  /** Max-likelihood segmentation of one word: forward Viterbi over
    * positions; ties on logp prefer fewer pieces, then the
    * lexicographically smaller piece ending at the position. Falls
    * back to per-character pieces with a floor logp for characters
    * outside the vocabulary (unknown-character robustness — an
    * encode must never fail). */
  private[text] def viterbi(word: String, logp: Map[String, Double],
                            maxPieceLen: Int): List[String] = {
    val n = word.length
    if (n == 0) return Nil
    val UnkLogp = -1e3 // far below any real piece; still finite
    val bestLp = new Array[Double](n + 1)
    val bestLen = new Array[Int](n + 1) // pieces used to reach i
    val bestBack = new Array[Int](n + 1) // start of the last piece
    java.util.Arrays.fill(bestLp, Double.NegativeInfinity)
    bestLp(0) = 0.0
    var i = 1
    while (i <= n) {
      var from = math.max(0, i - maxPieceLen)
      // never start on a low surrogate
      while (i - from >= 1) {
        if (bestLp(from) != Double.NegativeInfinity &&
            !Character.isLowSurrogate(word.charAt(from)) &&
            (i >= n || !Character.isLowSurrogate(word.charAt(i)))) {
          val piece = word.substring(from, i)
          val lp = logp.get(piece) match {
            case Some(v) => v
            case None =>
              // unknown fallback only for single code points
              if (piece.codePointCount(0, piece.length) == 1) UnkLogp
              else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val cand = bestLp(from) + lp
            val candLen = bestLen(from) + 1
            val better = cand > bestLp(i) ||
              (cand == bestLp(i) && (candLen < bestLen(i) ||
                (candLen == bestLen(i) && bestBack(i) >= 0 &&
                  piece < word.substring(bestBack(i), i))))
            if (bestLp(i) == Double.NegativeInfinity || better) {
              bestLp(i) = cand; bestLen(i) = candLen; bestBack(i) = from
            }
          }
        }
        from += 1
      }
      i += 1
    }
    // reconstruct
    var out = List.empty[String]
    var at = n
    while (at > 0) {
      val s = bestBack(at)
      out = word.substring(s, at) :: out
      at = s
    }
    out
  }

  /** Subword piece array of a text column under a learned model —
    * the [[Bpe.bpeTokens]] UDF shape (justified: the lattice
    * recursion has no Column form; the piece table rides the closure;
    * a per-task memo collapses the Zipfian word distribution). */
  def unigramTokens(text: Column, model: UnigramModel): Column = {
    val f = udf(new MemoizedSegmenter(model.logp))
    f(text)
  }

  /** Piece count — the headline budgeting number. */
  def unigramTokenCount(text: Column, model: UnigramModel): Column =
    size(unigramTokens(text, model))

  private final class MemoizedSegmenter(logp: Map[String, Double])
      extends (String => Array[String]) with Serializable {
    private val maxLen =
      if (logp.isEmpty) 1 else logp.keysIterator.map(_.length).max
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[String]]()
    def apply(s: String): Array[String] =
      if (s == null) null
      else Bpe.tokenizeString(s).flatMap { w =>
        var v = memo.get(w)
        if (v == null) {
          // byte fallback (SentencePiece byte_fallback): a Viterbi
          // piece outside the vocabulary (the unknown-single-code-
          // point fallback) expands to its UTF-8 byte pieces — total
          // encodability, no out-of-vocabulary symbol downstream
          v = viterbi(w, logp, maxLen).iterator.flatMap { p =>
            if (logp.contains(p)) Iterator.single(p)
            else ByteFallback.pieces(p).iterator
          }.toArray
          if (memo.size < 100000) memo.put(w, v)
        }
        v
      }
  }
}
