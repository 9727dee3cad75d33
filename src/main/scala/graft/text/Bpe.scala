package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Learned byte-pair encoding (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the real
  * tokenizer behind [[Text.bpeTokenCount]]'s regex estimate.
  *
  * ==The 100-TB shape==
  * Training never iterates over the corpus. The distributed stage is
  * ONE aggregation — [[wordCounts]], a corpus-scale
  * groupBy(word).count — and merge learning then runs on the compact
  * word-frequency DICTIONARY (distinct words grow ~log with corpus
  * size; a 100-TB web corpus has a few tens of millions of distinct
  * words where it has 10¹³ tokens). This is exactly how production
  * tokenizer trainers (HuggingFace tokenizers, SentencePiece) are fed.
  * The dictionary is collected to the driver behind an explicit
  * `driverWordLimit` guard (the [[graft.dedup.Dedup.connectedComponents]]
  * contract: a driver-side stage must prove its input is driver-sized,
  * and fail loudly when it is not — cap the dictionary by frequency
  * upstream if a corpus genuinely exceeds it). Encoding is
  * embarrassingly parallel: the learned merge table (a few thousand
  * string pairs) ships to executors once, each text encodes
  * independently.
  *
  * ==Determinism==
  * No seed anywhere: pair counts are exact longs, and ties on count
  * break lexicographically on the pair. Same dictionary ⇒ same merges
  * on any engine, any partitioning — so the declared query is pinned
  * by a committed golden even though no SQL oracle can express the
  * merge recursion.
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): lets a merge distinguish
    * word-final from word-internal context, and makes decoding
    * (token concatenation → word boundaries) unambiguous. */
  val EndOfWord = "</w>"

  /** Learned merge table, in learning order; rank = position.
    * `alphabet` is the training dictionary's code-point inventory:
    * characters outside it encode as [[ByteFallback]] byte pieces
    * (total encodability — no out-of-vocabulary symbol ever reaches a
    * token→id map). An empty alphabet disables the fallback (raw
    * unknown characters pass through as their own symbols — the
    * pre-round-15 behavior, kept for closed-form specs). */
  final case class BpeModel(merges: Vector[(String, String)],
                            alphabet: Set[String] = Set.empty) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** The corpus-scale half of training: the word-frequency dictionary
    * under [[Text.tokenize]] semantics (lowercased, letter/digit runs).
    * One shuffle, map-side partial aggregation. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.tokenize(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from a (word, n) dictionary frame.
    * Stops early when the best remaining pair occurs fewer than
    * `minPairCount` times (weighted by word frequency). */
  def learnBpe(wordCounts: DataFrame, numMerges: Int,
               minPairCount: Long = 2L,
               driverWordLimit: Long = 2000000L): BpeModel = {
    val n = wordCounts.count()
    require(n <= driverWordLimit,
      s"dictionary has $n distinct words > driverWordLimit " +
        s"$driverWordLimit; cap it by frequency upstream")
    val dict = wordCounts.select(col("word").cast("string"), col("n")
        .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, numMerges, minPairCount)
  }

  /** Pure driver-side merge loop over an in-memory dictionary —
    * split out for direct spec coverage. */
  private[text] def learnFromDict(dict: Array[(String, Long)],
                                  numMerges: Int,
                                  minPairCount: Long): BpeModel = {
    // each word as its current symbol sequence (code points +
    // EndOfWord — code points, never UTF-16 chars: an astral-plane
    // character must be one symbol, not two broken surrogate halves)
    val words = dict.map { case (w, c) =>
      (codePointSyms(w) :+ EndOfWord, c)
    }
    val alphabet = dict.iterator.flatMap(w => codePointSyms(w._1)).toSet
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max by count; ties break on the LEXICOGRAPHICALLY SMALLEST
        // pair — full determinism with no seed
        val (best, bestN) = counts.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        if (bestN < minPairCount) done = true
        else {
          merges += best
          var wi = 0
          while (wi < words.length) {
            words(wi) = (mergePair(words(wi)._1, best), words(wi)._2)
            wi += 1
          }
          it += 1
        }
      }
    }
    BpeModel(merges.result(), alphabet)
  }

  /** Code-point symbol sequence of a word (surrogate-pair safe). */
  private[text] def codePointSyms(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  private def mergePair(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 &&
          syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word with the learned ranks: repeatedly merge the
    * lowest-rank adjacent pair present (the standard BPE apply loop —
    * greedy on LEARNING order, not position). With a non-empty
    * `alphabet`, code points outside it become [[ByteFallback]] byte
    * pieces BEFORE merging (they can never merge — no learned pair
    * names a byte piece — so every output symbol is in-vocabulary). */
  private[text] def encodeWord(word: String,
                               ranks: Map[(String, String), Int],
                               alphabet: Set[String] = Set.empty)
      : Array[String] = {
    val base =
      if (alphabet.isEmpty) codePointSyms(word)
      else codePointSyms(word).flatMap { s =>
        if (alphabet.contains(s)) Array(s) else ByteFallback.pieces(s)
      }
    var syms = base :+ EndOfWord
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms = syms.patch(bestIdx, Array(syms(bestIdx) + syms(bestIdx + 1)),
                          2)
        if (syms.length == 1) continue = false
      }
    }
    syms
  }

  /** Mirror of [[Text.tokenize]]'s Column semantics in plain Scala —
    * the encode UDF must see exactly the words training counted
    * (`\p{M}` kept inside runs since the round-14 multilingual
    * tokenizer change). */
  private[text] def tokenizeString(text: String): Array[String] =
    text.toLowerCase
      .replaceAll("[^\\p{L}\\p{M}\\p{Nd}]+", " ")
      .split(" ")
      .filter(_.nonEmpty)

  /** Subword token array of a text column under a learned model. The
    * UDF is the justified kind (SURVEY §2.8 ladder): the apply loop is
    * a data-dependent fixpoint no Column algebra expresses; the merge
    * table rides the closure (KBs), and a per-task memo collapses the
    * Zipfian word distribution — each distinct word in a partition is
    * encoded once, not once per occurrence. */
  def bpeTokens(text: Column, model: BpeModel): Column = {
    val f = udf(new MemoizedEncoder(model.ranks, model.alphabet))
    f(text)
  }

  /** The encode closure with its word→tokens memo. The memo is
    * `@transient lazy`, so every task-side DESERIALIZATION of the
    * closure gets its own fresh, empty map — per-task memoization
    * (one encode per distinct word per partition, collapsing the
    * Zipfian word distribution) that is inherently scoped to THIS
    * model and this task. A process-wide/thread-local cache here was
    * a real bug: two models in one session (e.g. comparing merge
    * depths, or curation training a fresh tokenizer after an ad-hoc
    * query) silently served each other's encodings — caught by the
    * suite when CurationSpec's 100-merge model poisoned BpeSpec's
    * zero-merge closed form. Bounded at 100k entries: beyond that the
    * map stops growing (hit rate is already captured; a pathological
    * partition of unique words must not balloon task memory). */
  private final class MemoizedEncoder(ranks: Map[(String, String), Int],
                                      alphabet: Set[String])
      extends (String => Array[String]) with Serializable {
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[String]]()
    def apply(s: String): Array[String] =
      if (s == null) null
      else tokenizeString(s).flatMap { w =>
        var v = memo.get(w)
        if (v == null) {
          v = encodeWord(w, ranks, alphabet)
          if (memo.size < 100000) memo.put(w, v)
        }
        v
      }
  }

  /** Learned-BPE token count — the exact form of
    * [[Text.bpeTokenCount]]'s estimate. */
  def bpeTokenCount(text: Column, model: BpeModel): Column =
    size(bpeTokens(text, model))
}
