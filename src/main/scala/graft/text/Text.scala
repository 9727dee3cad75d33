package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, shingling, token counting, language ID, quality
  * scoring, fingerprinting. Everything is built-in Column expressions —
  * codegen'd, no UDFs — so the whole surface rides inside whole-stage
  * codegen on a 100-TB document scan.
  *
  * The reference repo has no text surface (its only strings are cast
  * ids, customer_segmentation_1.py:16); this module is the extension
  * plan of SURVEY §7.5 over the `documents` table.
  */
object Text {

  /** Normalized word tokens: lowercase, non-letter/digit → space, split,
    * drop empties. */
  def tokenize(text: Column): Column =
    graft.functions.Tokenize.tokenize(text)

  /** Whitespace token count — the cheap length proxy. */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword count: GPT-2-style pretokenizer regex (contractions
    * | letter runs | digit runs | punctuation runs), each match ≈ one
    * subword-merge seed. A real BPE vocab refines these counts; the
    * regex is the standard cheap estimator for token budgeting. */
  private val BpeIsh =
    "'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{Nd}+| ?[^\\s\\p{L}\\p{Nd}]+|\\s+"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIsh), lit(0)))

  /** Distinct word k-shingles ("k-grams") of the token stream — the unit
    * set for Jaccard/MinHash near-dup detection. Documents shorter than
    * k tokens contribute their whole token stream as one shingle.
    *
    * Uses the native [[graft.functions.Shingles]] kernel: the composed
    * higher-order-function form re-evaluates the tokenizer once per
    * window (measured 12.6 s for 5.5K docs at sf0.1 vs one array pass
    * here — see the expression's scaladoc). */
  def wordShingles(text: Column, k: Int): Column =
    graft.functions.Shingles.shingles(tokenize(text), k)

  /** Distinct k-shingle xxhash64 KEYS (`array<long>`) — for consumers
    * that only ever join/group on the shingle (the inverted-index
    * dedup family): same set semantics as [[wordShingles]] up to
    * 64-bit collisions, no window string ever leaves the kernel, and
    * downstream exchanges carry longs. */
  def wordShingleHashes(text: Column, k: Int): Column =
    graft.functions.Shingles.shingleHashes(tokenize(text), k)

  // --- language ID -------------------------------------------------------

  /** Stopword profiles for language ID — sourced from the native
    * [[graft.functions.LangHits]] kernel (single source of truth; the
    * SQL-oracle twins are GENERATED from the same lists). */
  private val Stopwords: Seq[(String, Seq[String])] =
    graft.functions.LangHits.Profiles

  /** Quality features use the pinned CORE (Latin-web) profile union —
    * see [[graft.functions.LangHits.CoreProfiles]] for why widening
    * the langID surface must not shift quality scores. */
  private val QualityStopwords: Seq[(String, Seq[String])] =
    graft.functions.LangHits.CoreProfiles

  /** Fraction of characters in the CJK unified ideograph block.
    * Counted with `regexp_count` — same value as the old
    * strip-and-subtract form without building the stripped string. */
  def cjkRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
                   .cast("double") / length(text).cast("double"))

  /** Per-language stopword hit ratio of the token stream. */
  def stopwordRatio(tokens: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    when(size(tokens) === 0, lit(0.0))
      .otherwise(size(filter(tokens, t => array_contains(set, t)))
                   .cast("double") / size(tokens).cast("double"))
  }

  /** Character-class thresholds for the script-rule languages —
    * aliases of the [[graft.functions.LangId]] kernel's constants
    * (the single source the generated SQL twins interpolate).
    * Order: hangul decides "ko" first (Korean hanja is rare), kana
    * decides "ja" before the CJK rule (Japanese prose mixes kana and
    * kanji — ≥5% kana is a reliable floor), then CJK decides "zh". */
  val HangulMinRatio: Double = graft.functions.LangId.HangulMinRatio
  val KanaMinRatio: Double = graft.functions.LangId.KanaMinRatio
  val CjkMinRatio: Double = graft.functions.LangId.CjkMinRatio

  /** Heuristic language ID: hangul/kana/CJK character ratios decide
    * ko/ja/zh (in that order); otherwise argmax of stopword-profile
    * hit counts across the 16 built-in profiles (shared denominator,
    * so the hit-ratio argmax reduces to integer comparisons;
    * first-listed language wins ties — deterministic); "und" when
    * nothing scores. */
  def langId(text: Column): Column = langIdFromTokens(tokenize(text), text)

  /** [[langId]] over an already-materialized token column — ONE call
    * into the native [[graft.functions.LangId]] kernel (one map probe
    * per token + one char walk). The composed 16-profile argmax
    * ladder referenced the hit struct ~150 times and blew past the
    * codegen size limits in planted queries, falling back to
    * interpreted per-reference re-evaluation (q_lang_id 0.48 → 7.26 s
    * before this kernel; see the kernel scaladoc). */
  def langIdFromTokens(toks: Column, text: Column): Column =
    graft.functions.LangId.langId(toks, text)

  /** The composed reference ladder ([[graft.functions.LangHits]]
    * struct + greatest/CASE argmax + [[graft.functions.ScriptHits]]
    * char ratios) — kept as the spec-pinned reference form for the
    * [[graft.functions.LangId]] kernel (KernelsSpec equivalence). */
  private[graft] def langIdComposed(toks: Column, text: Column): Column = {
    val h = graft.functions.LangHits.langHits(toks)
    val scores = Stopwords.map { case (lang, _) =>
      lang -> h.getField(s"h_$lang")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val argmax = scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === best, lang)
    }.otherwise(Stopwords.last._1)
    val k = graft.functions.ScriptHits.scriptHits(text)
    val nch = k.getField("n_chars")
    def ratio(field: String): Column =
      when(nch === 0L, lit(0.0))
        .otherwise(k.getField(field).cast("double") / nch.cast("double"))
    when(ratio("n_hangul") > HangulMinRatio, "ko")
      .when(ratio("n_kana") > KanaMinRatio, "ja")
      .when(ratio("n_cjk") > CjkMinRatio, "zh")
      .otherwise(argmax)
  }

  // --- quality -----------------------------------------------------------

  /** Per-document quality features as one struct column:
    * n_chars, n_tokens, avg token length, punctuation ratio, distinct
    * token ratio, any-language stopword ratio. Hot paths should
    * materialize tokens first and use [[qualityFeaturesFromTokens]]
    * (see [[langId]] note on HOF re-evaluation). */
  def qualityFeatures(text: Column): Column =
    qualityFeaturesFromTokens(tokenize(text), text)

  /** [[qualityFeatures]] over an already-materialized token column.
    * Counters come from the one-pass [[graft.functions.QualityStats]]
    * kernel (the composed form paid four interpreted walks per row —
    * see its scaladoc); the ratio arithmetic here is byte-identical
    * to the original HOF/regex spelling and to the SQL-oracle twins. */
  def qualityFeaturesFromTokens(toks: Column, text: Column): Column = {
    val allStops = QualityStopwords.flatMap(_._2).distinct
    val s = graft.functions.QualityStats.stats(toks, text, allStops)
    val nTok = s.getField("n_tokens")
    val nCh = s.getField("n_chars")
    struct(
      nCh.as("n_chars"),
      nTok.as("n_tokens"),
      when(nTok === 0, lit(0.0))
        .otherwise(s.getField("sum_tok_len").cast("double") /
                   nTok.cast("double"))
        .as("avg_token_len"),
      when(nCh === 0, lit(0.0))
        .otherwise(s.getField("punct").cast("double") / nCh.cast("double"))
        .as("punct_ratio"),
      when(nTok === 0, lit(0.0))
        .otherwise(s.getField("distinct_toks").cast("double") /
                   nTok.cast("double"))
        .as("distinct_ratio"),
      when(nTok === 0, lit(0.0))
        .otherwise(s.getField("stop_hits").cast("double") /
                   nTok.cast("double"))
        .as("stopword_ratio"))
  }

  /** Scalar quality score in [0,1]: penalizes extreme length, high
    * punctuation density, and low vocabulary diversity — the standard
    * pretraining-filter shape (C4-style heuristics). Weights are plain
    * lits; tune per corpus. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokenize(text), text)

  /** [[qualityScore]] over an already-materialized token column. */
  def qualityScoreFromTokens(toks: Column, text: Column): Column = {
    val f = qualityFeaturesFromTokens(toks, text)
    val lenOk = when(f.getField("n_tokens").between(5, 100000), lit(1.0))
      .otherwise(lit(0.0))
    val punctOk = lit(1.0) - least(f.getField("punct_ratio") * 4.0, lit(1.0))
    val diversity = f.getField("distinct_ratio")
    round(least(lenOk * (lit(0.4) * punctOk + lit(0.4) * diversity +
                         lit(0.2)), lit(1.0)), 6)
  }

  // --- content filters ---------------------------------------------------

  /** URL mentions (http/https). Pattern is RE2-and-Java-compatible so
    * the SQL-oracle twin matches byte-for-byte. `regexp_count` counts
    * non-overlapping matches without materializing a match array —
    * identical value to the twin's len(regexp_extract_all(…)), and
    * this predicate sits in the curation hot path (StageProfile r7:
    * the filter stage owned ~0.8 s of the funnel at sf0.1, most of it
    * match-array construction). */
  def urlCount(text: Column): Column =
    regexp_count(text, lit("https?://[^\\s]+"))

  /** Email-address mentions (pragmatic pattern, shared with the oracle
    * twin — content FILTERING, not validation). */
  def emailCount(text: Column): Column =
    regexp_count(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))

  /** Distinct-bigram ratio: |distinct word 2-grams| / (n_tokens − 1) —
    * the repetition signal of Gopher-style quality filters (a low
    * ratio means the same phrases loop). O(tokens) via the native
    * shingle kernel; 1.0 for degenerate sub-2-token docs. */
  def distinctBigramRatio(toks: Column): Column = {
    val total = size(toks) - 1
    when(total <= lit(0), lit(1.0))
      .otherwise(size(graft.functions.Shingles.shingles(toks, 2))
        .cast("double") / total.cast("double"))
  }

  /** PII redaction — the C4/Dolma-style cleaning pass: emails, URLs,
    * IPv4 addresses and phone-shaped digit runs replaced with typed
    * placeholder tokens. One codegen'd chain of regexp_replace
    * passes; patterns are RE2-and-Java-compatible so the SQL-oracle
    * twin matches byte-for-byte. Order is load-bearing: URLs first
    * (an address inside a URL must become part of [URL], not
    * [EMAIL]), then emails, then IPs before phones (a dotted quad is
    * phone-shaped). Pragmatic cleaning patterns, not validators.
    *
    * The phone pattern counts DIGITS (9 or more, at most one `().-`
    * separator between digits), not raw run length — a raw-run match
    * rewrote ISO dates, version strings and IDs to [PHONE], and with
    * `cfg.redactPii` that perturbed quality scores and dedup keys on
    * PII-free text. 9 is the deliberate floor: `2026-08-12` /
    * `20260812` date shapes carry 8 digits and are indistinguishable
    * from short local numbers without lookarounds (which RE2 — the
    * oracle's engine — lacks), so 7–8-digit local numbers are
    * knowingly left unredacted. No upper bound: a 15-digit ceiling
    * left residue on longer runs (a 16-digit card became `[PHONE]6`),
    * and for a CLEANING pass over-redacting a long digit run is
    * strictly safer than leaking its tail. */
  def redactPii(text: Column): Column = {
    val url = regexp_replace(text,
      "https?://[^\\s]+", "[URL]")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]")
    regexp_replace(ip, "\\+?\\d(?:[().-]?\\d){8,}", "[PHONE]")
  }

  /** Canonical text normalization — the cleaning pass a crawled corpus
    * runs BEFORE hashing, shingling, or tokenizing (CCNet/Dolma-style):
    *  1. Unicode NFC composition ([[graft.functions.NfcNormalize]] —
    *     native codegen'd kernel, ASCII zero-copy fast path), so
    *     precomposed and decomposed forms of the same glyph hash alike;
    *  2. strip non-whitespace C0/DEL control characters (`\x00-\x08`,
    *     `\x0B`, `\x0C`, `\x0E-\x1F`, `\x7F` — tab/newline/CR survive
    *     to the next step, they are layout, not garbage);
    *  3. collapse every whitespace run to one space and trim the ends.
    * Deliberately NOT lowercased and NOT NFKC: case and compatibility
    * forms (ligatures, full-width) are meaning-bearing; dedup keys that
    * need case folding apply `lower` downstream.
    *
    * All three stages are codegen'd scalar expressions (the regexes are
    * Java-and-RE2-common syntax, so the DuckDB oracle twin is
    * byte-for-byte — hash-gated by `q_normalize_text`). */
  def normalizeText(text: Column): Column = {
    val composed = graft.functions.NfcNormalize.nfcNormalize(text)
    val noCtrl = regexp_replace(composed,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    trim(regexp_replace(noCtrl, "\\s+", " "))
  }

  // --- repetition signals (Gopher §A1.1 shape) ---------------------------

  /** Trimmed non-blank lines of a document. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Non-distinct word n-grams (space-joined) of a token array — the
    * counting stream for repetition signals, unlike the DISTINCT
    * shingle set [[wordShingles]] feeds to MinHash. Sub-n-token docs
    * yield an empty stream. */
  private def gramStream(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Max character coverage of any single n-gram: max over distinct
    * n-grams of count × gram length, as a fraction of `nChars`, capped
    * at 1.0 (overlapping occurrences can over-count — "a a a a" has
    * bigram "a a" three times). One sort + one linear run-length pass
    * per row (O(T log T) per doc), no shuffle: the whole signal rides
    * the document scan. */
  private def topGramCoverage(toks: Column, nChars: Column, n: Int): Column = {
    val sorted = array_sort(gramStream(toks, n))
    val best = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(st.getField("prev") === g, st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
               greatest(st.getField("best"),
                        run * length(g).cast("long")).as("best"))
      },
      st => st.getField("best"))
    when(nChars === 0, lit(0.0))
      .otherwise(least(best.cast("double") / nChars.cast("double"), lit(1.0)))
  }

  /** Per-document repetition signals, the Gopher-rules family (Rae et
    * al. 2021 §A1.1): documents that loop the same lines or phrases are
    * low-quality for training. One struct column computed entirely
    * per-row (lines via [[docLines]], n-grams via a sorted run-length
    * pass) — NO shuffle; at 100 TB this is a map-only pass over the
    * corpus scan.
    *
    * Fields:
    *  - `n_lines` — trimmed non-blank lines;
    *  - `dup_line_frac` — beyond-first line occurrences / lines;
    *  - `dup_line_char_frac` — characters in beyond-first occurrences /
    *    total line characters;
    *  - `top_{2,3,4}gram_cov` — max single-n-gram character coverage of
    *    the normalized token stream (count × gram length / normalized
    *    chars, capped at 1.0; the cap absorbs overlap over-counting).
    *
    * Definitional deviation from Gopher (documented): the top-n-gram
    * signal maximizes count × length (character coverage) directly
    * instead of picking the most FREQUENT gram and then measuring its
    * coverage — coverage is the quantity the filter thresholds anyway,
    * and maximizing it is deterministic without a tie-break rule.
    *
    * Computed by the native [[graft.functions.RepetitionStats]] kernel —
    * one hash-counting pass per row inside codegen. The composed-HOF
    * reference form [[repetitionSignalsFromParts]] measured 49 s fused /
    * 3.7 s staged vs well under a second for the kernel on 5K docs at
    * sf0.1 (HOFs are CodegenFallback and re-evaluate per reference);
    * KernelsSpec pins the two bit-for-bit. */
  def repetitionSignals(text: Column): Column =
    graft.functions.RepetitionStats.repetitionStats(docLines(text),
                                                    tokenize(text))

  /** Duplicate-line fraction ALONE — the cheap slice of
    * [[repetitionSignals]] for gates that threshold only on looping
    * lines (the curation `maxDupLineFrac` gate): beyond-first line
    * occurrences / lines. Skips the kernel's three n-gram
    * hash-counting passes entirely; the line array is evaluated ~3×
    * per row (HOF re-evaluation), still far cheaper than computing
    * five unused signals. */
  def dupLineFrac(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise((size(ls) - size(array_distinct(ls))).cast("double") /
                 size(ls).cast("double"))
  }

  /** The composed-HOF REFERENCE form of [[repetitionSignals]], kept as
    * the semantic pin for the native kernel (KernelsSpec asserts
    * bit-for-bit equality): `ls` = [[docLines]], `dls` =
    * `array_distinct(ls)`, `toks` = [[tokenize]], `nChars` =
    * `length(concat_ws(" ", toks))` — stage each as a materialized
    * column when running this form over real data (HOF re-evaluation,
    * see the kernel's scaladoc). */
  def repetitionSignalsFromParts(ls: Column, dls: Column,
                                 toks: Column, nChars: Column): Column = {
    val nL = size(ls)
    val totalLineChars =
      aggregate(ls, lit(0L), (a, l) => a + length(l).cast("long"))
    // per distinct line: (count − 1) × length — O(|distinct| × |lines|)
    // comparisons per row, fine for per-document line counts
    val dupChars = aggregate(dls, lit(0L), (a, d) =>
      a + (size(filter(ls, x => x === d)) - 1).cast("long") *
        length(d).cast("long"))
    struct(
      nL.as("n_lines"),
      when(nL === 0, lit(0.0))
        .otherwise((nL - size(dls)).cast("double") / nL.cast("double"))
        .as("dup_line_frac"),
      when(totalLineChars === 0, lit(0.0))
        .otherwise(dupChars.cast("double") / totalLineChars.cast("double"))
        .as("dup_line_char_frac"),
      topGramCoverage(toks, nChars, 2).as("top_2gram_cov"),
      topGramCoverage(toks, nChars, 3).as("top_3gram_cov"),
      topGramCoverage(toks, nChars, 4).as("top_4gram_cov"))
  }

  // --- fingerprinting ----------------------------------------------------

  /** Winnowing-style document fingerprint: the rolling window of word
    * k-shingles, each hashed (md5 — available in every engine, so the
    * fingerprint is portable), keeping the `s` smallest hex digests — a
    * bottom-s sketch. Equal sketches ⇒ near-identical shingle sets;
    * sketch overlap estimates Jaccard (the same estimator MinHash
    * uses, in deterministic portable form). */
  def fingerprintSketch(text: Column, k: Int = 3, s: Int = 8): Column =
    slice(array_sort(transform(wordShingles(text, k), sh => md5(sh))),
          1, s)

  /** Single 32-hex-char fingerprint: the minimum shingle hash. */
  def fingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(wordShingles(text, k), sh => md5(sh)))
}
