package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher rule-based document filter (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", Appendix A1.1) — the published MassiveWeb keep/drop rule
  * set, as a named policy over this library's text signals. Where
  * [[Text.qualityScore]] produces a soft score and
  * [[graft.ml.QualityModel]] a learned probability, this is the
  * third industry-standard shape: hard, auditable, per-rule
  * thresholds with a drop reason per document.
  *
  * Rules (signal → keep condition, Gopher's published thresholds as
  * defaults):
  *  - word count in [50, 100000]
  *  - mean word length in [3, 10] characters
  *  - symbol-to-word ratio ("#" or ellipsis) ≤ 0.1
  *  - fraction of lines starting with a bullet ≤ 0.9
  *  - fraction of lines ending with an ellipsis ≤ 0.3
  *  - fraction of words with ≥1 alphabetic character ≥ 0.8
  *  - ≥ 2 distinct hits from the 8-word stop list {the, be, to, of,
  *    and, that, have, with} — matched case-insensitively
  *    (sentence-initial "The"/"With" count toward the floor)
  *  - repetition gates from [[Text.repetitionSignals]] (the native
  *    kernel): dup_line_frac ≤ 0.30, dup_line_char_frac ≤ 0.20,
  *    top_{2,3,4}gram_cov ≤ {0.20, 0.18, 0.16}. Gopher also gates
  *    duplicate PARAGRAPHS; this corpus model treats the line as the
  *    paragraph unit (documented deviation — the lined corpus has no
  *    blank-line paragraph breaks).
  *
  * "Words" here are RAW whitespace words (not [[Text.tokenize]]'s
  * normalized tokens): mean word length and the alphabetic-character
  * rule are defined on surface forms — normalizing away punctuation
  * first would blind exactly the signals the rules threshold.
  *
  * ==100-TB shape==
  * Every signal is a per-row expression over the document scan — one
  * map pass, NO shuffle, no vocabulary state, nothing driver-side.
  * The array signals ride staged projections (each non-cheap array is
  * materialized once per row — interpreted HOFs re-evaluate per
  * reference, see [[Text.repetitionSignals]]'s measurement); the
  * repetition struct comes from the codegen'd
  * [[graft.functions.RepetitionStats]] kernel.
  */
object Gopher {

  /** Keep/drop thresholds; defaults are Gopher's published values. */
  final case class Config(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L,
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxTop2gramCov: Double = 0.20,
      maxTop3gramCov: Double = 0.18,
      maxTop4gramCov: Double = 0.16)

  val StopList: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  // verdict() writes these via withColumn — a caller column of the
  // same name would be silently overwritten and filterDocs would then
  // drop it, so refuse loudly (the QualityModel.requireNoReserved
  // posture; ditto C4.cleanLines/pageVerdict)
  private[text] val Reserved: Seq[String] = Seq(
    "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
    "n_stop", "bullet_frac", "ellipsis_frac", "dup_line_frac",
    "top_2gram_cov", "keep", "drop_reason",
    "__g_k", "__g_sig", "__g_rep") ++
    Seq("word_count", "mean_word_len", "symbol_ratio", "bullets",
      "ellipsis", "alpha_frac", "stopwords", "repetition")
      .map("pass_" + _)

  private val BulletPrefixes = Seq("- ", "* ", "• ", "‣ ")

  /** Raw whitespace words of a document (newlines folded to spaces,
    * empties dropped) — the surface-form stream the Gopher signals
    * are defined on. */
  def rawWords(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** Occurrences of "#" plus ellipsis ("..." or "…") in the raw text —
    * the numerator of Gopher's symbol-to-word ratio. Counted by
    * length arithmetic: replacement removes leftmost non-overlapping
    * occurrences in both Spark (`regexp_replace`) and DuckDB
    * (`replace`), so the oracle twin is the same three
    * subtractions. */
  def symbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "#", ""))) +
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3) +
      (length(text) - length(regexp_replace(text, "…", "")))

  /** Per-document Gopher signals as one struct column:
    * `(n_words, mean_word_len, symbol_ratio, alpha_frac, n_stop,
    * bullet_frac, ellipsis_frac)`. `words` and `lines` must be
    * pre-staged columns ([[rawWords]] / [[Text.docLines]]) so each
    * array is evaluated once per row. */
  def signalsFromParts(text: Column, words: Column, lines: Column)
      : Column = {
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    val sumLen =
      aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
    val alphaWords =
      size(filter(words, w => w.rlike("\\p{L}"))).cast("long")
    val stopHits =
      size(array_intersect(transform(words, w => lower(w)),
        array(StopList.map(lit): _*))).cast("long")
    val bulletLines = size(filter(lines, l =>
      BulletPrefixes.map(p => l.startsWith(p))
        .reduce((a, b) => a || b))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val safeW = when(nW === 0L, lit(1L)).otherwise(nW)
    val safeL = when(nL === 0L, lit(1L)).otherwise(nL)
    struct(
      nW.as("n_words"),
      (sumLen.cast("double") / safeW.cast("double")).as("mean_word_len"),
      (symbolCount(text).cast("double") / safeW.cast("double"))
        .as("symbol_ratio"),
      (alphaWords.cast("double") / safeW.cast("double")).as("alpha_frac"),
      stopHits.as("n_stop"),
      (bulletLines.cast("double") / safeL.cast("double"))
        .as("bullet_frac"),
      (ellipsisLines.cast("double") / safeL.cast("double"))
        .as("ellipsis_frac"))
  }

  /** [[signalsFromParts]]'s struct built from the native
    * [[graft.functions.GopherStats]] kernel row (two codegen'd char
    * walks instead of ~8 interpreted array walks — the production
    * path; GopherSpec pins the two bit-for-bit). The symbol numerator
    * is bit-equal to the composed form because every term is integral
    * (the `/3` there divides an exact multiple of 3). */
  def signalsFromKernel(k: Column): Column = {
    val nW = k.getField("n_words")
    val nL = k.getField("n_lines")
    val safeW = when(nW === 0L, lit(1L)).otherwise(nW)
    val safeL = when(nL === 0L, lit(1L)).otherwise(nL)
    struct(
      nW.as("n_words"),
      (k.getField("sum_word_len").cast("double") /
        safeW.cast("double")).as("mean_word_len"),
      ((k.getField("n_hash") + k.getField("n_ell3") +
        k.getField("n_ellchar")).cast("double") / safeW.cast("double"))
        .as("symbol_ratio"),
      (k.getField("alpha_words").cast("double") / safeW.cast("double"))
        .as("alpha_frac"),
      k.getField("stop_hits").as("n_stop"),
      (k.getField("bullet_lines").cast("double") / safeL.cast("double"))
        .as("bullet_frac"),
      (k.getField("ellipsis_lines").cast("double") /
        safeL.cast("double")).as("ellipsis_frac"))
  }

  /** Verdict frame: input columns plus the signal columns, one 0/1
    * `pass_*` flag per rule, the composite `keep`, and `drop_reason`
    * (first failed rule in the order below; null when kept). Signals
    * are emitted UNROUNDED — callers snapshotting them for an
    * engine-portable gate round at the edge (the `q_gopher_filter`
    * spelling). Signal counting runs the native kernel. */
  def verdict(docs: DataFrame, cfg: Config = Config(),
              textCol: String = "text"): DataFrame = {
    val clash = docs.columns.toSeq.intersect(Reserved)
    require(clash.isEmpty,
      s"Gopher.verdict reserves column name(s) ${clash.mkString(", ")}" +
        " — rename them on the input; verdict overwrites and " +
        "filterDocs drops these names")
    val staged = docs
      .withColumn("__g_k", graft.functions.GopherStats
        .gopherStats(col(textCol), StopList))
      .withColumn("__g_sig", signalsFromKernel(col("__g_k")))
      .withColumn("__g_rep", Text.repetitionSignals(col(textCol)))
    val s = col("__g_sig")
    val r = col("__g_rep")
    val rules: Seq[(String, Column)] = Seq(
      "word_count" -> (s.getField("n_words").between(
        cfg.minWords, cfg.maxWords)),
      "mean_word_len" -> (s.getField("mean_word_len").between(
        cfg.minMeanWordLen, cfg.maxMeanWordLen)),
      "symbol_ratio" ->
        (s.getField("symbol_ratio") <= cfg.maxSymbolRatio),
      "bullets" -> (s.getField("bullet_frac") <= cfg.maxBulletFrac),
      "ellipsis" ->
        (s.getField("ellipsis_frac") <= cfg.maxEllipsisFrac),
      "alpha_frac" -> (s.getField("alpha_frac") >= cfg.minAlphaFrac),
      "stopwords" -> (s.getField("n_stop") >= cfg.minStopHits),
      "repetition" ->
        ((r.getField("dup_line_frac") <= cfg.maxDupLineFrac) &&
          (r.getField("dup_line_char_frac") <= cfg.maxDupLineCharFrac) &&
          (r.getField("top_2gram_cov") <= cfg.maxTop2gramCov) &&
          (r.getField("top_3gram_cov") <= cfg.maxTop3gramCov) &&
          (r.getField("top_4gram_cov") <= cfg.maxTop4gramCov)))
    val keep = rules.map(_._2).reduce(_ && _)
    val reason = rules.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, pass)) => when(!pass, lit(name)).otherwise(acc)
    }
    val flagged = rules.foldLeft(staged) { case (df, (name, pass)) =>
      df.withColumn(s"pass_$name", pass.cast("long"))
    }
    flagged
      .withColumn("n_words", s.getField("n_words"))
      .withColumn("mean_word_len", s.getField("mean_word_len"))
      .withColumn("symbol_ratio", s.getField("symbol_ratio"))
      .withColumn("alpha_frac", s.getField("alpha_frac"))
      .withColumn("n_stop", s.getField("n_stop"))
      .withColumn("bullet_frac", s.getField("bullet_frac"))
      .withColumn("ellipsis_frac", s.getField("ellipsis_frac"))
      .withColumn("dup_line_frac", r.getField("dup_line_frac"))
      .withColumn("top_2gram_cov", r.getField("top_2gram_cov"))
      .withColumn("keep", keep.cast("long"))
      .withColumn("drop_reason", reason)
      .drop("__g_k", "__g_sig", "__g_rep")
  }

  /** The filter itself: survivors of [[verdict]] with the bookkeeping
    * columns dropped — the production keep/drop pass. */
  def filterDocs(docs: DataFrame, cfg: Config = Config(),
                 textCol: String = "text"): DataFrame = {
    val added = Seq(
      "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
      "n_stop", "bullet_frac", "ellipsis_frac", "dup_line_frac",
      "top_2gram_cov", "keep", "drop_reason") ++
      Seq("word_count", "mean_word_len", "symbol_ratio", "bullets",
        "ellipsis", "alpha_frac", "stopwords", "repetition")
        .map("pass_" + _)
    verdict(docs, cfg, textCol)
      .filter(col("keep") === 1L)
      .drop(added: _*)
  }
}
