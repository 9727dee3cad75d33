package graft.pipelines

import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs over raw documents, built entirely from this
  * library's operators (each stage independently oracle/spec-verified):
  *
  *   1. language ID + allow-list        (Text.langIdFromTokens — TX3)
  *   2. quality scoring + threshold     (Text.qualityScoreFromTokens — TX4)
  *   3. content filters                 (URL/email caps — TX9)
  *   4. exact dedup                     (Dedup.dropExactDuplicates — DD1)
  *   5. near-dup dedup, canonical keep  (Dedup.markNearDuplicates — DD6)
  *   6. mixture resampling              (Splitting.stratifiedSample — SP1)
  *
  * Plan shape at 100 TB: stages 1–3 are one map-shaped pass (tokens
  * materialized once, kernels codegen'd — no shuffle); stage 4 is one
  * shuffle on the content hash; stage 5 is the banded/inverted-index
  * pair machinery + min-label clustering; stage 6 is per-partition
  * Bernoulli (no shuffle). Nothing quadratic, nothing driver-side.
  */
object Curation {

  final case class Config(
      langs: Set[String] = Set("en", "de", "es", "fr"),
      minQuality: Double = 0.3,
      maxUrls: Int = 10,
      nearDupJaccard: Double = 0.5,
      mixture: Map[String, Double] = Map.empty,
      seed: Long = 42L,
      // round-5 opt-in stages (defaults OFF keep the q_curation /
      // q_funnel oracles byte-stable):
      redactPii: Boolean = false,
      minMlQuality: Double = 0.0,
      // round-7 opt-in: drop docs whose duplicate-line fraction
      // (Gopher repetition signal, native kernel) exceeds this; 1.0 =
      // off (the gate is not even planned, keeping defaults
      // byte-stable AND kernel-pass-free)
      maxDupLineFrac: Double = 1.0,
      // round-13 opt-in rule policies (defaults None keep every
      // existing oracle byte-stable): C4 cleans LINES and drops pages
      // BEFORE scoring (it rewrites text, so scoring/dedup must see
      // the cleaned form); Gopher is a doc-level keep/drop after the
      // heuristic filters.
      c4: Option[graft.text.C4.Config] = None,
      gopher: Option[graft.text.Gopher.Config] = None,
      // round-15 opt-in: the TRAINED language classifier
      // (graft.ml.LangModel) replaces the heuristic ladder as the
      // source of `detected` — arbitrarily many languages, the
      // kanji-only-ja fix; predictions under `langModelMinConf`
      // degrade to "und" (allow-list them explicitly if wanted).
      // Default None keeps every existing oracle byte-stable.
      langModel: Option[graft.ml.LangModel.FittedLang] = None,
      langModelMinConf: Double = 0.5)

  /** Curate `docs` (needs `doc_id`, `text`). Output: surviving rows
    * with `detected` (language) and `quality` appended — plus
    * `ml_quality` when a trained [[graft.ml.QualityModel.Fitted]] is
    * supplied (scored after the heuristic filters, thresholded at
    * `cfg.minMlQuality`). With `cfg.redactPii` the text column is
    * redacted BEFORE any scoring/dedup (the training-pipeline order:
    * downstream consumers must never see the raw PII, and dedup has
    * to key on the text that actually ships). */
  def curate(docs: DataFrame, cfg: Config = Config(),
             model: Option[graft.ml.QualityModel.Fitted] = None)
      : DataFrame = {
    val redacted =
      if (cfg.redactPii)
        docs.withColumn("text", Text.redactPii(col("text")))
      else docs
    val input = cfg.c4 match {
      case Some(c4cfg) =>
        val c4 = graft.text.C4
        c4.pageVerdict(c4.cleanLines(redacted, c4cfg), c4cfg)
          .filter(col("keep") === 1L)
          .drop("raw_text", "n_lines", "n_kept", "n_sentences",
            "pass_sentences", "pass_badwords", "pass_lorem_ipsum",
            "pass_brace", "keep", "drop_reason")
      case None => redacted
    }
    val scored0 = input
      .withColumn("toks", Text.tokenize(col("text")))
      .withColumn("quality",
        Text.qualityScoreFromTokens(col("toks"), col("text")))
    // `detected`: the heuristic ladder by default; the trained
    // classifier when supplied (both are map projections — the swap
    // changes no plan shape)
    val scored = cfg.langModel match {
      case Some(lm) =>
        lm.score(scored0, cfg.langModelMinConf)
          .withColumn("detected", col("lang_pred"))
          .drop("lang_pred", "lang_conf", "toks")
      case None => scored0
        .withColumn("detected",
          Text.langIdFromTokens(col("toks"), col("text")))
        .drop("toks")
    }
    val heurFiltered = scored
      .filter(col("detected").isin(cfg.langs.toSeq: _*))
      .filter(col("quality") >= lit(cfg.minQuality))
      .filter(Text.urlCount(col("text")) <= lit(cfg.maxUrls))
    val repFiltered =
      if (cfg.maxDupLineFrac < 1.0)
        heurFiltered.filter(
          Text.dupLineFrac(col("text")) <= lit(cfg.maxDupLineFrac))
      else heurFiltered
    val filtered = cfg.gopher match {
      case Some(gcfg) => graft.text.Gopher.filterDocs(repFiltered, gcfg)
      case None => repFiltered
    }
    val mlFiltered = model match {
      case Some(m) =>
        m.score(filtered).filter(col("ml_quality") >= lit(cfg.minMlQuality))
      case None => filtered
    }
    val exact = Dedup.dropExactDuplicates(mlFiltered)
    val near = Dedup
      .markNearDuplicates(exact, minJaccard = cfg.nearDupJaccard)
      .filter(col("kept"))
      .drop("component", "kept")
    if (cfg.mixture.nonEmpty)
      Splitting.stratifiedSample(near, "detected", cfg.mixture, cfg.seed)
    else near
  }

  /** The COMPLETE corpus → training-sequences pipeline, composing the
    * verified stages end to end: [[curate]] (langID → quality/content
    * filters → exact + near dedup → optional mixture), optional
    * LM-quality SELECTION (score against a trusted target corpus with
    * [[NgramLm.score]], keep the top `keepFrac` by mean log-likelihood
    * via [[Splitting.selectTopFraction]] — the FineWeb/DCLM step), and
    * GPT-style pack-and-chunk ([[Packing.concatChunks]]) into
    * `seqLen`-token training sequences. Output: one row per surviving
    * doc with its pack offsets (doc_id, n_tokens, offset, chunk,
    * chunk_end).
    *
    * Every stage is individually oracle-gated or property-pinned;
    * this composition is itself spec-tested (survivors ⊆ curate's,
    * packing covers survivors exactly). Docs shorter than 2 tokens
    * carry no LM signal and are dropped by the selection stage's
    * inner score join — documented, deliberate (sub-2-token docs are
    * not trainable sequences). */
  def prepareTrainingData(docs: DataFrame, cfg: Config = Config(),
                          lmTarget: Option[DataFrame] = None,
                          keepFrac: Double = 1.0,
                          seqLen: Int = 2048): DataFrame = {
    val selected = selectForTraining(docs, cfg, lmTarget, keepFrac)
    // NARROW projection (two longs per surviving doc) so the
    // materialization concatChunks now owns internally (its three
    // passes over one stored copy — Packing scaladoc) stores longs,
    // not text (measured 7.2 s vs ~5 s at sf0.1)
    val withTokens = selected.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Packing.concatChunks(withTokens, "n_tokens", seqLen)
  }

  /** curate → optional LM-quality selection — the shared front of the
    * two packing variants. */
  private def selectForTraining(docs: DataFrame, cfg: Config,
                                lmTarget: Option[DataFrame],
                                keepFrac: Double): DataFrame = {
    val curated = curate(docs, cfg)
    (lmTarget, keepFrac) match {
      case (Some(t), f) if f < 1.0 =>
        val scored = graft.pipelines.NgramLm.score(curated, t)
          .select(col("doc_id"),
                  (col("ll_q").cast("double") /
                   col("n_bigrams").cast("double")).as("__mean_ll"))
        curated.join(
          Splitting.selectTopFraction(scored, "__mean_ll", f)
            .select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      case _ => curated
    }
  }

  /** [[prepareTrainingData]] with the REAL token budget: a BPE
    * tokenizer ([[graft.text.Bpe]]) is learned on the curated
    * survivors themselves (`numMerges` merges over their word-count
    * dictionary), and sequences are packed by LEARNED-subword counts
    * instead of the whitespace proxy — so a 2048-token training
    * sequence means 2048 tokens the model will actually see, not 2048
    * words that tokenize into ~3000. The survivors are
    * localCheckpoint'ed once: tokenizer training (one aggregate + a
    * driver-side merge loop) and the packing passes all read the
    * stored blocks, so the curation DAG executes once however many
    * passes follow; the narrow (doc_id, n_tokens) frame is then owned
    * by concatChunks as usual, so the BPE encode itself also runs
    * exactly once, not once per packing pass. */
  def prepareTrainingDataBpe(docs: DataFrame, cfg: Config = Config(),
                             lmTarget: Option[DataFrame] = None,
                             keepFrac: Double = 1.0,
                             seqLen: Int = 2048,
                             numMerges: Int = 200,
                             driverWordLimit: Long = 2000000L)
      : DataFrame = {
    val selected = selectForTraining(docs, cfg, lmTarget, keepFrac)
      .localCheckpoint(false)
    val model = graft.text.Bpe.learnBpe(
      graft.text.Bpe.wordCounts(selected), numMerges,
      driverWordLimit = driverWordLimit)
    val withTokens = selected.select(col("doc_id"),
      graft.text.Bpe.bpeTokenCount(col("text"), model).cast("long")
        .as("n_tokens"))
    Packing.concatChunks(withTokens, "n_tokens", seqLen)
  }

  /** Per-stage survivor counts — the curation funnel report.
    *
    * The first FOUR stages fold into ONE aggregate over one scan
    * (round 5; the round-3 form replayed the kernel pass per count,
    * the round-4 fix cached it — this needs neither): per-row stage
    * predicates become conditional counts, and the exact-dedup
    * survivor count is `countDistinct(content hash)` among quality
    * survivors — the same value dropExactDuplicates materializes,
    * without the min_by shuffle. The near-dup stage (pair machinery +
    * components over the deduplicated survivors) is the one second
    * computation: two scans total, no cache — at corpus scale a second
    * codegen'd pass beats pinning the scored corpus in block storage. */
  def funnel(docs: DataFrame, cfg: Config = Config(),
             model: Option[graft.ml.QualityModel.Fitted] = None)
      : Seq[(String, Long)] = {
    val frame = funnelFrame(docs, cfg, model)
    val r = frame.head()
    frame.columns.toIndexedSeq.zipWithIndex
      .map { case (s, i) => s -> r.getLong(i) }
  }

  /** [[funnel]] as a one-row DataFrame (input, lang, quality,
    * exact_dedup, near_dedup) — the driver-contract form, hash-gated
    * against a composed DuckDB oracle (`q_funnel`). Honors the same
    * config as [[curate]]: with `cfg.redactPii` the counts are over
    * the redacted text (so `exact_dedup` hashes what curate actually
    * dedups), and a supplied model inserts an `ml_gate` stage column
    * between `quality` and `exact_dedup`. Defaults keep the q_funnel
    * oracle schema and values byte-stable. */
  def funnelFrame(docs: DataFrame, cfg: Config = Config(),
                  model: Option[graft.ml.QualityModel.Fitted] = None)
      : DataFrame = {
    val input =
      if (cfg.redactPii)
        docs.withColumn("text", Text.redactPii(col("text")))
      else docs
    val base0 = model match {
      case Some(m) => m.score(input)
      case None    => input
    }
    // langModel opt-in mirrors curate: `detected` comes from the
    // trained classifier so the funnel's lang stage counts what
    // curate actually filtered
    val base = cfg.langModel match {
      case Some(lm) => lm.score(base0, cfg.langModelMinConf)
        .withColumnRenamed("lang_pred", "__detected")
        .drop("lang_conf")
      case None => base0
    }
    val toks = Text.tokenize(col("text"))
    val langOk = (cfg.langModel match {
      case Some(_) => col("__detected")
      case None    => Text.langIdFromTokens(toks, col("text"))
    }).isin(cfg.langs.toSeq: _*)
    val heurOk = langOk &&
      Text.qualityScoreFromTokens(toks, col("text")) >= lit(cfg.minQuality) &&
      Text.urlCount(col("text")) <= lit(cfg.maxUrls)
    // the opt-in repetition gate folds into the quality stage (it is
    // heuristic filtering, not a new funnel stage — schema stays stable)
    val qualOk =
      if (cfg.maxDupLineFrac < 1.0)
        heurOk && Text.dupLineFrac(col("text")) <= lit(cfg.maxDupLineFrac)
      else heurOk
    val mlOk = model match {
      case Some(_) => qualOk && col("ml_quality") >= lit(cfg.minMlQuality)
      case None    => qualOk
    }
    // ONE kernel pass over the corpus: the head aggregate and the
    // near-dedup chain both consume the flag columns from a lazily
    // owned frame — without it the tokenize/langID/quality kernels
    // run once per consumer (the markNearDuplicates lesson, round 10)
    val flagged = base
      .withColumn("__lang_ok", langOk)
      .withColumn("__qual_ok", qualOk)
      .withColumn("__ml_ok", mlOk)
      .localCheckpoint(false)
    val headCols =
      Seq(count(lit(1)).as("input"),
          count(when(col("__lang_ok"), 1)).as("lang"),
          count(when(col("__qual_ok"), 1)).as("quality")) ++
      (if (model.isDefined) Seq(count(when(col("__ml_ok"), 1)).as("ml_gate"))
       else Nil) ++
      Seq(countDistinct(when(col("__ml_ok"), sha2(col("text"), 256)))
            .as("exact_dedup"))
    val head = flagged.agg(headCols.head, headCols.tail: _*)
    val near = Dedup
      .markNearDuplicates(
        Dedup.dropExactDuplicates(flagged.filter(col("__ml_ok"))
          .select(input.columns.map(col): _*)),
        minJaccard = cfg.nearDupJaccard)
      .filter(col("kept"))
      .agg(count(lit(1)).as("near_dedup"))
    head.crossJoin(near)
  }
}
