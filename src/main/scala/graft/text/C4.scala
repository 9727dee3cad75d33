package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning ruleset (Raffel et al. 2020, "Exploring the Limits
  * of Transfer Learning with a Unified Text-to-Text Transformer",
  * §2.2) — the published heuristics that turned Common Crawl into C4,
  * as a named, auditable policy:
  *
  * Line level (applied to every line of a page):
  *  - keep only lines ending in a terminal punctuation mark
  *    (period, exclamation mark, question mark, closing quote);
  *  - keep only lines with ≥ 5 words;
  *  - drop any line containing the word "javascript" (the
  *    enable-Javascript boilerplate warning).
  *
  * Page level:
  *  - drop pages with fewer than 3 sentences (after line filtering;
  *    sentences split on terminal punctuation — see [[sentences]]);
  *  - drop pages whose RAW text contains any bad-word (word-boundary
  *    match; C4 used the "List of Dirty, Naughty, Obscene..." list —
  *    [[DefaultBadWords]] vendors a short representative subset, the
  *    parameter takes a caller's full list);
  *  - drop pages containing the phrase "lorem ipsum";
  *  - drop pages containing "{" (code);
  *
  * Corpus level:
  *  - discard all but one occurrence of any three-sentence span
  *    occurring more than once in the data set ([[spanDedup3]]).
  *
  * ==100-TB shape==
  * Line and page rules are per-row expressions — one map pass over
  * the scan, no state. The three-sentence dedup is the only shuffle:
  * one groupBy on the 16-byte window hash (map-side combinable
  * count + min-occurrence), one anti-join back, one per-doc rebuild —
  * the same shape as the exact-substring span dedup family
  * ([[graft.dedup.Dedup]]), which documents the skew/Bloom levers
  * that apply at full corpus scale.
  */
object C4 {

  /** Representative subset of the public bad-word list C4 filtered
    * on; callers substitute the full list via [[Config]]. */
  val DefaultBadWords: Seq[String] = Seq(
    "porn", "xxx", "sex", "viagra", "casino", "nude", "erotic",
    "escort")

  final case class Config(
      minWordsPerLine: Int = 5,
      minSentences: Int = 3,
      badWords: Seq[String] = DefaultBadWords)

  // cleanLines/pageVerdict write these via withColumn — a caller column
  // of the same name would be silently overwritten, so refuse loudly
  // (the QualityModel.requireNoReserved posture)
  private val CleanReserved =
    Seq("raw_text", "n_lines", "n_kept", "__c4_lines", "__c4_kept")
  private val VerdictReserved =
    Seq("n_sentences", "keep", "drop_reason") ++
      Seq("sentences", "badwords", "lorem_ipsum", "brace").map("pass_" + _)

  private def requireNoReserved(docs: DataFrame, reserved: Seq[String],
                                op: String): Unit = {
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"C4.$op reserves column name(s) ${clash.mkString(", ")} — " +
        "rename them on the input; the operator overwrites these names")
  }

  private val Terminal = Seq(".", "!", "?", "\"")

  /** Line-keep predicate on a TRIMMED line: terminal punctuation,
    * ≥ `minWords` whitespace words, no "javascript" word. */
  def lineKeep(line: Column, minWords: Int = 5): Column = {
    val terminal = Terminal.map(t => line.endsWith(t))
      .reduce((a, b) => a || b)
    val enough = size(filter(split(line, "\\s+"), w => w =!= "")) >=
      minWords
    val noJs = !line.rlike("(?i)\\bjavascript\\b")
    terminal && enough && noJs
  }

  /** Word-boundary bad-word hit on the raw page text (lowercased).
    * Each word is regex-quoted (`\Q…\E`) — production lists contain
    * regex metacharacters ("a.b", "c++") that must match literally,
    * not as patterns. */
  def badWordHit(text: Column, words: Seq[String]): Column =
    lower(text).rlike(
      "\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") +
        ")\\b")

  /** Sentences of a cleaned page: split after terminal punctuation at
    * whitespace, trimmed, empties dropped. On line-structured pages
    * (one sentence per kept line) this equals the kept-line array. */
  def sentences(text: Column): Column =
    filter(transform(split(text, "(?<=[.!?\"])\\s+"), s => trim(s)),
      s => s =!= "")

  /** Per-doc line filtering: adds `text` rebuilt from kept lines (in
    * order, newline-joined), `n_lines`, `n_kept`. The raw text is
    * preserved in `raw_text` for the page-level raw checks. */
  def cleanLines(docs: DataFrame, cfg: Config = Config(),
                 textCol: String = "text"): DataFrame = {
    requireNoReserved(docs, CleanReserved, "cleanLines")
    val lines = Text.docLines(col(textCol))
    val kept = filter(lines, l => lineKeep(l, cfg.minWordsPerLine))
    docs
      .withColumn("raw_text", col(textCol))
      .withColumn("__c4_lines", lines)
      .withColumn("__c4_kept", kept)
      .withColumn("n_lines", size(col("__c4_lines")).cast("long"))
      .withColumn("n_kept", size(col("__c4_kept")).cast("long"))
      .withColumn(textCol, concat_ws("\n", col("__c4_kept")))
      .drop("__c4_lines", "__c4_kept")
  }

  /** Page-level verdict over line-filtered docs (`raw_text` column
    * required — [[cleanLines]] provides it): per-rule 0/1 flags, the
    * composite `keep`, and the first-failed `drop_reason` in
    * published order (sentences, badwords, lorem_ipsum, brace). */
  def pageVerdict(cleaned: DataFrame, cfg: Config = Config(),
                  textCol: String = "text"): DataFrame = {
    requireNoReserved(cleaned, VerdictReserved, "pageVerdict")
    val nSent = size(sentences(col(textCol))).cast("long")
    val rules: Seq[(String, Column)] = Seq(
      "sentences" -> (nSent >= cfg.minSentences),
      "badwords" -> !badWordHit(col("raw_text"), cfg.badWords),
      "lorem_ipsum" -> !lower(col("raw_text")).contains("lorem ipsum"),
      "brace" -> !col("raw_text").contains("{"))
    val keep = rules.map(_._2).reduce(_ && _)
    val reason = rules.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, pass)) => when(!pass, lit(name)).otherwise(acc)
    }
    rules.foldLeft(cleaned.withColumn("n_sentences", nSent)) {
      case (df, (name, pass)) =>
        df.withColumn(s"pass_$name", pass.cast("long"))
    }.withColumn("keep", keep.cast("long"))
      .withColumn("drop_reason", reason)
  }

  /** Corpus-level three-sentence span dedup (single pass, as
    * published): for every three-consecutive-sentence window occurring
    * at more than one (doc, position) corpus-wide, the canonical
    * occurrence — smallest (idCol, position) — survives and every
    * other occurrence's three sentences are removed from their
    * documents. Returns (idCol, text, n_sent, n_removed) with text
    * rebuilt from surviving sentences in order.
    *
    * Window identity is the md5 of the U+0001-joined window (the
    * separator prevents concatenation aliasing) — a 16-byte shuffle
    * key instead of three sentence strings. The canonical occurrence
    * is picked by the encoded key `idCol · 10^6 + position` (engine-
    * portable single-column min; positions ≥ 10^6 — a million-sentence
    * page — would only perturb WHICH occurrence survives, never the
    * dedup set). The id column must be an integral type with
    * |id| < 2^63/10^6 ≈ 9.2·10^12 — BOTH validated loudly: the type
    * at plan time (a string id would null the encoding and silently
    * no-op the dedup) and the magnitude per-row at runtime via a
    * raise_error guard on the encoding (an overflowing id could let
    * both occurrences of a window survive).
    * Documents with NO sentences at all (empty/whitespace-only text)
    * pass through untouched with empty text and n_sent = 0; documents
    * whose every sentence is removed BY THE DEDUP drop out of the
    * result entirely (documented behavior). */
  def spanDedup3(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"spanDedup3 requires an integral id column ('$idCol' is " +
          s"${other.catalogString}): the canonical-occurrence key is " +
          "id*10^6+pos, which a non-integral id would null out, " +
          "silently disabling the dedup")
    }
    val sents = docs
      .select(col(idCol).as("id"), sentences(col(textCol)).as("__s"))
      .localCheckpoint(false)
    // (id, pos, h): one row per 3-sentence window, 1-based pos
    val wins = sents.select(col("id"), posexplode(
      when(size(col("__s")) >= 3,
        transform(sequence(lit(1), size(col("__s")) - 2),
          i => md5(concat_ws("\u0001",
            element_at(col("__s"), i),
            element_at(col("__s"), i + 1),
            element_at(col("__s"), i + 2)))))
        .otherwise(array().cast("array<string>"))))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("h"))
    // duplicated windows and their canonical occurrence: the count is
    // map-side combinable; min over the encoded (id, pos) key picks
    // the smallest occurrence
    // runtime magnitude guard: ids at or past 2^63/10^6 would overflow
    // the id*10^6+pos key and could let both occurrences of a window
    // survive — fail the job loudly instead (one comparison per window
    // row; the raise_error branch is never taken on valid data)
    val idBound = Long.MaxValue / 1000000L
    val winsE = wins.withColumn("enc",
      when(col("id") >= lit(idBound) || col("id") <= lit(-idBound),
        raise_error(concat(
          lit(s"spanDedup3: |$idCol| must be < $idBound so the " +
            "id*10^6+pos canonical-occurrence key cannot overflow; got "),
          col("id").cast("string"))))
        .otherwise(col("id") * lit(1000000L) + col("pos")))
    val canon = winsE.groupBy(col("h"))
      .agg(count(lit(1)).as("c"), min(col("enc")).as("k0"))
      .filter(col("c") > 1)
    val doomed = winsE.join(canon, "h")
      .filter(col("enc") =!= col("k0"))
      .select(col("id"), explode(array(col("pos"), col("pos") + 1,
        col("pos") + 2)).as("spos"))
      .distinct()
    val flat = sents.select(col("id"),
      posexplode(col("__s")).as(Seq("p0", "sent")))
      .select(col("id"), (col("p0") + 1).as("spos"), col("sent"))
    val rebuilt = flat.join(doomed, Seq("id", "spos"), "left_anti")
      .groupBy(col("id"))
      .agg(
        concat_ws(" ", array_sort(collect_list(struct(col("spos"),
          col("sent")))).getField("sent")).as("__text"),
        count(lit(1)).as("n_sent"))
    // left join from the input ids: a doc with zero sentences (empty /
    // whitespace-only text) produced no flat rows but was never touched
    // by the dedup — pass it through; a doc whose every sentence was
    // REMOVED (n0 > 0, no surviving rows) drops, as documented
    sents.select(col("id"), size(col("__s")).as("__n0"))
      .join(rebuilt, Seq("id"), "left")
      .filter(col("__n0") === 0 || col("n_sent").isNotNull)
      .select(col("id").as(idCol),
        coalesce(col("__text"), lit("")).as(textCol),
        coalesce(col("n_sent"), lit(0L)).as("n_sent"),
        (col("__n0") - coalesce(col("n_sent"), lit(0L))).as("n_removed"))
  }
}
