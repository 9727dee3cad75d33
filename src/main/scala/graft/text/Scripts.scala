package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode-script profiling — the writing-system histogram of a
  * document. Language ID ([[Text.langId]]) answers "which language";
  * the script profile answers the upstream routing question a
  * multilingual corpus asks first: which TOKENIZER/normalizer family
  * does this page need, is it mixed-script (a mojibake / spam
  * signal), and does the declared language match the script it is
  * written in (a "lang=en but the page is Cyrillic" audit).
  *
  * Counting runs the native [[graft.functions.ScriptHits]] kernel —
  * ONE codegen'd code-point walk per row emitting every script count
  * (the composed form paid nine `regexp_count` passes, re-referenced
  * by the profile's argmax tree; see the kernel scaladoc for the
  * measured cost). [[scriptCount]] keeps the `regexp_count` spelling
  * as the documented reference form — the SQL oracle twins count the
  * same regex classes. Ranges cover each script's core block — the
  * dominant-script decision needs the bulk of the mass, not
  * exhaustive block coverage (documented deviation from full Unicode
  * Script= property semantics, which regex character classes cannot
  * express portably across engines).
  */
object Scripts {

  /** Core block per script, in DOMINANCE-TIE order (first listed
    * wins). Latin includes the Latin-1/Extended letter supplements.
    * The [[graft.functions.ScriptHits]] kernel mirrors these ranges
    * verbatim (KernelsSpec pins the two). */
  val Ranges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hebrew" -> "[\\x{0590}-\\x{05FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
    "kana" -> "[\\x{3040}-\\x{30FF}]")

  /** Per-script character count — the composed `regexp_count`
    * reference form (the oracle-twin spelling; hot paths ride
    * [[scriptProfile]]'s kernel instead). */
  def scriptCount(text: Column, script: String): Column = {
    val range = Ranges.toMap.getOrElse(script,
      throw new IllegalArgumentException(
        s"unknown script '$script' — known: ${Ranges.map(_._1)}"))
    regexp_count(text, lit(range)).cast("long")
  }

  /** One struct column `(n_<script>..., n_scripted, dominant,
    * dom_frac)`: per-script counts, their total, the argmax script
    * ("none" when no scripted character occurs; ties break to the
    * [[Ranges]] order), and the dominant share of scripted
    * characters. One kernel pass; the rest is scalar integer math.
    *
    * Hot paths should STAGE the kernel first (alias
    * `ScriptHits.scriptHits(text)` in its own projection) and build
    * the profile from the attribute via [[profileFromKernel]]: this
    * form re-references the kernel expression per field, which is
    * free only while codegen CSE holds — planted queries with big
    * CASE trees fall back to interpreted evaluation where each
    * reference re-runs the walk (q_script_detect 1.03 → 2.80 s in
    * the first round-14 window). */
  def scriptProfile(text: Column,
                    scripts: Seq[String] = Ranges.map(_._1)): Column =
    profileFromKernel(graft.functions.ScriptHits.scriptHits(text),
      scripts)

  /** [[scriptProfile]] over an already-STAGED kernel column (an
    * attribute from a previous projection — every field extract is
    * cheap, no re-evaluation risk). */
  def profileFromKernel(k: Column,
                        scripts: Seq[String] = Ranges.map(_._1))
      : Column = {
    val counts = scripts.map(s => s -> k.getField(s"n_$s"))
    val total = counts.map(_._2).reduce(_ + _)
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val dominant = counts.foldLeft(when(total === 0L, lit("none"))) {
      case (acc, (name, c)) => acc.when(c === best, name)
    }.otherwise(scripts.last)
    val fields = counts.map { case (name, c) => c.as(s"n_$name") } ++
      Seq(total.as("n_scripted"), dominant.as("dominant"),
        when(total === 0L, lit(0.0))
          .otherwise(best.cast("double") / total.cast("double"))
          .as("dom_frac"))
    struct(fields: _*)
  }

  /** Expected dominant script(s) per detected language — the audit
    * table behind [[langScriptAgree]]. Multi-valued where a language
    * legitimately writes in more than one block (Japanese prose is
    * kana + kanji, so either may dominate). */
  val ExpectedScript: Map[String, Seq[String]] = Map(
    "en" -> Seq("latin"), "de" -> Seq("latin"), "es" -> Seq("latin"),
    "fr" -> Seq("latin"), "tr" -> Seq("latin"), "pt" -> Seq("latin"),
    "it" -> Seq("latin"), "nl" -> Seq("latin"), "pl" -> Seq("latin"),
    "ru" -> Seq("cyrillic"), "uk" -> Seq("cyrillic"),
    "el" -> Seq("greek"),
    "ar" -> Seq("arabic"), "fa" -> Seq("arabic"),
    "he" -> Seq("hebrew"),
    "hi" -> Seq("devanagari"),
    "zh" -> Seq("cjk"),
    "ko" -> Seq("hangul"),
    "ja" -> Seq("kana", "cjk"))

  /** The language↔script AGREEMENT audit: a page whose detected
    * language expects one script but whose characters are dominated
    * by another is mislabeled, mojibake, or spam ("lang=en but the
    * page is Cyrillic"). Agrees vacuously when the language is
    * unknown ("und"), the page has no scripted characters ("none"),
    * or the language has no expectation registered. */
  def langScriptAgree(detected: Column, dominant: Column): Column = {
    val expectedOk = ExpectedScript.foldLeft(lit(null).cast("boolean")) {
      case (acc, (lang, scripts)) =>
        when(detected === lang, dominant.isin(scripts: _*)).otherwise(acc)
    }
    detected === "und" || dominant === "none" ||
      expectedOk.isNull || expectedOk
  }

  /** Mixed-script flag: a second script carries more than `minFrac`
    * of the scripted characters — the homoglyph-spoofing / mojibake /
    * spam signal. */
  def mixedScript(text: Column, minFrac: Double = 0.10,
                  scripts: Seq[String] = Ranges.map(_._1)): Column =
    mixedFromKernel(graft.functions.ScriptHits.scriptHits(text),
      minFrac, scripts)

  /** [[mixedScript]] over an already-staged kernel column. */
  def mixedFromKernel(k: Column, minFrac: Double = 0.10,
                      scripts: Seq[String] = Ranges.map(_._1)): Column = {
    val counts = scripts.map(s => k.getField(s"n_$s"))
    val total = counts.reduce(_ + _)
    val best = counts.reduce((a, b) => greatest(a, b))
    (total > 0L) && ((total - best).cast("double") >
      total.cast("double") * minFrac)
  }
}
