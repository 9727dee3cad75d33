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
  * Counting is `regexp_count` over contiguous code-point ranges —
  * codegen'd, zero-allocation, one pass per script over the row; the
  * whole profile rides the document scan ([[Text.cjkRatio]]'s
  * pattern, generalized). Ranges cover each script's core block —
  * the dominant-script decision needs the bulk of the mass, not
  * exhaustive block coverage (documented deviation from full Unicode
  * Script= property semantics, which regex character classes cannot
  * express portably across engines).
  */
object Scripts {

  /** Core block per script, in DOMINANCE-TIE order (first listed
    * wins). Latin includes the Latin-1/Extended letter supplements. */
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

  /** Per-script character count. */
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
    * characters. */
  def scriptProfile(text: Column,
                    scripts: Seq[String] = Ranges.map(_._1)): Column = {
    val counts = scripts.map(s => s -> scriptCount(text, s))
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

  /** Expected dominant script per detected language — the audit
    * table behind [[langScriptAgree]]. */
  val ExpectedScript: Map[String, String] = Map(
    "en" -> "latin", "de" -> "latin", "es" -> "latin",
    "fr" -> "latin", "zh" -> "cjk")

  /** The language↔script AGREEMENT audit: a page whose detected
    * language expects one script but whose characters are dominated
    * by another is mislabeled, mojibake, or spam ("lang=en but the
    * page is Cyrillic"). Agrees vacuously when the language is
    * unknown ("und"), the page has no scripted characters ("none"),
    * or the language has no expectation registered. */
  def langScriptAgree(detected: Column, dominant: Column): Column = {
    val expected = ExpectedScript.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, script)) =>
        when(detected === lang, lit(script)).otherwise(acc)
    }
    detected === "und" || dominant === "none" ||
      expected.isNull || expected === dominant
  }

  /** Mixed-script flag: a second script carries more than `minFrac`
    * of the scripted characters — the homoglyph-spoofing / mojibake /
    * spam signal. */
  def mixedScript(text: Column, minFrac: Double = 0.10,
                  scripts: Seq[String] = Ranges.map(_._1)): Column = {
    val counts = scripts.map(s => scriptCount(text, s))
    val total = counts.reduce(_ + _)
    val best = counts.reduce((a, b) => greatest(a, b))
    (total > 0L) && ((total - best).cast("double") >
      total.cast("double") * minFrac)
  }
}
