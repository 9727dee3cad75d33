package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-profile hit counter for language ID: one pass over a
  * normalized `array<string>` token column, counting membership in each
  * built-in language profile → `struct<n, h_en, h_de, h_es, h_fr>`.
  *
  * Why a custom Catalyst `Expression` (idiom ladder, SURVEY §2.8): the
  * composed form is one `filter(toks, array_contains(profile, t))` HOF
  * per language, and the downstream argmax tree references each score
  * several times — HOFs are CodegenFallback, so they get NO
  * subexpression elimination and re-run per reference (~24 interpreted
  * token scans per row measured). This kernel runs once per row inside
  * codegen (subexpression elimination applies to codegen-capable
  * expressions); the argmax over its fields is scalar integer math.
  *
  * Membership is hash-set lookup per token (profiles are static), so
  * cost is O(tokens), not O(tokens × profile).
  */
case class LangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_hits requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LangHits.OutputType
  override def prettyName: String = "lang_hits"

  override def nullSafeEval(input: Any): Any =
    LangHits.hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangHits.hits($c)")

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}

object LangHits {

  /** Language profiles — the single source of truth (the SQL-oracle
    * twins are GENERATED from these lists; `SparkEntry.langCteSql`).
    * 16 function words per language, all lowercase, chosen to be
    * distinctive under the shared-denominator argmax (e.g. Polish
    * drops its single-letter clitics `i/w/z` — capital-I English
    * prose tokenizes to `i` and would leak into the Polish score).
    * Scripts that don't space-separate (zh/ja) or that a char-class
    * rule identifies more reliably (ko) are handled by the
    * kana/hangul/CJK ratio ladder in `Text.langIdFromTokens`, not by
    * a profile. Order matters: argmax ties break to the FIRST listed
    * language. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it",
                "for", "with", "was", "his", "are", "not", "this", "but"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
                "mit", "auf", "für", "von", "sich", "dem", "den", "zu"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en",
                "un", "una", "por", "con", "para", "es", "su", "del"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un",
                "une", "dans", "pour", "que", "qui", "sur", "pas", "au"),
    "ru" -> Seq("и", "в", "не", "на", "что", "он", "как", "это",
                "но", "по", "из", "у", "за", "от", "так", "же"),
    "uk" -> Seq("і", "в", "не", "на", "що", "він", "як", "це",
                "але", "по", "з", "у", "за", "від", "так", "ми"),
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "التي",
                "الذي", "مع", "كان", "لم", "ما", "هو", "كل", "بعد"),
    "fa" -> Seq("در", "به", "از", "که", "را", "با", "این", "است",
                "برای", "آن", "خود", "تا", "می", "بر", "هم", "نیز"),
    "he" -> Seq("של", "את", "על", "הוא", "היא", "זה", "עם", "לא",
                "אני", "מה", "יש", "כל", "גם", "אבל", "או", "אם"),
    "hi" -> Seq("के", "में", "की", "है", "को", "से", "का", "पर",
                "यह", "और", "हैं", "था", "कि", "जो", "ने", "एक"),
    "el" -> Seq("και", "το", "η", "ο", "να", "του", "με", "τα",
                "που", "από", "για", "την", "στο", "δεν", "είναι", "τη"),
    "tr" -> Seq("ve", "bir", "bu", "için", "ile", "ne", "ben", "çok",
                "ama", "gibi", "daha", "var", "yok", "sen", "biz", "ki"),
    "pt" -> Seq("não", "com", "uma", "os", "em", "mais", "como", "mas",
                "foi", "são", "ele", "ela", "seu", "também", "já", "isso"),
    "it" -> Seq("il", "lo", "gli", "le", "di", "che", "è", "per",
                "non", "una", "sono", "ma", "si", "come", "più", "anche"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "op",
                "te", "zijn", "met", "voor", "maar", "ook", "naar", "bij"),
    "pl" -> Seq("nie", "się", "jest", "jak", "ale", "tak", "przez",
                "być", "przy", "już", "bardzo", "może", "tylko", "czy",
                "gdy", "oraz"))

  /** The original four Latin-web profiles. Quality-feature scoring
    * ([[graft.text.Text.qualityFeaturesFromTokens]]'s any-language
    * stopword ratio and the ML quality features built on it) stays
    * pinned to this core set: the feature is tuned for the Latin-web
    * corpus and widening its vocabulary with every new langID profile
    * would silently shift every trained model and quality oracle. */
  val CoreProfiles: Seq[(String, Seq[String])] = Profiles.take(4)

  val OutputType: StructType = StructType(
    StructField("n", IntegerType, nullable = false) +:
      Profiles.map { case (lang, _) =>
        StructField(s"h_$lang", IntegerType, nullable = false) })

  // one hash set per profile, keyed by UTF8String for allocation-free probes
  private val sets: Array[java.util.HashSet[UTF8String]] =
    Profiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Shared interpreted/codegen kernel (public + allocation-light). */
  def hits(arr: ArrayData): InternalRow = {
    val counts = new Array[Int](sets.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var p = 0
        while (p < sets.length) {
          if (sets(p).contains(t)) counts(p) += 1
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](sets.length + 1)
    out(0) = n
    var p = 0
    while (p < sets.length) { out(p + 1) = counts(p); p += 1 }
    new GenericInternalRow(out)
  }

  /** Column API: `langHits(tokens)` over a normalized token array. */
  def langHits(tokens: Column): Column =
    ColumnBridge.column(LangHits(ColumnBridge.expression(tokens)))
}
