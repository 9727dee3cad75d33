package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode-script profiling ([[Scripts]]): range counts, dominance,
  * tie/empty handling, the mixed-script flag. */
class ScriptsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(text: String) =
    Seq(text).toDF("text")
      .select(Scripts.scriptProfile(col("text")).as("p"))
      .select("p.*").collect().head

  test("per-script counts over a mixed string") {
    val r = profile("abc привет 中文 αβ 한글 かな العربية")
    assert(r.getAs[Long]("n_latin") == 3L)
    assert(r.getAs[Long]("n_cyrillic") == 6L)
    assert(r.getAs[Long]("n_cjk") == 2L)
    assert(r.getAs[Long]("n_greek") == 2L)
    assert(r.getAs[Long]("n_hangul") == 2L)
    assert(r.getAs[Long]("n_kana") == 2L)
    assert(r.getAs[Long]("n_arabic") == 7L)
    assert(r.getAs[Long]("n_scripted") == 24L)
    assert(r.getAs[String]("dominant") == "arabic")
  }

  test("digits and punctuation are not scripted characters") {
    val r = profile("123 456 !!! ---")
    assert(r.getAs[Long]("n_scripted") == 0L)
    assert(r.getAs[String]("dominant") == "none")
    assert(r.getAs[Double]("dom_frac") == 0.0)
  }

  test("ties break to the Ranges order") {
    val r = profile("ab пр") // 2 latin, 2 cyrillic
    assert(r.getAs[String]("dominant") == "latin")
  }

  test("latin range includes accented European letters") {
    assert(profile("café naïve łódź").getAs[Long]("n_latin") == 13L)
  }

  test("mixedScript fires above the minority threshold only") {
    def mixed(text: String, f: Double = 0.10) =
      Seq(text).toDF("text")
        .select(Scripts.mixedScript(col("text"), f).as("m"))
        .as[Boolean].head()
    // 10 latin + 2 cyrillic = 2/12 ≈ 17% minority → mixed
    assert(mixed("abcdefghij пр"))
    // 98 latin + 2 cyrillic → under 10% → not mixed
    assert(!mixed(("a" * 98) + " пр"))
    assert(!mixed("purely latin text here"))
    assert(!mixed(""))
  }

  test("per-script counts: hebrew and devanagari ranges") {
    val r = profile("שלום नमस्ते")
    assert(r.getAs[Long]("n_hebrew") == 4L)
    assert(r.getAs[Long]("n_devanagari") == 6L)
    assert(r.getAs[String]("dominant") == "devanagari")
  }

  test("langScriptAgree: the mislabel audit rule table") {
    val cases = Seq(
      ("en", "latin", true),
      ("en", "cyrillic", false),   // the "lang=en, Cyrillic page" case
      ("zh", "cjk", true),
      ("zh", "latin", false),
      ("und", "cyrillic", true),   // unknown language agrees vacuously
      ("en", "none", true),        // unscripted page agrees vacuously
      ("ja", "kana", true),        // multi-valued expectation: kana…
      ("ja", "cjk", true),         // …or kanji may dominate Japanese
      ("ja", "latin", false),
      ("ru", "cyrillic", true),
      ("uk", "cyrillic", true),
      ("ru", "latin", false),
      ("hi", "devanagari", true),
      ("he", "hebrew", true),
      ("he", "arabic", false),
      ("fa", "arabic", true),
      ("el", "greek", true),
      ("ko", "hangul", true),
      ("ko", "cjk", false),
      ("pl", "latin", true),
      ("xx", "latin", true))       // unregistered language → vacuous
    val df = cases.map(c => (c._1, c._2)).toDF("detected", "dominant")
      .withColumn("agree",
        Scripts.langScriptAgree(col("detected"), col("dominant")))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2))
      .toMap
    cases.foreach { c =>
      assert(got((c._1, c._2)) == c._3, s"case $c")
    }
  }

  test("unknown script names refuse loudly") {
    intercept[IllegalArgumentException] {
      Scripts.scriptCount(col("text"), "klingon")
    }
  }
}
