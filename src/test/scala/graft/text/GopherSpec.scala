package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule filter ([[Gopher]]): published MassiveWeb thresholds,
  * per-rule flags, first-failed drop reason. */
class GopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 60 UNIQUE alpha words with 2 stopwords — passes every rule (a
    * cyclic word pattern would trip the top-4-gram repetition gate). */
  private val goodText = {
    val base = Seq("the", "of") ++ (1 to 58).map(i => s"tok${i}wordy")
    base.grouped(6).map(_.mkString(" ")).mkString("\n")
  }

  private def verdictOf(texts: (Long, String)*) =
    Gopher.verdict(texts.toDF("doc_id", "text"))
      .select("doc_id", "keep", "drop_reason",
        "n_words", "n_stop", "bullet_frac", "ellipsis_frac",
        "symbol_ratio", "alpha_frac", "mean_word_len")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a clean document keeps; every signal is in range") {
    val v = verdictOf(1L -> goodText)(1L)
    assert(v.getLong(1) == 1L && v.isNullAt(2))
    assert(v.getLong(3) == 60L && v.getLong(4) == 2L)
  }

  test("word-count floor and ceiling") {
    val short = "the of tiny doc here now"
    val v = verdictOf(1L -> short)(1L)
    assert(v.getLong(1) == 0L && v.getString(2) == "word_count")
  }

  test("bullet-started lines beyond 90% drop with reason 'bullets'") {
    val bulleted = goodText.split("\n").map("- " + _).mkString("\n")
    val v = verdictOf(1L -> bulleted)(1L)
    assert(v.getString(2) == "bullets")
    assert(v.getDouble(5) == 1.0)
  }

  test("ellipsis-ended lines beyond 30% drop with reason 'ellipsis'") {
    val ellipsed = goodText.split("\n").zipWithIndex
      .map { case (l, i) => if (i % 2 == 0) l + " ..." else l }
      .mkString("\n")
    val v = verdictOf(1L -> ellipsed)(1L)
    assert(v.getString(2) == "ellipsis")
    assert(v.getDouble(6) > 0.3)
  }

  test("hash/ellipsis symbols beyond a 0.1 word ratio drop") {
    val symboled = goodText + "\n" + Seq.fill(9)("#").mkString(" ")
    val v = verdictOf(1L -> symboled)(1L)
    assert(v.getString(2) == "symbol_ratio")
    // 9 hashes over 69 words > 0.1; the hashes are also non-alpha
    // words but 60/69 alpha ≥ 0.8 keeps alpha_frac passing
    assert(v.getDouble(7) > 0.1 && v.getDouble(8) >= 0.8)
  }

  test("mostly-numeric words drop with reason 'alpha_frac'") {
    val numeric = goodText + "\n" +
      (1 to 20).map(i => (i * 137).toString).grouped(6)
        .map(_.mkString(" ")).mkString("\n")
    val v = verdictOf(1L -> numeric)(1L)
    assert(v.getString(2) == "alpha_frac")
  }

  test("fewer than 2 distinct stop words drop") {
    val noStops = goodText.split("\\s+").filterNot(_ == "of")
      .grouped(6).map(_.mkString(" ")).mkString("\n")
    val v = verdictOf(1L -> noStops)(1L)
    assert(v.getString(2) == "stopwords")
  }

  test("looping documents drop with reason 'repetition'") {
    val line = "the of looping line repeated forever"
    val looping = Seq.fill(10)(line).mkString("\n")
    val v = verdictOf(1L -> looping)(1L)
    assert(v.getString(2) == "repetition")
  }

  test("drop reason is the FIRST failed rule in published order") {
    // fails word_count AND stopwords: word_count wins
    val v = verdictOf(1L -> "zz yy xx")(1L)
    assert(v.getString(2) == "word_count")
  }

  test("mean word length out of [3,10] drops") {
    val shortWords = Seq.fill(60)("a b").mkString(" ") // 120 words len 1
    val v = verdictOf(1L -> ("the of " + shortWords))(1L)
    assert(v.getString(2) == "mean_word_len")
    assert(v.getDouble(9) < 3.0)
  }

  test("filterDocs keeps survivors with original schema only") {
    val df = Seq((1L, goodText), (2L, "too short")).toDF("doc_id", "text")
    val out = Gopher.filterDocs(df)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("kernel signals == composed-HOF signals bit-for-bit") {
    // hostile battery: unicode words/bullets/ellipses, tabs, CRLF,
    // dot runs, supplementary-plane chars, empty-ish lines, plus the
    // real corpus
    val crafted = Seq(
      "",
      "   ",
      "the of and that have with to be",
      "• bullet line here\n- another one\n* third 😀 line",
      "ends with ellipsis ...\nends with … char\n.... four dots",
      "df#df ## #\t#x\f.y\r\nz",
      "привет мир\nтекст … с многоточием ...",
      "a\n\n\n  b  \n - nospacebullet\n-  doublespace",
      "😀😀 emoji words 𝔘𝔫𝔦 sup-plane\nshort.",
      "word. .. ... .... ..... ...... . ")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    import spark.implicits._
    val craftedDf = crafted.toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    Seq(craftedDf, corpus).foreach { df =>
      val both = df.select(
        Gopher.signalsFromKernel(graft.functions.GopherStats
          .gopherStats(col("text"), Gopher.StopList)).as("k"),
        Gopher.signalsFromParts(col("text"), Gopher.rawWords(col("text")),
          graft.text.Text.docLines(col("text"))).as("h"))
      val diff = both.filter(not(col("k") <=> col("h"))).count()
      assert(diff == 0L, s"kernel/HOF divergence on $diff rows")
    }
  }

  test("boundary: symbol ratio exactly 0.1 passes (rule is <=)") {
    // 54 plain words + 6 hashes = 60 words, 6 symbols → exactly 0.1
    val words = Seq("the", "of") ++ (1 to 52).map(i => s"tok${i}word")
    val t = (words ++ Seq.fill(6)("#")).grouped(6)
      .map(_.mkString(" ")).mkString("\n")
    val v = verdictOf(1L -> t)(1L)
    assert(v.getDouble(7) == 0.1)
    assert(v.getString(2) != "symbol_ratio")
  }

  test("stop-word check is case-insensitive: capitalized prose counts") {
    // 'The'/'With' sentence-initial forms must count toward the
    // >=2-distinct floor (the published rule is on word identity)
    val t = (1 to 13).map(i =>
      s"The quick brown foxes jump With style over fence$i.")
      .mkString("\n")
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, t)).toDF("doc_id", "text")
    val v = Gopher.verdict(df)
      .select("n_stop", "pass_stopwords").collect().head
    assert(v.getLong(0) == 2L)
    assert(v.getLong(1) == 1L)
    // composed form agrees with the kernel on mixed-case text
    val both = df.select(
      Gopher.signalsFromKernel(graft.functions.GopherStats
        .gopherStats(col("text"), Gopher.StopList)).as("k"),
      Gopher.signalsFromParts(col("text"), Gopher.rawWords(col("text")),
        graft.text.Text.docLines(col("text"))).as("h"))
    assert(both.filter(not(col("k") <=> col("h"))).count() == 0L)
  }

  test("verdict refuses reserved caller columns loudly") {
    val df = Seq((1L, "text", 7L)).toDF("doc_id", "text", "n_words")
    val e = intercept[IllegalArgumentException](Gopher.verdict(df))
    assert(e.getMessage.contains("n_words"))
  }
}
