package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c).head()

  test("tokenize: lowercases, strips punctuation, drops empties") {
    val toks = one(Text.tokenize(col("t")), "Hello, World!  It's 42.")
      .getSeq[String](0)
    assert(toks == Seq("hello", "world", "it", "s", "42"))
    assert(one(Text.tokenize(col("t")), "").getSeq[String](0).isEmpty)
    assert(one(Text.tokenize(col("t")), " .,;! ").getSeq[String](0).isEmpty)
  }

  test("wordShingles: k-windows, short docs collapse to one shingle") {
    val sh = one(Text.wordShingles(col("t"), 3), "a b c d")
      .getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    assert(one(Text.wordShingles(col("t"), 5), "a b")
      .getSeq[String](0) == Seq("a b"))
    assert(one(Text.wordShingles(col("t"), 5), "").getSeq[String](0).isEmpty)
    // duplicate windows dedup
    val dup = one(Text.wordShingles(col("t"), 2), "x y x y x y")
      .getSeq[String](0)
    assert(dup.distinct == dup)
  }

  test("normalizeText: NFC composes, controls stripped, whitespace collapsed") {
    def norm(s: String) = one(Text.normalizeText(col("t")), s).getString(0)
    // decomposed e + U+0301 composes to precomposed é (U+00E9)
    assert(norm("cafe\u0301") == "café")
    // already-NFC and pure-ASCII text passes through unchanged
    assert(norm("café") == "café")
    assert(norm("plain ascii") == "plain ascii")
    // C0 controls stripped, tab/newline treated as whitespace not garbage
    assert(norm("a\u0000b\u0007c") == "abc")
    assert(norm("a\tb\nc") == "a b c")
    // whitespace runs collapse, ends trimmed
    assert(norm("  a \t\n  b  ") == "a b")
    assert(norm("") == "")
    // NFC is idempotent through the full pipeline
    val messy = "  x\u0301\u0007  cafe\u0301\ty  "
    assert(norm(messy) == norm(norm(messy)))
  }

  test("token counts: whitespace and BPE-ish regex") {
    assert(one(Text.tokenCount(col("t")), "one two three").getInt(0) == 3)
    val bpe = one(Text.bpeTokenCount(col("t")), "don't stop me now")
      .getInt(0)
    assert(bpe >= 4, s"bpe-ish count too small: $bpe")
    assert(one(Text.bpeTokenCount(col("t")), "").getInt(0) == 0)
  }

  test("langId: stopword + CJK heuristics on hand fixtures") {
    def lid(s: String) = one(Text.langId(col("t")), s).getString(0)
    assert(lid("the cat is in the house and it is not far from the barn") == "en")
    assert(lid("der hund ist nicht in dem haus und die katze ist auf dem dach") == "de")
    assert(lid("el perro y la casa de los gatos es un lugar para el sol") == "es")
    assert(lid("le chien est dans la maison et les chats sont sur le toit") == "fr")
    assert(lid("今天天气很好我们去公园散步吧") == "zh")
    assert(lid("qwerty zxcvb plmokn") == "und")
    assert(lid("") == "und")
  }

  test("langId: the multilingual profiles and char-class rules") {
    def lid(s: String) = one(Text.langId(col("t")), s).getString(0)
    graft.ops.Corpus.LangPlants.foreach { case (lang, snippet) =>
      assert(lid(snippet) == lang, s"plant '$lang' mis-detected")
    }
    // kana identifies Japanese even with a kanji majority
    assert(lid("日本語の文章は漢字とかなで書かれています") == "ja")
    // hangul decides before anything else
    assert(lid("한국어 문서 입니다") == "ko")
  }

  test("langId ladder: DOCUMENTED limitations the trained classifier " +
    "(graft.ml.LangModel) exists to fix") {
    def lid(s: String) = one(Text.langId(col("t")), s).getString(0)
    // 1. kanji-only Japanese (kana <= 5%): only the CJK char-class
    //    rule fires, so the ladder says zh. The char census cannot
    //    know WHICH ideographs are Japanese usage — that is lexical
    //    evidence, the LangModel hashed-n-gram signal.
    //    LangModelSpec pins the model detecting ja on this fixture.
    assert(lid("東京大学日本語教育研究所") == "zh")
    // 2. Latin-brand-heavy Arabic (mixed-direction): enough Arabic
    //    function words still win the argmax — the ladder handles
    //    this one — but drop below the profile floor and it
    //    degrades to whichever Latin profile the brand words hit.
    assert(lid("هذا التقرير من Google Cloud Platform عن الأداء") == "ar")
    assert(lid("Google Cloud Platform und Amazon Web Services تقرير") == "de")
    // 3. sub-threshold short doc: no stopword hits, no script rule ->
    //    und; a trained model still has char-n-gram evidence.
    assert(lid("zebra quokka") == "und")
  }

  test("tokenize keeps combining marks inside tokens") {
    // Devanagari vowel signs (Mn/Mc) must not split the word: के is
    // क + U+0947, की is क + U+0940
    val toks = one(Text.tokenize(col("t")), "के घर की").getSeq[String](0)
    assert(toks == Seq("के", "घर", "की"))
    // Arabic with a haraka
    val ar = one(Text.tokenize(col("t")), "كَتب").getSeq[String](0)
    assert(ar == Seq("كَتب"))
    // mark-free text unchanged vs the letter/digit-only form
    assert(one(Text.tokenize(col("t")), "Hello, World!").getSeq[String](0)
      == Seq("hello", "world"))
  }

  test("quality features and score: sane ranges, junk scores low") {
    val f = one(Text.qualityFeatures(col("t")),
      "a clean readable sentence with several distinct words")
    val row = f.getStruct(0)
    assert(row.getAs[Int]("n_tokens") == 8)
    assert(row.getAs[Double]("distinct_ratio") == 1.0)
    assert(row.getAs[Double]("punct_ratio") == 0.0)

    def score(s: String) = one(Text.qualityScore(col("t")), s).getDouble(0)
    val clean = score("the quick brown fox jumps over the lazy dog near the river bank")
    val junk = score("!!! ??? *** !!! ??? *** !!! ???")
    assert(clean >= 0.0 && clean <= 1.0)
    assert(junk >= 0.0 && junk <= 1.0)
    assert(clean > junk, s"clean=$clean junk=$junk")
  }

  test("fingerprint: equal for identical text, sketch bounded by s") {
    val df = Seq("a b c d e f g h", "a b c d e f g h", "z y x w v u t s")
      .toDF("t")
      .select(Text.fingerprint(col("t")).as("fp"),
              Text.fingerprintSketch(col("t"), 3, 4).as("sk"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(1).getString(0))
    assert(rows(0).getString(0) != rows(2).getString(0))
    assert(rows.forall(_.getSeq[String](1).size <= 4))
    assert(rows.forall(r => r.getSeq[String](1) ==
      r.getSeq[String](1).sorted))
  }

  test("redactPii: typed placeholders, ordering, clean text untouched") {
    def red(s: String) = one(Text.redactPii(col("t")), s).getString(0)
    assert(red("mail bob@example.com today")
      == "mail [EMAIL] today")
    assert(red("see https://ex.org/a?b=1 now") == "see [URL] now")
    assert(red("call 555-123-4567 or +1(800)555-0100 now")
      == "call [PHONE] or [PHONE] now")
    assert(red("host 10.0.0.1 and 192.168.255.254 up")
      == "host [IP] and [IP] up")
    // an email INSIDE a url redacts as part of the [URL], not [EMAIL]
    assert(red("x https://ex.org/mail?to=a@b.co y") == "x [URL] y")
    // a dotted quad must not be phone-eaten
    assert(red("ip 10.0.0.1 phone 555-123-4567")
      == "ip [IP] phone [PHONE]")
    // clean text and plain years survive unchanged
    val clean = "from 1999 to 2001 the three cats slept"
    assert(red(clean) == clean)
    assert(red("") == "")
  }

  // Regression pins for the r6 digit-COUNTING phone pattern (9-digit
  // floor, at most one ().- separator between digits) and the r7
  // removal of the 15-digit ceiling. Each case failed on the pre-r6
  // raw-run pattern (dates/IDs became [PHONE]) or leaves residue under
  // the r6 {8,14} ceiling ('[PHONE]6' for a 16-digit card).
  test("redactPii: digit-counting boundaries (dates survive, 9+ redact)") {
    def red(s: String) = one(Text.redactPii(col("t")), s).getString(0)
    // ISO date (8 digits, separators) and compact date survive
    assert(red("released 2026-08-12 at noon") == "released 2026-08-12 at noon")
    assert(red("build 20260812 shipped") == "build 20260812 shipped")
    // 7–8-digit local numbers knowingly unredacted (documented floor)
    assert(red("call 5551234 today") == "call 5551234 today")
    assert(red("call 555-1234 today") == "call 555-1234 today")
    // 9 digits is the floor: redacts, with or without separators
    assert(red("ssn-shaped 123456789 here") == "ssn-shaped [PHONE] here")
    assert(red("dial 555-123-4567 now") == "dial [PHONE] now")
    // long digit runs redact FULLY — no '[PHONE]6' residue (the r6
    // {8,14} ceiling left trailing digits on 16-digit card numbers)
    assert(red("card 1234567890123456 on file") == "card [PHONE] on file")
    assert(red("iban-ish 12345678901234567890 x") == "iban-ish [PHONE] x")
    // at most ONE separator between digits: a double dash breaks the run
    assert(red("range 1234--56789 ok") == "range 1234--56789 ok")
  }

  test("repetitionSignals: hand-computed line and n-gram fixtures") {
    val r = one(Text.repetitionSignals(col("t")),
                "a b\na b\nc d e\n\n  \nx")
    // lines after trim/blank-drop: [a b, a b, c d e, x]
    assert(r.getStruct(0).getInt(0) == 4)                  // n_lines
    assert(r.getStruct(0).getDouble(1) == 0.25)            // dup_line_frac
    // dup chars: one extra "a b" (3 chars) of 12 line chars
    assert(r.getStruct(0).getDouble(2) == 0.25)
    // tokens: a b a b c d e x (normalized length 15); bigram "a b"
    // occurs twice, len 3 → 6/15; tri/4-grams unique → 5/15, 7/15
    assert(math.abs(r.getStruct(0).getDouble(3) - 6.0 / 15) < 1e-12)
    assert(math.abs(r.getStruct(0).getDouble(4) - 5.0 / 15) < 1e-12)
    assert(math.abs(r.getStruct(0).getDouble(5) - 7.0 / 15) < 1e-12)
  }

  test("repetitionSignals: coverage caps at 1.0, degenerate docs zero") {
    // "a a a a": bigram "a a" ×3 × len 3 = 9 > 7 normalized chars → cap
    val cap = one(Text.repetitionSignals(col("t")), "a a a a")
    assert(cap.getStruct(0).getDouble(3) == 1.0)
    val empty = one(Text.repetitionSignals(col("t")), "")
    assert(empty.getStruct(0).getInt(0) == 0)
    (1 to 5).foreach(i => assert(empty.getStruct(0).getDouble(i) == 0.0))
    // single token: no bigrams → 0.0, not NaN
    val single = one(Text.repetitionSignals(col("t")), "word")
    assert(single.getStruct(0).getDouble(3) == 0.0)
  }
}
