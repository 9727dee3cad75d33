package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence tests for the custom Catalyst kernels: the
  * expression evaluated through a real plan (codegen path) must match
  * an independent pure-Scala reference on arbitrary inputs, and the
  * Exact fixed-point helpers must be exact at extreme counts. */
class KernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private def randToken(): String =
    Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString

  test("Shingles expression matches a pure-Scala reference on random input") {
    def reference(toks: Seq[String], k: Int): Seq[String] =
      if (toks.isEmpty) Seq.empty
      else if (toks.size < k) Seq(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct

    val cases = Seq.fill(200)(Seq.fill(rnd.nextInt(25))(randToken())) ++
      Seq(Seq.empty[String], Seq("solo"), Seq("a", "a", "a", "a"))
    for (k <- Seq(1, 2, 3, 5)) {
      val got = cases.toDF("toks")
        .select(Shingles.shingles(col("toks"), k).as("sh"))
        .collect().map(_.getSeq[String](0).toSeq)
      cases.zip(got).foreach { case (in, out) =>
        assert(out == reference(in, k), s"k=$k input=$in")
      }
    }
  }

  test("SimHash64 expression matches a pure-Scala reference on random input") {
    def reference(toks: Seq[String]): Long = {
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = SimHash64.fnv1a64(t.getBytes("UTF-8"))
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val cases = Seq.fill(200)(Seq.fill(rnd.nextInt(40))(randToken())) :+
      Seq.empty[String]
    val got = cases.toDF("toks")
      .select(SimHash64.simhash64(col("toks")).as("sig"))
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case (in, out) =>
      assert(out == reference(in), s"input=$in")
    }
  }

  test("DotProduct expression matches the HOF form bit-for-bit") {
    val cases = Seq.fill(200) {
      val n = rnd.nextInt(40)
      (Seq.fill(n)(rnd.nextFloat() * 2 - 1), Seq.fill(n)(rnd.nextFloat() * 2 - 1))
    } :+ ((Seq.empty[Float], Seq.empty[Float]))
    val df = cases.toDF("a", "b")
    val got = df.select(
        graft.similarity.Similarity.dot(col("a"), col("b")).as("native"),
        graft.similarity.Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    // length mismatch and null element → null, like zip_with padding
    val edge = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(graft.similarity.Similarity.dot(col("a"), col("b")).as("d"))
    assert(edge.head().isNullAt(0), "length mismatch must be null")
  }

  test("LangHits expression matches a pure-Scala reference on random input") {
    val vocab = LangHits.Profiles.flatMap(_._2) ++ Seq("xx", "yy", "zz")
    val cases = Seq.fill(200)(
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))) :+
      Seq.empty[String]
    def reference(toks: Seq[String]): Seq[Int] =
      toks.size +: LangHits.Profiles.map { case (_, ws) =>
        toks.count(ws.toSet)
      }
    val got = cases.toDF("toks")
      .select(LangHits.langHits(col("toks")).as("h"))
      .collect().map { r =>
        val s = r.getStruct(0)
        (0 until s.length).map(s.getInt)
      }
    cases.zip(got).foreach { case (in, out) =>
      assert(out == reference(in), s"input=$in")
    }
  }

  test("RepetitionStats expression matches the HOF reference bit-for-bit") {
    import graft.text.Text
    // random multi-line docs over a tiny vocabulary so duplicate lines
    // and repeated n-grams actually occur, plus hand edge cases
    def randDoc(): String = {
      val vocab = Seq("a", "bb", "ccc", "dd", "e")
      val lines = Seq.fill(rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      lines.mkString("\n")
    }
    val cases = Seq.fill(300)(randDoc()) ++ Seq(
      "", "a b\na b\nc d e\n\n  \nx", "a a a a", "word",
      "x\n\nx", "one two\none two\none two")
    val df = cases.toDF("text")
      .select(col("text"), Text.docLines(col("text")).as("ls"),
              Text.tokenize(col("text")).as("toks"))
      .select(col("text"), col("ls"), array_distinct(col("ls")).as("dls"),
              col("toks"), length(concat_ws(" ", col("toks"))).as("nchars"))
      .select(col("text"),
              Text.repetitionSignals(col("text")).as("kernel"),
              Text.repetitionSignalsFromParts(
                col("ls"), col("dls"), col("toks"), col("nchars"))
                .as("hof"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getStruct(1) == r.getStruct(2),
        s"kernel=${r.getStruct(1)} hof=${r.getStruct(2)} " +
          s"text=${r.getString(0).take(80)}")
    }
  }

  test("LangId kernel == the composed 16-profile ladder") {
    import graft.text.Text
    // random token soups over the union vocabulary (collisions across
    // profiles included — 'de' is es/fr/nl), the 19 planted texts, and
    // char-rule scripts
    val vocab = LangHits.Profiles.flatMap(_._2) ++ Seq("zz", "qq", "xx")
    val soups = Seq.fill(300)(
      Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")) ++
      graft.ops.Corpus.LangPlants.map(_._2) ++
      Seq("", "   ", "日本語のかな混じり文", "한국어 문장",
        "中文内容测试")
    val rows = soups.toDF("text")
      .select(col("text"),
        Text.langIdFromTokens(Text.tokenize(col("text")), col("text"))
          .as("kernel"),
        Text.langIdComposed(Text.tokenize(col("text")), col("text"))
          .as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"kernel=${r.getString(1)} composed=${r.getString(2)} " +
          s"text=${r.getString(0).take(60)}")
    }
  }

  test("ScriptHits kernel == the regexp_count composed form per script") {
    // random mixed-script strings: snippets from every census block,
    // plus digits/punct/supplementary chars that match no range
    val pieces = Seq(
      "abc", "ÀÉñç", "ďøß", "привет", "αβγδ", "مرحبا", "שלום",
      "नमस्ते", "中文字", "한글", "かなカナ", "123", "!!?.", "×÷",
      "😀", " ", "\n")
    val cases = Seq.fill(300)(
      Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size)))
        .mkString("")) ++ Seq("", "a", "の")
    val k = ScriptHits.scriptHits(col("text"))
    val cols = col("text") +: length(col("text")).cast("long")
      .as("len") +: k.getField("n_chars").as("k_chars") +:
      graft.text.Scripts.Ranges.flatMap { case (name, range) =>
        Seq(k.getField(s"n_$name").as(s"k_$name"),
          regexp_count(col("text"), lit(range)).cast("long")
            .as(s"r_$name"))
      }
    cases.toDF("text").select(cols: _*).collect().foreach { r =>
      assert(r.getAs[Long]("k_chars") == r.getAs[Long]("len"),
        s"n_chars != length() on ${r.getString(0)}")
      graft.text.Scripts.Ranges.foreach { case (name, _) =>
        assert(r.getAs[Long](s"k_$name") == r.getAs[Long](s"r_$name"),
          s"$name diverges on ${r.getString(0)}")
      }
    }
  }

  test("CharNgrams expression matches a pure-Scala reference " +
    "(incl. astral-plane code points)") {
    def reference(s: String, nMin: Int, nMax: Int,
                  maxChars: Int): Seq[String] = {
      val cps = s.codePoints().toArray.take(maxChars)
        .map(Character.toChars(_).mkString)
      (nMin to nMax).flatMap(n => cps.sliding(n).filter(_.length == n)
        .map(_.mkString))
    }
    val astral = "a😀b😁c"  // a😀b😁c
    val cases = Seq.fill(150)(
      Seq.fill(rnd.nextInt(40))(
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar.toString
        else new String(Character.toChars(0x10000 + rnd.nextInt(0x100))))
        .mkString) ++ Seq("", "x", astral, "日本語の文書")
    for ((nMin, nMax, mc) <- Seq((1, 3, 300), (2, 2, 5), (1, 4, 10))) {
      val got = cases.toDF("t")
        .select(CharNgrams.charNgrams(col("t"), nMin, nMax, mc).as("g"))
        .collect().map(_.getSeq[String](0).toSeq)
      cases.zip(got).foreach { case (in, out) =>
        assert(out == reference(in, nMin, nMax, mc),
          s"nMin=$nMin nMax=$nMax maxChars=$mc input=$in")
      }
    }
    // never splits a surrogate pair: every output n-gram is valid UTF-16
    val grams = Seq(astral).toDF("t")
      .select(CharNgrams.charNgrams(col("t"), 1, 3, 300).as("g"))
      .head().getSeq[String](0)
    grams.foreach { g =>
      assert(!Character.isLowSurrogate(g.charAt(0)) &&
        !Character.isHighSurrogate(g.charAt(g.length - 1)), s"split: $g")
    }
  }

  test("Exact sumCents/avgFromCents is exact at extreme counts") {
    // 2dp values whose float sum drifts: many 0.01-grid values
    val n = 200000
    val df = spark.range(n)
      .select(((col("id") % 10000).cast("double") / 100.0 + 0.07).as("x"))
    val sumCents = df.agg(Exact.sumCents(col("x"))).head().getLong(0)
    // reference: integer arithmetic on the driver
    val want = (0L until n).map(i => (i % 10000) + 7L).sum
    assert(sumCents == want, s"got $sumCents want $want")
    val avg = df.agg(
      Exact.avgFromCents(Exact.sumCents(col("x")), count(lit(1))))
      .head().getDouble(0)
    assert(avg == want.toDouble / (n.toDouble * 100.0))
  }
}
