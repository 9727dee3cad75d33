package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C4 cleaning ruleset ([[C4]]): line filter, page policy, and the
  * corpus-level three-sentence span dedup. */
class C4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keptLines(text: String): Seq[String] = {
    val out = C4.cleanLines(Seq((1L, text)).toDF("doc_id", "text"))
      .select("text").as[String].head()
    if (out.isEmpty) Nil else out.split("\n").toSeq
  }

  test("line filter: terminal punctuation required") {
    val t = "a good long sentence ends here.\n" +
      "this line never terminates properly\n" +
      "does a question mark count as terminal?\n" +
      "an exclamation certainly does count too!\n" +
      "a quoted ending also passes the rule.\""
    assert(keptLines(t).size == 4)
    assert(!keptLines(t).exists(_.contains("never terminates")))
  }

  test("line filter: five-word floor and javascript drop") {
    val t = "too short line.\n" +
      "please enable javascript to continue viewing.\n" +
      "a perfectly fine content sentence stays here."
    assert(keptLines(t) ==
      Seq("a perfectly fine content sentence stays here."))
  }

  test("page policy: each raw-text rule fires with its reason") {
    val good = (1 to 5).map(i =>
      s"sentence number $i has enough words here.").mkString("\n")
    val cases = Seq(
      (1L, good, 1L, null),
      (2L, good + "\nvisit our casino bonus pages now.", 0L,
        "badwords"),
      (3L, good + "\nlorem ipsum dolor sit amet filler.", 0L,
        "lorem_ipsum"),
      (4L, good + "\ncode with a { brace inside it.", 0L, "brace"),
      (5L, "only two sentences live here today.\n" +
        "the second one is right here.", 0L, "sentences"))
    val v = C4.pageVerdict(C4.cleanLines(
      cases.map(c => (c._1, c._2)).toDF("doc_id", "text")))
      .select("doc_id", "keep", "drop_reason")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toMap
    cases.foreach { c => assert(v(c._1) == ((c._3, c._4)), s"doc ${c._1}") }
  }

  test("badword match is word-boundary: sussex is not sex") {
    val df = Seq((1L, "the sussex countryside is lovely today."))
      .toDF("doc_id", "text")
    assert(C4.pageVerdict(C4.cleanLines(df))
      .select("pass_badwords").as[Long].head() == 1L)
  }

  test("three-sentence span dedup removes all but the first holder") {
    val span = Seq(
      "first shared sentence with plenty of words.",
      "second shared sentence with plenty of words.",
      "third shared sentence with plenty of words.")
    def page(id: Long, own: String) =
      (id, (own +: span).mkString("\n"))
    val docs = Seq(
      page(1L, "unique opener for the first document here."),
      page(2L, "unique opener for the second document here."),
      page(3L, "unique opener for the third document here."))
      .toDF("doc_id", "text")
    val out = C4.spanDedup3(docs)
      .select("doc_id", "text", "n_sent", "n_removed")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 (smallest id, smallest pos) keeps the span
    assert(out(1L)._2 == 4L && out(1L)._3 == 0L)
    assert(out(1L)._1.contains("first shared sentence"))
    // docs 2 and 3 lose exactly the three shared sentences
    Seq(2L, 3L).foreach { id =>
      assert(out(id)._2 == 1L && out(id)._3 == 3L)
      assert(!out(id)._1.contains("shared sentence"))
      assert(out(id)._1.startsWith("unique opener"))
    }
  }

  test("span dedup: overlapping duplicate windows union their marks") {
    // doc 1: s1..s4; doc 2 repeats s1..s4 → windows (1,2,3) and
    // (2,3,4) both duplicated; doc 2 loses all four sentences and
    // drops out of the result entirely
    val sents = (1 to 4).map(i =>
      s"repeated sentence number $i carries weight.")
    val docs = Seq((1L, sents.mkString("\n")), (2L, sents.mkString("\n")))
      .toDF("doc_id", "text")
    val out = C4.spanDedup3(docs).select("doc_id", "n_sent")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L))
  }

  test("a document with no duplicated window is untouched") {
    val docs = Seq(
      (1L, "alpha one two three four five.\nbeta one two three four."),
      (2L, "gamma six seven eight nine ten.")).toDF("doc_id", "text")
    val out = C4.spanDedup3(docs).select("doc_id", "n_removed")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("sentences(): internal sentence breaks split within a line") {
    val df = Seq((1L, "one full sentence here. and another one too! " +
      "a third asks a question?")).toDF("doc_id", "text")
    val n = df.select(size(C4.sentences(col("text")))).as[Int].head()
    assert(n == 3)
  }

  test("badword with regex metacharacters matches literally") {
    val df = Seq(
      (1L, "the acb token must not match a dot pattern."),
      (2L, "the a.b token is the literal bad word.")).toDF("doc_id", "text")
    // unquoted, 'a.b' would match 'acb' too; quoted it matches only
    // the literal — and 'c++' must not throw at pattern compile
    val hits = df.select(col("doc_id"),
      C4.badWordHit(col("text"), Seq("a.b", "c++")).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    assert(hits == Map(1L -> false, 2L -> true))
  }

  test("spanDedup3 refuses a non-integral id column loudly") {
    val df = Seq(("a", "one two three four five six."))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](C4.spanDedup3(df))
    assert(e.getMessage.contains("integral id column"))
  }

  test("spanDedup3 passes empty/whitespace-only docs through untouched") {
    val docs = Seq(
      (1L, "a real sentence with enough words here."),
      (2L, ""),
      (3L, "   ")).toDF("doc_id", "text")
    val out = C4.spanDedup3(docs)
      .select("doc_id", "text", "n_sent", "n_removed")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(1) == ((2L, "", 0L, 0L)))
    assert(out(2) == ((3L, "", 0L, 0L)))
  }

  test("cleanLines/pageVerdict refuse reserved caller columns") {
    val clash1 = Seq((1L, "t", "x")).toDF("doc_id", "text", "raw_text")
    val e1 = intercept[IllegalArgumentException](C4.cleanLines(clash1))
    assert(e1.getMessage.contains("raw_text"))
    val clash2 = Seq((1L, "t", 1L)).toDF("doc_id", "text", "keep")
    val e2 = intercept[IllegalArgumentException](C4.pageVerdict(clash2))
    assert(e2.getMessage.contains("keep"))
  }
}
