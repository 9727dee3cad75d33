package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained hashed char-n-gram language classifier: training
  * accuracy, the kanji-only-ja fix (the ladder's documented edge —
  * TextSpec pins the ladder saying zh on the same fixture), ≥ 95%
  * agreement with the heuristic ladder on the 19-language plants,
  * fit determinism, and the und confidence floor. */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = LangModel.trainingCorpus(spark)
  private lazy val fitted = LangModel.fit(corpus)

  test("training corpus: every language recovered on its own rows") {
    val scored = fitted.score(corpus.withColumnRenamed("lang", "truth"))
    val n = scored.count()
    val right = scored.filter(col("truth") === col("lang_pred")).count()
    assert(n > 100, s"corpus unexpectedly small: $n")
    assert(right == n,
      s"train accuracy $right/$n — misses: " +
        scored.filter(col("truth") =!= col("lang_pred"))
          .select("truth", "lang_pred", "text").collect().take(5)
          .mkString("; "))
  }

  test("kanji-only Japanese detects ja (the ladder's zh edge, fixed)") {
    val docs = Seq(
      "東京大学日本語教育研究所",            // the TextSpec ladder fixture
      "日本語教育研究所年次報告書概要",       // kanji-only, unseen order
      "统计分析引擎正在处理中文文本数据"      // zh control
    ).toDF("text")
    val got = fitted.score(docs)
      .select("text", "lang_pred").as[(String, String)].collect().toMap
    assert(got("東京大学日本語教育研究所") == "ja")
    assert(got("日本語教育研究所年次報告書概要") == "ja")
    assert(got("统计分析引擎正在处理中文文本数据") == "zh")
  }

  test("agreement with the heuristic ladder >= 95% on the planted " +
    "multilingual corpus (and 100% on the plants themselves)") {
    val out = graft.ops.Corpus.langIdModel(spark, "/root/testdata/sf0.001")
    val planted = out.filter(col("doc_id") % 24 < 19)
    val nPlanted = planted.count()
    val agreePlanted = planted.filter(col("agree") === 1L).count()
    assert(nPlanted > 0)
    assert(agreePlanted.toDouble / nPlanted >= 0.95,
      s"plant agreement $agreePlanted/$nPlanted")
    // exact-plant rows should agree perfectly: the model was trained
    // on rotations of these very snippets
    val misses = planted.filter(col("agree") === 0L)
      .select("doc_id", "detected", "predicted").collect()
    assert(misses.length <= (nPlanted * 0.05).toInt,
      s"plant misses: ${misses.take(10).mkString("; ")}")
  }

  test("fit is deterministic: two fits, identical predictions") {
    val again = LangModel.fit(corpus)
    val probe = Seq(
      "the cat sat on the mat near the house",
      "der hund und die katze auf dem dach",
      "統計的な処理をする日本語の文書",
      "대규모 데이터 처리").toDF("text")
    val a = fitted.score(probe).select("text", "lang_pred", "lang_conf")
      .collect().map(_.toString).sorted.toSeq
    val b = again.score(probe).select("text", "lang_pred", "lang_conf")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // and the weight matrices agree bit-for-bit
    assert(fitted.model.coefficientMatrix == again.model.coefficientMatrix)
  }

  test("curation opt-in: the trained model rescues kanji-only ja docs " +
    "the ladder mislabels zh; funnel's lang stage agrees") {
    import graft.pipelines.Curation
    val docs = (0L until 20L).map { i =>
      if (i % 4 == 0)
        (i, s"東京大学日本語教育研究所年次報告書概要 $i")
      else
        (i, s"the cat and the dog of this house are not in that tree $i")
    }.toDF("doc_id", "text")
    // near-dup off (the en rows differ only by number) and quality
    // floor off: this case isolates the LANGUAGE stage
    val base = Curation.Config(langs = Set("en", "ja"),
      minQuality = 0.0, maxUrls = 1000, nearDupJaccard = 1.01)
    val ladder = Curation.curate(docs, base)
    assert(ladder.filter(col("detected") === "ja").count() == 0,
      "ladder unexpectedly detected ja on kanji-only text")
    assert(ladder.count() == 15) // the 5 ja docs dropped as zh
    val withModel = base.copy(langModel = Some(fitted),
      langModelMinConf = 0.0)
    val modeled = Curation.curate(docs, withModel)
    assert(modeled.count() == 20)
    assert(modeled.filter(col("detected") === "ja").count() == 5)
    // funnel parity: the lang stage counts what curate filtered
    val funnelLang = Curation.funnelFrame(docs, withModel)
      .select("lang").head().getLong(0)
    assert(funnelLang == 20L)
    val funnelLadder = Curation.funnelFrame(docs, base)
      .select("lang").head().getLong(0)
    assert(funnelLadder == 15L)
    // and the streaming ingest takes the same opt-in (batch mode)
    val streamed = graft.streaming.CurationStream.ingest(docs, withModel)
    assert(streamed.count() == 20)
  }

  test("save/load round-trips the fitted classifier exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-langmodel").toString
    LangModel.save(fitted, dir)
    val loaded = LangModel.load(spark, dir)
    assert(loaded.labels == fitted.labels)
    assert(loaded.numFeatures == fitted.numFeatures)
    val probe = Seq(
      "the cat sat on the mat near the house",
      "東京大学日本語教育研究所",
      "der hund und die katze").toDF("text")
    val a = fitted.score(probe).select("text", "lang_pred", "lang_conf")
      .collect().map(_.toString).sorted.toSeq
    val b = loaded.score(probe).select("text", "lang_pred", "lang_conf")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("minConf floor: gibberish degrades to und, clean text does not") {
    val docs = Seq("the cat and the dog of this house are not in that tree")
      .toDF("text")
    val conf = fitted.score(docs).select("lang_conf").head().getDouble(0)
    assert(conf > 0.9, s"clean en conf $conf")
    val floored = fitted.score(docs, minConf = conf + 0.05)
      .select("lang_pred").head().getString(0)
    assert(floored == "und")
  }
}
