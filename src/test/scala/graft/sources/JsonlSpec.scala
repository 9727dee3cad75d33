package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("source"), col("lang"), col("text"))

  test("documents JSONL round-trip: schema and content preserved") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, Jsonl.documentSchema)
    assert(back.schema == Jsonl.documentSchema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
    // splittable plain-text shards, parallelism preserved
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length >= 1)
    assert(parts.forall(f => f.getName.endsWith(".json")))
  }

  test("gzip JSONL round-trip produces .gz shards with equal content") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/gz"
    Jsonl.write(docs, dir, compression = "gzip")
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".gz")))
    val back = Jsonl.read(spark, dir, Jsonl.documentSchema)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("readWithCorrupt captures malformed lines; corruptStats counts them") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Path.of(dir, "mixed.jsonl"),
      """{"doc_id": 1, "source": "web", "lang": "en", "text": "good row"}
        |{"doc_id": oops not json
        |{"doc_id": 3, "source": "web", "lang": "fr", "text": "bon"}
        |also completely unparseable
        |""".stripMargin)
    val df = Jsonl.readWithCorrupt(spark, dir + "/mixed.jsonl",
      Jsonl.documentSchema).cache()
    assert(df.count() == 4)
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 2)
    assert(good.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      == Set(1L, 3L))
    // the raw offending line text is preserved for quarantine
    assert(bad.filter(col("_corrupt_record")
      .contains("oops not json")).count() == 1)
    val stats = Jsonl.corruptStats(df).head()
    assert(stats.getLong(0) == 4L)
    assert(stats.getLong(1) == 2L)
    assert(math.abs(stats.getDouble(2) - 0.5) < 1e-12)
    // corruptStats must also work on the RAW (uncached) frame — a
    // corrupt-column-only aggregate over a raw JSON scan throws in
    // Spark, so the helper materializes internally (round-5 review)
    val raw = Jsonl.readWithCorrupt(spark, dir + "/mixed.jsonl",
      Jsonl.documentSchema)
    val rawStats = Jsonl.corruptStats(raw).head()
    assert(rawStats.getLong(0) == 4L && rawStats.getLong(1) == 2L)
  }

  test("FAILFAST read dies on a malformed line instead of nulling it") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Path.of(dir, "bad.jsonl"),
      "{\"doc_id\": 1, \"source\": \"web\", \"lang\": \"en\", \"text\": \"x\"}\nnot json\n")
    val e = intercept[Exception] {
      Jsonl.read(spark, dir + "/bad.jsonl", Jsonl.documentSchema).collect()
    }
    assert(e.getMessage != null)
  }

  test("writePartitioned lays out lang= directories and reads back whole") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/bylang"
    Jsonl.writePartitioned(docs, dir, Seq("lang"))
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    val nLangs = docs.select(col("lang")).distinct().count()
    assert(langDirs.length == nLangs)
    // the partition column round-trips via directory names: read with
    // the data-only schema; partition discovery appends `lang`
    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType(
        Jsonl.documentSchema.filterNot(_.name == "lang").toArray))
      .json(dir)
    assert(back.columns.contains("lang"))
    val realigned = back.select(docs.columns.map(col): _*)
    assert(realigned.count() == docs.count())
    assert(realigned.exceptAll(docs).count() == 0)
  }
}
