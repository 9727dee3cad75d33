package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ratings CSV round-trip: schema, values, nulls preserved") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/ratings"
    val in = Seq(
      (Some(1), Some(10), Some(4.5), Some(111L)),
      (Some(2), Some(20), Some(3.0), Some(222L)),
      (None, Some(30), Some(2.5), Some(333L)),
      (Some(4), None, None, None))
      .toDF("userId", "movieId", "rating", "timestamp")
    Csv.write(in, dir)
    val back = Csv.readRatings(spark, dir)
    assert(back.schema == Csv.ratingsSchema)
    assert(back.count() == 4)
    assert(back.exceptAll(in).count() == 0)
    assert(in.exceptAll(back).count() == 0)
  }

  test("twin-pairs CSV round-trip (the q1_pairs.csv flow)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/pairs"
    val pairs = Seq((1, 2, 0.75), (3, 9, 1.0))
      .toDF("userA", "userB", "similarity")
    Csv.write(pairs, dir)
    val back = Csv.read(spark, dir, Csv.pairsSchema)
    assert(back.schema == Csv.pairsSchema)
    assert(back.exceptAll(pairs).count() == 0)
    assert(pairs.exceptAll(back).count() == 0)
  }

  test("write does not force a single output file") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/parts"
    val df = spark.range(1000).repartition(4)
      .select(col("id").cast("int").as("userId"),
              col("id").cast("int").as("movieId"),
              lit(1.0).as("rating"), col("id").as("timestamp"))
    Csv.write(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(parts > 1, "engine core must not coalesce(1)")
  }

  test("FAILFAST read surfaces malformed rows") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "bad.csv"),
      "userId,movieId,rating,timestamp\n1,2,notadouble,4\n")
    val e = intercept[Exception] {
      Csv.read(spark, dir + "/bad.csv", Csv.ratingsSchema).collect()
    }
    assert(e.getMessage != null)
  }
}
