package graft.pipelines

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val sized: DataFrame = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
    .cache()

  test("concatChunks: offsets are the exact prefix sums, chunks consistent") {
    val budget = 512
    val out = Packing.concatChunks(sized, "n_tokens", budget).cache()
    assert(out.count() == sized.count())
    // offset(row i) = offset(i-1) + tokens(i-1) and starts at 0,
    // i.e. offset + n_tokens = next row's offset — check via window
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val chained = out
      .withColumn("next_offset", lead(col("offset"), 1).over(w))
      .filter(col("next_offset").isNotNull)
      .filter(col("next_offset") =!= col("offset") + col("n_tokens"))
    assert(chained.count() == 0)
    assert(out.orderBy(col("doc_id")).select(col("offset"))
      .head().getLong(0) == 0L)
    // chunk arithmetic: chunk = offset / budget, chunk_end covers the
    // last token, straddling docs have chunk_end > chunk
    assert(out.filter(col("chunk") =!= (col("offset") / budget)
      .cast("long")).count() == 0)
    assert(out.filter(col("chunk_end") < col("chunk")).count() == 0)
    val straddlers = out.filter(
      (col("offset") % budget) + col("n_tokens") > budget)
    assert(straddlers.count() ==
      out.filter(col("chunk_end") > col("chunk")).count())
  }

  test("binPackGreedy: exact cover, no bin over budget, bounded waste") {
    val budget = 512
    val out = Packing.binPackGreedy(sized, "n_tokens", budget,
      numPartitions = 4).cache()
    // every document assigned exactly once
    assert(out.count() == sized.count())
    assert(out.select(col("doc_id")).distinct().count() == sized.count())
    val bins = out.groupBy(col("bin_id"))
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("n"))
      .cache()
    // a bin only exceeds the budget when it holds a single oversized doc
    assert(bins.filter(col("tok") > budget && col("n") > 1).count() == 0)
    // waste bound: first-fit-decreasing per partition; allow generous
    // slack of one open bin per partition over the theoretical minimum
    val total = sized.agg(sum(col("n_tokens"))).head().getLong(0)
    val minBins = math.ceil(total.toDouble / budget).toLong
    val gotBins = bins.count()
    assert(gotBins <= 2 * minBins + 4,
      s"bin count $gotBins vs theoretical min $minBins")
  }

  test("binPackGreedy: oversized documents get singleton bins") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 900L), (3L, 200L), (4L, 150L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.binPackGreedy(docs, "n_tokens", 512,
      numPartitions = 2).cache()
    val big = out.filter(col("doc_id") === 2L).select(col("bin_id"))
      .head().getLong(0)
    assert(out.filter(col("bin_id") === big).count() == 1,
      "an over-budget doc must sit alone in its bin")
    assert(out.count() == 4)
  }

  test("binPackGreedy is deterministic") {
    def snap() = Packing.binPackGreedy(sized, "n_tokens", 512,
      numPartitions = 4).orderBy(col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(snap() == snap())
  }
}
