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

  // --- r6-fix regression pins (each failed on the pre-r6 code) ----------

  test("binPackGreedy: null token count fails loudly, names the doc") {
    import spark.implicits._
    val docs = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("doc_id", "n_tokens")
    val ex = intercept[Exception] {
      Packing.binPackGreedy(docs, "n_tokens", 512, numPartitions = 1)
        .collect()
    }
    // thrown inside a task → surfaces wrapped in SparkException; the
    // require message must survive in the cause chain
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(messages(ex).exists(_.contains("binPackGreedy: null")),
      s"expected the null-token require message, got: ${messages(ex)}")
  }

  test("binPackGreedy: negative token count fails loudly") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, -3L)).toDF("doc_id", "n_tokens")
    val ex = intercept[Exception] {
      Packing.binPackGreedy(docs, "n_tokens", 512, numPartitions = 1)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(messages(ex).exists(m =>
      m.contains("negative") && m.contains("n_tokens")),
      s"expected the negative-token require message, got: ${messages(ex)}")
  }

  test("binPackGreedy: oversized bin is sealed — even a zero-token doc " +
       "cannot join it") {
    import spark.implicits._
    // pre-r6 the over-budget bin kept remaining = budget − min(tok,
    // budget) = 0, which a zero-token doc's first-fit (needs remaining
    // >= 0) happily joined — the -1L seal pins the bin singleton
    val docs = Seq((1L, 900L), (2L, 0L), (3L, 0L), (4L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.binPackGreedy(docs, "n_tokens", 512,
      numPartitions = 1).cache()
    val bigBin = out.filter(col("doc_id") === 1L).select(col("bin_id"))
      .head().getLong(0)
    assert(out.filter(col("bin_id") === bigBin).count() == 1,
      "zero-token docs must not share the sealed over-budget bin")
    assert(out.count() == 4)
  }

  test("concatChunks owns its evaluation count: upstream runs once") {
    // the operator makes three passes over its input (quantile probe,
    // bucket totals, window) — its internal lazy localCheckpoint must
    // shield an expensive upstream DAG from re-execution (VERDICT r7 #3)
    import spark.implicits._
    val evals = spark.sparkContext.longAccumulator("upstream-row-evals")
    val upstream = spark.range(100).as[Long]
      .map { id => evals.add(1); (id, id % 7 + 1) }
      .toDF("doc_id", "n_tokens")
    val out = Packing.concatChunks(upstream, "n_tokens", 16)
    assert(out.count() == 100)
    assert(evals.value == 100,
      s"upstream evaluated ${evals.value} row-visits; the internal " +
      "checkpoint must hold it to one pass (100)")
    // opting out restores pass-through semantics (caller owns caching)
    val evals2 = spark.sparkContext.longAccumulator("uncheckpointed")
    val upstream2 = spark.range(100).as[Long]
      .map { id => evals2.add(1); (id, id % 7 + 1) }
      .toDF("doc_id", "n_tokens")
    Packing.concatChunks(upstream2, "n_tokens", 16, ownInput = false).count()
    assert(evals2.value > 100, "ownInput=false must not checkpoint")
  }

  test("chunkOverlap: windows tile with overlap, reconstruct the doc, " +
       "short tail, null text drops") {
    import spark.implicits._
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b c"), (3L, null))
      .toDF("doc_id", "text")
    val out = Packing.chunkOverlap(docs, width = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx")).collect()
    // doc 1: starts 0,24,48,72 → 4 windows; doc 2: one short window;
    // doc 3: none
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 1L, 1L, 1L, 2L))
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[Long]("token_start")).toSeq ==
      Seq(0L, 24L, 48L, 72L))
    assert(d1.map(_.getAs[Long]("n_tokens")).toSeq ==
      Seq(32L, 32L, 32L, 8L))
    // consecutive windows overlap by width − stride = 8 tokens
    val w0 = d1(0).getAs[String]("chunk_text").split(" ")
    val w1 = d1(1).getAs[String]("chunk_text").split(" ")
    assert(w0.takeRight(8).toSeq == w1.take(8).toSeq)
    // stride-spaced prefixes reconstruct the doc exactly
    val rebuilt = d1.flatMap(r =>
      r.getAs[String]("chunk_text").split(" ").take(24)).toSeq ++
      d1.last.getAs[String]("chunk_text").split(" ").drop(24)
    assert(rebuilt.mkString(" ") == text)
    assert(out.filter(_.getLong(0) == 2L).head
      .getAs[Long]("n_tokens") == 3L)
  }

  test("concatChunks: chunk ids are exact past 2^53 (div, not double /)") {
    import spark.implicits._
    // offset 2^53+1 is not double-representable: double division by 3
    // floors to 3002399751580330; exact integral div gives …331
    val big = 9007199254740993L // 2^53 + 1 = 3 * 3002399751580331
    val docs = Seq((1L, big), (2L, 5L)).toDF("doc_id", "n_tokens")
    val out = Packing.concatChunks(docs, "n_tokens", budget = 3)
      .orderBy(col("doc_id")).collect()
    assert(out(1).getAs[Long]("offset") == big)
    assert(out(1).getAs[Long]("chunk") == 3002399751580331L,
      s"chunk must use integral div; got ${out(1).getAs[Long]("chunk")}")
    // first doc straddles: last token at big-1 = 2^53, chunk_end exact
    assert(out(0).getAs[Long]("chunk_end") == 3002399751580330L)
  }
}
