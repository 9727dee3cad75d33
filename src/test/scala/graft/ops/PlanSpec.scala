package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits: the scaling claims in scaladocs/SCALING.md,
  * checked against the ACTUAL plans (`explain formatted`), so a
  * regression that silently changes a join strategy or un-pushes a
  * filter fails CI — not just a slower bench three rounds later. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def plan(df: DataFrame): String = {
    // sibling suites .cache() shared tables; a cached input swaps the
    // parquet scan for InMemoryTableScan and every scan-shape assertion
    // here goes vacuous or false depending on suite ORDER (flaked when
    // SplittingSpec preceded this suite). Plans are asserted against a
    // cache-free catalog; other suites' cached frames just recompute.
    spark.catalog.clearCache()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("filters and projections reach the parquet scan") {
    val p = plan(Relational.filterNotNullThreshold(spark, dir))
    assert(p.contains("PushedFilters:") &&
           p.contains("GreaterThanOrEqual(o_totalprice,50000.0)"), p)
    // 3-column projection must not scan the rest of the table
    val scanLine = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!scanLine.contains("o_orderdate") && !scanLine.contains("o_comment"),
      s"projection not pruned at the scan: $scanLine")
  }

  test("pair queries pair via broadcast nested-loop, not a shuffle join") {
    for (df <- Seq(Relational.selfJoinPairs(spark, dir),
                   Stats.corrPerPair(spark, dir))) {
      val p = plan(df)
      assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
      assert(!p.contains("SortMergeJoin"), "unexpected shuffle join")
    }
  }

  test("corr pairs use the native pearson kernel inside the plan") {
    val p = plan(Stats.corrPerPair(spark, dir))
    assert(p.contains("pearson_maps"), p.take(2000))
  }

  test("cosine top-k: native dot kernel, broadcast queries, rank pushdown") {
    val p = plan(Corpus.cosineTopK(spark, dir))
    assert(p.contains("dot_product"), "native kernel missing from plan")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast (one pass over the corpus)")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "rank<=k filter should push a group limit into the window")
  }

  test("window rank top-k gets a WindowGroupLimit") {
    val p = plan(graft.ops.Windows.rankTopKPerGroup(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("global top-k fuses to TakeOrderedAndProject") {
    val p = plan(Relational.orderByLimitTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("as-of join plans ONE shuffle and a running window, no range join") {
    val p = plan(Corpus.asofJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      "as-of join must not degrade to a range/cross join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(500))
  }

  test("tfidf top terms: tokenize+explode runs once; N scan is doc_id-only") {
    // df rides a window over tf instead of a re-derived branch — Spark
    // does NOT reuse sibling exchanges here (checked both statically
    // and in the AQE final plan), so every extra branch re-ran the
    // scan+explode. N's scan must be column-pruned to doc_id alone.
    val p = plan(Corpus.tfidfTopTerms(spark, dir))
    // count TREE nodes ("Op (id)") — formatted mode lists each node a
    // second time in the detail section
    val generates = "Generate \\(\\d+\\)".r.findAllIn(p).length
    assert(generates == 1,
      s"tokenize+explode must appear exactly once, got $generates:\n${p.take(2000)}")
    val scans = "Scan parquet +\\(\\d+\\)".r.findAllIn(p).length
    assert(scans <= 2, s"expected at most 2 scans, got $scans")
    val nScanSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).filterNot(_.contains("text"))
      .mkString
    assert(nScanSchema.contains("doc_id"),
      s"N branch must scan only doc_id: $nScanSchema")
  }

  test("dim chains broadcast every dimension (no fact-side join shuffle)") {
    for (df <- Seq(Relational.dimRollup(spark, dir),
                   Relational.partSupplierVolume(spark, dir))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p.take(1200))
      assert(!p.contains("SortMergeJoin") &&
             !p.contains("ShuffledHashJoin"),
        "dimension joins must not shuffle the fact side")
    }
  }

  test("range self-join is an equi-join on (key, bucket)") {
    val p = plan(Corpus.rangeJoinFollowers(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      "bucketized range join must be a pure equi-join")
  }

  test("pack-and-chunk prefix sum is bucket-distributed, not single-partition") {
    val p = plan(Corpus.packChunks(spark, dir))
    // the corpus-side window must partition by the quantile bucket —
    // a partition-less Window.orderBy would plan Exchange
    // SinglePartition over the whole corpus (the round-5 review bug)
    assert(p.contains("hashpartitioning(__bkt"),
      s"local prefix window must hash-exchange on the bucket:\n${p.take(1500)}")
    // the only single-partition stage is the <= nBuckets totals frame
    val singles = "Exchange SinglePartition".r.findAllIn(p).length
    assert(singles <= 1, s"corpus must not funnel to one partition:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must join back as a broadcast")
  }

  test("quality-classifier scoring plans zero shuffles (pure map pass)") {
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text"))
    val model = graft.ml.QualityModel.fit(
      docs.limit(40), docs.limit(40)
        .withColumn("text",
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("text"),
            org.apache.spark.sql.functions.lit(" !!! !!! !!!"))))
    val p = plan(model.score(docs))
    assert(!p.contains("Exchange"),
      s"scoring must be shuffle-free:\n${p.take(1500)}")
    assert(!p.contains("Join"), "scoring must not plan any join")
  }

  test("semantic-dedup pair join is a salted equi-join, never all-pairs") {
    val emb = Tables.embeddings(spark, dir)
    val p = plan(graft.dedup.Dedup.semanticPairs(emb, nClusters = 4))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      s"within-cell pairing must stay an equi-join:\n${p.take(1500)}")
    // the join key carries the salt (parallelism multiplier), not just
    // the cell id
    assert(p.contains("salt"), "salt column missing from the pair join")
  }
}
