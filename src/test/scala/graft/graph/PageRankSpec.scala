package graft.graph

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank ([[PageRank]]): the integer fixed-point recurrence against
  * hand-computed ranks on a known graph, mass-conservation bounds, the
  * double spelling tracking the scaled one, and partitioning
  * invariance. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic 4-node example: 0->1, 0->2, 1->2, 2->0, 3->2
  private lazy val edges =
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
  private lazy val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")

  private def ranksMap(iters: Int): Map[Long, Long] =
    PageRank.pageRankScaled(edges, nodes, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("iters=0 returns the uniform start mass") {
    assert(ranksMap(0) == Map(0L -> 1000000L, 1L -> 1000000L,
                              2L -> 1000000L, 3L -> 1000000L))
  }

  test("one iteration matches the hand-computed integer recurrence") {
    // r0 = 1e6 each; base = 150000
    // node0: from 2 (deg1): 85*1e6 div 100 = 850000        -> 1000000
    // node1: from 0 (deg2): 85*1e6 div 200 = 425000        ->  575000
    // node2: from 0 + 1(deg1) + 3(deg1): 425000+850000*2   -> 2275000
    // node3: no in-links                                   ->  150000
    assert(ranksMap(1) == Map(0L -> 1000000L, 1L -> 575000L,
                              2L -> 2275000L, 3L -> 150000L))
  }

  test("two iterations keep following the exact recurrence") {
    // from r1: contrib(0->x) = 85*1000000 div 200 = 425000
    //          contrib(1->2) = 85*575000 div 100  = 488750
    //          contrib(2->0) = 85*2275000 div 100 = 1933750
    //          contrib(3->2) = 85*150000 div 100  = 127500
    assert(ranksMap(2) == Map(
      0L -> (150000L + 1933750L),
      1L -> (150000L + 425000L),
      2L -> (150000L + 425000L + 488750L + 127500L),
      3L -> 150000L))
  }

  test("mass never exceeds the start total; every node keeps the base") {
    val r = ranksMap(5)
    // floor divisions + the dangling drop only LOSE mass
    assert(r.values.sum <= 4L * 1000000L)
    assert(r.values.forall(_ >= 150000L))
  }

  test("double spelling tracks the scaled ranks within floor error") {
    val d = PageRank.pageRank(edges, nodes, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s = ranksMap(5)
    // each of the 5 iterations floors ≤ indeg times; at this scale
    // the relative gap stays tiny
    s.foreach { case (id, r) =>
      assert(math.abs(r / 1e6 - d(id)) < 1e-3,
        s"node $id: scaled ${r / 1e6} vs double ${d(id)}") }
  }

  test("result is invariant to input partitioning") {
    val a = PageRank.pageRankScaled(edges.repartition(7), nodes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.pageRankScaled(edges.coalesce(1), nodes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("distributed path (driverEdgeLimit=0) is bit-equal to the " +
       "driver fast path") {
    val dist = PageRank.pageRankScaled(edges, nodes, iters = 3,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == ranksMap(3))
  }

  test("isolated node (in nodes, no edges) holds base after an iter") {
    val n5 = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val r = PageRank.pageRankScaled(edges, n5, iters = 2)
      .filter(col("id") === 9L).head().getLong(1)
    assert(r == 150000L)
  }

  test("parallel edges each carry mass (declared multigraph semantics)") {
    val multi = Seq((0L, 1L), (0L, 1L)).toDF("src", "dst")
    val two = Seq(0L, 1L).toDF("id")
    val r = PageRank.pageRankScaled(multi, two, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // outdeg(0)=2, two edges: 2 * (85*1e6 div 200) = 850000
    assert(r(1L) == 150000L + 850000L)
  }
}
