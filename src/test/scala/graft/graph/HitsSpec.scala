package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Integer fixed-point HITS ([[Hits]]). The q_hits oracle gates the
  * planted-graph mass; these cases pin the recurrence against hand
  * computation and the declared edge postures. */
class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int, scale: Long = 100L)
      : Map[Long, (Long, Long)] =
    Hits.hitsScaled(edges.toDF("src", "dst"), nodes.toDF("id"),
                    iters = iters, scale = scale)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("one iteration matches the hand-computed recurrence") {
    // 1→3, 2→3, 3→4 at scale 100:
    //   a_raw = {3: 200, 4: 100}, max 200 → a = {3: 100, 4: 50}
    //   h_raw = {1: 100, 2: 100, 3: 50}, max 100 → h = {1:100, 2:100, 3:50}
    val got = run(Seq(1L -> 3L, 2L -> 3L, 3L -> 4L),
                  Seq(1L, 2L, 3L, 4L), iters = 1)
    assert(got(1L) == ((100L, 0L)))
    assert(got(2L) == ((100L, 0L)))
    assert(got(3L) == ((50L, 100L)))
    assert(got(4L) == ((0L, 50L)))
  }

  test("a directory page pointing at every authority is the top hub") {
    // 9 is a pure hub into three authorities, which also link
    // each other a bit; 9 should dominate hub, never authority
    val edges = Seq(9L -> 1L, 9L -> 2L, 9L -> 3L,
                    1L -> 2L, 2L -> 3L)
    val got = run(edges, Seq(1L, 2L, 3L, 9L), iters = 3,
                  scale = 65536L)
    val topHub = got.maxBy(_._2._1)._1
    assert(topHub == 9L)
    assert(got(9L)._2 == 0L) // nothing points at the directory
  }

  test("an edgeless graph yields all-zero scores, not an error") {
    val got = run(Seq.empty, Seq(1L, 2L), iters = 2)
    assert(got == Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L))))
  }

  test("double spelling tracks the scaled spelling within the grid") {
    val edges = (0L until 60L).map(i => i -> ((i * 11 + 2) % 60))
      .filter { case (a, b) => a != b }
    val nodes = (0L until 60L)
    val scale = 1L << 20
    val scaled = Hits.hitsScaled(edges.toDF("src", "dst"),
        nodes.toDF("id"), iters = 3, scale = scale)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val dbl = Hits.hits(edges.toDF("src", "dst"), nodes.toDF("id"),
        iters = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // per-iteration floor error is < 1/scale of the max-normalized
    // value; after 3 iterations the drift stays well inside 1e-4
    nodes.foreach { id =>
      val (hs, as) = scaled(id); val (hd, ad) = dbl(id)
      assert(math.abs(hs.toDouble / scale - hd) < 1e-4,
        s"hub drift at $id: scaled=${hs.toDouble / scale} double=$hd")
      assert(math.abs(as.toDouble / scale - ad) < 1e-4,
        s"auth drift at $id: scaled=${as.toDouble / scale} double=$ad")
    }
  }

  test("scores are deterministic across partition layouts") {
    val edges = (0L until 40L).map(i => i -> ((i * 7 + 3) % 40))
      .filter { case (a, b) => a != b }
    val nodes = (0L until 40L)
    val a = run(edges, nodes, iters = 3, scale = 65536L)
    val b = Hits.hitsScaled(
        edges.toDF("src", "dst").repartition(17),
        nodes.toDF("id").repartition(3), iters = 3, scale = 65536L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(a == b)
  }
}
