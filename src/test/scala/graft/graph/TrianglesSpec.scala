package graft.graph

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle counting ([[Triangles]]): known counts on constructed
  * graphs, each-triangle-exactly-once, direction/duplicate/self-loop
  * insensitivity, and the brute-force cross-check on a random-ish
  * deterministic graph. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Triangles.triangleCount(edges.toDF("src", "dst"))

  test("known small graphs") {
    // single triangle
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == 1L)
    // K4 has 4 triangles
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(count(k4) == 4L)
    // path has none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    // two triangles sharing an edge
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L)))
      == 2L)
  }

  test("duplicates, reversed duplicates, self-loops don't change counts") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ Seq((2L, 1L), (1L, 2L), (3L, 3L), (1L, 1L))
    assert(count(noisy) == 1L)
  }

  test("each triangle listed exactly once, in orientation-rooted form") {
    val t = Triangles.triangleList(
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L))
          .toDF("src", "dst"))
      .collect().map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.length == 2)
    assert(t.toSet == Set(Set(1L, 2L, 3L), Set(2L, 3L, 4L)))
  }

  test("vertexTriangles credits every corner once per triangle") {
    val v = Triangles.vertexTriangles(
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L))
          .toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    val edges = (0 until 400).map { i =>
      ((i * 48271L) % 60, (i * 69621L) % 60)
    }.filter { case (a, b) => a != b }
    val fast = count(edges)
    // brute force over the normalized undirected set
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } brute += 1
    assert(fast == brute, s"fast $fast vs brute $brute")
  }

  test("hub skew: star graph has no triangles, star+rim has rim count") {
    val star = (1L to 50L).map(i => (0L, i))
    assert(count(star) == 0L)
    val rim = (1L until 50L).map(i => (i, i + 1))
    // each rim edge closes one triangle through the hub
    assert(count(star ++ rim) == 49L)
  }
}
