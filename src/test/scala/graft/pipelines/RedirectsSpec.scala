package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Redirect-chain resolution ([[Redirects]]). The q_redirect_chain
  * oracle gates the planted mass; these cases pin the semantics the
  * twin can't see — the maxHops boundary, conflicting-edge collapse,
  * and the crawl-frame shaping helper. */
class RedirectsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resolve(edges: Seq[(String, String)], maxHops: Int = 16)
      : Map[String, (String, Any, Long)] =
    Redirects.resolveChains(edges.toDF("src_url", "dst_url"), maxHops)
      .collect()
      .map { r =>
        r.getString(0) -> ((r.getString(1),
                            if (r.isNullAt(2)) null else r.getLong(2),
                            r.getLong(3)))
      }.toMap

  test("straight chains resolve with exact hop counts from every link") {
    val got = resolve(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(got("a") == (("d", 3L, 1L)))
    assert(got("b") == (("d", 2L, 1L)))
    assert(got("c") == (("d", 1L, 1L)))
  }

  test("cycles and tails into cycles flag unresolved, nulls carried") {
    val got = resolve(Seq(
      "x" -> "y", "y" -> "x",          // 2-cycle
      "self" -> "self",                // self-loop
      "t" -> "x",                      // tail entering the cycle
      "ok" -> "done"))                 // control
    for (u <- Seq("x", "y", "self", "t"))
      assert(got(u) == ((null, null, 0L)), s"$u should be unresolved")
    assert(got("ok") == (("done", 1L, 1L)))
  }

  test("chains longer than maxHops flag unresolved; at the bound resolve") {
    val chain = (0 until 6).map(i => s"u$i" -> s"u${i + 1}")
    val tight = resolve(chain, maxHops = 5)
    assert(tight("u0") == ((null, null, 0L))) // 6 hops > 5
    assert(tight("u1") == (("u6", 5L, 1L)))   // exactly at the bound
    val loose = resolve(chain, maxHops = 6)
    assert(loose("u0") == (("u6", 6L, 1L)))
  }

  test("conflicting duplicate edges collapse to the minimum target") {
    val got = resolve(Seq("a" -> "z2", "a" -> "z1"))
    assert(got("a") == (("z1", 1L, 1L)))
  }

  test("maxHops = 1 resolves single hops only") {
    val got = resolve(Seq("a" -> "b", "b" -> "c"), maxHops = 1)
    assert(got("b") == (("c", 1L, 1L)))
    assert(got("a") == ((null, null, 0L)))
  }

  test("edgesFromCrawl keeps resolvable redirect rows only") {
    val crawl = Seq(
      ("http://a/1", "http://a/2", 1L),
      ("http://a/2", null, 1L),
      ("http://a/3", "http://a/4", 0L)
    ).toDF("target_uri", "redirect_target", "is_redirect")
    val got = Redirects.edgesFromCrawl(crawl).collect().toSeq
    assert(got == Seq(Row("http://a/1", "http://a/2")))
  }
}
