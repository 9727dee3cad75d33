package graft.similarity

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BM25 semantics (idf ordering, tf saturation, length
  * normalization), word-space cosine, and RRF fusion behavior. */
class LexicalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(s: String) = Seq((1L, s)).toDF("query_id", "qtext")

  test("bm25: a rare term outranks a ubiquitous one at equal tf") {
    // 'zebra' appears in one doc, 'the' in all four: idf must make
    // the zebra doc the top hit for 'zebra the'
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the bird flew"),
      (4L, "the zebra grazed")).toDF("doc_id", "text")
    val top = Lexical.bm25TopK(docs, q("zebra the"), k = 4).collect()
    assert(top.head.getLong(2) == 4L, "rare-term doc must rank first")
    // every doc matches 'the', so all four are candidates
    assert(top.length == 4)
  }

  test("bm25: length normalization prefers the shorter doc at " +
    "equal tf; saturation caps runaway tf") {
    val docs = Seq(
      (1L, "apple pie"),
      (2L, "apple tart with a very long list of other words here"),
      (3L, "apple apple apple apple apple apple apple apple"))
      .toDF("doc_id", "text")
    val rows = Lexical.bm25TopK(docs, q("apple"), k = 3).collect()
    val rankOf = rows.map(r => r.getLong(2) -> r.getInt(1)).toMap
    // doc 1 (tf=1, len=2) beats doc 2 (tf=1, len=11)
    assert(rankOf(1L) < rankOf(2L), "length normalization inverted")
    // doc 3's tf=8 saturates: its score must be < (k1+1) * idf * 1e6,
    // the asymptote (soft upper bound of the saturation curve)
    val d3 = rows.find(_.getLong(2) == 3L).get.getLong(3)
    val n = 3.0; val df = 3.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    assert(d3 < 2.2 * idf * 1e6 + 1)
  }

  test("bm25: repeated query terms count once (DISTINCT semantics)") {
    val docs = Seq((1L, "apple pie"), (2L, "pear pie"))
      .toDF("doc_id", "text")
    val once = Lexical.bm25TopK(docs, q("apple"), k = 2).collect()
    val thrice = Lexical.bm25TopK(docs, q("apple apple apple"), k = 2)
      .collect()
    assert(once.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      thrice.map(r => (r.getLong(2), r.getLong(3))).toSeq)
  }

  test("wordCosine: an exact token-multiset match scores the " +
    "maximum grid value") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "epsilon zeta eta")).toDF("doc_id", "text")
    val rows = Lexical.wordCosineTopK(docs, q("alpha beta gamma"), k = 3)
      .collect()
    // cos=1 on the grid: (dot^2 * 2^20) div (n2*n2) = 2^20
    assert(rows.head.getLong(2) == 1L)
    assert(rows.head.getLong(3) == 1048576L)
    // no shared term -> never a candidate
    assert(!rows.map(_.getLong(2)).contains(3L))
  }

  test("rrf: agreement across rankers beats a single first place; " +
    "absence contributes nothing") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id",
      "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id",
      "rank")
    val fused = Lexical.rrfFuse(Seq(a, b), k = 3).collect()
    // doc 20 (ranks 2+1) = 1e6/62 + 1e6/61 beats doc 10 (rank 1 in
    // one ranker only) = 1e6/61
    assert(fused.head.getLong(2) == 20L)
    assert(fused.head.getLong(3) ==
      math.round(1e6 / 62) + math.round(1e6 / 61))
    val d10 = fused.find(_.getLong(2) == 10L).get
    assert(d10.getLong(3) == math.round(1e6 / 61))
  }
}
