package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse LEXICAL retrieval — the keyword side of a hybrid search
  * stack (BM25 + reciprocal-rank fusion with any dense ranker), built
  * for the same corpus scale as the dedup family: every shuffle is
  * keyed on the term, queries broadcast, and no stage ever
  * materializes an all-pairs surface.
  *
  * Reference behavior: classic retrieval semantics per Robertson &
  * Zaragoza 2009 (the BM25 probabilistic relevance framework, the
  * `ln(1 + (N-df+0.5)/(df+0.5))` non-negative IDF spelling Lucene
  * adopted) and Cormack, Clarke & Buettcher 2009 (reciprocal rank
  * fusion, the standard `1/(60+rank)` constant).
  *
  * ==Determinism contract==
  * Scores are emitted on an INTEGER grid (per-term micro-units,
  * summed as longs) so the ranking and the values replay bit-exactly
  * on any engine: summing doubles is addition-order-dependent and a
  * distributed aggregate has no fixed order, but rounding each TERM
  * contribution to a long first makes the sum order-free. Ranking
  * ties break on ascending item id.
  *
  * ==Scale shape==
  * `tf`/`df`/`len` are one tokenize pass + two narrow aggregates
  * keyed on (doc, term) / term — the inverted-index build, linear in
  * corpus tokens. Scoring joins the (small) query term set against
  * the postings ON TERM — a broadcast hash join once the query side
  * is collected under a documented bound — so cost scales with the
  * postings of the QUERIED terms, not the corpus. The final top-k is
  * a per-query window over candidate docs only. At 100 TB the
  * inverted index is built once and persisted (the
  * [[graft.dedup.DedupIndex]] posting-table pattern applies
  * verbatim); per-query cost is then df-bounded.
  */
object Lexical {

  /** BM25 top-k: for each query row, the `k` best-scoring documents.
    *
    * `docs`: (`idCol`, `textCol`); `queries`: (`queryIdCol`,
    * `queryTextCol`). Tokenization is the corpus contract's
    * single-space split (the [[graft.ops.Corpus]] twin spelling).
    * Repeated query terms count once (DISTINCT query-term semantics —
    * the common web-query shape; document tf is what BM25's
    * saturation curve is for). Documents sharing no term with a query
    * simply never become candidates (score would be 0).
    *
    * Output: (query_id, rank, doc_id, score_micro) where
    * `score_micro` = Σ_terms round(10⁶ · idf·tf·(k1+1) /
    * (tf + k1·(1−b+b·len/avgdl))) — the integer-grid BM25 score. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text",
               queryIdCol: String = "query_id",
               queryTextCol: String = "qtext"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val len = words.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // one-row globals: N docs and average doc length (in tokens,
    // over ALL docs — the denominator both engines can spell alike)
    val g = docs.agg(count(lit(1)).as("n"))
      .crossJoin(words.agg(count(lit(1)).as("tot")))
      .withColumn("avgdl", col("tot") * lit(1.0) / col("n"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(split(col(queryTextCol), " ")).as("word"))
      .distinct()
    val term = broadcast(qterms)
      .join(tf, Seq("word")) // inverted-index probe: df-bounded
      .join(df, Seq("word"))
      .join(len, Seq("doc_id"))
      .crossJoin(broadcast(g))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("term_micro",
        round(lit(1000000.0) * col("idf") *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("len") / col("avgdl")))).cast("long"))
    val scored = term.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"))
  }

  /** Raw word-space sparse-cosine top-k — the un-weighted lexical
    * ranker (term-frequency vectors, no idf, no length prior): the
    * natural SECOND opinion to fuse with [[bm25TopK]], cheap because
    * it shares the same (doc, word, tf) postings shape. Integer
    * score: `(dot² · 2²⁰) div (n2_q · n2_d)` — the established
    * monotone-in-cosine exact grid
    * ([[graft.text.TextVectors.topKBySparseCosine]] contract). */
  def wordCosineTopK(docs: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "doc_id", textCol: String = "text",
                     queryIdCol: String = "query_id",
                     queryTextCol: String = "qtext"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val n2 = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val qtf = queries.select(col(queryIdCol).as("query_id"),
        explode(split(col(queryTextCol), " ")).as("word"))
      .groupBy(col("query_id"), col("word"))
      .agg(count(lit(1)).as("qtf"))
    val qn2 = qtf.groupBy(col("query_id"))
      .agg(sum(col("qtf") * col("qtf")).as("qn2"))
    val dot = broadcast(qtf).join(tf, Seq("word"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qtf") * col("tf")).as("dot"))
    val scored = dot
      .join(broadcast(qn2), Seq("query_id"))
      .join(n2, Seq("doc_id"))
      .withColumn("score_q",
        expr("(dot * dot * 1048576) div (qn2 * n2)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_q"))
  }

  /** Reciprocal-rank fusion: merge any number of (query_id, doc_id,
    * rank) rankings into one, scored Σ round(10⁶ / (kRrf + rank)) —
    * integer per-ranker contributions, so the fused score is an
    * order-free long sum. A doc absent from a ranker simply
    * contributes nothing (the standard RRF treatment). Rankers are
    * heterogeneous by design — BM25 + dense ANN is the canonical
    * pair; any frame with the three columns fuses. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "nothing to fuse")
    require(k > 0 && kRrf > 0)
    val contrib = rankings.map(_.select(col("query_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(kRrf) + col("rank")))
          .cast("long").as("rrf_micro")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("rrf_micro")).as("rrf_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_micro"))
  }
}
