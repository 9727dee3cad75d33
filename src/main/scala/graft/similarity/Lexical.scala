package graft.similarity

import org.apache.spark.sql.DataFrame
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
  * EVERYTHING derives from one (doc, term, tf) postings frame — one
  * tokenize pass + one narrow aggregate keyed on (doc, term), the
  * inverted-index build, linear in corpus tokens. Document lengths,
  * document frequencies, and the cosine norms are all aggregates OF
  * the postings, never a second corpus scan. Scoring joins the
  * (small) query term set against the postings ON TERM — a broadcast
  * hash join — so per-query cost scales with the postings of the
  * QUERIED terms, not the corpus. The final top-k is a per-query
  * window over candidate docs only. [[hybridTopK]] checkpoints the
  * shared postings so its two rankers pay the tokenize once. At
  * 100 TB the postings frame is built once and persisted (the
  * [[graft.dedup.DedupIndex]] posting-table pattern applies
  * verbatim); per-query cost is then df-bounded.
  */
object Lexical {

  /** The shared inverted-index shape: (doc_id, word, tf) under the
    * corpus contract's single-space split (the [[graft.ops.Corpus]]
    * twin spelling). */
  private[similarity] def tfPostings(docs: DataFrame, idCol: String,
                                     textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** DISTINCT query terms (the common web-query shape; document tf is
    * what BM25's saturation curve is for). */
  private[similarity] def queryTerms(queries: DataFrame,
                                     queryIdCol: String,
                                     queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
        explode(split(col(queryTextCol), " ")).as("word"))
      .distinct()

  /** BM25 ranking from a postings frame: doc length = Σtf per doc and
    * corpus token count = Σtf — aggregates of the postings, never a
    * second corpus scan. `nDocs` is a one-row frame with column `n`. */
  private def bm25Ranked(tf: DataFrame, nDocs: DataFrame,
                         qterms: DataFrame, k: Int,
                         k1: Double, b: Double): DataFrame = {
    val len = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val g = nDocs.crossJoin(tf.agg(sum(col("tf")).as("tot")))
      .withColumn("avgdl", col("tot") * lit(1.0) / col("n"))
    val cand = broadcast(qterms)
      .join(tf, Seq("word")) // inverted-index probe: df-bounded
    bm25RankFromParts(cand, df, len, g, k, k1, b)
  }

  /** The BM25 scoring + ranking tail, shared verbatim by the
    * in-memory path ([[bm25Ranked]]) and the persisted index
    * ([[LexicalIndex.searchBm25]]) — ONE spelling of the score, so
    * the two paths cannot drift. `cand`: (query_id, word, doc_id,
    * tf); `df`: (word, df); `len`: (doc_id, len); `g`: one row of
    * (n, avgdl). */
  private[similarity] def bm25RankFromParts(cand: DataFrame,
                                            df: DataFrame,
                                            len: DataFrame, g: DataFrame,
                                            k: Int, k1: Double,
                                            b: Double): DataFrame = {
    val term = cand
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

  /** Word-space tf-cosine ranking from a postings frame. Integer
    * score: `(dot² · 2²⁰) div (n2_q · n2_d)` — the established
    * monotone-in-cosine exact grid
    * ([[graft.text.TextVectors.topKBySparseCosine]] contract). */
  private def cosineRanked(tf: DataFrame, qtf: DataFrame,
                           k: Int): DataFrame = {
    val n2 = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val dot = broadcast(qtf).join(tf, Seq("word"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qtf") * col("tf")).as("dot"))
    cosineRankFromParts(dot, qtf, n2, k)
  }

  /** The cosine scoring + ranking tail, shared verbatim by the
    * in-memory path ([[cosineRanked]]) and the persisted index
    * ([[LexicalIndex.searchHybrid]]) — one spelling, no drift.
    * `dot`: (query_id, doc_id, dot); `qtf`: (query_id, word, qtf);
    * `n2`: (doc_id, n2) — the STORED doc norms (Σtf² over ALL the
    * doc's words, not just the probed ones). */
  private[similarity] def cosineRankFromParts(dot: DataFrame,
                                              qtf: DataFrame,
                                              n2: DataFrame,
                                              k: Int): DataFrame = {
    val qn2 = qtf.groupBy(col("query_id"))
      .agg(sum(col("qtf") * col("qtf")).as("qn2"))
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

  /** Query term frequencies for the cosine ranker (tf semantics, NOT
    * distinct — a cosine weights repeats). */
  private[similarity] def queryTf(queries: DataFrame,
                      queryIdCol: String,
                      queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
        explode(split(col(queryTextCol), " ")).as("word"))
      .groupBy(col("query_id"), col("word"))
      .agg(count(lit(1)).as("qtf"))

  /** BM25 top-k: for each query row, the `k` best-scoring documents.
    *
    * `docs`: (`idCol`, `textCol`); `queries`: (`queryIdCol`,
    * `queryTextCol`). Documents sharing no term with a query simply
    * never become candidates (score would be 0).
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
    bm25Ranked(tfPostings(docs, idCol, textCol),
      docs.agg(count(lit(1)).as("n")),
      queryTerms(queries, queryIdCol, queryTextCol), k, k1, b)
  }

  /** Raw word-space sparse-cosine top-k — the un-weighted lexical
    * ranker (term-frequency vectors, no idf, no length prior): the
    * natural SECOND opinion to fuse with [[bm25TopK]], cheap because
    * it shares the same (doc, word, tf) postings shape. */
  def wordCosineTopK(docs: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "doc_id", textCol: String = "text",
                     queryIdCol: String = "query_id",
                     queryTextCol: String = "qtext"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    cosineRanked(tfPostings(docs, idCol, textCol),
      queryTf(queries, queryIdCol, queryTextCol), k)
  }

  /** The BM25 + word-cosine hybrid in one call, RRF-fused
    * ([[rrfFuse]]): both rankers are branches of ONE fused plan over
    * the IDENTICAL postings subtree, so Spark's ReuseExchange
    * deduplicates the tokenize+aggregate shuffle across them — the
    * corpus is read once with no materialization step (an eager
    * checkpoint here measured SLOWER than the reuse: the exchange is
    * already shared). `kEach` is each ranker's candidate depth, `k`
    * the fused cut. */
  def hybridTopK(docs: DataFrame, queries: DataFrame, k: Int,
                 kEach: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                 kRrf: Int = 60,
                 idCol: String = "doc_id", textCol: String = "text",
                 queryIdCol: String = "query_id",
                 queryTextCol: String = "qtext"): DataFrame = {
    require(k > 0 && kEach > 0)
    val tf = tfPostings(docs, idCol, textCol)
    rrfFuse(Seq(
        bm25Ranked(tf, docs.agg(count(lit(1)).as("n")),
          queryTerms(queries, queryIdCol, queryTextCol), kEach, k1, b),
        cosineRanked(tf, queryTf(queries, queryIdCol, queryTextCol),
          kEach)),
      k, kRrf)
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
