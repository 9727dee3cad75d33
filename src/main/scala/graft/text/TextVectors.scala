package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL classical text embeddings — the hashing-trick (HashingTF)
  * bag-of-words vectorizer, built PORTABLY: each token lands in
  * bucket `uint32(md5(token)[0,8)) mod d` (the
  * [[graft.pipelines.Sharding.shardId]] arithmetic, identical on any
  * engine), so the vectors — and every similarity computed from
  * them — are hash-oracleable where Spark's murmur-based `HashingTF`
  * would be engine-private. This is the text twin of
  * [[graft.multimodal.ImagePhash]]'s DCT features: a real,
  * deterministic, classical embedding kernel that composes with the
  * whole similarity family ([[graft.similarity.Similarity]] /
  * `Pq`), leaving only deep-MODEL inference as the environmental
  * stub ([[graft.multimodal.Multimodal.FakeEmbedder]]).
  *
  * ==Integer-exact similarity==
  * TF counts are integers, so dot products and squared norms are
  * integers, and ranking by cosine equals ranking by
  * `dot² · 2²⁰ div (|a|²·|b|²)` — integer arithmetic end to end (TF
  * vectors are non-negative, so cos² orders like cos). That is what
  * makes `q_hashed_embed_topk` a hash-gated oracle query instead of
  * a float-tolerance comparison.
  *
  * ==Scale notes==
  * [[hashedTf]] is one narrow aggregate after a tokenizing flatMap.
  * [[topKBySparseCosine]] joins on the BUCKET — an inverted-index
  * candidate join like the dedup family's, never all-pairs; with
  * `d` buckets the join fan-out per query row is corpus/d. For
  * large-k dense workloads route the [[hashedTfVectors]] dense form
  * through the IVF/PQ index instead. */
object TextVectors {

  /** Portable bucket of one token: `uint32(md5(token)[0,8)) mod d`. */
  def tokenBucket(token: Column, d: Int): Column = {
    require(d > 0, s"dimension must be positive: $d")
    pmod(conv(substring(md5(token.cast("binary")), 1, 8), 16, 10)
           .cast("long"),
         lit(d.toLong))
  }

  /** Sparse hashed-TF: one `(id, bucket, tf)` row per non-empty
    * bucket. Tokenization is single-space split with empties dropped
    * (the corpus queries' portable convention). */
  def hashedTf(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", d: Int = 64): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(idCol), tokenBucket(col("tok"), d).as("bucket"))
      .agg(count(lit(1)).as("tf"))

  /** Dense `Array[Float]` form of [[hashedTf]] for composition with
    * the similarity family (`embedding` column contract). TF counts
    * are far below 2²⁴, so the float cast is exact. */
  def hashedTfVectors(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", d: Int = 64): DataFrame =
    hashedTf(docs, textCol, idCol, d)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("tf"))))
             .as("m"))
      .select(col(idCol),
              transform(sequence(lit(0L), lit(d - 1L)),
                i => coalesce(try_element_at(col("m"), i), lit(0L))
                       .cast("float"))
                .as("embedding"))

  /** Top-`k` most-similar docs per query doc by hashed-TF cosine,
    * ranked by the integer-exact `dot² · 2²⁰ div (|a|²·|b|²)` score
    * (ties → neighbor id). `queryPred` selects the query side; the
    * candidate join is bucket-keyed (inverted index), never
    * all-pairs. Output: `(query_id, rank, neighbor_id, score_q)`. */
  def topKBySparseCosine(docs: DataFrame, queryPred: Column, k: Int,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         d: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = hashedTf(docs, textCol, idCol, d)
      .localCheckpoint(false) // one tokenize pass serves both sides
    val norms = tf.groupBy(col(idCol))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val q = tf.filter(queryPred)
      .select(col(idCol).as("qid"), col("bucket"), col("tf").as("qtf"))
    val c = tf.select(col(idCol).as("nid"), col("bucket"),
                      col("tf").as("ntf"))
    val dots = q.join(c, "bucket")
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qtf") * col("ntf")).as("dot"))
    val scored = dots
      .join(norms.select(col(idCol).as("qid"), col("n2").as("qn2")), "qid")
      .join(norms.select(col(idCol).as("nid"), col("n2").as("nn2")), "nid")
      .withColumn("score_q",
        expr("(dot * dot * 1048576) div (qn2 * nn2)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("score_q").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
              col("nid").as("neighbor_id"), col("score_q"))
  }
}
