package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.text.Text

/** Corpus-overlap estimation between sources via bottom-k sketches —
  * "how much of source A is already in source B" WITHOUT joining the
  * corpora. The planning question every multi-source training mix
  * starts with (dataset-overlap audits in the Pile/Dolma lineage) is
  * a pairwise Jaccard/containment matrix over sources; computing it
  * exactly is a shingle join across the full corpus product. The
  * bottom-k sketch (the KMV / Minwise estimator family — Bar-Yossef
  * et al. 2002; Beyer et al. 2007) answers it from `k` hashes per
  * source:
  *
  *  - sketch(S) = the k smallest DISTINCT md5 hex digests of S's
  *    3-word shingles (md5: engine-portable, so the whole estimator
  *    is oracle-checkable; deterministic — no seed);
  *  - bottomK(A ∪ B) = the k smallest of sketch(A) ∪ sketch(B)
  *    (exact identity — the k smallest of a union are always within
  *    the per-side k smallest);
  *  - J(A,B) ≈ |bottomK(A∪B) ∩ A ∩ B| / |bottomK(A∪B)|, the classic
  *    KMV Jaccard estimator;
  *  - containment C(A⊆B) ≈ |bottomK(A∪B) ∩ A ∩ B| /
  *    |bottomK(A∪B) ∩ A| — what "A is already inside B" asks.
  *
  * ==100-TB shape==
  * The shingle stream is the only corpus-bound stage and it feeds a
  * typed Aggregator whose state is AT MOST k strings: partial
  * sketches combine map-side, so the shuffle carries O(sources × k)
  * bytes no matter the corpus size. The pairwise stage runs on
  * |sources|² × k cells — sketch-sized data, never corpus-sized. The
  * sketches are also the natural PERSISTED artifact: store one row
  * per source and estimate overlap with every future source without
  * rescanning (the same merge identity serves streaming — the
  * aggregate is order-free and mergeable).
  */
object OverlapSketch {

  /** Mergeable bottom-k state: `hashes` sorted ascending, ≤ k
    * entries, duplicates never stored. */
  final case class Sketch(hashes: Seq[String])

  /** Bottom-k over strings as a typed Aggregator — insert keeps the
    * buffer sorted/deduped/trimmed, merge is a sorted union trim;
    * both are order-free, so the result is deterministic under any
    * partitioning. */
  final class BottomK(k: Int)
      extends Aggregator[String, Sketch, Sketch] {
    require(k > 0, s"bottom-k needs k > 0, got $k")

    override def zero: Sketch = Sketch(Vector.empty)

    override def reduce(b: Sketch, h: String): Sketch = {
      val v = b.hashes
      if (v.size >= k && h >= v.last) b
      else {
        val i = insertionPoint(v, h)
        if (i < v.size && v(i) == h) b
        else {
          val grown = (v.take(i) :+ h) ++ v.drop(i)
          Sketch(if (grown.size > k) grown.take(k) else grown)
        }
      }
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      // sorted-union two sorted deduped seqs, trim to k
      val out = Vector.newBuilder[String]
      var (i, j, n) = (0, 0, 0)
      val (x, y) = (a.hashes, b.hashes)
      while (n < k && (i < x.size || j < y.size)) {
        val next =
          if (j >= y.size || (i < x.size && x(i) <= y(j))) {
            val h = x(i); i += 1
            if (j < y.size && y(j) == h) j += 1
            h
          } else { val h = y(j); j += 1; h }
        out += next; n += 1
      }
      Sketch(out.result())
    }

    override def finish(r: Sketch): Sketch = r
    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]

    private def insertionPoint(v: Seq[String], h: String): Int = {
      var lo = 0; var hi = v.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  /** Per-key bottom-k sketches over a hash column: one row per key,
    * `sketch` = sorted array of ≤ k smallest distinct hashes. The
    * production kernel — map-side-combined typed aggregate, shuffle
    * O(keys × k). */
  def sketchByKey(rows: DataFrame, keyCol: String, hashCol: String,
                  k: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val agg = udaf(new BottomK(k))
    rows.groupBy(col(keyCol))
      .agg(agg(col(hashCol)).getField("hashes").as("sketch"))
  }

  /** The declarative twin of [[sketchByKey]] (distinct + ranked
    * window) — the semantics pin for OverlapSketchSpec; shuffles the
    * full distinct hash set, so the Aggregator is the production
    * path. */
  private[graft] def sketchByKeyDeclarative(rows: DataFrame,
      keyCol: String, hashCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rows.select(col(keyCol), col(hashCol)).distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(hashCol))))
      .filter(col("__rn") <= k)
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col(hashCol))).as("sketch"))
  }

  /** Distinct-3-shingle md5 stream of a document frame:
    * (keyCol, h). */
  def shingleHashes(docs: DataFrame, keyCol: String,
                    textCol: String = "text"): DataFrame =
    docs.select(col(keyCol),
        explode(Text.wordShingles(col(textCol), 3)).as("__sh"))
      .select(col(keyCol), md5(col("__sh")).as("h"))

  /** Pairwise overlap estimates from a sketch frame (key, sketch):
    * one row per unordered pair (key_a < key_b) with the union-sketch
    * size, the three intersection counts, and the Jaccard /
    * containment estimates (0.0 where the denominator is empty). */
  def pairwiseEstimates(sketches: DataFrame, keyCol: String, k: Int)
      : DataFrame = {
    val a = sketches.select(col(keyCol).as("key_a"),
      col("sketch").as("__sa"))
    val b = sketches.select(col(keyCol).as("key_b"),
      col("sketch").as("__sb"))
    val u = slice(array_sort(array_union(col("__sa"), col("__sb"))),
      1, k)
    def both(h: Column) =
      array_contains(col("__sa"), h) && array_contains(col("__sb"), h)
    val est = a.join(b, col("key_a") < col("key_b"))
      .withColumn("__u", u)
      .withColumn("n_union", size(col("__u")).cast("long"))
      .withColumn("n_common",
        size(filter(col("__u"), h => both(h))).cast("long"))
      .withColumn("n_a", size(filter(col("__u"),
        h => array_contains(col("__sa"), h))).cast("long"))
      .withColumn("n_b", size(filter(col("__u"),
        h => array_contains(col("__sb"), h))).cast("long"))
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
    est.select(col("key_a"), col("key_b"), col("n_union"),
      col("n_common"), col("n_a"), col("n_b"),
      ratio(col("n_common"), col("n_union")).as("j_est"),
      ratio(col("n_common"), col("n_a")).as("c_ab"),
      ratio(col("n_common"), col("n_b")).as("c_ba"))
  }

  /** The composed operator: source-pair overlap matrix of a document
    * corpus from 3-shingle bottom-k sketches. */
  def sourceOverlap(docs: DataFrame, k: Int = 64,
                    keyCol: String = "source",
                    textCol: String = "text"): DataFrame =
    pairwiseEstimates(
      sketchByKey(shingleHashes(docs, keyCol, textCol), keyCol, "h", k),
      keyCol, k)

  // ---- persisted-sketch lifecycle -----------------------------------

  /** Persist sketches (one tiny row per key: the sketch array plus
    * `k` stamped for read-time validation). The whole point of a
    * sketch registry: the 100-TB corpus is scanned ONCE per source,
    * ever — every future overlap question runs against these rows. */
  def saveSketches(sketches: DataFrame, path: String, k: Int): Unit =
    sketches.withColumn("k", lit(k))
      .write.mode("overwrite").parquet(path)

  /** Load a sketch registry, refusing loudly on a `k` mismatch — an
    * estimate mixing sketch resolutions is silently wrong, never
    * approximately right. */
  def loadSketches(spark: org.apache.spark.sql.SparkSession,
                   path: String, k: Int): DataFrame = {
    val df = spark.read.parquet(path)
    val ks = df.select(col("k")).distinct()
      .collect().map(_.getInt(0)).toSeq
    require(ks == Seq(k),
      s"sketch registry at $path was built with k=${ks.mkString(",")}" +
        s", caller asked for k=$k — rebuild or re-request")
    df.drop("k")
  }

  /** Overlap of a NEW corpus against every stored source: sketch the
    * incoming docs (one scan), union with the registry, estimate
    * pairwise, keep only pairs touching an incoming key — the landed
    * corpus is never rescanned. Incoming keys must not collide with
    * stored ones (checked). The key list is collected to the driver:
    * it is |new sources| strings — sketch-registry-sized by
    * construction, never corpus-sized. */
  def overlapAgainst(docs: DataFrame, registryPath: String,
                     k: Int = 64, keyCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val stored = loadSketches(spark, registryPath, k)
    val fresh =
      sketchByKey(shingleHashes(docs, keyCol, textCol), keyCol, "h", k)
        .localCheckpoint(false)
    val freshKeys = fresh.select(col(keyCol))
      .collect().map(_.getString(0)).toSeq
    val clash = freshKeys.toSet
    val collisions = stored.select(col(keyCol))
      .filter(col(keyCol).isInCollection(clash)).limit(1).count()
    require(collisions == 0,
      s"incoming $keyCol values collide with the stored registry — " +
        "disambiguate keys before estimating")
    pairwiseEstimates(fresh.unionByName(stored), keyCol, k)
      .filter(col("key_a").isInCollection(freshKeys) ||
        col("key_b").isInCollection(freshKeys))
  }
}
