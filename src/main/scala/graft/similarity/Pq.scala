package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the MEMORY-scale leg of the similarity
  * family (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; the FAISS `IndexPQ`/`IndexIVFPQ` layout).
  *
  * [[Similarity.cosineTopK]] scans raw vectors (dim × 4 bytes each);
  * [[Similarity.ivfTopK]] prunes WHICH vectors are scanned but still
  * reads raw floats. PQ compresses WHAT is scanned: each unit vector is
  * cut into `m` contiguous subvectors, each subvector quantized to one
  * of `kCodes` per-subspace centroids, so a vector becomes `m` small
  * ints — at (m=8, kCodes=16), 64 float dims (256 B) become 8 codes
  * (≤ 8 B), a 32× shrink. A 100-TB embedding corpus becomes a ~3-TB
  * code table that fits a modest cluster's page cache; search reads
  * codes only, never raw floats.
  *
  * Search is ADC (asymmetric distance computation): per query, one
  * m × kCodes table of exact subspace distances (query side stays
  * un-quantized — hence "asymmetric"); each corpus row's approximate
  * squared L2 distance is then `m` table lookups, no float math on the
  * corpus side. On unit vectors ‖q−x‖² = 2(1−cos), so the reported
  * `cos` is 1 − adc/2 — an ESTIMATE whose error is the quantization
  * residual (tested: recall vs the exact scan, and error → 0 as kCodes
  * grows).
  *
  * Training is m seeded KMeans fits over one localCheckpoint'd pass of
  * the corpus (the codebook is m·kCodes·(dim/m) doubles — KBs; ships
  * to executors by closure). Seeded quantizer ⇒ no SQL oracle; the
  * declared query is rows-checked by the driver and content-pinned by
  * the committed sf0.01 golden (GoldenSeededSpec), like the other
  * seeded similarity queries.
  */
object Pq {

  /** Trained product quantizer: `codebooks(j)(c)` is the (dim/m)-dim
    * centroid of code `c` in subspace `j`. Tiny by construction —
    * m·kCodes·dsub doubles. */
  final case class PqModel(m: Int, dsub: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.length == m && codebooks.forall(_.nonEmpty))
    def kCodes: Int = codebooks(0).length
  }

  /** Fit per-subspace codebooks on the unit-normalized corpus. One
    * corpus pass materializes the normalized vectors (localCheckpoint —
    * KMeans iterates, and m fits would otherwise re-run the upstream
    * DAG m × iterations times); each fit then reads only its own
    * dsub-wide slice. Zero-norm vectors are dropped (no direction to
    * quantize). `dim` must divide evenly by `m`. */
  def trainPq(corpus: DataFrame, m: Int = 8, kCodes: Int = 16,
              seed: Long = 42L, vecCol: String = "embedding"): PqModel = {
    val unit = corpus
      .select(col(vecCol).as("raw"))
      .filter(Similarity.l2Norm(col("raw")) > lit(0.0))
      .select(Similarity.normalize(col("raw")).as("nv"))
      .localCheckpoint()
    trainPqVectors(unit, m, kCodes, seed)
  }

  /** Codebook fit over an ALREADY-prepared vector column `nv` (no
    * normalization — residual vectors must be quantized as-is). The
    * input should be materialized (localCheckpoint) by the caller:
    * KMeans iterates, and m fits re-read it. */
  private def trainPqVectors(prepared: DataFrame, m: Int, kCodes: Int,
                             seed: Long): PqModel = {
    val first = prepared.select(size(col("nv"))).head(1)
    require(first.nonEmpty,
      "trainPq needs at least one non-zero-norm vector")
    val dim = first(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = prepared.select(
        array_to_vector(slice(col("nv"), j * dsub + 1, dsub)).as("v"))
      new KMeans().setK(kCodes).setSeed(seed + j)
        .setFeaturesCol("v").setPredictionCol("c")
        .fit(sub).clusterCenters.map(_.toArray)
    }
    PqModel(m, dsub, codebooks)
  }

  /** Argmin code of subvector `arr[off, off+dsub)` against one
    * subspace's codebook. */
  private def nearestCode(arr: Array[Double], off: Int,
                          book: Array[Array[Double]], dsub: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cen = book(c)
      var d = 0.0
      var i = 0
      while (i < dsub) {
        val t = arr(off + i) - cen(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Corpus → (`idCol`, codes array<int> of length m). The UDF is the
    * justified kind (SURVEY §2.8 ladder): the kernel is an argmin over
    * a closure-shipped codebook — m·kCodes·dsub multiplies per row in
    * tight JVM loops; the Column-algebra form would be an m·kCodes-way
    * expression tree re-evaluated per reference (the round-6 HOF
    * staging lesson). Zero-norm vectors are dropped, matching
    * [[trainPq]]. */
  def encodePq(df: DataFrame, model: PqModel,
               vecCol: String = "embedding",
               idCol: String = "vec_id"): DataFrame = {
    val enc = encodeUdfOf(model)
    df.select(col(idCol), col(vecCol).as("raw"))
      .filter(Similarity.l2Norm(col("raw")) > lit(0.0))
      .select(col(idCol), enc(Similarity.normalize(col("raw"))).as("codes"))
  }

  /** Argmin-encode UDF over an as-is vector column (shared by
    * [[encodePq]] and the residual path, which must NOT normalize). */
  private def encodeUdfOf(model: PqModel) = {
    val m = model.m
    val dsub = model.dsub
    val books = model.codebooks
    udf { nv: Seq[Double] =>
      val arr = nv.toArray
      Array.tabulate(m)(j => nearestCode(arr, j * dsub, books(j), dsub))
    }
  }

  /** PQ-approximate top-k: train on the corpus, encode the corpus,
    * ADC-rank per query. Output (query_id, neighbor_id, cos, rank) —
    * `cos` is the ADC estimate 1 − adc/2, NOT the exact cosine.
    *
    * Plan: broadcast(queries ⊕ their flattened distance tables — each
    * m·kCodes doubles) × one pass over the code table; scoring is m
    * array lookups per pair inside a JVM UDF; per-query top-k via
    * WindowGroupLimit, exactly the [[Similarity.cosineTopK]] serving
    * shape. The corpus-side bytes are the whole point: codes, not
    * floats. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
             qId: String = "vec_id", qVec: String = "embedding",
             cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val model = trainPq(corpus, m, kCodes, seed, cVec)
    searchCodes(queries, encodePq(corpus, model, cVec, cId)
                  .withColumnRenamed(cId, "neighbor_id"),
                model, k, qId, qVec)
  }

  /** ADC search of a pre-encoded code table (`neighbor_id`, `codes`) —
    * the reusable second half of [[pqTopK]], and the whole recurring
    * cost once codes are materialized ([[writePqIndex]]). */
  /** Per-query subspace-distance table UDF, flattened to m·kCodes
    * doubles (flat primitive array: one allocation, O(1) indexed
    * lookups). */
  private def tableUdfOf(model: PqModel) = {
    val m = model.m; val dsub = model.dsub; val kC = model.kCodes
    val books = model.codebooks
    udf { nv: Seq[Double] =>
      val arr = nv.toArray
      val t = new Array[Double](m * kC)
      var j = 0
      while (j < m) {
        val book = books(j)
        var c = 0
        while (c < kC) {
          val cen = book(c)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val x = arr(j * dsub + i) - cen(i)
            d += x * x
            i += 1
          }
          t(j * kC + c) = d
          c += 1
        }
        j += 1
      }
      t
    }
  }

  /** ADC lookup-sum UDF: m table reads per (codes, table) pair. */
  private def adcUdfOf(model: PqModel) = {
    val m = model.m; val kC = model.kCodes
    udf { (codes: Seq[Int], table: Seq[Double]) =>
      var s = 0.0
      var j = 0
      while (j < m) {
        s += table(j * kC + codes(j))
        j += 1
      }
      s
    }
  }

  def searchCodes(queries: DataFrame, codes: DataFrame, model: PqModel,
                  k: Int, qId: String = "vec_id",
                  qVec: String = "embedding"): DataFrame = {
    val tableUdf = tableUdfOf(model)
    val adcUdf = adcUdfOf(model)
    val q = queries
      .select(col(qId).as("query_id"), col(qVec).as("qraw"))
      .filter(Similarity.l2Norm(col("qraw")) > lit(0.0))
      .select(col("query_id"),
              tableUdf(Similarity.normalize(col("qraw"))).as("qtable"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    broadcast(q).crossJoin(codes)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw",
        lit(1.0) - adcUdf(col("codes"), col("qtable")) / lit(2.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(k))
      .select(col("query_id"), col("neighbor_id"),
              col("cos_raw").as("cos"), col("rank"))
  }

  /** PQ search with EXACT RE-RANKING (the FAISS `refine` stage): ADC
    * produces a shortlist of `k·refine` candidates per query from codes
    * alone, then ONLY those rows' raw vectors are fetched and scored
    * exactly. Output contract matches [[Similarity.cosineTopK]] —
    * `cos` is the TRUE cosine — while the corpus-wide scan still reads
    * nothing but codes; the refine join touches |Q|·k·refine raw rows
    * (point lookups against the id-keyed store at scale). Recall is
    * bounded by ADC recall@(k·refine), which the `refine` dial widens
    * cheaply — the spec pins it well above plain [[pqTopK]]'s. */
  def pqTopKRefined(queries: DataFrame, corpus: DataFrame, k: Int,
                    refine: Int = 5, m: Int = 8, kCodes: Int = 16,
                    seed: Long = 42L,
                    qId: String = "vec_id", qVec: String = "embedding",
                    cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val model = trainPq(corpus, m, kCodes, seed, cVec)
    val codes = encodePq(corpus, model, cVec, cId)
      .withColumnRenamed(cId, "neighbor_id")
    val shortlist = searchCodes(queries, codes, model, k * refine,
        qId, qVec)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
      .withColumn("cn", Similarity.l2Norm(col("cv")))
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
      .withColumn("qn", Similarity.l2Norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    shortlist
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_raw",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(k))
      .select(col("query_id"), col("neighbor_id"),
              col("cos_raw").as("cos"), col("rank"))
  }

  /** IVF × PQ — both scale dials composed (the FAISS `IndexIVFPQ`
    * role): a k-means coarse quantizer prunes WHICH rows are touched
    * (each query reads only its `nProbe` of `nCells` cells), PQ codes
    * shrink WHAT is read per touched row (m codes, not dim·4 float
    * bytes), and an exact refine stage re-ranks the `k·refine`
    * shortlist with true cosines. At 100 TB: cell-partitioned CODE
    * table (the [[Similarity.writeIvfIndex]] layout holding codes
    * instead of vectors) ⇒ a search scans nProbe/nCells of a
    * 32×-compressed corpus — both factors multiply.
    *
    * One deliberate divergence from FAISS: codebooks are SHARED across
    * cells and trained on the vectors themselves, not per-cell
    * residuals — residual encoding couples the two quantizers (every
    * re-cluster invalidates every code; a shared codebook lets cells
    * and codes rebuild independently, the right trade for a
    * periodically re-landed corpus). Recall lost to the coarser
    * codebook is bought back by the refine stage, which the spec pins
    * against plain [[pqTopKRefined]]. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nCells: Int = 16, nProbe: Int = 4, refine: Int = 5,
                m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val model = trainPq(corpus, m, kCodes, seed, cVec)
    // coarse quantizer over the same unit sphere the codes live on
    val c = corpus
      .select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
      .filter(Similarity.l2Norm(col("cv")) > lit(0.0))
      .withColumn("v", array_to_vector(Similarity.normalize(col("cv"))))
      .localCheckpoint()
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("v").setPredictionCol("cell")
    // drop the KMeans training summary (frame + session) the predict
    // UDF's closure would otherwise carry — see SummaryBridge
    val kmModel =
      org.apache.spark.ml.graft.SummaryBridge.dropSummary(km.fit(c))
    val codes = encodePq(corpus, model, cVec, cId)
      .withColumnRenamed(cId, "neighbor_id")
      .join(kmModel.transform(c).select(col("neighbor_id"), col("cell")),
            Seq("neighbor_id"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centers = kmModel.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "center")
    val tableUdf = tableUdfOf(model)
    val adcUdf = adcUdfOf(model)
    val q = queries
      .select(col(qId).as("query_id"), col(qVec).as("qv"))
      .filter(Similarity.l2Norm(col("qv")) > lit(0.0))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("center_cos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centers))
      .withColumn("center_cos", Similarity.cosine(col("qv"), col("center")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= lit(nProbe))
      .select(col("query_id"), col("qv"),
              tableUdf(Similarity.normalize(col("qv"))).as("qtable"),
              col("cell"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    val shortlist = probed.join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcUdf(col("codes"), col("qtable")))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= lit(k * refine))
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    // exact re-rank of the shortlist: raw floats touched for
    // |Q|·k·refine rows only
    val raw = c.select(col("neighbor_id"), col("cv"),
                       Similarity.l2Norm(col("cv")).as("cn"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    shortlist.join(raw, Seq("neighbor_id"))
      .withColumn("cos_raw",
        Similarity.dot(col("qv"), col("cv")) /
          (Similarity.l2Norm(col("qv")) * col("cn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= lit(k))
      .select(col("query_id"), col("neighbor_id"),
              col("cos_raw").as("cos"), col("rank"))
  }

  /** IVF-PQ with RESIDUAL encoding — the other side of
    * [[ivfPqTopK]]'s documented trade-off (its scaladoc: shared
    * codebooks decouple the quantizers at some recall cost). Here the
    * coupling is accepted to buy recall at the SAME code budget:
    * codes quantize `v − center(cell(v))` instead of `v`, and
    * residuals concentrate near the origin with far less variance
    * than raw unit vectors, so the same m × kCodes budget spends its
    * centroids on a much smaller ball — finer quantization, higher
    * ADC recall (PqSpec pins residual ≥ shared-codebook at equal
    * budget; SCALING.md carries the measured gap). ADC is exact over
    * the decomposition ‖q − (c + r̂)‖² = ‖(q − c) − r̂‖²: each probed
    * cell gets its own query-residual distance table (nProbe small
    * tables per query — still KBs).
    *
    * The price stays as documented on [[ivfPqTopK]]: re-clustering
    * cells invalidates every code (residuals move), so this variant
    * fits corpora whose cell structure is stable between full
    * re-lands, while the shared-codebook variant suits independent
    * rebuild cadences. No refine stage — output `cos` is the ADC
    * estimate, so the codebook quality itself is what benchmarks
    * (compose [[pqTopKRefined]]'s refine join on top when serving
    * true cosines). */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        nCells: Int = 16, nProbe: Int = 4,
                        m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
                        qId: String = "vec_id", qVec: String = "embedding",
                        cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus
      .select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
      .filter(Similarity.l2Norm(col("cv")) > lit(0.0))
      .withColumn("nv", Similarity.normalize(col("cv")))
      .withColumn("v", array_to_vector(col("nv")))
      .localCheckpoint()
    val kmModel = org.apache.spark.ml.graft.SummaryBridge.dropSummary(
      new KMeans().setK(nCells).setSeed(seed)
        .setFeaturesCol("v").setPredictionCol("cell").fit(c))
    val centers = kmModel.clusterCenters.map(_.toArray)
    val residUdf = udf { (nv: Seq[Double], cell: Int) =>
      val cen = centers(cell)
      Array.tabulate(nv.length)(i => nv(i) - cen(i))
    }
    val resid = kmModel.transform(c)
      .select(col("neighbor_id"), col("cell"),
              residUdf(col("nv"), col("cell")).as("nv_r"))
      .localCheckpoint() // codebook fit + encode both read it
    val model = trainPqVectors(
      resid.select(col("nv_r").as("nv")), m, kCodes, seed)
    val codes = resid
      .select(col("neighbor_id"), col("cell"),
              encodeUdfOf(model)(col("nv_r")).as("codes"))
    val centersDf = centers.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "center")
    val tableUdf = tableUdfOf(model)
    val adcUdf = adcUdfOf(model)
    val q = queries
      .select(col(qId).as("query_id"), col(qVec).as("qv"))
      .filter(Similarity.l2Norm(col("qv")) > lit(0.0))
      .withColumn("qnv", Similarity.normalize(col("qv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("center_cos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centersDf))
      .withColumn("center_cos", Similarity.cosine(col("qnv"), col("center")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= lit(nProbe))
      .select(col("query_id"),
              tableUdf(residUdf(col("qnv"), col("cell"))).as("qtable"),
              col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    probed.join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw",
        lit(1.0) - adcUdf(col("codes"), col("qtable")) / lit(2.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(k))
      .select(col("query_id"), col("neighbor_id"),
              col("cos_raw").as("cos"), col("rank"))
  }

  /** Materialized PQ index: the code table as parquet plus the
    * codebooks as one tiny parquet frame (subspace, code, center) —
    * the concrete 100-TB form: build once at landing, every search
    * then scans m-byte codes instead of dim·4-byte floats. Same seed ⇒
    * same quantizer ⇒ [[searchPqIndex]] ≡ [[pqTopK]] (spec-pinned).
    *
    * ==Lifecycle (the [[graft.dedup.DedupIndex]] pattern)==
    * Codes land in BATCH-SCOPED partition directories
    * (`codes/batch=<tag>`, per-directory overwrite): a growing
    * corpus [[appendPqIndex]]es each landed batch — encoded with the
    * BUILD-TIME codebooks, no retrain, the shared-codebooks contract
    * that keeps old and new codes comparable under one ADC table —
    * and re-running an append with the same tag replaces its own
    * files (at-least-once-retry idempotence). [[gcPqIndex]] is the
    * takedown half: rewrite minus the removed ids, codebooks carried
    * over. Codebook DRIFT (the corpus distribution wandering from
    * the training sample) degrades recall, not correctness — ADC
    * stays exact over whatever centroids exist; re-train cadence is
    * a deployment call ([[trainPq]] + full re-encode). */
  def writePqIndex(corpus: DataFrame, path: String, m: Int = 8,
                   kCodes: Int = 16, seed: Long = 42L,
                   cId: String = "vec_id", cVec: String = "embedding")
      : Unit = {
    val model = trainPq(corpus, m, kCodes, seed, cVec)
    encodePq(corpus, model, cVec, cId)
      .withColumnRenamed(cId, "neighbor_id")
      .write.mode("overwrite").parquet(s"$path/codes/batch=b0")
    val spark = corpus.sparkSession
    import spark.implicits._
    (for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "center")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Fail fast on an index whose `codes/` is not the batch-partitioned
    * layout (an index written by a pre-lifecycle build has part files
    * directly under `codes/`): appending next to flat files makes the
    * later partitioned read throw Spark's conflicting-directory-
    * structures error at SEARCH time — the same loud-at-the-boundary
    * contract as [[graft.dedup.DedupIndex]]'s key-format stamp. */
  private def requireBatchLayout(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Unit = {
    val codes = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codes.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(codes)) {
      val flat = fs.listStatus(codes).filter { st =>
        val n = st.getPath.getName
        !n.startsWith("batch=") && !n.startsWith("_") && !n.startsWith(".")
      }
      require(flat.isEmpty,
        s"PQ index at $path has a pre-lifecycle flat codes/ layout " +
        s"(found ${flat.map(_.getPath.getName).take(3).mkString(", ")}); " +
        "rebuild it with writePqIndex before appending or searching")
    }
  }

  /** Land a new batch of vectors into an existing index: encode with
    * the STORED codebooks (no retrain — appended codes stay
    * comparable with every earlier batch under one ADC table) and
    * write into the batch's own partition directory. `batchTag` must
    * be fresh per landed batch ("b0" is the build); re-using a tag
    * overwrites that batch's files — retry idempotence. */
  def appendPqIndex(batch: DataFrame, path: String, batchTag: String,
                    cId: String = "vec_id", cVec: String = "embedding")
      : Unit = {
    require(batchTag.nonEmpty && batchTag != "b0" &&
            batchTag.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"batchTag must be a fresh directory-safe tag, got '$batchTag'")
    requireBatchLayout(batch.sparkSession, path)
    val model = readModel(batch.sparkSession, path)
    encodePq(batch, model, cVec, cId)
      .withColumnRenamed(cId, "neighbor_id")
      .write.mode("overwrite").parquet(s"$path/codes/batch=$batchTag")
  }

  /** Retention GC + compaction: rewrite the index at `dst` WITHOUT
    * the `removedIds` vectors, all batches folded to one directory,
    * codebooks carried over unchanged. Only the index is scanned —
    * never the vector corpus. Same `dst != path` swap contract as
    * [[graft.dedup.DedupIndex.gc]]. */
  def gcPqIndex(spark: org.apache.spark.sql.SparkSession,
                removedIds: DataFrame, path: String, dst: String,
                idCol: String = "vec_id"): Unit = {
    require(dst != path, "gc to a fresh directory, then swap")
    requireBatchLayout(spark, path)
    val removed = removedIds.select(col(idCol).as("neighbor_id")).distinct()
    spark.read.parquet(s"$path/codes")
      .select(col("neighbor_id"), col("codes"))
      .join(broadcast(removed), Seq("neighbor_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$dst/codes/batch=b0")
    spark.read.parquet(s"$path/codebooks")
      .write.mode("overwrite").parquet(s"$dst/codebooks")
  }

  /** Rebuild the (tiny) PqModel from an index's codebook frame —
    * collected driver-side, KBs. */
  private def readModel(spark: org.apache.spark.sql.SparkSession,
                        path: String): PqModel = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("subspace"), col("code"), col("center"))
      .collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { j =>
      rows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
    PqModel(m, books(0)(0).length, books)
  }

  /** Search a [[writePqIndex]] index: rebuild the model, then
    * ADC-scan the code table (all batches — partition discovery
    * walks `codes/batch=*`). */
  def searchPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, qId: String = "vec_id",
                    qVec: String = "embedding"): DataFrame = {
    requireBatchLayout(spark, path)
    val model = readModel(spark, path)
    searchCodes(queries,
                spark.read.parquet(s"$path/codes")
                  .select(col("neighbor_id"), col("codes")),
                model, k, qId, qVec)
  }
}
