package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH ANN, Spark-shaped: a PARTITIONED NSW-lite index. The current
  * recall/latency frontier for nearest-neighbor search is graph
  * indexes (NSW/HNSW — navigable small worlds walked greedily from an
  * entry point), but their natural form is a pointer-chasing loop
  * with a mutable priority queue: one step per EDGE, thousands of
  * sequential steps per query — the exact execution shape Spark
  * cannot express (a Spark "step" is a distributed JOIN, and a
  * thousand-join plan is neither plannable nor fast). The honest
  * Spark translation RESHAPES the walk:
  *
  *  - a k-means coarse quantizer splits the corpus into CELLS (the
  *    IVF move, [[Similarity.writeIvfIndex]]), and the neighbor graph
  *    is built PER CELL — each node's M nearest within its cell, an
  *    embarrassingly parallel bounded self-join per cell, built ONCE
  *    at index time and never recomputed at search;
  *  - the search probes `nProbe` cells (partition-pruned scans of
  *    `nodes/` and `edges/` — the driver never touches vectors), and
  *    the greedy walk becomes a BEAM SEARCH of `hops` ROUNDS: every
  *    round expands the whole beam's out-edges in ONE join and keeps
  *    the best `beam` PER (query, cell) — each probed cell's walk
  *    stays alive independently (a global beam would abandon a cell
  *    whose entry scored poorly even when the true neighbor sits
  *    deep inside it) — so the plan is a FIXED ≤4-join chain
  *    regardless of corpus size, and each round's work is
  *    edge-bounded (nProbe·beam·2M candidate rows per query).
  *
  * Links are UNDIRECTED (the actual NSW shape: a directed M-NN graph
  * is hub-sinked — popular nodes collect in-edges the walk cannot
  * leave through) and each cell exposes several entry points (the
  * `entriesPerCell` nodes nearest the centroid), so coverage never
  * hangs off one node's neighborhood. Recall is a
  * (nProbe, M, beam, hops) dial, spec-pinned ≥ 0.9 against the exact
  * scan at full probe (isolating the graph approximation) and ≥ 0.9
  * against IVF's exact within-cell scan at EQUAL probe budget.
  *
  * ==At 100 TB==
  * Index build cost is Σ per-cell n²·d within cells (bounded: scale
  * `nCells` with the corpus so cells stay ~10⁴–10⁵ vectors — the
  * same discipline FAISS applies to IVF lists), all shuffle-local to
  * one cell. Search reads `nProbe/nCells` of the data at worst, and
  * only `entries + beam·M·hops` vectors per query in the join path.
  * The walk never leaves the probed cells — the deliberate
  * PARTITIONED trade (true HNSW's global long-range links don't
  * shard; the coarse quantizer plays that role here, exactly as in
  * IVF). SCALING.md documents the mismatch and this reshaping. */
object GraphAnn {

  /** Build the index at `path`: `nodes/` and `edges/` parquet
    * PARTITIONED BY cell (edges symmetrized, out-degree ≤ 2M),
    * `centroids/` (tiny), `entries/` (the `entriesPerCell` nodes
    * nearest each centroid). Same seed ⇒ same quantizer ⇒
    * byte-stable index. */
  def writeNswIndex(corpus: DataFrame, path: String, nCells: Int = 16,
                    m: Int = 8, seed: Long = 42L,
                    entriesPerCell: Int = 4,
                    cId: String = "vec_id",
                    cVec: String = "embedding"): Unit = {
    require(nCells >= 1 && m >= 1 && entriesPerCell >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    // KMeans.fit iterates, transform re-reads: pin the normalized
    // frame once (the ivfTopK lifecycle contract)
    val c = corpus
      .select(col(cId).as("node_id"), col(cVec).as("cv"))
      .filter(Similarity.l2Norm(col("cv")) > lit(0.0))
      .withColumn("v", array_to_vector(Similarity.normalize(col("cv"))))
      .localCheckpoint()
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("v").setPredictionCol("cell")
    // drop the KMeans training summary (frame + session) the predict
    // UDF's closure would otherwise carry — see SummaryBridge
    val model =
      org.apache.spark.ml.graft.SummaryBridge.dropSummary(km.fit(c))
    val nodes = model.transform(c)
      .select(col("node_id"), col("cv"), col("cell"))
      .localCheckpoint() // consumed by three writes below
    nodes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/nodes")
    // per-cell M-NN graph: a self-join BOUNDED to each cell (the
    // build-once cost the search amortizes; cell sizes are the knob)
    val a = nodes.select(col("cell"), col("node_id").as("src"),
      col("cv").as("sv"))
    val b = nodes.select(col("cell"), col("node_id").as("dst"),
      col("cv").as("dv"))
    val wM = Window.partitionBy(col("cell"), col("src"))
      .orderBy(col("ecos").desc, col("dst"))
    val knn = a.join(b, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .withColumn("ecos", Similarity.cosine(col("sv"), col("dv")))
      .withColumn("r", row_number().over(wM))
      .filter(col("r") <= lit(m))
      .select(col("cell"), col("src"), col("dst"))
    // UNDIRECTED links (the actual NSW shape): a directed M-NN graph
    // is hub-sinked — popular nodes collect in-edges but the walk
    // can't leave through them; symmetrizing restores navigability
    // (out-degree ≤ 2M, storage-bounded)
    knn.unionByName(knn.select(col("cell"),
        col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/edges")
    val centers = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "center")
    centers.write.mode("overwrite").parquet(s"$path/centroids")
    // entry points: the `entriesPerCell` nodes nearest their cell
    // centroid (medoid stand-ins) — several beams start per cell, so
    // coverage never hangs off one node's neighborhood
    val wE = Window.partitionBy(col("cell"))
      .orderBy(col("ccos").desc, col("node_id"))
    nodes.join(broadcast(centers), Seq("cell"))
      .withColumn("ccos", Similarity.cosine(col("cv"), col("center")))
      .withColumn("r", row_number().over(wE))
      .filter(col("r") <= lit(entriesPerCell))
      .select(col("cell"), col("node_id"))
      .write.mode("overwrite").parquet(s"$path/entries")
  }

  /** Beam-search the index: `nProbe` cells per query
    * (partition-pruned), then `hops` rounds of
    * expand-all-out-edges-in-one-join, keeping the per-query best
    * `beam` as the next frontier; top-k over everything visited.
    * Ties break on id everywhere — deterministic for a fixed index. */
  def searchNswIndex(spark: SparkSession, path: String,
                     queries: DataFrame, k: Int, nProbe: Int = 4,
                     beam: Int = 8, hops: Int = 3,
                     qId: String = "vec_id",
                     qVec: String = "embedding"): DataFrame = {
    require(k >= 1 && nProbe >= 1 && beam >= 1 &&
      hops >= 1 && hops <= 4,
      "hops is the plan depth — ≤4 keeps the join chain fixed; " +
        "raise beam/nProbe for recall instead")
    val centers = spark.read.parquet(s"$path/centroids")
    val q = queries
      .select(col(qId).as("query_id"), col(qVec).as("qv"))
      .filter(Similarity.l2Norm(col("qv")) > lit(0.0))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("center_cos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centers))
      .withColumn("center_cos", Similarity.cosine(col("qv"),
        col("center")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= lit(nProbe))
      .select(col("query_id"), col("qv"), col("cell"))
    // the probed cell list is |Q|·nProbe ids — driver-side by design,
    // so nodes/edges scans are statically partition-pruned
    val probedCells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val nodes = spark.read.parquet(s"$path/nodes")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("cell"), col("node_id"), col("cv"))
    val edges = spark.read.parquet(s"$path/edges")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("cell"), col("src"), col("dst"))
    val entries = spark.read.parquet(s"$path/entries")
      .filter(col("cell").isin(probedCells: _*))
    def scoreOf(fr: DataFrame): DataFrame = fr
      .join(nodes, Seq("cell", "node_id"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("qv"), col("cell"),
        col("node_id"), col("cos"))
    // the beam is PER (query, cell): each probed cell keeps its own
    // walk alive (a global beam would abandon a cell whose ENTRY
    // scored poorly even when the query's true neighbor sits deep
    // inside it — entry score and best-in-cell correlate weakly);
    // per-round work is nProbe·beam·2M rows per query, explicit and
    // bounded
    val wBeam = Window.partitionBy(col("query_id"), col("cell"))
      .orderBy(col("cos").desc, col("node_id"))
    def topBeam(scored: DataFrame): DataFrame = scored
      .withColumn("r", row_number().over(wBeam))
      .filter(col("r") <= lit(beam))
      .select(col("query_id"), col("qv"), col("cell"), col("node_id"))
    // round 0: every probed cell's entry node
    var scored = scoreOf(probed.join(entries, Seq("cell")))
    var visited = scored.select(col("query_id"), col("node_id"),
      col("cos"))
    var frontier = topBeam(scored)
    (1 to hops).foreach { _ =>
      // ONE join expands the whole beam's out-edges; dedupe on the
      // (query, cell, node) key BEFORE scoring so a node reached via
      // two beam members costs one dot product (qv rides along via
      // first — it is functionally dependent on query_id). Frontier
      // columns are RENAMED before the join (fcell/fsrc) so every
      // reference resolves by unique name — repeated hops would
      // otherwise trip Spark's ambiguous-self-join detection (the
      // frontier's lineage contains the edges relation after hop 1).
      val nbrs = frontier
        .select(col("query_id"), col("qv"),
          col("cell").as("fcell"), col("node_id").as("fsrc"))
        .join(edges, col("fsrc") === col("src") &&
          col("fcell") === col("cell"))
        .groupBy(col("query_id"), col("cell"), col("dst"))
        .agg(first(col("qv")).as("qv"))
        .select(col("query_id"), col("qv"), col("cell"),
          col("dst").as("node_id"))
      scored = scoreOf(nbrs)
      visited = visited.unionByName(
        scored.select(col("query_id"), col("node_id"), col("cos")))
      frontier = topBeam(scored)
    }
    visited
      .filter(col("query_id") =!= col("node_id"))
      .groupBy(col("query_id"), col("node_id"))
      .agg(max(col("cos")).as("cos_raw"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_raw").desc, col("node_id"))))
      .filter(col("rank") <= lit(k))
      .select(col("query_id"), col("node_id").as("neighbor_id"),
        col("cos_raw").as("cos"), col("rank"))
  }
}
