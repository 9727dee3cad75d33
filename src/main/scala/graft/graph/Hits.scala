package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (hubs & authorities, Kleinberg 1999) over a directed edge
  * list — [[PageRank]]'s complementary link-ranking pass: PageRank
  * answers "how much stationary mass lands here", HITS separates
  * "points AT good pages" (hub) from "is pointed at BY good hubs"
  * (authority). On a crawl's link graph the two scores drive
  * different curation decisions — authority feeds per-page quality
  * priors (like PageRank), hub strength identifies directory/index
  * pages whose OUTLINKS are high-yield frontier candidates.
  *
  * ==Integer fixed-point spelling==
  * Same posture as [[PageRank.pageRankScaled]]: scores are BIGINT
  * multiples of `1/scale`, every step floor arithmetic, so an
  * independent engine unrolling the identical recurrence reproduces
  * it bit-for-bit. HITS needs per-iteration normalization (unlike
  * PageRank its raw sums grow without bound); the classic L2 norm
  * has no integer spelling, so the declared normalizer is MAX:
  * {{{
  *   a_raw(v) = Σ_{u→v} h(u);  a(v) = (a_raw(v)·scale) div max(a_raw)
  *   h_raw(u) = Σ_{u→v} a(v);  h(u) = (h_raw(u)·scale) div max(h_raw)
  * }}}
  * Max-normalization preserves the SCORE ORDER and relative ratios
  * each iteration (what rankings consume), differs from L2 only by
  * the constant. An all-zero side (a graph with no edges) stays
  * all-zero — declared, not an error.
  *
  * ==Bounds==
  * Raw sums are ≤ N·scale, the normalization multiply ≤ N·scale² —
  * the default `scale = 2¹⁶` keeps that under 2⁶³ to N ≈ 2×10⁹
  * nodes. Raise scale only with a smaller node universe.
  *
  * ==Scale shape==
  * The edge list is laid out by key ONCE per direction and persisted
  * (`src` for the hub gather, `dst` for the authority gather); each
  * half-iteration is one small-side join (the |V|-sized score table)
  * + one map-side-combined groupBy + a SCALAR max (an aggregate to
  * one row, broadcast back — never a driver collect). Score lineage
  * cuts every iteration. */
object Hits {

  /** Integer-exact HITS; returns `(id, hub, auth)` (BIGINT multiples
    * of `1/scale`; `h⁰ = scale`). `nodes` fixes the vertex universe
    * (same contract as [[PageRank.pageRankScaled]]). */
  def hitsScaled(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
                 scale: Long = 65536L, srcCol: String = "src",
                 dstCol: String = "dst", idCol: String = "id")
      : DataFrame = {
    require(iters >= 1, s"bad iters $iters")
    require(scale > 0, s"bad scale $scale")
    val spark = edges.sparkSession
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
                          col(dstCol).cast("long").as("dst"))
    val eBySrc = e0.repartition(shuffle, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst = e0.repartition(shuffle, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n0 = nodes.select(col(idCol).cast("long").as("id"))

    // (raw, join-key) → max-normalized score over the node universe
    def normalized(raw: DataFrame): DataFrame = {
      val m = raw.agg(max(col("raw")).as("mx"))
      n0.join(raw.withColumnRenamed("k", "id"), Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"),
          when(col("mx").isNull || col("mx") === 0L, lit(0L))
            .otherwise(expr(s"(coalesce(raw, 0L) * ${scale}L) div mx"))
            .as("score"))
    }

    var hubs = n0.withColumn("score", lit(scale))
    var auths: DataFrame = null
    try {
      for (_ <- 0 until iters) {
        val aRaw = eByDst
          .join(hubs.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("k")).agg(sum(col("score")).as("raw"))
        auths = normalized(aRaw).localCheckpoint()
        val hRaw = eBySrc
          .join(auths.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("k")).agg(sum(col("score")).as("raw"))
        hubs = normalized(hRaw).localCheckpoint()
      }
      hubs.withColumnRenamed("score", "hub")
        .join(auths.withColumnRenamed("score", "auth"), Seq("id"))
    } finally {
      eBySrc.unpersist(blocking = false)
      eByDst.unpersist(blocking = false)
    }
  }

  /** Double-precision production spelling — identical plan shape
    * (two persisted edge layouts, |V|-side joins, scalar max
    * broadcast, lineage cut), scores as doubles with the same MAX
    * normalization (`h⁰ = 1.0`). Use when exact cross-engine replay
    * is not required; HitsSpec pins that it tracks the scaled
    * spelling within the fixed-point grid. */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
           srcCol: String = "src", dstCol: String = "dst",
           idCol: String = "id"): DataFrame = {
    require(iters >= 1, s"bad iters $iters")
    val spark = edges.sparkSession
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
                          col(dstCol).cast("long").as("dst"))
    val eBySrc = e0.repartition(shuffle, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst = e0.repartition(shuffle, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n0 = nodes.select(col(idCol).cast("long").as("id"))

    def normalized(raw: DataFrame): DataFrame = {
      val m = raw.agg(max(col("raw")).as("mx"))
      n0.join(raw.withColumnRenamed("k", "id"), Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"),
          when(col("mx").isNull || col("mx") === 0.0, lit(0.0))
            .otherwise(coalesce(col("raw"), lit(0.0)) / col("mx"))
            .as("score"))
    }

    var hubs = n0.withColumn("score", lit(1.0))
    var auths: DataFrame = null
    try {
      for (_ <- 0 until iters) {
        val aRaw = eByDst
          .join(hubs.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("k")).agg(sum(col("score")).as("raw"))
        auths = normalized(aRaw).localCheckpoint()
        val hRaw = eBySrc
          .join(auths.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("k")).agg(sum(col("score")).as("raw"))
        hubs = normalized(hRaw).localCheckpoint()
      }
      hubs.withColumnRenamed("score", "hub")
        .join(auths.withColumnRenamed("score", "auth"), Seq("id"))
    } finally {
      eBySrc.unpersist(blocking = false)
      eByDst.unpersist(blocking = false)
    }
  }
}
